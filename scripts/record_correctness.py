#!/usr/bin/env python3
"""Convert a check_oracle.py log into a CORRECTNESS_rN_*.json artifact.

Usage: python3 scripts/record_correctness.py <check_oracle.log> <out.json> <note> [expected_count]

PASS lines become triple-green entries (the gate only prints PASS after
rows+schema+hash all match); FAIL lines record the failure text in err.

A truncated or crashed check_oracle run must not masquerade as a clean
gate: when `expected_count` is given (or derivable from the catalog),
the script exits non-zero if fewer entries were parsed — a smaller
artifact that still reads 0-fail is exactly the silent-drop failure
mode this guards against.
"""
import json
import re
import sys

log, out, note = sys.argv[1], sys.argv[2], sys.argv[3]
expected = int(sys.argv[4]) if len(sys.argv) > 4 else None
entries = {}
for line in open(log):
    m = re.match(r"PASS (\S+) \((\d+) rows\)", line.strip())
    if m:
        entries[m.group(1)] = {
            "rows_match": True, "schema_match": True, "hash_match": True,
            "spark_rows": int(m.group(2)), "oracle_rows": int(m.group(2)),
            "err": None, "note": note}
        continue
    m = re.match(r"FAIL (\S+): (.*)", line.strip())
    if m:
        entries[m.group(1)] = {
            "rows_match": False, "schema_match": False, "hash_match": False,
            "spark_rows": None, "oracle_rows": None,
            "err": m.group(2)[:300], "note": note}
n_fail = sum(1 for v in entries.values() if v["err"])
json.dump(dict(sorted(entries.items())), open(out, "w"), indent=1)
print(f"wrote {out}: {len(entries)} queries, {n_fail} fail")
if expected is not None and len(entries) != expected:
    print(f"ERROR: expected {expected} queries but parsed {len(entries)} — "
          f"truncated/crashed run? artifact written but NOT gate-clean",
          file=sys.stderr)
    sys.exit(2)
