#!/usr/bin/env python3
"""Merge N chunk-catalog Bench artifacts into one combined record.

The sf100 full-catalog pass does not fit a single round's wall clock in
one JVM, so it runs as cost-balanced chunks (catalog order preserved
inside each chunk; membership split at sf10 cumulative-cost points).
This script unions them into BENCH_r{N}_sf100.json with full
provenance: the combined record carries every chunk's calibration/
contention/normalization gates verbatim and is honest about being
sequential fresh-JVM runs, not one suite.

Deliberate contract exclusions (queries no chunk was ever asked to
run — e.g. quadratic-output rows skipped on scale legs) are passed via
--skip name[,name...] and unioned into the merged "skipped" list, so
the combined artifact distinguishes "excluded by contract" from "not
measured" without a reader needing the campaign prose.

Usage: merge_bench_halves.py out.json [--skip n1,n2] chunk1.json chunk2.json [...]
"""
import json
import sys


def main():
    argv = sys.argv[1:]
    declared_skips = set()
    if "--skip" in argv:
        i = argv.index("--skip")
        declared_skips = {s for s in argv[i + 1].split(",") if s}
        argv = argv[:i] + argv[i + 2:]
    out_path, chunk_paths = argv[0], argv[1:]
    chunks = []
    for p in chunk_paths:
        lines = [ln for ln in open(p).read().strip().splitlines() if ln.strip()]
        chunks.append((p, json.loads(lines[-1])))
    seen = set()
    for p, c in chunks:
        if c.get("rejected"):
            sys.exit(f"refusing to merge rejected chunk {p}: {c.get('reject_reason')}")
        overlap = seen & set(c["queries"])
        if overlap:
            sys.exit(f"chunk {p} overlaps earlier chunks: {sorted(overlap)}")
        seen |= set(c["queries"])
    # a stray chunk from a different leg or gate config must not merge
    # into a silently mislabeled artifact
    for key in ("sf", "calibration_ref_sec", "calibration_gate"):
        vals = {json.dumps(c.get(key)) for _, c in chunks}
        if len(vals) > 1:
            sys.exit(f"chunks disagree on {key}: {sorted(vals)} — refusing to merge")
    measured_skips = declared_skips & seen
    if measured_skips:
        sys.exit(f"--skip names were actually measured by a chunk: "
                 f"{sorted(measured_skips)}")
    gate_keys = ("value", "normalized_value", "calibration_sec",
                 "calibration_mid", "gc_reruns", "contention_reruns",
                 "contention_skipped", "contention_unremediated",
                 "contended", "mem_probe_gbps", "skipped", "failed")
    merged = {
        "metric": "total",
        "value": sum(c["value"] for _, c in chunks),
        "normalized_value": round(sum(
            c.get("normalized_value", c["value"]) for _, c in chunks), 3),
        "unit": "sec",
        "queries": {k: v for _, c in chunks for k, v in c["queries"].items()},
        "hash_family_overrides": {
            k: v for _, c in chunks
            for k, v in c.get("hash_family_overrides", {}).items()},
        "skipped": sorted({s for _, c in chunks
                           for s in c.get("skipped", [])} | declared_skips),
        "failed": sorted({f for _, c in chunks for f in c.get("failed", [])}),
        "failed_count": sum(c.get("failed_count", 0) for _, c in chunks),
        "contended": any(c.get("contended", False) for _, c in chunks),
        "rejected": False,
        "sf": chunks[0][1]["sf"],
        # provenance: sequential fresh-JVM runs, each gate-clean on its
        # own calibration/contention record (kept verbatim per chunk)
        "combined_from": {
            p: {k: c.get(k) for k in gate_keys} for p, c in chunks},
        "calibration_ref_sec": chunks[0][1].get("calibration_ref_sec"),
        "calibration_gate": chunks[0][1].get("calibration_gate"),
    }
    with open(out_path, "w") as f:
        json.dump(merged, f)
    print(f"merged {len(merged['queries'])} rows from {len(chunks)} chunks -> "
          f"{out_path}; total {merged['value']:.1f}s normalized "
          f"{merged['normalized_value']:.1f}s failed {merged['failed_count']} "
          f"skipped {merged['skipped']}")


if __name__ == "__main__":
    main()
