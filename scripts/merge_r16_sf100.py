#!/usr/bin/env python3
"""Assemble BENCH_r16_sf100.json from the round-16 chunk artifacts plus
the round-15 record for rows not re-measured this round.

Overlap policy (documented in PROFILE_r16 §7): a row re-measured in
round 16 supersedes its round-15 value — the r15 value is preserved
verbatim in the superseded_r15 map, so both numbers stay on the
record (the r15 values for w2/a4/a2/s1/m13 were measured at the
pre-sizing 32-partition config, m12 additionally under the
javax.sound lock, g6/g4/d14 were failures). merge_bench_halves.py
does the actual union with its overlap/config assertions; this script
only strips superseded rows from a COPY of the r15 artifact and adds
the declared contract skips.
"""
import json
import subprocess
import sys
import tempfile

R16_CHUNKS = [
    "/tmp/BENCH_r16_sf100_cliff.json",
    "/tmp/BENCH_r16_sf100_ev29.json",
    "/tmp/BENCH_r16_sf100_m12.json",
    "/tmp/BENCH_r16_sf100_g46.json",
    "/tmp/BENCH_r16_sf100_g4.json",
    "/tmp/BENCH_r16_sf100_tail1.json",
    "/tmp/BENCH_r16_sf100_tail2.json",
    "/tmp/BENCH_r16_sf100_tail3.json",
    "/tmp/BENCH_r16_sf100_d14.json",
    "/tmp/BENCH_r16_sf100_d6.json",
]
R15 = "BENCH_r15_sf100.json"
R14_DOZEN = "BENCH_r14_sf100_dozen.json"
CONTRACT_SKIPS = "ev9_stream_stream_join,e3_embedding_dedup,m6_image_neardup,d2_ngram_jaccard_pairs,d15_containment_pairs"


def load(p):
    return json.loads(open(p).read().strip().splitlines()[-1])


def main():
    out = sys.argv[1] if len(sys.argv) > 1 else "BENCH_r16_sf100.json"
    chunks = [(p, load(p)) for p in R16_CHUNKS]
    # m12 was re-measured solo after the codec fix; g4/d14 were failures
    # in their first chunks and re-measured after their fixes. Strip the
    # superseded/failed copies so the merge has no overlaps, recording
    # the first-measurement values alongside.
    superseded = {}
    strip = {
        "/tmp/BENCH_r16_sf100_cliff.json": ["m12_audio_segments"],
        "/tmp/BENCH_r16_sf100_g46.json": ["g4_joint_recall"],
        "/tmp/BENCH_r16_sf100_tail1.json": ["d14_contamination_score"],
        "/tmp/BENCH_r16_sf100_tail2.json": ["d6_decontaminate"],
    }
    tmp_files = []
    fixed_chunks = []
    r16_rows = set()

    def pop_row(c, name):
        """Pop a query row AND its time contribution, so chunk totals
        (which merge_bench_halves.py sums) never double-count a row
        that another chunk re-measured. Failed rows are recorded as
        -1.0 and contribute nothing to 'value', so only subtract
        non-negative times; 'normalized_value' is value scaled by the
        chunk's host-drift factor, so rescale it proportionally."""
        t = c["queries"].pop(name)
        if isinstance(t, (int, float)) and t > 0 and c.get("value", 0) > 0:
            factor = c.get("normalized_value", c["value"]) / c["value"]
            c["value"] -= t
            c["normalized_value"] = round(c["value"] * factor, 3)
        return t

    for p, c in chunks:
        for name in strip.get(p, []):
            if name in c["queries"]:
                superseded[name + "@" + p.split("/")[-1]] = pop_row(c, name)
                c["failed"] = [f for f in c.get("failed", []) if f != name]
                c["failed_count"] = len(c["failed"])
        r16_rows |= set(c["queries"])
        t = tempfile.NamedTemporaryFile("w", suffix=".json", delete=False)
        json.dump(c, t); t.close(); tmp_files.append(t.name)
        fixed_chunks.append(t.name)
    # r15/r14 carry-over: strip everything round 16 re-measured
    for prior in (R15, R14_DOZEN):
        c = load(prior)
        dropped = {}
        for name in list(c["queries"]):
            if name in r16_rows:
                dropped[name] = pop_row(c, name)
        c["failed"] = [f for f in c.get("failed", []) if f not in r16_rows]
        c["failed_count"] = len(c["failed"])
        # r14's artifact predates the calibration-config keys — backfill
        # ONLY when absent, so a genuine r15 config mismatch still trips
        # merge_bench_halves.py's assertion
        c.setdefault("calibration_ref_sec", 0.4)
        c.setdefault("calibration_gate", 1.25)
        c.setdefault("sf", "/tmp/sf100")
        superseded.update({k + "@" + prior: v for k, v in dropped.items()})
        r16_rows |= set(c["queries"])
        t = tempfile.NamedTemporaryFile("w", suffix=".json", delete=False)
        json.dump(c, t); t.close(); tmp_files.append(t.name)
        fixed_chunks.append(t.name)
    r = subprocess.run(
        [sys.executable, "scripts/merge_bench_halves.py", out,
         "--skip", CONTRACT_SKIPS] + fixed_chunks,
        capture_output=True, text=True)
    print(r.stdout, r.stderr)
    if r.returncode != 0:
        sys.exit(r.returncode)
    # append provenance for superseded first measurements
    m = json.load(open(out))
    m["superseded_values"] = superseded
    json.dump(m, open(out, "w"))
    # coverage report against the current catalog
    cat = json.load(open("CORRECTNESS_r15.json"))
    allq = set(cat["queries"] if "queries" in cat else cat) | {"ev29_stream_join_agg"}
    have = set(m["queries"]) | set(m["skipped"]) | set(m["failed"])
    print(f"coverage: {len(have & allq)}/{len(allq)}; missing: {sorted(allq - have)}")


if __name__ == "__main__":
    main()
