#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run graft.Verify, then
compare each query's parquet dump against its DuckDB oracle SQL
(columns sorted by name, rows sorted, value-level compare).

Usage: python3 scripts/check_oracle.py [sfDir] [outDir] [--skip-verify]
                                       [--only=name1,name2,...] [--agg]

--only restricts the compare to the named queries (spot-check mode for
scale legs, where graft.Verify was run with its own subset arg and the
remaining catalog has no parquet dump to compare).

--agg replaces the Python-side row materialization (fetchall + sort)
with an in-DuckDB order-insensitive aggregate compare: both sides are
normalized identically (doubles rounded to 9 places, everything cast
to VARCHAR) and reduced to (count(*), sum(hash(row-struct))). Value
coverage is equivalent — every cell feeds the hash — but the compare
stays vectorized and spill-able, so 100M+-row outputs (g3/w2 at sf100)
are checkable where fetchall would exhaust driver memory.
"""
import json
import math
import subprocess
import sys
from pathlib import Path

import duckdb

args = [a for a in sys.argv[1:] if not a.startswith("--")]
SF_DIR = args[0] if len(args) > 0 else "/root/testdata/sf0.001"
OUT_DIR = args[1] if len(args) > 1 else "/tmp/verify_out"
SKIP = "--skip-verify" in sys.argv
AGG = "--agg" in sys.argv
ONLY = None
for a in sys.argv[1:]:
    if a.startswith("--only="):
        ONLY = set(n for n in a[len("--only="):].split(",") if n)

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def run_verify():
    # forward the --only subset to graft.Verify's subset arg so spot-check
    # runs dump only the queries they will compare (the full catalog dump
    # is exactly the expensive run --only exists to avoid on scale legs)
    subset = f" {','.join(sorted(ONLY))}" if ONLY else ""
    cmd = ["sbt", f'runMain graft.Verify {SF_DIR} {OUT_DIR}{subset}']
    r = subprocess.run(cmd, cwd="/root/repo", capture_output=True, text=True)
    for line in r.stdout.splitlines():
        if "[verify]" in line or "error" in line.lower():
            print(line)
    for line in r.stderr.splitlines():
        if "[verify]" in line:
            print(line)
    if r.returncode != 0:
        print(r.stdout[-3000:])
        sys.exit(f"verify failed rc={r.returncode}")


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 9)
    return v


def main():
    if not SKIP:
        run_verify()
    con = duckdb.connect()
    for t in TABLES:
        p = f"{SF_DIR}/{t}.parquet"
        if Path(p).is_dir():  # Spark directory layout (ScaleUp legs)
            p = f"{p}/*.parquet"
        elif not Path(p).exists():
            continue
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
        # ScaleUp (Spark-written) events store ts as BIGINT epoch-nanos —
        # Spark cannot write TIMESTAMP(NANOS). The graft side normalizes
        # via tsToNanos; normalize the DuckDB side too by rebuilding the
        # view with make_timestamp(ts // 1000), which reproduces exactly
        # DuckDB's own nanos->micros truncation on the driver's originals.
        if t == "events":
            cols = con.execute("DESCRIBE events").fetchall()
            if dict((c[0], c[1]) for c in cols).get("ts") == "BIGINT":
                sel = ", ".join(
                    "make_timestamp(ts // 1000) AS ts" if c[0] == "ts"
                    else c[0] for c in cols)
                con.execute("CREATE OR REPLACE VIEW events AS "
                            f"SELECT {sel} FROM '{p}'")
    oracle = json.loads(Path(f"{OUT_DIR}/oracle_sql.json").read_text())
    if ONLY is not None:
        # a typo'd --only name is a gate failure, not a warning — otherwise
        # a mistyped list filters the compare set down (possibly to zero)
        # and the gate exits 0 having checked nothing
        missing = ONLY - set(oracle)
        if missing:
            sys.exit(f"FAIL: --only names not in oracle catalog: {sorted(missing)}")
        oracle = {k: v for k, v in oracle.items() if k in ONLY}
        if not oracle:
            sys.exit("FAIL: --only filtered the oracle set to nothing")
    # Lint: DuckDB widens sum(BIGINT) to HUGEINT (and may produce DECIMAL),
    # which Spark never emits — an uncast window/agg sum hash-mismatches even
    # when every value is equal (bit r1 g4 and r3 c3). Flag them up front.
    n_lint = 0
    for name, sql in sorted(oracle.items()):
        try:
            cols = con.execute(f"DESCRIBE {sql}").fetchall()
        except Exception as e:
            print(f"LINT {name}: describe error {e}")
            n_lint += 1
            continue
        for cname, ctype, *_ in cols:
            if "HUGEINT" in ctype.upper() or "DECIMAL" in ctype.upper():
                print(f"LINT {name}: column '{cname}' types as {ctype} — "
                      f"Spark has no such type; add an explicit ::BIGINT/"
                      f"::DOUBLE cast in the oracle SQL")
                n_lint += 1
    if n_lint:
        print(f"{n_lint} oracle type lint failure(s)\n")
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        pq = f"{OUT_DIR}/{name}"
        if not Path(pq).exists():
            print(f"FAIL {name}: no parquet output")
            n_fail += 1
            continue
        if AGG:
            try:
                got_cols = [c[0] for c in con.execute(
                    f"DESCRIBE SELECT * FROM read_parquet('{pq}/*.parquet')"
                ).fetchall()]
                want_cols = [c[0] for c in con.execute(
                    f"DESCRIBE {sql}").fetchall()]
                if sorted(got_cols) != sorted(want_cols):
                    print(f"FAIL {name}: cols {sorted(got_cols)} != "
                          f"{sorted(want_cols)}")
                    n_fail += 1
                    continue

                def digest(src, cols):
                    # quote every identifier (catalog has reserved-word
                    # column names like "order"); represent each cell as
                    # VARCHAR with doubles rounded as the classic compare
                    # rounds, NULL kept distinct from '' via a sentinel,
                    # and rows joined on a separator no cell contains
                    types = dict(
                        (c[0], c[1]) for c in con.execute(
                            f"DESCRIBE SELECT * FROM ({src})").fetchall())
                    cells = ", ".join(
                        "COALESCE(" + (
                            f'CAST(round("{c}", 9) AS VARCHAR)'
                            if types[c].upper() in ("DOUBLE", "FLOAT", "REAL")
                            else f'CAST("{c}" AS VARCHAR)')
                        + ", chr(1))"
                        for c in sorted(cols))
                    return con.execute(
                        f"SELECT count(*), sum(hash(concat_ws(chr(31), "
                        f"{cells}))) FROM ({src})"
                    ).fetchone()

                gn, gh = digest(
                    f"SELECT * FROM read_parquet('{pq}/*.parquet')", got_cols)
                wn, wh = digest(sql, want_cols)
            except Exception as e:
                print(f"FAIL {name}: exec error {e}")
                n_fail += 1
                continue
            if gn != wn:
                print(f"FAIL {name}: rows {gn} != {wn}")
                n_fail += 1
            elif gh != wh:
                print(f"FAIL {name}: agg hash mismatch over {gn} rows")
                n_fail += 1
            else:
                print(f"PASS {name} ({gn} rows)")
                n_pass += 1
            continue
        try:
            got = con.execute(
                f"SELECT * FROM read_parquet('{pq}/*.parquet')").fetchall()
            got_cols = [d[0] for d in con.description]
            want = con.execute(sql).fetchall()
            want_cols = [d[0] for d in con.description]
        except Exception as e:
            print(f"FAIL {name}: exec error {e}")
            n_fail += 1
            continue
        if sorted(got_cols) != sorted(want_cols):
            print(f"FAIL {name}: cols {sorted(got_cols)} != {sorted(want_cols)}")
            n_fail += 1
            continue
        gi = [got_cols.index(c) for c in sorted(got_cols)]
        wi = [want_cols.index(c) for c in sorted(want_cols)]
        g = sorted((tuple(norm(r[i]) for i in gi) for r in got), key=repr)
        w = sorted((tuple(norm(r[i]) for i in wi) for r in want), key=repr)
        if len(g) != len(w):
            print(f"FAIL {name}: rows {len(g)} != {len(w)}")
            n_fail += 1
            continue
        bad = [(a, b) for a, b in zip(g, w) if a != b]
        if bad:
            print(f"FAIL {name}: {len(bad)} mismatched rows; first: {bad[0]}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(g)} rows)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_lint} lint")
    sys.exit(1 if (n_fail or n_lint) else 0)


if __name__ == "__main__":
    main()
