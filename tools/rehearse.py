#!/usr/bin/env python3
"""Local rehearsal of the driver's t2 correctness gate.

Usage: python3 tools/rehearse.py <outDir> [sfDir]

Assumes `graft.Verify` has already been run with (sfDir, outDir) — e.g.
  sbt 'runMain graft.Verify /root/testdata/sf0.01 /tmp/verify_out'
Then this script, like the driver: reads outDir/oracle_sql.json, runs each
SQL in DuckDB against the same fixture parquets (registered as views named
by table), loads our parquet dump, sorts columns by name, sorts rows, and
compares values STRICTLY (bit-exact for floats). Strict pass here implies a
pass under any weaker driver compare.
"""
import json
import sys
import glob
import os

import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True, kind="mergesort")
    return df


def main():
    out_dir = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracle = json.load(f)

    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    n_pass = n_fail = 0
    for name in sorted(oracle):
        sql = oracle[name]
        try:
            expected = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        files = glob.glob(os.path.join(out_dir, name, "*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark output parquet")
            n_fail += 1
            continue
        got = pd.concat([pd.read_parquet(p) for p in sorted(files)], ignore_index=True)
        g, e = norm(got), norm(expected)
        if list(g.columns) != list(e.columns):
            print(f"FAIL {name}: columns {list(g.columns)} != {list(e.columns)}")
            n_fail += 1
            continue
        if len(g) != len(e):
            print(f"FAIL {name}: rows {len(g)} != {len(e)}")
            n_fail += 1
            continue
        # dtype-strict: the driver hashes formatted VALUES, so int64 1002
        # vs float64 1002.0 hash-mismatch even though pandas' == coerces
        # them equal. Fail on cross-family numeric kinds (int vs float vs
        # bool) so HUGEINT-class oracle bugs (DuckDB SUM over ints) can't
        # pass a local rehearsal (they did once: sql_pivot, round 7).
        kind_fail = []
        for c in g.columns:
            gk, ek = g[c].dtype.kind, e[c].dtype.kind
            fam = lambda k: "i" if k in "iu" else k
            if fam(gk) != fam(ek) and {fam(gk), fam(ek)} <= {"i", "f", "b"}:
                kind_fail.append(f"{c}: got dtype {g[c].dtype} want {e[c].dtype}")
        if kind_fail:
            print(f"FAIL {name}: dtype mismatch: " + "; ".join(kind_fail))
            n_fail += 1
            continue
        # strict compare; report first few diffs per column
        bad = []
        for c in g.columns:
            gv, ev = g[c], e[c]
            try:
                neq = ~((gv == ev) | (gv.isna() & ev.isna()))
            except Exception:
                neq = gv.astype(str) != ev.astype(str)
            if neq.any():
                i = neq.idxmax()
                bad.append(f"{c}[{i}]: got={gv[i]!r} want={ev[i]!r} (n={int(neq.sum())})")
        if bad:
            print(f"FAIL {name}: " + "; ".join(bad[:4]))
            n_fail += 1
        else:
            print(f"PASS {name} ({len(g)} rows)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {len(oracle)} total")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
