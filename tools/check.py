#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run graft.Verify, then
compare each dumped parquet against the DuckDB oracle on the same tables.

Usage: python3 tools/check.py [sfdir] [outdir]
"""
import json, math, sys, subprocess, os

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return repr(v)  # full precision
    return str(v)


def table_key(rows):
    return sorted(",".join(norm(v) for v in r) for r in rows)


def main():
    import duckdb
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    with open(os.path.join(OUT, "oracle_sql.json")) as f:
        oracle = json.load(f)

    ok = fail = 0
    for name, sql in sorted(oracle.items()):
        path = os.path.join(OUT, name)
        if not os.path.isdir(path):
            print(f"FAIL {name}: no spark output"); fail += 1; continue
        try:
            got = con.execute(
                f"SELECT * FROM read_parquet('{path}/*.parquet')").fetchall()
            got_cols = [d[0] for d in con.description]
            want = con.execute(sql).fetchall()
            want_cols = [d[0] for d in con.description]
        except Exception as e:
            print(f"FAIL {name}: {e}"); fail += 1; continue
        if sorted(c.lower() for c in got_cols) != sorted(c.lower() for c in want_cols):
            print(f"FAIL {name}: schema {sorted(got_cols)} != {sorted(want_cols)}")
            fail += 1; continue
        # reorder got columns to oracle order (driver sorts by name; same idea)
        idx = [got_cols.index(next(g for g in got_cols if g.lower() == w.lower()))
               for w in want_cols]
        got2 = [tuple(r[i] for i in idx) for r in got]
        if len(got2) != len(want):
            print(f"FAIL {name}: rows {len(got2)} != {len(want)}"); fail += 1; continue
        gk, wk = table_key(got2), table_key(want)
        if gk != wk:
            diffs = [(a, b) for a, b in zip(gk, wk) if a != b][:3]
            print(f"FAIL {name}: value mismatch, first diffs: {diffs}")
            fail += 1; continue
        print(f"ok   {name} ({len(got2)} rows)")
        ok += 1
    print(f"\n{ok} ok, {fail} fail")
    sys.exit(1 if fail else 0)


if __name__ == "__main__":
    main()
