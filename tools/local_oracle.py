#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness gate.

Usage:
  python3 tools/local_oracle.py [sfdir] [outdir]

Assumes `sbt "runMain graft.Verify <sfdir> <outdir>"` has already written
one parquet dir per query plus oracle_sql.json. For each query: runs the
oracle SQL in DuckDB over the same parquet tables, then compares against
the Spark parquet with the driver's discipline — columns sorted by name,
rows sorted, values hashed exactly (no float tolerance).
"""
import json
import pathlib
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize for stable sort/compare
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].apply(lambda v: str(v) if v is not None else None)
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


def main() -> int:
    sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    outdir = pathlib.Path(sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")
    oracle = json.loads((outdir / "oracle_sql.json").read_text())
    n_pass = n_fail = n_skip = 0
    for name in sorted(oracle):
        qdir = outdir / name
        if not qdir.exists():
            print(f"MISSING  {name} (no spark output)")
            n_fail += 1
            continue
        try:
            got = canon(con.sql(
                f"SELECT * FROM read_parquet('{qdir}/*.parquet')").df())
            want = canon(con.sql(oracle[name]).df())
        except Exception as e:  # noqa: BLE001
            print(f"ERROR    {name}: {e}")
            n_fail += 1
            continue
        if list(got.columns) != list(want.columns):
            print(f"COLS     {name}: spark={list(got.columns)} duckdb={list(want.columns)}")
            n_fail += 1
            continue
        if len(got) != len(want):
            print(f"ROWS     {name}: spark={len(got)} duckdb={len(want)}")
            n_fail += 1
            continue
        # exact value compare (emulates hash match)
        eq = got.equals(want)
        if not eq:
            # locate first difference for debugging
            diff_cols = [c for c in got.columns if not got[c].equals(want[c])]
            print(f"VALUES   {name}: differing cols={diff_cols}")
            for c in diff_cols[:2]:
                mask = ~(got[c].eq(want[c]) | (got[c].isna() & want[c].isna()))
                idx = mask[mask].index[:3]
                for i in idx:
                    print(f"         row{i} {c}: spark={got[c][i]!r} duckdb={want[c][i]!r}")
            n_fail += 1
        else:
            print(f"OK       {name} ({len(got)} rows)")
            n_pass += 1
    # queries without oracle (rows-only check)
    for qdir in sorted(outdir.iterdir()):
        if qdir.is_dir() and qdir.name not in oracle:
            n = con.sql(f"SELECT count(*) FROM read_parquet('{qdir}/*.parquet')").fetchone()[0]
            print(f"ROWSONLY {qdir.name}: {n} rows {'OK' if n > 0 else 'EMPTY!'}")
            n_skip += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_skip} rows-only")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
