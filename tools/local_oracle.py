#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness gate.

Usage:
  python3 tools/local_oracle.py [sfdir] [outdir]

Assumes `sbt "runMain graft.Verify <sfdir> <outdir>"` has already written
one parquet dir per query plus oracle_sql.json. For each query: runs the
oracle SQL in DuckDB over the same parquet tables, then compares against
the Spark parquet with the driver's discipline — the Spark side is read
with pandas/pyarrow (NOT through DuckDB, which would canonicalize both
sides identically and hide representation asymmetries such as pyarrow
Decimal('x.00') vs DuckDB float64 'x.0' — the round-9 dc1/dc3 escape),
columns sorted by name, rows sorted, STRINGIFIED values compared exactly
(no float tolerance).
"""
import json
import pathlib
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


import datetime as _dt


def _cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, float) and v != v:  # NaN (pandas null for float cols)
        return "NULL"
    # DATE columns: pyarrow yields datetime.date ('1998-01-14') but
    # DuckDB's .df() materializes datetime64 ('1998-01-14 00:00:00').
    # The driver canonicalizes these equal (r9 gate passed date-typed
    # queries), so collapse midnight tz-naive timestamps to the date.
    if v is pd.NaT:
        return "NULL"
    if isinstance(v, _dt.datetime) and v.tzinfo is None and \
            v.time() == _dt.time(0, 0):
        return str(v.date())
    return str(v)


def canon(df: pd.DataFrame) -> pd.DataFrame:
    """Columns sorted by name, every value stringified (the driver hashes
    string representations — Decimal('1.00') != 1.0), rows sorted."""
    df = df.reindex(sorted(df.columns), axis=1)
    out = pd.DataFrame({c: df[c].apply(_cell) for c in df.columns})
    return out.sort_values(by=list(out.columns), kind="mergesort").reset_index(drop=True)


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
            # Spark side via pyarrow, exactly like the driver — do NOT
            # round-trip it through DuckDB (hides decimal repr divergence).
            got = canon(pd.read_parquet(qdir, engine="pyarrow"))
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
