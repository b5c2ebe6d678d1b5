#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run every oracle SQL in
DuckDB over the fixture parquet tables, load the Spark-side parquet dumps,
sort columns by name / rows by value, and compare.

Usage: python3 tools/local_verify.py [sfDir] [verifyOutDir]
(run tools/run_verify.sh first to produce the Spark dumps)
"""
import json
import math
import sys
from pathlib import Path

import duckdb

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT_DIR = Path(sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft-verify")

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    return repr(v)


def canon(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm(r[i]) for i in order) for r in rows]
    out.sort()
    return [cols[i] for i in order], out


def main():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    oracle = json.loads((OUT_DIR / "oracle_sql.json").read_text())
    n_ok = n_bad = 0
    for name in sorted(oracle):
        sql = oracle[name]
        d = OUT_DIR / name
        if not d.exists():
            print(f"MISS  {name}: no spark output")
            n_bad += 1
            continue
        try:
            got = con.execute(
                f"SELECT * FROM '{d}/*.parquet'").fetchall()
            got_cols = [c[0] for c in con.description]
            want = con.execute(sql).fetchall()
            want_cols = [c[0] for c in con.description]
        except Exception as e:
            print(f"ERR   {name}: {e}")
            n_bad += 1
            continue
        # The driver's hasher materializes DuckDB results as float64 while
        # Spark parquet decimals stay Decimal objects -> any DECIMAL output
        # column hash-mismatches even when values are equal. Treat decimal
        # outputs as failures here so the replica matches the driver.
        import decimal
        dec_cols = sorted({got_cols[i] for r in (got[:1] or [])
                           for i, v in enumerate(r)
                           if isinstance(v, decimal.Decimal)} |
                          {want_cols[i] for r in (want[:1] or [])
                           for i, v in enumerate(r)
                           if isinstance(v, decimal.Decimal)})
        if dec_cols:
            print(f"DECIMAL {name}: output columns {dec_cols} are decimal-typed"
                  f" -> driver hash would mismatch; cast to DOUBLE")
            n_bad += 1
            continue
        gc, gr = canon(got_cols, got)
        wc, wr = canon(want_cols, want)
        if gc != wc:
            print(f"SCHEMA {name}: spark={gc} oracle={wc}")
            n_bad += 1
        elif gr != wr:
            n_bad += 1
            diff = [(a, b) for a, b in zip(gr, wr) if a != b][:3]
            print(f"ROWS  {name}: {len(gr)} vs {len(wr)} rows; first diffs:")
            for a, b in diff:
                print(f"   spark : {a}\n   oracle: {b}")
            if len(gr) != len(wr):
                print(f"   (row-count mismatch)")
        else:
            n_ok += 1
            print(f"OK    {name} ({len(gr)} rows)")
    print(f"\n{n_ok} ok, {n_bad} bad")
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
