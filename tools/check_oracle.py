#!/usr/bin/env python3
"""Dev-only cross-check of SparkEntry.queries vs oracleSql in DuckDB.

Mimics the driver's compare: load each verify-dump parquet, run the oracle
SQL in DuckDB over the same sf dir, canonicalize (columns sorted by name,
rows sorted), and diff values. Not part of the shipped library.

Usage: check_oracle.py [sf_dir] [verify_out_dir] [json_artifact_path]
The optional third arg writes a driver-shaped JSON record (per-query
rows/schema/hash match) — used for committed artifacts like
CORRECTNESS_sf1.json.
"""
import glob
import json
import math
import sys

import duckdb

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT_DIR = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
JSON_OUT = sys.argv[3] if len(sys.argv) > 3 else None

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

con = duckdb.connect()
for t in TABLES:
    con.execute(
        f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")

oracle = json.load(open(f"{OUT_DIR}/oracle_sql.json"))

def canon(df):
    cols = sorted(df.columns)
    df = df[cols]
    rows = []
    for tup in df.itertuples(index=False):
        row = []
        for v in tup:
            if isinstance(v, float):
                if math.isnan(v):
                    row.append("nan")
                else:
                    row.append(repr(v))
            else:
                row.append(str(v))
        rows.append(tuple(row))
    rows.sort()
    return cols, rows

n_ok = n_bad = 0
record = {}
for name in sorted(oracle):
    rec = {"rows_match": None, "schema_match": None, "hash_match": None,
           "spark_rows": None, "oracle_rows": None, "err": None}
    record[name] = rec
    pq_dirs = glob.glob(f"{OUT_DIR}/{name}/*.parquet")
    if not pq_dirs:
        print(f"MISSING  {name}: no verify parquet")
        rec["err"] = "missing_parquet"
        n_bad += 1
        continue
    try:
        mine = con.sql(
            f"SELECT * FROM read_parquet('{OUT_DIR}/{name}/*.parquet')").df()
        orc = con.sql(oracle[name]).df()
    except Exception as e:
        print(f"SQLERR   {name}: {e}")
        rec["err"] = f"sql_error: {e}"
        n_bad += 1
        continue
    mc, mr = canon(mine)
    oc, orows = canon(orc)
    rec.update(spark_rows=len(mr), oracle_rows=len(orows),
               rows_match=len(mr) == len(orows), schema_match=mc == oc,
               hash_match=mc == oc and mr == orows)
    if mc != oc:
        print(f"SCHEMA   {name}: mine={mc} oracle={oc}")
        n_bad += 1
    elif len(mr) != len(orows):
        print(f"ROWS     {name}: mine={len(mr)} oracle={len(orows)}")
        n_bad += 1
    elif mr != orows:
        diffs = [(a, b) for a, b in zip(mr, orows) if a != b][:3]
        print(f"VALUES   {name}: first diffs {diffs}")
        n_bad += 1
    else:
        print(f"OK       {name} ({len(mr)} rows)")
        n_ok += 1

# rows-only entries (no oracle): check the dump exists and has rows
for d in sorted(glob.glob(f"{OUT_DIR}/*/")):
    name = d.rstrip("/").split("/")[-1]
    if name in oracle:
        continue
    try:
        n = con.sql(f"SELECT count(*) FROM read_parquet('{d}*.parquet')").fetchone()[0]
        print(f"ROWSONLY {name}: {n} rows")
        record[name] = {"rows_match": None, "schema_match": None,
                        "hash_match": None, "spark_rows": n,
                        "oracle_rows": None, "err": "no_oracle"}
    except Exception as e:
        print(f"ROWSONLY {name}: unreadable ({e})")
        record[name] = {"rows_match": None, "schema_match": None,
                        "hash_match": None, "spark_rows": None,
                        "oracle_rows": None, "err": f"unreadable: {e}"}

if JSON_OUT:
    with open(JSON_OUT, "w") as f:
        json.dump(dict(sorted(record.items())), f, indent=2)
    print(f"json artifact -> {JSON_OUT}")

print(f"\n{n_ok} ok, {n_bad} bad")
sys.exit(1 if n_bad else 0)
