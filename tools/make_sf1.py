#!/usr/bin/env python3
"""Dev-only: build an sf1-scale oracle dataset as a deterministic 10x
replication of the driver's sf0.1 parquet (lineitem lands at 6M rows —
TPC-H sf1's size). Used for the opt-in large-SF correctness pass
(CORRECTNESS_sf1.json): the gates re-run where scale-variant hash breaks
(decimal overflow, tie-ordering under duplicate sort keys) would show.

Construction: each fact row is copied `copies` times with every key
column shifted by rep * (max_key + 1) of its OWNING table, so referential
integrity (orders.o_custkey -> customer, lineitem.l_* -> orders/part/
supplier, events.user_id) is preserved and all keys stay unique — every
rank/top-k gate tie-breaks on a key, so replication cannot create
cross-engine tie ambiguity. The fixed catalogs (region, nation) and the
text/embedding corpora are byte-identical file copies: their gates are
scale-anchored separately (Bench reference_text*/reference_*m tiers), and
replicating identical text would add exact-duplicate groups, changing the
dedup queries' character rather than their coverage.

events.ts note: the source file is parquet TIMESTAMP(NANOS); DuckDB (like
every writer in this stack) re-emits MICROS. graft.core.Tables.events
accepts both layouts (it branches on the loaded type), and DuckDB's
ns->us floor matches Spark's `ts div 1000`, so the two engines see
identical values either way.

Usage: make_sf1.py [src_sf_dir] [dst_dir] [copies]
"""
import os
import shutil
import sys

import duckdb

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
DST = sys.argv[2] if len(sys.argv) > 2 else "testdata_sf1"
COPIES = int(sys.argv[3]) if len(sys.argv) > 3 else 10

os.makedirs(DST, exist_ok=True)
con = duckdb.connect()


def src(t):
    return f"read_parquet('{SRC}/{t}.parquet')"


def stride(t, k):
    return con.sql(f"SELECT max({k}) + 1 FROM {src(t)}").fetchone()[0]


# key strides come from the OWNING table so foreign keys shift in lockstep
cust = stride("customer", "c_custkey")
supp = stride("supplier", "s_suppkey")
part = stride("part", "p_partkey")
ordr = stride("orders", "o_orderkey")
evid = stride("events", "event_id")
usr = stride("events", "user_id")

# unscaled tables: byte-identical copies (no rewrite risk at all)
for t in ["region", "nation", "documents", "embeddings"]:
    shutil.copyfile(f"{SRC}/{t}.parquet", f"{DST}/{t}.parquet")
    print(f"copied   {t}")


def write(t, select):
    con.execute(
        f"""COPY (SELECT {select}
                  FROM {src(t)} CROSS JOIN range({COPIES}) r(rep)
                  ORDER BY rep)
            TO '{DST}/{t}.parquet' (FORMAT PARQUET)""")
    n = con.sql(f"SELECT count(*) FROM read_parquet('{DST}/{t}.parquet')").fetchone()[0]
    print(f"scaled   {t}: {n} rows ({COPIES}x)")


write("customer",
      f"c_custkey + rep * {cust} AS c_custkey, c_name, c_nationkey, "
      "c_acctbal, c_mktsegment")
write("supplier",
      f"s_suppkey + rep * {supp} AS s_suppkey, s_name, s_nationkey, s_acctbal")
write("part",
      f"p_partkey + rep * {part} AS p_partkey, p_name, p_brand, p_type, "
      "p_size, p_retailprice")
write("orders",
      f"o_orderkey + rep * {ordr} AS o_orderkey, "
      f"o_custkey + rep * {cust} AS o_custkey, "
      "o_orderstatus, o_totalprice, o_orderdate, o_orderpriority")
write("lineitem",
      f"l_orderkey + rep * {ordr} AS l_orderkey, "
      f"l_partkey + rep * {part} AS l_partkey, "
      f"l_suppkey + rep * {supp} AS l_suppkey, "
      "l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax, "
      "l_returnflag, l_linestatus, l_shipdate")
write("events",
      f"event_id + rep * {evid} AS event_id, ts, "
      f"user_id + rep * {usr} AS user_id, event_type, value, props")
print(f"done -> {DST}")
