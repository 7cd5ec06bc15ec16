#!/usr/bin/env python3
"""Scale-rehearsal data generator: build a 10x copy of an SF directory
(default sf0.1 -> "sf1") for PERF rehearsal only — correctness oracles
always run on the driver-generated data.

Replication preserves join structure: every copy i offsets each table's
keys by i * (table's key stride), applied consistently on both sides of
every foreign key (orders.o_custkey moves with customer.c_custkey, etc).
region/nation stay as-is (dimension tables; 10x would change join
semantics, real deployments scale facts, not dims).

documents: every token gets a per-copy suffix, so cross-copy Jaccard/
minhash similarity is ZERO and the planted near-dup structure replicates
linearly (exact 10x copies would inflate pair queries quadratically and
measure a corpus shape no dedup deployment has).

embeddings: each copy rotates the vector by i positions — same norm,
same distribution, distinct directions; cross-copy cosine stays in the
background-noise band instead of creating 20k exact duplicates.

Usage: python3 tools/scale10.py [src_dir] [dst_dir] [copies]
"""
import sys
import duckdb

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
DST = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_sf1"
N = int(sys.argv[3]) if len(sys.argv) > 3 else 10

# key columns to offset per table: (column, stride-source table alias)
STRIDES = {
    "customer": 15000, "orders": 150000, "lineitem_order": 150000,
    "part": 20000, "supplier": 1000, "events": 100000,
    "documents": 5000, "embeddings": 2000,
}

con = duckdb.connect()
con.execute(f"SET threads TO 16")
import os
os.makedirs(DST, exist_ok=True)

def write(table, sql):
    con.execute(f"COPY ({sql}) TO '{DST}/{table}.parquet' (FORMAT PARQUET)")
    n = con.execute(f"SELECT count(*) FROM '{DST}/{table}.parquet'").fetchone()[0]
    print(f"{table}: {n}")

def copies_sql(body):
    return " UNION ALL ".join(body.format(i=i) for i in range(N))

# dimension tables: unchanged
for t in ("region", "nation"):
    write(t, f"SELECT * FROM '{SRC}/{t}.parquet'")

write("customer", copies_sql(
    f"SELECT c_custkey + {{i}} * {STRIDES['customer']} AS c_custkey, c_name, "
    f"c_nationkey, c_acctbal, c_mktsegment FROM '{SRC}/customer.parquet'"))

write("orders", copies_sql(
    f"SELECT o_orderkey + {{i}} * {STRIDES['orders']} AS o_orderkey, "
    f"o_custkey + {{i}} * {STRIDES['customer']} AS o_custkey, o_orderstatus, "
    f"o_totalprice, o_orderdate, o_orderpriority FROM '{SRC}/orders.parquet'"))

write("lineitem", copies_sql(
    f"SELECT l_orderkey + {{i}} * {STRIDES['orders']} AS l_orderkey, "
    f"l_partkey + {{i}} * {STRIDES['part']} AS l_partkey, "
    f"l_suppkey + {{i}} * {STRIDES['supplier']} AS l_suppkey, "
    f"l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax, "
    f"l_returnflag, l_linestatus, l_shipdate FROM '{SRC}/lineitem.parquet'"))

write("part", copies_sql(
    f"SELECT p_partkey + {{i}} * {STRIDES['part']} AS p_partkey, p_name, "
    f"p_brand, p_type, p_size, p_retailprice FROM '{SRC}/part.parquet'"))

write("supplier", copies_sql(
    f"SELECT s_suppkey + {{i}} * {STRIDES['supplier']} AS s_suppkey, s_name, "
    f"s_nationkey, s_acctbal FROM '{SRC}/supplier.parquet'"))

write("events", copies_sql(
    f"SELECT event_id + {{i}} * {STRIDES['events']} AS event_id, ts, "
    f"user_id + {{i}} * 10000 AS user_id, event_type, value, props "
    f"FROM '{SRC}/events.parquet'"))

write("documents", copies_sql(
    f"SELECT doc_id + {{i}} * {STRIDES['documents']} AS doc_id, "
    f"CASE WHEN {{i}} = 0 THEN text ELSE array_to_string(list_transform("
    f"regexp_split_to_array(text, '\\s+'), t -> t || '_x{{i}}'), ' ') END AS text, "
    f"lang, source, n_chars FROM '{SRC}/documents.parquet'"))

write("embeddings", copies_sql(
    f"SELECT vec_id + {{i}} * {STRIDES['embeddings']} AS vec_id, "
    f"CASE WHEN {{i}} = 0 THEN embedding ELSE "
    f"list_transform(list_concat(embedding[{{i}}+1:], embedding[:{{i}}]), "
    f"x -> CAST(x AS FLOAT)) END AS embedding, "
    f"label FROM '{SRC}/embeddings.parquet'"))
