#!/usr/bin/env python3
"""Build the N-fold probe corpus graft.ScaleProbe compares against.

Replicates sf0.1 documents N times with PER-REPLICA TOKEN MUTATION
(every word in replica i>0 gets a replica-specific suffix) so replicas
are NOT near-duplicates of each other — a naive N-fold copy plants
N-doc duplicate clusters whose C(N,2) output pairs would dominate every
near-dup timing quadratically for reasons that have nothing to do with
the index. Embeddings are N-fold FRESH seeded-random vectors for the
same reason. Usage:

    python3 tools/make_probe_corpus.py [N] [outdir]

defaults: N=10, outdir=/tmp/sfbig. Then:

    sbt -batch "runMain graft.ScaleProbe /root/testdata/sf0.1 /tmp/sfbig"
"""
import sys

import duckdb

N = int(sys.argv[1]) if len(sys.argv) > 1 else 10
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sfbig"
SRC = "/root/testdata/sf0.1"

import os

os.makedirs(OUT, exist_ok=True)
con = duckdb.connect()

# Replica id offset must clear the source id range — a hardcoded 1M
# would silently collide ids (planting exact duplicates this script
# exists to avoid) on any corpus with ids >= 1M.
doc_off = con.execute(f"SELECT max(doc_id) + 1 FROM '{SRC}/documents.parquet'").fetchone()[0]
vec_off = con.execute(f"SELECT max(vec_id) + 1 FROM '{SRC}/embeddings.parquet'").fetchone()[0]

con.sql(f"""
COPY (
  SELECT doc_id + i * {doc_off} AS doc_id,
         CASE WHEN i = 0 THEN text
              ELSE array_to_string(
                list_transform(string_split(text, ' '),
                               w -> w || '_' || chr(CAST(97 + i AS INTEGER))), ' ')
         END AS text,
         lang, source, n_chars
  FROM '{SRC}/documents.parquet', range({N}) t(i)
  ORDER BY doc_id
) TO '{OUT}/documents.parquet' (FORMAT PARQUET)
""")

# fresh deterministic vectors: element e of vec v hashes (v, e) into
# [-0.5, 0.5) — same distribution family as the source's random floats,
# no duplicate vectors across replicas
con.sql("SELECT setseed(0.42)")
con.sql(f"""
COPY (
  SELECT vec_id + i * {vec_off} AS vec_id,
         CASE WHEN i = 0 THEN embedding
              ELSE list_transform(range(1, 65), e ->
                CAST((hash(vec_id * 64 + e + i * 131071) % 1000000)
                     / 1000000.0 - 0.5 AS FLOAT))
         END AS embedding,
         label
  FROM '{SRC}/embeddings.parquet', range({N}) t(i)
  ORDER BY vec_id
) TO '{OUT}/embeddings.parquet' (FORMAT PARQUET)
""")

# Customer table for the ER probes (er_fuzzy_match/_d2, er_cluster,
# stream_er): replica i>0 gets fresh keys AND the name re-derived from
# the NEW key — exactly what a larger TPC-H customer table looks like
# (denser zero-padded key space, the adversarially collision-heavy ER
# case), with no planted cross-replica duplicates. printf('%09d'),
# not lpad: DuckDB's lpad TRUNCATES strings longer than the target
# length, so a key past 1e9 would silently collide names across
# replicas — printf pads short keys and leaves long ones intact.
cust_off = con.execute(f"SELECT max(c_custkey) + 1 FROM '{SRC}/customer.parquet'").fetchone()[0]
con.sql(f"""
COPY (
  SELECT c_custkey + i * {cust_off} AS c_custkey,
         CASE WHEN i = 0 THEN c_name
              ELSE printf('Customer#%09d', c_custkey + i * {cust_off})
         END AS c_name,
         c_nationkey, c_acctbal, c_mktsegment
  FROM '{SRC}/customer.parquet', range({N}) t(i)
  ORDER BY c_custkey
) TO '{OUT}/customer.parquet' (FORMAT PARQUET)
""")

# Events table for the payload/relational probes (ev_json_extract):
# replica i>0 shifts ids/users and re-derives the JSON payload from the
# new event id — fresh key space, same payload shape and event_type
# distribution, timestamps offset by i days so replicas do not stack
# inside one time window.
ev_off = con.execute(f"SELECT max(event_id) + 1 FROM '{SRC}/events.parquet'").fetchone()[0]
user_off = con.execute(f"SELECT max(user_id) + 1 FROM '{SRC}/events.parquet'").fetchone()[0]
con.sql(f"""
COPY (
  SELECT event_id + i * {ev_off} AS event_id,
         ts + to_days(CAST(i AS INTEGER)) AS ts,
         user_id + i * {user_off} AS user_id,
         event_type,
         value,
         CASE WHEN i = 0 THEN props
              ELSE '{{"k": ' || CAST((event_id * 31 + i) % 100 AS VARCHAR) || '}}'
         END AS props
  FROM '{SRC}/events.parquet', range({N}) t(i)
  ORDER BY event_id
) TO '{OUT}/events.parquet' (FORMAT PARQUET)
""")

# Orders table for the incremental-agg / retract-stream probes: replica
# i>0 shifts order and customer keys past the source ranges; prices and
# dates keep the source distribution.
ord_off = con.execute(f"SELECT max(o_orderkey) + 1 FROM '{SRC}/orders.parquet'").fetchone()[0]
ocust_off = con.execute(f"SELECT max(o_custkey) + 1 FROM '{SRC}/orders.parquet'").fetchone()[0]
con.sql(f"""
COPY (
  SELECT o_orderkey + i * {ord_off} AS o_orderkey,
         o_custkey + i * {ocust_off} AS o_custkey,
         o_orderstatus,
         o_totalprice,
         o_orderdate,
         o_orderpriority
  FROM '{SRC}/orders.parquet', range({N}) t(i)
  ORDER BY o_orderkey
) TO '{OUT}/orders.parquet' (FORMAT PARQUET)
""")

for t in ("documents", "embeddings", "customer", "events", "orders"):
    n = con.execute(f"SELECT COUNT(*) FROM '{OUT}/{t}.parquet'").fetchone()[0]
    print(f"{OUT}/{t}.parquet: {n} rows")
