#!/usr/bin/env python3
"""Generate an sf1-equivalent fixture set (10x sf0.1) for SCALING
measurements only (BASELINE.md "sf1 validation"): correctness oracles
stay at sf0.01 — this data never feeds the driver gate.

Construction (deterministic, no RNG):
  - fact tables (orders, lineitem, events, documents) are replicated
    10x with key offsets so joins fan out linearly, never 100x;
  - events timestamps shift i ms per replica so per-key event
    sequences stay strict total orders (sessionize/lead shapes);
  - document text gets a per-replica token suffix ("a b" -> "a_r1
    b_r1"), so the shingle/vocab space scales with the corpus and
    cross-replica texts are NOT near-duplicates — within-replica dup
    structure is preserved, keeping dedup candidate counts linear
    (replicating verbatim would make every doc a 10-way dup cluster
    and quadratically inflate every pair join, which says nothing
    about real 10x corpora);
  - dimension tables stay 1x (TPC-H dims scale sub-linearly);
  - embeddings are replicated 10x with a deterministic per-replica
    perturbation (amplitude 0.085/component, ~cos 0.9 vs the source
    vector) and re-normalized to unit length: copies land in the same
    cluster/bucket REGIONS (realistic LSH/IVF occupancy growth) but
    sit below the near-dup cosine band, so candidate pairs grow with
    collisions, not 10-way duplicate cliques (same reasoning as the
    document-text suffixing above).

Usage: python3 tools/gen_sf1.py [/tmp/sf1 [R]]
  R = replica count (default 10 = sf1; 30 = sf3 for the second
  scaling point — two measured points distinguish capped-linear
  from quietly-quadratic).
"""
# ROW_GROUP_SIZE on every fact COPY: duckdb's default writes one giant
# row group per ~122k rows, and Spark cannot split a scan below row-group
# granularity -- the round-14 sf3 canary measured CPU-dense text/vector
# scans (q151 spans, q526 decode, q280 JL) running on ~2 effective cores
# because documents.parquet had TWO row groups. Real corpora have
# thousands of files/row groups; the canary fixture should too, so the
# canary measures the ENGINE, not a fixture-layout artifact.
import duckdb, os, shutil, sys

SRC = "/root/testdata/sf0.1"
DST = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
R = int(sys.argv[2]) if len(sys.argv) > 2 else 10

os.makedirs(DST, exist_ok=True)
con = duckdb.connect()

for t in ["region", "nation", "customer", "supplier", "part"]:
    shutil.copy(f"{SRC}/{t}.parquet", f"{DST}/{t}.parquet")

KV = con.execute(f"SELECT max(vec_id)+1 FROM '{SRC}/embeddings.parquet'").fetchone()[0]

# replica 0 stays the source vectors verbatim; replicas 1..9 add a
# deterministic sin-phase perturbation per (replica, dim, vec_id) and
# re-normalize, keeping unit norms (the cosine operators assume them)
# while dropping cosine-vs-source to ~0.9 — inside the same bucket
# regions, outside the near-dup band
con.execute(f"""COPY (
  WITH pert AS (SELECT vec_id + i*{KV} AS vec_id, i, embedding, label,
      list_transform(range(1, 65), j -> embedding[j]::DOUBLE
        + 0.085 * sin(0.7*i + 0.31*j + 0.011*vec_id)) AS e
    FROM '{SRC}/embeddings.parquet', range({R}) r(i)),
  nrm AS (SELECT vec_id, i, embedding, e,
      sqrt(list_sum(list_transform(e, x -> x*x))) AS n, label FROM pert)
  SELECT vec_id,
    CASE WHEN i = 0 THEN embedding
    ELSE list_transform(e, x -> (x / n)::FLOAT) END AS embedding, label
  FROM nrm ORDER BY vec_id
) TO '{DST}/embeddings.parquet' (FORMAT PARQUET, ROW_GROUP_SIZE 2000)""")

KO = con.execute(f"SELECT max(o_orderkey)+1 FROM '{SRC}/orders.parquet'").fetchone()[0]
KE = con.execute(f"SELECT max(event_id)+1 FROM '{SRC}/events.parquet'").fetchone()[0]
KD = con.execute(f"SELECT max(doc_id)+1 FROM '{SRC}/documents.parquet'").fetchone()[0]

con.execute(f"""COPY (SELECT o_orderkey + i*{KO} AS o_orderkey, o_custkey,
    o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
  FROM '{SRC}/orders.parquet', range({R}) r(i))
  TO '{DST}/orders.parquet' (FORMAT PARQUET, ROW_GROUP_SIZE 100000)""")

con.execute(f"""COPY (SELECT l_orderkey + i*{KO} AS l_orderkey, l_partkey,
    l_suppkey, l_linenumber, l_quantity, l_extendedprice, l_discount,
    l_tax, l_returnflag, l_linestatus, l_shipdate
  FROM '{SRC}/lineitem.parquet', range({R}) r(i))
  TO '{DST}/lineitem.parquet' (FORMAT PARQUET, ROW_GROUP_SIZE 20000)""")

# ts written as BIGINT nanos — the same physical shape the driver's
# TIMESTAMP(NANOS) takes through Fixtures' nanosAsLong path
con.execute(f"""COPY (SELECT event_id + i*{KE} AS event_id,
    epoch_ns(ts)::BIGINT + i*1000000 AS ts, user_id, event_type, value, props
  FROM '{SRC}/events.parquet', range({R}) r(i))
  TO '{DST}/events.parquet' (FORMAT PARQUET, ROW_GROUP_SIZE 100000)""")

con.execute(f"""COPY (SELECT doc_id + i*{KD} AS doc_id,
    CASE WHEN i = 0 THEN text
         ELSE replace(text, ' ', '_r'||i||' ') || '_r'||i END AS text,
    lang, source,
    CASE WHEN i = 0 THEN n_chars
         ELSE length(replace(text, ' ', '_r'||i||' ') || '_r'||i)
         END AS n_chars
  FROM '{SRC}/documents.parquet', range({R}) r(i))
  TO '{DST}/documents.parquet' (FORMAT PARQUET, ROW_GROUP_SIZE 4000)""")

for t in ["orders", "lineitem", "events", "documents"]:
    n = con.execute(f"SELECT count(*) FROM '{DST}/{t}.parquet'").fetchone()[0]
    print(t, n)
print("wrote", DST)
