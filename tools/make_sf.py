#!/usr/bin/env python3
"""Driver-side scale-up generator (dev tool only — the shipped library is
pure Scala/Spark): replicates an sf directory K times with consistent key
shifting, so joins keep their fan-out and dedup/similarity workloads keep
their duplicate-structure CHARACTER instead of becoming 90%-duplicate
pathologies:

  - fact/dim keys shift per replica (foreign keys shift with their
    parents), so entity counts scale Kx;
  - document text gets a per-replica token suffix for k > 0 (every
    3-token shingle becomes replica-local -> replicas are NOT near-dups
    of each other, matching a real corpus 10x the size);
  - embeddings rotate by k positions (norm-preserving, so replicas are
    not planted cosine-dups);
  - region/nation stay fixed (dimensions don't grow with data volume).

Usage: python3 tools/make_sf.py <srcSfDir> <outDir> <K>
"""
import sys

import duckdb


def main(src, out, k):
    import os
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    reps = f"(SELECT unnest(range({k})) AS k)"

    def emit(table, select):
        con.execute(f"COPY ({select}) TO '{out}/{table}.parquet' (FORMAT PARQUET)")
        n = con.sql(f"SELECT count(*) FROM '{out}/{table}.parquet'").fetchone()[0]
        print(f"{table}: {n} rows")

    for t in ("region", "nation"):
        emit(t, f"SELECT * FROM '{src}/{t}.parquet'")
    emit("customer", f"""
        SELECT c_custkey + k * 100000 AS c_custkey, c_name, c_nationkey,
               c_acctbal, c_mktsegment
        FROM '{src}/customer.parquet', {reps}""")
    emit("supplier", f"""
        SELECT s_suppkey + k * 10000 AS s_suppkey, s_name, s_nationkey, s_acctbal
        FROM '{src}/supplier.parquet', {reps}""")
    emit("part", f"""
        SELECT p_partkey + k * 100000 AS p_partkey, p_name, p_brand, p_type,
               p_size, p_retailprice
        FROM '{src}/part.parquet', {reps}""")
    emit("orders", f"""
        SELECT o_orderkey + k * 1000000 AS o_orderkey,
               o_custkey + k * 100000 AS o_custkey,
               o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
        FROM '{src}/orders.parquet', {reps}""")
    emit("lineitem", f"""
        SELECT l_orderkey + k * 1000000 AS l_orderkey,
               l_partkey + k * 100000 AS l_partkey,
               l_suppkey + k * 10000 AS l_suppkey,
               l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax,
               l_returnflag, l_linestatus, l_shipdate
        FROM '{src}/lineitem.parquet', {reps}""")
    emit("events", f"""
        SELECT event_id + k * 1000000 AS event_id, ts,
               user_id + k * 1500 AS user_id, event_type, value, props
        FROM '{src}/events.parquet', {reps}""")
    emit("documents", f"""
        SELECT doc_id + k * 100000 AS doc_id,
               CASE WHEN k = 0 THEN text
                    ELSE regexp_replace(text, '(\\S+)', '\\1~' || k, 'g') END AS text,
               lang, source,
               CAST(len(CASE WHEN k = 0 THEN text
                    ELSE regexp_replace(text, '(\\S+)', '\\1~' || k, 'g') END)
                 AS BIGINT) AS n_chars
        FROM '{src}/documents.parquet', {reps}""")
    emit("embeddings", f"""
        SELECT vec_id + k * 100000 AS vec_id,
               CASE WHEN k = 0 THEN embedding
                    ELSE list_concat(embedding[k+1:], embedding[1:k]) END
                 AS embedding,
               label
        FROM '{src}/embeddings.parquet', {reps}""")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], int(sys.argv[3]))
