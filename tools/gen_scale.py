#!/usr/bin/env python3
"""Synthesize the training-pipeline tables (documents / events /
embeddings) at an arbitrary multiple of sf0.1, structurally matching
TESTDATA.md: 31-word vocabulary documents with a controlled near-dup
replica rate, zipf-ish event users over a 30-day window (TIMESTAMP_NS),
and i.i.d. 64-dim embeddings with a near-duplicate replica tail.
Fully hash-deterministic — no RNG — so corpora regenerate
bit-identically after /tmp is wiped.

Usage: gen_scale.py OUTDIR MULT [--relational]   (MULT=1000 -> 5M
docs, 100M events, 2M vectors; --relational also synthesizes the
TPC-H-ish tables at MULT x sf0.1 cardinalities — 600k·MULT lineitem —
mirroring TESTDATA.md's schemas, value domains, and FK structure).
"""
import sys

import duckdb

VOCAB = ("key agg row scan slow fast table value part hash merge batch "
         "spark the line sort window join shard byte page cache disk "
         "node task stage plan query index block codec").split()
assert len(VOCAB) == 31

def main(out: str, mult: int) -> None:
    con = duckdb.connect()
    con.execute(f"SET threads TO 16")
    vocab_sql = "[" + ", ".join(f"'{w}'" for w in VOCAB) + "]"

    n_docs = 5_000 * mult
    # 10% of docs replicate the doc 5 ids earlier (same hash source =>
    # identical base text): half as near-dups (one appended word), half
    # as exact duplicates
    con.execute(f"""
      COPY (
        WITH s AS (
          SELECT r AS doc_id,
                 CASE WHEN r % 10 = 9 THEN r - 5 ELSE r END AS src,
                 {vocab_sql} AS vocab
          FROM range({n_docs}) t(r)),
        d AS (
          SELECT doc_id,
            array_to_string(list_transform(
              range(CAST(20 + hash(src * 31 + 17) % 40 AS BIGINT)),
              p -> vocab[CAST(1 + hash(src * 131071 + p) % 31 AS BIGINT)]), ' ')
            || CASE WHEN doc_id % 20 = 9 THEN ' extra' ELSE '' END AS text,
            ['en','de','fr','es','ru'][CAST(1 + hash(src + 7) % 5 AS BIGINT)] AS lang,
            's' || (doc_id % 7) AS source
          FROM s)
        SELECT doc_id, text, lang, source, length(text)::BIGINT AS n_chars
        FROM d
      ) TO '{out}/documents.parquet' (FORMAT PARQUET)""")
    print(f"documents: {n_docs}")

    n_events = 100_000 * mult
    n_users = 1_500 * mult
    # duckdb 1.0's parquet writer downcasts TIMESTAMP_NS to micros, so
    # ts leaves duckdb as raw epoch NANOS (BIGINT) and pyarrow applies
    # the zero-copy int64 -> timestamp[ns] cast on the way out — the
    # driver's events.parquet is TIMESTAMP(NANOS) and Tables.t reads
    # it via nanosAsLong, so the unit must survive.
    import pyarrow as pa
    import pyarrow.parquet as pq
    res = con.execute(f"""
        WITH e AS (SELECT r AS event_id,
            CAST(hash(r * 13 + 5) % 1000000 AS BIGINT) / 1000000.0 AS u,
            CAST(hash(r * 29 + 11) % 4611686018427387904 AS BIGINT) AS h2,
            CAST(hash(r * 43 + 23) % 4611686018427387904 AS BIGINT) AS h3
          FROM range({n_events}) t(r))
        SELECT event_id,
          1704067200000000000 + (h2 % 2592000) * 1000000000
            + (h3 % 1000000000) AS ts,
          CAST(u * u * u * {n_users} AS BIGINT) AS user_id,
          ['view','click','purchase','signup','error']
            [CAST(1 + hash(event_id * 3 + 1) % 5 AS BIGINT)] AS event_type,
          (h3 % 10000) / 100.0 AS value,
          '{{"k": ' || (h2 % 100) || '}}' AS props
        FROM e""")
    schema = pa.schema([
        ("event_id", pa.int64()), ("ts", pa.timestamp("ns")),
        ("user_id", pa.int64()), ("event_type", pa.string()),
        ("value", pa.float64()), ("props", pa.string())])
    writer = pq.ParquetWriter(f"{out}/events.parquet", schema)
    reader = res.fetch_record_batch(4_000_000)
    for b in reader:
        writer.write_batch(pa.record_batch(
            [b.column(0), b.column(1).cast(pa.timestamp("ns")),
             b.column(2), b.column(3), b.column(4), b.column(5)],
            schema=schema))
    writer.close()
    print(f"events: {n_events}, users~{n_users}")

    n_vecs = 2_000 * mult
    # matches the measured structure of the driver's embeddings: i.i.d.
    # uniform vectors (pairwise cosine ~ 0 — labels carry NO cosine
    # cluster, so sign-LSH buckets stay balanced) plus a 0.5% tail of
    # explicit near-duplicate replicas (tiny perturbation of an
    # earlier vector) for the near-dup family to find
    con.execute(f"""
      COPY (
        WITH s AS (SELECT r AS vec_id,
            CASE WHEN r % 200 = 199 THEN r - 100 ELSE r END AS src,
            CASE WHEN r % 200 = 199 THEN 1 ELSE 0 END AS rep
          FROM range({n_vecs}) t(r))
        SELECT vec_id,
          list_transform(range(64), i ->
            CAST((CAST(hash(src * 8191 + i) % 2000 AS BIGINT) / 1000.0 - 1.0)
                 + rep * (CAST(hash(vec_id * 524287 + i) % 100 AS BIGINT)
                          / 1000.0 - 0.05)
              AS FLOAT)) AS embedding,
          CAST(hash(src * 11 + 1) % 16 AS INTEGER) AS label
        FROM s
      ) TO '{out}/embeddings.parquet' (FORMAT PARQUET)""")
    print(f"embeddings: {n_vecs}")

def relational(out: str, mult: int) -> None:
    """TPC-H-ish tables at MULT x sf0.1: same schemas, value domains,
    and FK shape as the driver's testdata (fixed dims, ~4 lineitems
    per order, dates 1995-2001)."""
    con = duckdb.connect()
    con.execute("SET threads TO 16")
    n_cust = 15_000 * mult
    n_supp = 1_000 * mult
    n_part = 20_000 * mult
    n_ord = 150_000 * mult
    n_li = 600_000 * mult
    con.execute(f"""COPY (SELECT r::INTEGER AS r_regionkey,
        ['AFRICA','AMERICA','ASIA','EUROPE','MIDDLE EAST'][r + 1] AS r_name
      FROM range(5) t(r)) TO '{out}/region.parquet' (FORMAT PARQUET)""")
    con.execute(f"""COPY (SELECT r::INTEGER AS n_nationkey,
        'NATION_' || r AS n_name, (r % 5)::INTEGER AS n_regionkey
      FROM range(25) t(r)) TO '{out}/nation.parquet' (FORMAT PARQUET)""")
    con.execute(f"""COPY (SELECT r AS c_custkey,
        'Customer#' || r AS c_name,
        CAST(hash(r * 3 + 1) % 25 AS INTEGER) AS c_nationkey,
        round(CAST(hash(r * 5 + 2) % 1100000 AS BIGINT) / 100.0 - 1000, 2)
          AS c_acctbal,
        ['AUTOMOBILE','FURNITURE','HOUSEHOLD','MACHINERY','BUILDING']
          [CAST(1 + hash(r * 7 + 3) % 5 AS BIGINT)] AS c_mktsegment
      FROM range({n_cust}) t(r)) TO '{out}/customer.parquet' (FORMAT PARQUET)""")
    con.execute(f"""COPY (SELECT r AS s_suppkey,
        'Supplier#' || r AS s_name,
        CAST(hash(r * 3 + 4) % 25 AS INTEGER) AS s_nationkey,
        round(CAST(hash(r * 5 + 5) % 1100000 AS BIGINT) / 100.0 - 1000, 2)
          AS s_acctbal
      FROM range({n_supp}) t(r)) TO '{out}/supplier.parquet' (FORMAT PARQUET)""")
    con.execute(f"""COPY (SELECT r AS p_partkey,
        'part_' || r AS p_name,
        'Brand#' || (1 + CAST(hash(r * 3 + 6) % 5 AS BIGINT)) ||
          (1 + CAST(hash(r * 5 + 7) % 5 AS BIGINT)) AS p_brand,
        ['STANDARD','SMALL','MEDIUM','LARGE','ECONOMY','PROMO']
            [CAST(1 + hash(r * 7 + 8) % 6 AS BIGINT)] || ' ' ||
          ['ANODIZED','BURNISHED','PLATED','POLISHED','BRUSHED']
            [CAST(1 + hash(r * 11 + 9) % 5 AS BIGINT)] || ' ' ||
          ['TIN','NICKEL','BRASS','STEEL','COPPER']
            [CAST(1 + hash(r * 13 + 10) % 5 AS BIGINT)] AS p_type,
        CAST(1 + hash(r * 17 + 11) % 50 AS INTEGER) AS p_size,
        round(900 + CAST(hash(r * 19 + 12) % 110000 AS BIGINT) / 100.0, 2)
          AS p_retailprice
      FROM range({n_part}) t(r)) TO '{out}/part.parquet' (FORMAT PARQUET)""")
    con.execute(f"""COPY (SELECT r AS o_orderkey,
        CAST(hash(r * 3 + 13) % {n_cust} AS BIGINT) AS o_custkey,
        ['P','O','F'][CAST(1 + hash(r * 5 + 14) % 3 AS BIGINT)]
          AS o_orderstatus,
        round(1000 + CAST(hash(r * 7 + 15) % 49900000 AS BIGINT) / 100.0, 2)
          AS o_totalprice,
        TIMESTAMP '1995-01-01' + INTERVAL
          (CAST(hash(r * 11 + 16) % 2400 AS BIGINT)) DAY AS o_orderdate,
        ['1-URGENT','2-HIGH','3-MEDIUM','4-NOT SPECIFIED','5-LOW']
          [CAST(1 + hash(r * 13 + 17) % 5 AS BIGINT)] AS o_orderpriority
      FROM range({n_ord}) t(r)) TO '{out}/orders.parquet' (FORMAT PARQUET)""")
    con.execute(f"""COPY (SELECT
        CAST(hash(r * 3 + 18) % {n_ord} AS BIGINT) AS l_orderkey,
        CAST(hash(r * 5 + 19) % {n_part} AS BIGINT) AS l_partkey,
        CAST(hash(r * 7 + 20) % {n_supp} AS BIGINT) AS l_suppkey,
        CAST(1 + hash(r * 11 + 21) % 7 AS INTEGER) AS l_linenumber,
        (1 + CAST(hash(r * 13 + 22) % 50 AS BIGINT))::DOUBLE AS l_quantity,
        round(900 + CAST(hash(r * 17 + 23) % 10410000 AS BIGINT) / 100.0, 2)
          AS l_extendedprice,
        (CAST(hash(r * 19 + 24) % 11 AS BIGINT) / 100.0) AS l_discount,
        (CAST(hash(r * 23 + 25) % 9 AS BIGINT) / 100.0) AS l_tax,
        ['A','N','R'][CAST(1 + hash(r * 29 + 26) % 3 AS BIGINT)]
          AS l_returnflag,
        ['O','F'][CAST(1 + hash(r * 31 + 27) % 2 AS BIGINT)] AS l_linestatus,
        TIMESTAMP '1995-01-02' + INTERVAL
          (CAST(hash(r * 37 + 28) % 2490 AS BIGINT)) DAY AS l_shipdate
      FROM range({n_li}) t(r)) TO '{out}/lineitem.parquet' (FORMAT PARQUET)""")
    print(f"relational: lineitem {n_li}, orders {n_ord}, "
          f"customer {n_cust}, supplier {n_supp}, part {n_part}")

if __name__ == "__main__":
    import os
    out, mult = sys.argv[1], int(sys.argv[2])
    os.makedirs(out, exist_ok=True)
    main(out, mult)
    if "--relational" in sys.argv[3:]:
        relational(out, mult)
