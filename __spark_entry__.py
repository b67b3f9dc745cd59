"""Driver contract for the dataingestion_spark engine.

``entry(spark)``    — flagship ingest→chunk→enrich→embed→search pipeline
                      on /root/testdata/sf0.001.
``queries()``       — one callable per implemented operator from SURVEY §2
                      plus the training-data-scale operators.
``oracle_sql()``    — DuckDB-equivalent SQL for every oracle-expressible
                      query. Fixture-based operators (markdown parsing,
                      chunk packing) use VALUES oracles derived from the
                      local (non-Spark) reference implementation, so the
                      check pins the distributed path against the unit-
                      tested local semantics. Streaming is rows-only.

All numeric aggregates are computed exactly (DECIMAL) and presented as
DOUBLE, and every hash is md5-based, so Spark and DuckDB agree bit-for-bit.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

# The package lives next to this file; make it importable no matter how the
# driver loads the module (filepath import, different CWD, executors).
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import pandas as pd  # module-level: PySpark resolves stringified UDF type hints here

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from dataingestion_spark.operators import dedup, similarity, text_analysis
from dataingestion_spark.partitioning import fan_out
from dataingestion_spark.operators.chunkers import (
    ChunkerOptions,
    header_chunk_doc,
    header_chunker,
    markdown_chunk_doc,
    markdown_chunker,
    section_chunk_doc,
    section_chunker,
    token_chunk_text,
)
from dataingestion_spark.operators.enrichers import (
    classification_enricher,
    keyword_enricher,
    sentiment_enricher,
    summary_enricher,
)
from dataingestion_spark.operators.removal import remove_footers
from dataingestion_spark.sinks.vector_store import build_vector_records, fake_embedding
from dataingestion_spark.sources.corpus import documents_to_markdown
from dataingestion_spark.sources.markdown import parse_markdown, parse_markdown_df
from dataingestion_spark.tokenizer import WordTokenizer

# ---------------------------------------------------------------------------
# helpers
# ---------------------------------------------------------------------------

DEC = "decimal(18,4)"


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events.parquet currently stores TIMESTAMP(MICROS) NTZ; older driver
    generations used TIMESTAMP(NANOS) which Spark reads as long (nanosAsLong)
    — normalize either shape to a session-zone TIMESTAMP matching DuckDB."""
    from dataingestion_spark.streaming.pipeline import normalize_event_ts

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return normalize_event_ts(spark.read.parquet(f"{sf_dir}/events.parquet"))


def _utc(spark: SparkSession) -> None:
    spark.conf.set("spark.sql.session.timeZone", "UTC")


def _dec(c: str):
    return F.col(c).cast(DEC)


def _sql_lit(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    if isinstance(v, (int, float)):
        return repr(v)
    return "'" + str(v).replace("'", "''") + "'"


def _values_oracle(rows, cols, types) -> str:
    """Build a typed VALUES oracle from locally computed golden rows."""
    if not rows:
        empty = ", ".join(f"CAST(NULL AS {t}) AS {c}" for c, t in zip(cols, types))
        return f"SELECT {empty} WHERE 1=0"
    vals = ",\n".join(
        "(" + ", ".join(_sql_lit(v) for v in row) + ")" for row in rows
    )
    casts = ", ".join(f"CAST({c} AS {t}) AS {c}" for c, t in zip(cols, types))
    return f"SELECT {casts} FROM (VALUES\n{vals}\n) AS t({', '.join(cols)})"


# ---------------------------------------------------------------------------
# fixture corpus (markdown semantics pinned by tests/test_markdown_parser.py
# and tests/test_chunkers_local.py; goldens derived from the local engine)
# ---------------------------------------------------------------------------

FIXTURE_DOCS = {
    "fx_guide": """# User Guide

Welcome to the engine.

## Install

Run the installer. It is fast and small.

### Requirements

A machine with memory.

## Usage

| flag | meaning |
| --- | --- |
| -v | verbose |
| -q | quiet |

Use flags wisely.

---

Footer: manual v2
""",
    "fx_list": """# Notes

- alpha item
- beta item

> quoted wisdom

Closing paragraph.
""",
    "fx_plain": """Just a paragraph without any headers at all.

Second paragraph.
""",
}

# Minimal real PNG header (signature + IHDR 7x5) so image probing sees true
# dimensions; alt text intentionally empty so the enricher has work to do.
_PNG_BYTES = (
    b"\x89PNG\r\n\x1a\n"
    + (13).to_bytes(4, "big") + b"IHDR"
    + (7).to_bytes(4, "big") + (5).to_bytes(4, "big")
    + b"\x08\x02\x00\x00\x00"
)
import base64 as _b64  # noqa: E402

FIXTURE_DOCS["fx_image"] = (
    "# Image Doc\n\nIntro paragraph.\n\n"
    f"![](data:image/png;base64,{_b64.b64encode(_PNG_BYTES).decode()})\n\n"
    "Tail paragraph.\n"
)

_FIXED_OPTS = ChunkerOptions(WordTokenizer(), 2000)


def _fixture_rows_local():
    rows = []
    for doc_id in sorted(FIXTURE_DOCS):
        rows.extend(parse_markdown(FIXTURE_DOCS[doc_id], doc_id))
    return rows


def _fixture_elements_df(spark: SparkSession) -> DataFrame:
    src = spark.createDataFrame(
        sorted(FIXTURE_DOCS.items()), "doc_id string, markdown string"
    )
    return parse_markdown_df(src, id_col="doc_id", content_col="markdown")


def _fixture_chunk_golden(chunk_fn):
    rows = _fixture_rows_local()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    out = []
    for doc_id in sorted(by_doc):
        for i, c in enumerate(chunk_fn(by_doc[doc_id])):
            out.append((doc_id, i, c.get("context"), c["content"]))
    return out


_CHUNK_COLS = ["doc_id", "chunk_seq", "context", "content"]
_CHUNK_TYPES = ["VARCHAR", "INTEGER", "VARCHAR", "VARCHAR"]


# ---------------------------------------------------------------------------
# A. relational coverage (joins/aggregations/windows "free" in Spark —
#    SURVEY §2.7 — exercised against the TPC-H-ish tables)
# ---------------------------------------------------------------------------

def q_tpch_q1(spark, sf):
    _utc(spark)
    l = fan_out(_t(spark, sf, "lineitem")).filter(F.col("l_shipdate") <= "2000-12-01")
    disc_price = _dec("l_extendedprice") * (F.lit(1).cast(DEC) - _dec("l_discount"))
    agg = l.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum(_dec("l_quantity")).alias("dq"),
        F.sum(_dec("l_extendedprice")).alias("dp"),
        F.sum(disc_price).alias("ddp"),
        F.count("*").alias("count_order"),
    )
    return agg.select(
        "l_returnflag",
        "l_linestatus",
        F.col("dq").cast("double").alias("sum_qty"),
        F.col("dp").cast("double").alias("sum_base_price"),
        F.col("ddp").cast("double").alias("sum_disc_price"),
        (F.col("dq").cast("double") / F.col("count_order")).alias("avg_qty"),
        (F.col("dp").cast("double") / F.col("count_order")).alias("avg_price"),
        "count_order",
    )


ORACLE_Q1 = """
SELECT l_returnflag, l_linestatus,
  CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS sum_qty,
  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS sum_base_price,
  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))) AS VARCHAR) AS DOUBLE) AS sum_disc_price,
  CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) / COUNT(*) AS avg_qty,
  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) / COUNT(*) AS avg_price,
  COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2000-12-01'
GROUP BY l_returnflag, l_linestatus
"""


def q_tpch_q3(spark, sf):
    _utc(spark)
    c = _t(spark, sf, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf, "orders").filter(F.col("o_orderdate") < "1998-01-01")
    l = _t(spark, sf, "lineitem").filter(F.col("l_shipdate") > "1998-01-01")
    disc_price = _dec("l_extendedprice") * (F.lit(1).cast(DEC) - _dec("l_discount"))
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(disc_price).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("o_orderkey"))
        .limit(10)
    )


ORACLE_Q3 = """
SELECT o_orderkey, o_orderdate, o_orderpriority,
  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))) AS VARCHAR) AS DOUBLE) AS revenue
FROM customer JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-01-01'
  AND l_shipdate > TIMESTAMP '1998-01-01'
GROUP BY o_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, o_orderkey LIMIT 10
"""


def q_tpch_q5(spark, sf):
    _utc(spark)
    r = _t(spark, sf, "region").filter(F.col("r_name") == "ASIA")
    n = _t(spark, sf, "nation")
    c = _t(spark, sf, "customer")
    s = _t(spark, sf, "supplier")
    o = _t(spark, sf, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1997-01-01")
    )
    l = _t(spark, sf, "lineitem")
    disc_price = _dec("l_extendedprice") * (F.lit(1).cast(DEC) - _dec("l_discount"))
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(c, o.o_custkey == c.c_custkey)
        .filter(c.c_nationkey == s.s_nationkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(F.sum(disc_price).cast("double").alias("revenue"))
    )


ORACLE_Q5 = """
SELECT n_name,
  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))) AS VARCHAR) AS DOUBLE) AS revenue
FROM region JOIN nation ON n_regionkey = r_regionkey
JOIN supplier ON s_nationkey = n_nationkey
JOIN lineitem ON l_suppkey = s_suppkey
JOIN orders ON o_orderkey = l_orderkey
JOIN customer ON c_custkey = o_custkey AND c_nationkey = s_nationkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
GROUP BY n_name
"""


def q_tpch_q6(spark, sf):
    _utc(spark)
    l = _t(spark, sf, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-01-01")
        & (F.col("l_shipdate") < "1998-01-01")
        & (F.col("l_discount") >= 0.03)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    )
    return l.agg(
        F.sum(_dec("l_extendedprice") * _dec("l_discount")).cast("double").alias("revenue"),
        F.count("*").alias("n_items"),
    )


ORACLE_Q6 = """
SELECT
  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * CAST(l_discount AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS revenue,
  COUNT(*) AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
  AND l_discount BETWEEN 0.03 AND 0.07 AND l_quantity < 24
"""


def q_tpch_q4(spark, sf):
    """TPC-H Q4 shape (priority count over EXISTS): orders having at least
    one late-shipped lineitem, counted per priority. The correlated EXISTS
    becomes a LEFT SEMI join — Spark's native form; the subquery side is
    pre-projected to the join key so the shuffle carries keys only."""
    _utc(spark)
    o = _t(spark, sf, "orders").filter(
        (F.col("o_orderdate") >= "1996-07-01") & (F.col("o_orderdate") < "1996-10-01")
    )
    l = _t(spark, sf, "lineitem")
    late = (
        l.join(o.select("o_orderkey", "o_orderdate"), l.l_orderkey == F.col("o_orderkey"))
        .filter(F.col("l_shipdate") > F.col("o_orderdate"))
        .select("l_orderkey")
    )
    return (
        o.join(late, o.o_orderkey == late.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


ORACLE_Q4 = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-07-01' AND o_orderdate < TIMESTAMP '1996-10-01'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
GROUP BY o_orderpriority
"""


def q_tpch_q7(spark, sf):
    """TPC-H Q7 shape (volume shipping): revenue between nation pairs by
    ship year. Two nation lookups (broadcast both), supplier and customer
    sides resolved independently, then one agg keyed on the pair+year."""
    _utc(spark)
    n1 = _t(spark, sf, "nation").select(
        F.col("n_nationkey").alias("sk"), F.col("n_name").alias("supp_nation")
    )
    n2 = _t(spark, sf, "nation").select(
        F.col("n_nationkey").alias("ck"), F.col("n_name").alias("cust_nation")
    )
    s = _t(spark, sf, "supplier")
    c = _t(spark, sf, "customer")
    o = _t(spark, sf, "orders")
    l = _t(spark, sf, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1998-01-01")
    )
    disc_price = _dec("l_extendedprice") * (F.lit(1).cast(DEC) - _dec("l_discount"))
    pairs = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("sk"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("ck"))
        .filter(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
    )
    return (
        pairs.withColumn("l_year", F.year("l_shipdate").cast("int"))
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(F.sum(disc_price).cast("double").alias("revenue"))
    )


ORACLE_Q7 = """
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
  CAST(year(l_shipdate) AS INTEGER) AS l_year,
  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))) AS VARCHAR) AS DOUBLE) AS revenue
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
  AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
    OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
GROUP BY n1.n_name, n2.n_name, CAST(year(l_shipdate) AS INTEGER)
"""


def q_tpch_q10(spark, sf):
    """TPC-H Q10 shape (returned-item revenue): top 20 customers by revenue
    lost to returns in a quarter. Fact-side filters first, dims broadcast,
    deterministic tiebreak on custkey for the limit."""
    _utc(spark)
    c = _t(spark, sf, "customer")
    n = _t(spark, sf, "nation")
    o = _t(spark, sf, "orders").filter(
        (F.col("o_orderdate") >= "1996-10-01") & (F.col("o_orderdate") < "1997-01-01")
    )
    l = _t(spark, sf, "lineitem").filter(F.col("l_returnflag") == "R")
    disc_price = _dec("l_extendedprice") * (F.lit(1).cast(DEC) - _dec("l_discount"))
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.sum(disc_price).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


ORACLE_Q10 = """
SELECT c_custkey, c_name, c_acctbal, n_name,
  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))) AS VARCHAR) AS DOUBLE) AS revenue
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
WHERE o_orderdate >= TIMESTAMP '1996-10-01' AND o_orderdate < TIMESTAMP '1997-01-01'
  AND l_returnflag = 'R'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey LIMIT 20
"""


def q_tpch_q14(spark, sf):
    """TPC-H Q14 shape (promo revenue share): conditional aggregation —
    100 × revenue of 'PROMO%' parts / total revenue in one month. Both sums
    exact DECIMAL, division in double in the same order as the oracle."""
    _utc(spark)
    p = _t(spark, sf, "part")
    l = _t(spark, sf, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-03-01") & (F.col("l_shipdate") < "1997-04-01")
    )
    disc_price = _dec("l_extendedprice") * (F.lit(1).cast(DEC) - _dec("l_discount"))
    j = l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
    return j.agg(
        (
            F.lit(100.0)
            * F.sum(
                F.when(F.col("p_type").startswith("PROMO"), disc_price)
                .otherwise(F.lit(0).cast(DEC))
            ).cast("double")
            / F.sum(disc_price).cast("double")
        ).alias("promo_revenue_pct")
    )


ORACLE_Q14 = """
SELECT 100.0 * CAST(CAST(SUM(CASE WHEN p_type LIKE 'PROMO%'
          THEN CAST(l_extendedprice AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))
          ELSE CAST(0 AS DECIMAL(18,4)) END) AS VARCHAR) AS DOUBLE)
     / CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))) AS VARCHAR) AS DOUBLE)
  AS promo_revenue_pct
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1997-03-01' AND l_shipdate < TIMESTAMP '1997-04-01'
"""


def q_tpch_q18(spark, sf):
    """TPC-H Q18 shape (large-volume orders): orders whose summed quantity
    exceeds a threshold, joined back to customer detail. The HAVING runs on
    the pre-aggregated (small) side; the join back is a broadcast."""
    _utc(spark)
    big = (
        _t(spark, sf, "lineitem")
        .groupBy("l_orderkey")
        .agg(F.sum(_dec("l_quantity")).alias("_q"))
        .filter(F.col("_q") > 150)
        .select("l_orderkey", F.col("_q").cast("double").alias("total_qty"))
    )
    o = _t(spark, sf, "orders")
    c = _t(spark, sf, "customer")
    return (
        o.join(F.broadcast(big), o.o_orderkey == big.l_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select("c_name", "c_custkey", "o_orderkey", "o_orderdate",
                "o_totalprice", "total_qty")
    )


ORACLE_Q18 = """
SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
  CAST(CAST(t._q AS VARCHAR) AS DOUBLE) AS total_qty
FROM orders
JOIN (SELECT l_orderkey, SUM(CAST(l_quantity AS DECIMAL(18,4))) AS _q
      FROM lineitem GROUP BY l_orderkey HAVING _q > 150) t
  ON o_orderkey = t.l_orderkey
JOIN customer ON o_custkey = c_custkey
"""


def q_tpch_q19(spark, sf):
    """TPC-H Q19 shape (disjunctive predicates): revenue from three
    brand/size/quantity bands OR-ed together. One broadcast join; the OR of
    ANDs stays a single scan predicate (no union of three scans)."""
    _utc(spark)
    p = _t(spark, sf, "part")
    l = _t(spark, sf, "lineitem")
    j = l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
    band = (
        ((F.col("p_brand") == "Brand#1") & (F.col("p_size").between(1, 15))
         & (F.col("l_quantity").between(1, 11)))
        | ((F.col("p_brand") == "Brand#2") & (F.col("p_size").between(1, 25))
           & (F.col("l_quantity").between(10, 20)))
        | ((F.col("p_brand") == "Brand#3") & (F.col("p_size").between(1, 35))
           & (F.col("l_quantity").between(20, 30)))
    )
    disc_price = _dec("l_extendedprice") * (F.lit(1).cast(DEC) - _dec("l_discount"))
    return j.filter(band).agg(
        F.sum(disc_price).cast("double").alias("revenue"),
        F.count("*").alias("n_items"),
    )


ORACLE_Q19 = """
SELECT
  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))) AS VARCHAR) AS DOUBLE) AS revenue,
  COUNT(*) AS n_items
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 30)
"""


def q_tpch_q22(spark, sf):
    """TPC-H Q22 shape (dormant high-balance customers): customers with
    above-average balance and no URGENT order — scalar subquery (computed
    once, broadcast as a 1-row join) + anti-join, grouped by nation. The
    avg is an exact DECIMAL sum divided in double, same order as SQL."""
    _utc(spark)
    c = _t(spark, sf, "customer")
    o = _t(spark, sf, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    n = _t(spark, sf, "nation")
    avg_row = c.filter(F.col("c_acctbal") > 0.0).agg(
        (F.sum(_dec("c_acctbal")).cast("double") / F.count("*")).alias("_avg")
    )
    return (
        c.crossJoin(F.broadcast(avg_row))
        .filter(F.col("c_acctbal") > F.col("_avg"))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
        .join(F.broadcast(n), F.col("c_nationkey") == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count("*").alias("n_customers"),
            F.sum(_dec("c_acctbal")).cast("double").alias("total_bal"),
        )
    )


ORACLE_Q22 = """
SELECT n_name, COUNT(*) AS n_customers,
  CAST(CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS total_bal
FROM customer JOIN nation ON c_nationkey = n_nationkey
WHERE c_acctbal > (SELECT CAST(CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) / COUNT(*)
                   FROM customer WHERE c_acctbal > 0.0)
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
GROUP BY n_name
"""


def q_tpch_q2(spark, sf):
    """TPC-H Q2 shape (min-cost supplier per part). The testdata has no
    partsupp table, so supply cost is derived from lineitem as the MIN unit
    price (one IEEE division per row — bit-identical across engines; MIN is
    order-independent). The correlated min subquery becomes a per-part min
    aggregate joined back; ties are kept, as in the reference query."""
    _utc(spark)
    l = _t(spark, sf, "lineitem")
    unit = l.groupBy("l_partkey", "l_suppkey").agg(
        F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("supply_cost")
    )
    minc = unit.groupBy("l_partkey").agg(F.min("supply_cost").alias("_min_cost"))
    p = _t(spark, sf, "part").filter(
        (F.col("p_size").between(10, 20)) & (F.col("p_type") == "LARGE")
    )
    s = _t(spark, sf, "supplier")
    n = _t(spark, sf, "nation")
    r = _t(spark, sf, "region").filter(F.col("r_name") == "EUROPE")
    return (
        unit.join(minc, "l_partkey")
        .filter(F.col("supply_cost") == F.col("_min_cost"))
        .join(F.broadcast(p), F.col("l_partkey") == p.p_partkey)
        .join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_type", "supply_cost")
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


ORACLE_Q2 = """
WITH unit AS (
  SELECT l_partkey, l_suppkey, MIN(l_extendedprice / l_quantity) AS supply_cost
  FROM lineitem GROUP BY l_partkey, l_suppkey),
minc AS (SELECT l_partkey, MIN(supply_cost) AS _min_cost FROM unit GROUP BY l_partkey)
SELECT s_acctbal, s_name, n_name, p_partkey, p_type, supply_cost
FROM unit JOIN minc USING (l_partkey)
JOIN part ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE supply_cost = _min_cost AND p_size BETWEEN 10 AND 20
  AND p_type = 'LARGE' AND r_name = 'EUROPE'
ORDER BY s_acctbal DESC, n_name, s_name, p_partkey LIMIT 100
"""


def q_tpch_q8(spark, sf):
    """TPC-H Q8 shape (national market share): NATION_1's share of
    AMERICA-region revenue for STANDARD parts, per order year. Dims
    broadcast; one agg with a conditional numerator over the same rows."""
    _utc(spark)
    p = _t(spark, sf, "part").filter(F.col("p_type") == "STANDARD")
    s = _t(spark, sf, "supplier")
    c = _t(spark, sf, "customer")
    o = _t(spark, sf, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1998-01-01")
    )
    l = _t(spark, sf, "lineitem")
    n1 = _t(spark, sf, "nation").select(
        F.col("n_nationkey").alias("ck"), F.col("n_regionkey").alias("c_region")
    )
    r = _t(spark, sf, "region").filter(F.col("r_name") == "AMERICA")
    n2 = _t(spark, sf, "nation").select(
        F.col("n_nationkey").alias("sk"), F.col("n_name").alias("supp_nation")
    )
    disc_price = _dec("l_extendedprice") * (F.lit(1).cast(DEC) - _dec("l_discount"))
    vol = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("ck"))
        .join(F.broadcast(r), F.col("c_region") == F.col("r_regionkey"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("sk"))
        .withColumn("o_year", F.year("o_orderdate").cast("int"))
    )
    return vol.groupBy("o_year").agg(
        (
            F.sum(
                F.when(F.col("supp_nation") == "NATION_1", disc_price)
                .otherwise(F.lit(0).cast(DEC))
            ).cast("double")
            / F.sum(disc_price).cast("double")
        ).alias("mkt_share")
    )


ORACLE_Q8 = """
SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
  CAST(CAST(SUM(CASE WHEN n2.n_name = 'NATION_1'
        THEN CAST(l_extendedprice AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))
        ELSE CAST(0 AS DECIMAL(18,4)) END) AS VARCHAR) AS DOUBLE)
  / CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))) AS VARCHAR) AS DOUBLE)
  AS mkt_share
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
JOIN part ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n1 ON c_nationkey = n1.n_nationkey
JOIN region ON n1.n_regionkey = r_regionkey
JOIN nation n2 ON s_nationkey = n2.n_nationkey
WHERE p_type = 'STANDARD' AND r_name = 'AMERICA'
  AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
GROUP BY CAST(year(o_orderdate) AS INTEGER)
"""


def q_tpch_q9(spark, sf):
    """TPC-H Q9 shape (product-line profit by nation and year). No partsupp
    table, so cost is p_retailprice × quantity instead of ps_supplycost ×
    quantity — same plan shape: part-name filter, 4-way join, two-key agg."""
    _utc(spark)
    p = _t(spark, sf, "part").filter(F.col("p_name").contains("gear"))
    s = _t(spark, sf, "supplier")
    o = _t(spark, sf, "orders")
    n = _t(spark, sf, "nation")
    l = _t(spark, sf, "lineitem")
    amount = _dec("l_extendedprice") * (F.lit(1).cast(DEC) - _dec("l_discount")) - _dec(
        "p_retailprice"
    ) * _dec("l_quantity")
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .withColumn("o_year", F.year("o_orderdate").cast("int"))
        .groupBy(F.col("n_name").alias("nation"), "o_year")
        .agg(F.sum(amount).cast("double").alias("sum_profit"))
    )


ORACLE_Q9 = """
SELECT n_name AS nation, CAST(year(o_orderdate) AS INTEGER) AS o_year,
  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))
       - CAST(p_retailprice AS DECIMAL(18,4)) * CAST(l_quantity AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS sum_profit
FROM lineitem JOIN part ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN orders ON l_orderkey = o_orderkey
JOIN nation ON s_nationkey = n_nationkey
WHERE p_name LIKE '%gear%'
GROUP BY n_name, CAST(year(o_orderdate) AS INTEGER)
"""


def q_tpch_q11(spark, sf):
    """TPC-H Q11 shape (important parts by value): per-part revenue from one
    nation's suppliers, kept when above a fraction of the total (scalar
    subquery → 1-row broadcast). Value stands in for ps_supplycost×availqty."""
    _utc(spark)
    n = _t(spark, sf, "nation").filter(F.col("n_name") == "NATION_3")
    s = _t(spark, sf, "supplier").join(
        F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"), "left_semi"
    )
    l = _t(spark, sf, "lineitem")
    disc_price = _dec("l_extendedprice") * (F.lit(1).cast(DEC) - _dec("l_discount"))
    per_part = (
        l.join(F.broadcast(s), l.l_suppkey == F.col("s_suppkey"), "left_semi")
        .groupBy("l_partkey")
        .agg(F.sum(disc_price).alias("_v"))
    )
    total = per_part.agg(F.sum("_v").cast("double").alias("_total"))
    return (
        per_part.crossJoin(F.broadcast(total))
        .filter(F.col("_v").cast("double") > F.col("_total") * 0.0002)
        .select("l_partkey", F.col("_v").cast("double").alias("part_value"))
        .orderBy(F.desc("part_value"), "l_partkey")
    )


ORACLE_Q11 = """
WITH nat_supp AS (
  SELECT s_suppkey FROM supplier JOIN nation ON s_nationkey = n_nationkey
  WHERE n_name = 'NATION_3'),
per_part AS (
  SELECT l_partkey,
    SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))) AS _v
  FROM lineitem WHERE l_suppkey IN (SELECT s_suppkey FROM nat_supp)
  GROUP BY l_partkey)
SELECT l_partkey, CAST(CAST(_v AS VARCHAR) AS DOUBLE) AS part_value
FROM per_part
WHERE CAST(CAST(_v AS VARCHAR) AS DOUBLE) >
  (SELECT CAST(CAST(SUM(_v) AS VARCHAR) AS DOUBLE) FROM per_part) * 0.0002
ORDER BY part_value DESC, l_partkey
"""


def q_tpch_q12(spark, sf):
    """TPC-H Q12 shape (late shipments by class): lineitems shipped ≥60 days
    after their order date in 1997, bucketed by linestatus (the schema has no
    l_shipmode), with conditional high/low-priority counts."""
    _utc(spark)
    o = _t(spark, sf, "orders")
    l = _t(spark, sf, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1998-01-01")
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .filter(F.col("l_shipdate") >= F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
    )


ORACLE_Q12 = """
SELECT l_linestatus,
  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
  AND l_shipdate >= o_orderdate + INTERVAL 60 DAY
GROUP BY l_linestatus
"""


def q_tpch_q13(spark, sf):
    """TPC-H Q13 shape (customer order-count distribution): left join orders
    (minus urgent, standing in for the comment filter), count per customer,
    then the distribution of those counts."""
    _utc(spark)
    c = _t(spark, sf, "customer")
    o = _t(spark, sf, "orders").filter(F.col("o_orderpriority") != "1-URGENT")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


ORACLE_Q13 = """
SELECT c_count, COUNT(*) AS custdist
FROM (SELECT c_custkey, COUNT(o_orderkey) AS c_count
      FROM customer LEFT JOIN orders
        ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      GROUP BY c_custkey) t
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


def q_tpch_q15(spark, sf):
    """TPC-H Q15 shape (top supplier): quarterly revenue per supplier, keep
    the max (the view + scalar-subquery pair becomes agg → 1-row broadcast →
    exact DECIMAL equality, so ties survive like the reference query)."""
    _utc(spark)
    l = _t(spark, sf, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1997-04-01")
    )
    disc_price = _dec("l_extendedprice") * (F.lit(1).cast(DEC) - _dec("l_discount"))
    rev = l.groupBy("l_suppkey").agg(F.sum(disc_price).alias("_rev"))
    maxrev = rev.agg(F.max("_rev").alias("_max"))
    s = _t(spark, sf, "supplier")
    return (
        rev.crossJoin(F.broadcast(maxrev))
        .filter(F.col("_rev") == F.col("_max"))
        .join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .select(
            "s_suppkey", "s_name", F.col("_rev").cast("double").alias("total_revenue")
        )
        .orderBy("s_suppkey")
    )


ORACLE_Q15 = """
WITH revenue AS (
  SELECT l_suppkey,
    SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))) AS _rev
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1997-04-01'
  GROUP BY l_suppkey)
SELECT s_suppkey, s_name, CAST(CAST(_rev AS VARCHAR) AS DOUBLE) AS total_revenue
FROM revenue JOIN supplier ON l_suppkey = s_suppkey
WHERE _rev = (SELECT MAX(_rev) FROM revenue)
ORDER BY s_suppkey
"""


def q_tpch_q16(spark, sf):
    """TPC-H Q16 shape (supplier count by part attributes): distinct
    suppliers per (brand, type, size) from lineitem (no partsupp table),
    excluding one brand, one type prefix, and a supplier NOT-IN subquery
    (negative balance stands in for the comment filter)."""
    _utc(spark)
    p = _t(spark, sf, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & (~F.col("p_type").startswith("PROMO"))
        & (F.col("p_size").isin(1, 4, 9, 14, 19, 23, 36, 45))
    )
    excl = _t(spark, sf, "supplier").filter(F.col("s_acctbal") < 0).select("s_suppkey")
    l = _t(spark, sf, "lineitem")
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(F.broadcast(excl), l.l_suppkey == F.col("s_suppkey"), "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


ORACLE_Q16 = """
SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#1' AND p_type NOT LIKE 'PROMO%'
  AND p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
"""


def q_tpch_q17(spark, sf):
    """TPC-H Q17 shape (small-quantity-order revenue): average yearly revenue
    lost if small orders (below 20% of the per-part mean quantity) were not
    filled. Brand+type filter stands in for brand+container. The correlated
    avg subquery becomes a per-part agg joined back (broadcast)."""
    _utc(spark)
    p = _t(spark, sf, "part").filter(
        (F.col("p_brand") == "Brand#5") & (F.col("p_type") == "SMALL")
    )
    l = _t(spark, sf, "lineitem")
    j = l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
    avg_q = j.groupBy("p_partkey").agg(
        (F.sum(_dec("l_quantity")).cast("double") / F.count("*")).alias("_avg")
    )
    return (
        j.join(F.broadcast(avg_q), "p_partkey")
        .filter(F.col("l_quantity") < 0.2 * F.col("_avg"))
        .agg((F.sum(_dec("l_extendedprice")).cast("double") / 7.0).alias("avg_yearly"))
    )


ORACLE_Q17 = """
WITH jp AS (
  SELECT p_partkey, l_quantity, l_extendedprice
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_brand = 'Brand#5' AND p_type = 'SMALL'),
avg_q AS (
  SELECT p_partkey,
    CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) / COUNT(*) AS _avg
  FROM jp GROUP BY p_partkey)
SELECT CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) / 7.0 AS avg_yearly
FROM jp JOIN avg_q USING (p_partkey)
WHERE l_quantity < 0.2 * _avg
"""


def q_tpch_q20(spark, sf):
    """TPC-H Q20 shape (suppliers with excess movement of a part line):
    suppliers who shipped more than a threshold quantity of any 'small %'
    part in 1997 (lineitem stands in for partsupp availability), restricted
    to one nation. Semi-join chain — the shuffle carries keys only."""
    _utc(spark)
    pk = (
        _t(spark, sf, "part")
        .filter(F.col("p_name").startswith("small"))
        .select("p_partkey")
    )
    l = _t(spark, sf, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1998-01-01")
    )
    heavy = (
        l.join(F.broadcast(pk), l.l_partkey == F.col("p_partkey"), "left_semi")
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum(_dec("l_quantity")).alias("_q"))
        .filter(F.col("_q").cast("double") > 30.0)
        .select("l_suppkey")
        .distinct()
    )
    n = _t(spark, sf, "nation").filter(F.col("n_name").isin("NATION_2", "NATION_3"))
    s = _t(spark, sf, "supplier").join(
        F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"), "left_semi"
    )
    return (
        s.join(heavy, s.s_suppkey == heavy.l_suppkey, "left_semi")
        .select("s_suppkey", "s_name")
        .orderBy("s_suppkey")
    )


ORACLE_Q20 = """
SELECT s_suppkey, s_name
FROM supplier JOIN nation ON s_nationkey = n_nationkey
WHERE n_name IN ('NATION_2', 'NATION_3')
  AND s_suppkey IN (
    SELECT l_suppkey FROM lineitem
    WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'small%')
      AND l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
    GROUP BY l_suppkey, l_partkey
    HAVING CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) > 30.0)
ORDER BY s_suppkey
"""


def q_tpch_q21(spark, sf):
    """TPC-H Q21 shape (suppliers who kept orders waiting): for finished
    multi-supplier orders, blame the supplier that alone shipped last (the
    schema has no commit/receipt dates, so 'last l_shipdate' stands in for
    'late receipt'). The double EXISTS/NOT-EXISTS of the reference becomes
    per-order aggregates joined back — no correlated execution."""
    _utc(spark)
    o = _t(spark, sf, "orders").filter(F.col("o_orderstatus") == "F")
    l = _t(spark, sf, "lineitem")
    pairs = (
        l.join(o.select("o_orderkey"), l.l_orderkey == F.col("o_orderkey"), "left_semi")
        .groupBy("l_orderkey", "l_suppkey")
        .agg(F.max("l_shipdate").alias("_supp_max"))
    )
    per_order = pairs.groupBy("l_orderkey").agg(
        F.max("_supp_max").alias("_order_max"), F.count("*").alias("_n_supp")
    )
    at_max = (
        pairs.join(per_order, "l_orderkey")
        .filter((F.col("_supp_max") == F.col("_order_max")) & (F.col("_n_supp") > 1))
    )
    blamed = (
        at_max.groupBy("l_orderkey")
        .agg(F.count("*").alias("_n_late"), F.max("l_suppkey").alias("suppkey"))
        .filter(F.col("_n_late") == 1)
    )
    s = _t(spark, sf, "supplier")
    return (
        blamed.join(F.broadcast(s), F.col("suppkey") == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(100)
    )


ORACLE_Q21 = """
WITH pairs AS (
  SELECT l_orderkey, l_suppkey, MAX(l_shipdate) AS _supp_max
  FROM lineitem
  WHERE l_orderkey IN (SELECT o_orderkey FROM orders WHERE o_orderstatus = 'F')
  GROUP BY l_orderkey, l_suppkey),
per_order AS (
  SELECT l_orderkey, MAX(_supp_max) AS _order_max, COUNT(*) AS _n_supp
  FROM pairs GROUP BY l_orderkey),
blamed AS (
  SELECT p.l_orderkey, COUNT(*) AS _n_late, MAX(p.l_suppkey) AS suppkey
  FROM pairs p JOIN per_order po ON p.l_orderkey = po.l_orderkey
  WHERE p._supp_max = po._order_max AND po._n_supp > 1
  GROUP BY p.l_orderkey
  HAVING COUNT(*) = 1)
SELECT s_name, COUNT(*) AS numwait
FROM blamed JOIN supplier ON suppkey = s_suppkey
GROUP BY s_name
ORDER BY numwait DESC, s_name LIMIT 100
"""


def q_orders_rollup(spark, sf):
    _utc(spark)
    o = _t(spark, sf, "orders")
    return o.rollup("o_orderstatus", "o_orderpriority").agg(
        F.count("*").alias("n_orders"),
        F.sum(_dec("o_totalprice")).cast("double").alias("total_price"),
    )


ORACLE_ROLLUP = """
SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders,
  CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS total_price
FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
"""


def q_orders_cube(spark, sf):
    """CUBE + grouping_id: every aggregation lattice cell over
    (status, priority) with an explicit cell marker — the grouping-sets
    family the reference lacks entirely (SURVEY §2.7) but Spark gives for
    free; grouping_id disambiguates real NULL keys from subtotal rows."""
    _utc(spark)
    o = _t(spark, sf, "orders")
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.grouping_id().alias("gid"),
            F.count("*").alias("n_orders"),
            F.sum(_dec("o_totalprice")).cast("double").alias("total_price"),
        )
        .select("o_orderstatus", "o_orderpriority", F.col("gid").cast("int"),
                "n_orders", "total_price")
    )


ORACLE_CUBE = """
SELECT o_orderstatus, o_orderpriority,
  CAST(GROUPING(o_orderstatus) * 2 + GROUPING(o_orderpriority) AS INT) AS gid,
  COUNT(*) AS n_orders,
  CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS total_price
FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
"""


def q_part_set_ops(spark, sf):
    """Set operations (SURVEY §2.7 absent-in-reference): brands supplying
    both large and small parts (INTERSECT), only-large (EXCEPT), and the
    symmetric union tagged per side — exercises INTERSECT / EXCEPT /
    UNION ALL distinct-set semantics against the oracle."""
    _utc(spark)
    p = _t(spark, sf, "part")
    large = p.filter(F.col("p_size") >= 40).select("p_brand").distinct()
    small = p.filter(F.col("p_size") <= 10).select("p_brand").distinct()
    both = large.intersect(small).select(F.lit("both").alias("side"), "p_brand")
    only_large = large.exceptAll(small).select(
        F.lit("only_large").alias("side"), "p_brand"
    )
    only_small = small.exceptAll(large).select(
        F.lit("only_small").alias("side"), "p_brand"
    )
    return both.unionByName(only_large).unionByName(only_small)


ORACLE_SET_OPS = """
WITH large AS (SELECT DISTINCT p_brand FROM part WHERE p_size >= 40),
     small AS (SELECT DISTINCT p_brand FROM part WHERE p_size <= 10)
SELECT 'both' AS side, p_brand FROM (SELECT p_brand FROM large INTERSECT SELECT p_brand FROM small)
UNION ALL
SELECT 'only_large', p_brand FROM (SELECT p_brand FROM large EXCEPT SELECT p_brand FROM small)
UNION ALL
SELECT 'only_small', p_brand FROM (SELECT p_brand FROM small EXCEPT SELECT p_brand FROM large)
"""


def q_events_topk_per_type(spark, sf):
    _utc(spark)
    e = _events(spark, sf)
    w = W.partitionBy("event_type").orderBy(F.desc("value"), F.asc("event_id"))
    return (
        e.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("event_type", "rk", "event_id", "value")
    )


ORACLE_TOPK = """
SELECT event_type, CAST(rk AS INT) AS rk, event_id, value FROM (
  SELECT event_type, event_id, value,
         row_number() OVER (PARTITION BY event_type ORDER BY value DESC, event_id) AS rk
  FROM events) WHERE rk <= 3
"""


def q_events_sessionize(spark, sf):
    _utc(spark)
    e = _events(spark, sf)
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    # unix_micros, not unix_timestamp: second-truncation would disagree with
    # the oracle's full-precision INTERVAL comparison near the gap boundary
    gap = F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))
    brk = F.when(gap > 1800 * 1_000_000, 1).otherwise(0)
    sess = F.sum(brk).over(w.rowsBetween(W.unboundedPreceding, 0))
    return (
        e.withColumn("session_id", sess)
        .groupBy("user_id", "session_id")
        .agg(
            F.count("*").alias("n_events"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
        )
    )


ORACLE_SESSIONIZE = """
WITH g AS (
  SELECT user_id, event_id, ts,
    CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
              > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS brk
  FROM events),
s AS (
  SELECT user_id, ts,
    CAST(SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
  FROM g)
SELECT user_id, session_id, COUNT(*) AS n_events,
       MIN(ts) AS session_start, MAX(ts) AS session_end
FROM s GROUP BY user_id, session_id
"""


def q_events_session_window(spark, sf):
    """Native session windows (F.session_window) — the built-in merging
    sessionizer that also runs under Structured Streaming, complementing
    the window-function formulation in events_sessionize. Semantics pinned
    by the oracle: a gap of exactly the timeout starts a NEW session
    (merge condition is strict <), and session_end = last event + gap."""
    _utc(spark)
    e = _events(spark, sf)
    return (
        e.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )


ORACLE_SESSION_WINDOW = """
WITH g AS (
  SELECT user_id, event_id, ts,
    CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
              >= INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS brk
  FROM events),
s AS (
  SELECT user_id, ts,
    SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS UNBOUNDED PRECEDING) AS sid
  FROM g)
SELECT user_id, MIN(ts) AS session_start,
       MAX(ts) + INTERVAL 30 MINUTE AS session_end,
       COUNT(*) AS n_events
FROM s GROUP BY user_id, sid
"""


def q_events_windowed(spark, sf):
    _utc(spark)
    e = _events(spark, sf)
    return (
        e.groupBy(F.window("ts", "5 minutes").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("sum_value"),
        )
        .select(F.col("w.start").alias("win_start"), "event_type", "n", "sum_value")
    )


ORACLE_WINDOWED = """
SELECT time_bucket(INTERVAL '5 minutes', ts) AS win_start, event_type,
  COUNT(*) AS n,
  CAST(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) AS sum_value
FROM events GROUP BY 1, 2
"""


def q_events_json_stats(spark, sf):
    """JSON scalar-function coverage: parse the props JSON payload."""
    _utc(spark)
    e = _events(spark, sf)
    k = F.get_json_object("props", "$.k").cast("bigint")
    return e.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(k).alias("sum_k"),
        F.max(k).alias("max_k"),
        F.min(k).alias("min_k"),
    )


ORACLE_JSON = """
SELECT event_type, COUNT(*) AS n,
  CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
  MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k,
  MIN(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k
FROM events GROUP BY event_type
"""


def q_lineitem_quantiles(spark, sf):
    """Exact interpolated percentiles (ordered-set aggregate coverage)."""
    l = _t(spark, sf, "lineitem")
    return l.groupBy("l_returnflag").agg(
        F.percentile("l_quantity", 0.5).alias("p50_qty"),
        F.percentile("l_quantity", 0.9).alias("p90_qty"),
        F.percentile("l_discount", 0.95).alias("p95_disc"),
    )


ORACLE_QUANTILES = """
SELECT l_returnflag,
  quantile_cont(l_quantity, 0.5) AS p50_qty,
  quantile_cont(l_quantity, 0.9) AS p90_qty,
  quantile_cont(l_discount, 0.95) AS p95_disc
FROM lineitem GROUP BY l_returnflag
"""


EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


def q_events_pivot(spark, sf):
    _utc(spark)
    e = _events(spark, sf)
    return (
        e.groupBy("user_id")
        .pivot("event_type", EVENT_TYPES)
        .count()
        .na.fill(0, EVENT_TYPES)
    )


ORACLE_PIVOT = "SELECT user_id, " + ", ".join(
    f"COUNT(*) FILTER (WHERE event_type = '{t}') AS {t}" for t in EVENT_TYPES
) + " FROM events GROUP BY user_id"


def q_orders_grouping_sets(spark, sf):
    """Explicit GROUPING SETS (beyond the rollup/cube queries): totals
    per priority, per status, and the grand total in one pass, with
    grouping_id disambiguating the null groups."""
    _t(spark, sf, "orders").createOrReplaceTempView("v_orders_gs")
    return spark.sql("""
        SELECT o_orderpriority, o_orderstatus,
               CAST(grouping_id() AS INT) AS gid,
               COUNT(*) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                 AS total_price
        FROM v_orders_gs
        GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus), ())
    """)


ORACLE_GROUPING_SETS = """
SELECT o_orderpriority, o_orderstatus,
       CAST(GROUPING(o_orderpriority) * 2 + GROUPING(o_orderstatus) AS INTEGER)
         AS gid,
       COUNT(*) AS n_orders,
       CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(18,2))
            AS DOUBLE) AS total_price
FROM orders
GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus), ())
"""


def q_lineitem_rank_windows(spark, sf):
    """Rank-family window completeness: percent_rank and cume_dist of
    quantity within each return flag (plus dense_rank) — all exact
    integer-ratio doubles, full-table output hash-checked."""
    li = _t(spark, sf, "lineitem")
    w = W.partitionBy("l_returnflag").orderBy("l_quantity")
    return li.select(
        "l_orderkey", "l_linenumber", "l_returnflag", "l_quantity",
        F.round(F.percent_rank().over(w), 6).alias("pr"),
        F.round(F.cume_dist().over(w), 6).alias("cd"),
        F.dense_rank().over(w).alias("dr"),
    )


ORACLE_RANK_WINDOWS = """
SELECT l_orderkey, l_linenumber, l_returnflag, l_quantity,
       round(percent_rank() OVER w, 6) AS pr,
       round(cume_dist() OVER w, 6) AS cd,
       CAST(dense_rank() OVER w AS INTEGER) AS dr
FROM lineitem
WINDOW w AS (PARTITION BY l_returnflag ORDER BY l_quantity)
"""


def q_events_unpivot(spark, sf):
    """UNPIVOT (melt) — the inverse of events_pivot_by_user: the wide
    per-user type-count matrix back to long (user_id, event_type, n),
    zero-count cells dropped. Native DataFrame.unpivot (Spark 3.4+);
    round-tripping pivot∘unpivot equals the plain groupBy, which is
    exactly what the oracle states."""
    _utc(spark)
    wide = q_events_pivot(spark, sf)
    return (
        wide.unpivot("user_id", EVENT_TYPES, "event_type", "n")
        .filter(F.col("n") > 0)
    )


ORACLE_UNPIVOT = """
SELECT user_id, event_type, COUNT(*) AS n
FROM events GROUP BY user_id, event_type
"""


def q_customers_without_orders(spark, sf):
    # anti-join coverage; scoped to urgent orders so the result is non-empty
    c = _t(spark, sf, "customer")
    o = _t(spark, sf, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name", "c_mktsegment"
    )


ORACLE_ANTI = """
SELECT c_custkey, c_name, c_mktsegment FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT')
"""


def q_customers_with_urgent_orders(spark, sf):
    c = _t(spark, sf, "customer")
    o = _t(spark, sf, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_name"
    )


ORACLE_SEMI = """
SELECT c_custkey, c_name FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT')
"""


def q_events_asof_join(spark, sf):
    """For each error event: the latest click at-or-before it by the same
    user — the as-of join Spark lacks natively (see operators/temporal.py)."""
    from dataingestion_spark.operators.temporal import asof_join

    _utc(spark)
    e = _events(spark, sf)
    errors = e.filter(F.col("event_type") == "error").select("user_id", "event_id", "ts")
    clicks = e.filter(F.col("event_type") == "click").select("user_id", "ts", "value")
    out = asof_join(errors, clicks, on="user_id", right_cols=["value"])
    return out.select("user_id", "event_id", "ts", "ts_right", "value_right")


ORACLE_ASOF = """
WITH l AS (SELECT user_id, event_id, ts FROM events WHERE event_type = 'error'),
     r AS (SELECT user_id, ts, value FROM events WHERE event_type = 'click')
SELECT l.user_id, l.event_id, l.ts, r.ts AS ts_right, r.value AS value_right
FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.ts >= r.ts
"""


def q_events_asof_forward(spark, sf):
    """Forward as-of with a staleness bound: for each error, the EARLIEST
    click at-or-after it by the same user within 2 hours
    (asof_join(direction='forward', tolerance=...) — the kdb/pandas
    direction the backward query can't express). Ties pick the min value
    row, mirrored by the lateral min in the oracle."""
    import pandas as pd

    from dataingestion_spark.operators.temporal import asof_join

    _utc(spark)
    e = _events(spark, sf)
    errors = e.filter(F.col("event_type") == "error").select("user_id", "event_id", "ts")
    clicks = e.filter(F.col("event_type") == "click").select("user_id", "ts", "value")
    out = asof_join(errors, clicks, on="user_id", right_cols=["value"],
                    direction="forward", tolerance=pd.Timedelta(hours=2))
    return out.select("user_id", "event_id", "ts", "ts_right", "value_right")


ORACLE_ASOF_FORWARD = """
WITH l AS (SELECT user_id, event_id, ts FROM events WHERE event_type = 'error'),
     r AS (SELECT user_id, ts, value FROM events WHERE event_type = 'click')
SELECT l.user_id, l.event_id, l.ts, m.ts AS ts_right, m.value AS value_right
FROM l LEFT JOIN LATERAL (
  SELECT r.ts, r.value FROM r
  WHERE r.user_id = l.user_id AND r.ts >= l.ts
    AND r.ts <= l.ts + INTERVAL 2 HOUR
  ORDER BY r.ts, r.value LIMIT 1
) m ON true
"""


def q_events_range_join(spark, sf):
    """Clicks landing in the 30 minutes after each purchase by the same user
    — a point-in-interval (range) join. Spark would plan the raw inequality
    as a nested-loop join; ``interval_join`` (operators/temporal.py) buckets
    the time axis and runs it as an equi-join on (bucket, user)."""
    from dataingestion_spark.operators.temporal import interval_join

    _utc(spark)
    e = _events(spark, sf)
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("start"),
        (F.col("ts") + F.expr("INTERVAL 30 MINUTES")).alias("end"),
    )
    clicks = e.filter(F.col("event_type") == "click").select("user_id", "event_id", "ts")
    j = interval_join(clicks, purchases, point_ts="ts", on=["user_id"],
                      bucket="30 minutes")
    return j.groupBy("purchase_id").agg(
        F.count("*").alias("n_clicks"),
        F.max("ts").alias("last_click_ts"),
    )


ORACLE_RANGE_JOIN = """
SELECT p.event_id AS purchase_id, COUNT(*) AS n_clicks, MAX(c.ts) AS last_click_ts
FROM events p JOIN events c
  ON c.user_id = p.user_id
 AND c.ts >= p.ts AND c.ts < p.ts + INTERVAL 30 MINUTE
WHERE p.event_type = 'purchase' AND c.event_type = 'click'
GROUP BY p.event_id
"""


def q_events_moving_sum(spark, sf):
    _utc(spark)
    e = _events(spark, sf)
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-4, W.currentRow)
    )
    return e.select(
        "user_id",
        "event_id",
        F.sum(F.col("value").cast("decimal(18,6)")).over(w).cast("double").alias("sum5"),
    )


ORACLE_MOVING = """
SELECT user_id, event_id,
  CAST(CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER (
    PARTITION BY user_id ORDER BY ts, event_id
    ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS VARCHAR) AS DOUBLE) AS sum5
FROM events
"""


def q_doc_predicate_forms(spark, sf):
    # ==, startswith, endswith, isin — the reference's filtered-get predicate
    # forms (SURVEY §2.6; DocumentPipelineTests.cs:90,138,170).
    d = _t(spark, sf, "documents")
    return d.filter(
        F.col("source").startswith("src1")
        & F.col("source").endswith("2")
        & F.col("lang").isin("en", "de")
        & (F.col("n_chars") >= 100)
    ).select("doc_id", "lang", "source", "n_chars")


ORACLE_PREDICATES = """
SELECT doc_id, lang, source, n_chars FROM documents
WHERE source LIKE 'src1%' AND source LIKE '%2' AND lang IN ('en','de') AND n_chars >= 100
"""


# ---------------------------------------------------------------------------
# B. text analytics + dedup (training-data operators)
# ---------------------------------------------------------------------------

def q_doc_token_counts(spark, sf):
    return text_analysis.token_counts(_t(spark, sf, "documents"))


_BPE = text_analysis.BPEISH_PATTERN.replace("'", "''")
ORACLE_TOKEN_COUNTS = f"""
SELECT CAST(doc_id AS BIGINT) AS doc_id,
  CAST(CASE WHEN length(trim(text)) = 0 THEN 0
       ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS INT) AS n_words,
  CAST(len(regexp_extract_all(text, '{_BPE}')) AS INT) AS n_tokens_bpeish,
  CAST(length(text) AS INT) AS n_chars
FROM documents
"""


def q_doc_bpe_tokens(spark, sf):
    """Real subword BPE token counts, distributed: the self-contained BPE
    engine (``dataingestion_spark/bpe.py`` — trainer + tiktoken-format
    loader, the reference's Tiktoken analog) runs inside an Arrow-batched
    pandas UDF with the rank table shipped once per executor. Pinned
    against the identical local encode by a VALUES oracle."""
    from dataingestion_spark.bpe import BPE, seed_bpe_tokenizer

    ranks = seed_bpe_tokenizer().bpe.ranks
    bc = spark.sparkContext.broadcast(ranks)

    def n_bpe_fn(texts: pd.Series) -> pd.Series:
        bpe = BPE(bc.value)
        return texts.map(lambda t: len(bpe.encode(t or "")))

    n_bpe = F.pandas_udf(n_bpe_fn, "int")

    src = spark.createDataFrame(
        sorted(FIXTURE_DOCS.items()), "doc_id string, markdown string"
    )
    return src.select("doc_id", n_bpe(F.col("markdown")).alias("n_bpe_tokens"))


def _oracle_bpe_tokens() -> str:
    from dataingestion_spark.bpe import seed_bpe_tokenizer

    tok = seed_bpe_tokenizer()
    rows = [(d, tok.count(md)) for d, md in sorted(FIXTURE_DOCS.items())]
    return _values_oracle(rows, ["doc_id", "n_bpe_tokens"], ["VARCHAR", "INT"])


def q_bpe_pair_counts(spark, sf):
    """Distributed BPE training, round-1 statistic (operators/bpe_train.py):
    whitespace piece counts (one JVM explode+groupBy — the only
    corpus-size-dependent step of BPE training) → adjacent-pair counts →
    top-50 by (n DESC, pair). The pair maximizing this statistic IS the
    first merge; the full iterative loop is the rows-only
    tokenizer_bpe_train_merges query, pinned exactly equivalent to
    single-process train_bpe in tests/test_bpe.py."""
    from dataingestion_spark.operators import bpe_train

    docs = _t(spark, sf, "documents")
    counts = bpe_train.word_piece_counts(docs, pattern=None)
    return (
        bpe_train.pair_counts(counts)
        .orderBy(F.desc("n"), F.asc("pair"))
        .limit(50)
        .select("pair", "n")
    )


ORACLE_BPE_PAIRS = r"""
WITH words AS (
  SELECT unnest(regexp_split_to_array(trim(text), '\s+')) AS piece
  FROM documents),
wc AS (SELECT piece, COUNT(*) AS cnt FROM words WHERE piece <> '' GROUP BY piece),
pairs AS (
  SELECT substring(piece, CAST(i AS INTEGER), 2) AS pair,
         CAST(SUM(cnt) AS BIGINT) AS n
  FROM wc, unnest(range(1, length(piece))) AS t(i)
  WHERE length(piece) >= 2
  GROUP BY 1)
SELECT pair, n FROM pairs ORDER BY n DESC, pair LIMIT 50
"""


def _oracle_bpe_merges(n_merges=24):
    """Unrolled BPE merge loop as chained DuckDB CTEs. Pieces stay
    single CHARACTERS by assigning each merged token a fresh private-use
    char (U+E000+k), so adjacent-pair extraction remains substring(w,i,2)
    in every round; an expansion map (merged char -> token text) recovers
    byte-level tokens for output and for the (-count, pair-bytes)
    tie-break. replace() is left-to-right non-overlapping -- exactly the
    merge-application order of the Python loop."""
    parts = [r"""WITH w0 AS MATERIALIZED (
  SELECT piece AS w, CAST(SUM(c) AS BIGINT) AS cnt FROM (
    SELECT unnest(regexp_split_to_array(trim(text), '\s+')) AS piece, 1 AS c
    FROM documents) WHERE piece <> '' GROUP BY piece),
m0 AS MATERIALIZED (SELECT '' AS ch, '' AS tok WHERE 1=0)"""]
    for k in range(n_merges):
        nc = f"chr({0xE000 + k})"
        parts.append(f"""p{k} AS MATERIALIZED (
  SELECT substring(w, CAST(i AS INTEGER), 1) AS l,
         substring(w, CAST(i AS INTEGER) + 1, 1) AS r,
         SUM(cnt) AS n
  FROM w{k}, unnest(range(1, length(w))) AS t(i)
  WHERE length(w) >= 2 GROUP BY 1, 2),
b{k} AS MATERIALIZED (
  SELECT l, r, {nc} AS nc,
         coalesce(ml.tok, p{k}.l) || coalesce(mr.tok, p{k}.r) AS tok
  FROM p{k}
  LEFT JOIN m{k} ml ON p{k}.l = ml.ch
  LEFT JOIN m{k} mr ON p{k}.r = mr.ch
  ORDER BY n DESC, coalesce(ml.tok, p{k}.l), coalesce(mr.tok, p{k}.r)
  LIMIT 1),
w{k+1} AS MATERIALIZED (SELECT replace(w, b.l || b.r, b.nc) AS w, cnt FROM w{k}, b{k} b),
m{k+1} AS MATERIALIZED (SELECT ch, tok FROM m{k} UNION ALL SELECT nc, tok FROM b{k})""")
    merges = "\nUNION ALL\n".join(
        f"SELECT {256 + k} AS rank, tok AS token FROM b{k}" for k in range(n_merges))
    parts.append(f"""merges AS MATERIALIZED (\n{merges}\n),
cut AS (
  SELECT MIN(r1.rank) AS c FROM merges r1
  WHERE EXISTS (SELECT 1 FROM merges r2
                WHERE r2.token = r1.token AND r2.rank < r1.rank))""")
    body = ",\n".join(parts)
    return (body + "\nSELECT CAST(rank AS INTEGER) AS rank, token FROM merges "
            "WHERE rank < coalesce((SELECT c FROM cut), 1000000)")


def q_bpe_train_merges(spark, sf):
    """Full distributed BPE training: whitespace-mode piece counts at
    cluster scale, 24 merges learned from the collected frequency table,
    returned as the (rank, token) merge table. Fully oracled: the merge
    loop unrolls into 24 chained SQL rounds (_oracle_bpe_merges) — each
    merged token becomes a fresh private-use CHARACTER so pair
    extraction stays substring(w,i,2) in every round, replace() applies
    merges left-to-right non-overlapping exactly like the trainer, and
    an expansion map recovers byte-level tokens for output and for the
    (-count, pair-bytes) tie-break. Single-process equivalence is also
    pinned by tests/test_bpe.py."""
    from dataingestion_spark.operators.bpe_train import train_bpe_distributed

    docs = _t(spark, sf, "documents")
    ranks = train_bpe_distributed(docs, 256 + 24, pattern=None)
    rows = sorted(
        (v, k.decode("utf-8", "replace")) for k, v in ranks.items() if v >= 256
    )
    return spark.createDataFrame(rows, "rank int, token string")


def q_doc_lang_id(spark, sf):
    return text_analysis.lang_id(_t(spark, sf, "documents"))


def _oracle_lang_id() -> str:
    langs = sorted(text_analysis.STOPWORDS)
    scores = {
        lang: "len(list_filter(w, x -> x IN ({})))".format(
            ", ".join(f"'{s}'" for s in text_analysis.STOPWORDS[lang])
        )
        for lang in langs
    }
    best = "greatest({})".format(", ".join(scores.values()))
    case = "CASE"
    for lang in langs:
        case += f" WHEN best > 0 AND {scores[lang]} = best THEN '{lang}'"
    case += " ELSE 'und' END"
    return f"""
WITH base AS (
  SELECT CAST(doc_id AS BIGINT) AS doc_id,
         regexp_split_to_array(trim(lower(text)), '\\s+') AS w
  FROM documents),
scored AS (SELECT doc_id, w, {best} AS best FROM base)
SELECT doc_id, {case} AS detected_lang, CAST(best AS INT) AS stopword_hits
FROM scored
"""


def q_doc_quality(spark, sf):
    return text_analysis.quality_score(_t(spark, sf, "documents"))


_EN_STOP = ", ".join(f"'{s}'" for s in text_analysis.STOPWORDS["en"])
ORACLE_QUALITY = f"""
WITH base AS (
  SELECT CAST(doc_id AS BIGINT) AS doc_id, text,
         regexp_split_to_array(trim(lower(text)), '\\s+') AS w,
         CAST(length(text) AS INT) AS n_chars
  FROM documents),
m AS (
  SELECT doc_id,
    CAST(CASE WHEN n_chars = 0 OR length(trim(text)) = 0 THEN 0 ELSE len(w) END AS INT) AS n_words,
    CAST(length(regexp_replace(lower(text), '[^a-z]', '', 'g')) AS INT) AS alpha_chars,
    CAST(len(list_filter(w, x -> x IN ({_EN_STOP}))) AS INT) AS sw,
    n_chars
  FROM base)
SELECT doc_id, n_words,
  round(CAST(n_chars - greatest(n_words - 1, 0) AS DOUBLE) / greatest(n_words, 1), 6) AS mean_word_len,
  round(CAST(alpha_chars AS DOUBLE) / greatest(n_chars, 1), 6) AS alpha_ratio,
  round(CAST(sw AS DOUBLE) / greatest(n_words, 1), 6) AS stopword_ratio,
  round(0.3 * (CASE WHEN n_words >= 20 AND n_words <= 100000 THEN 1.0 ELSE 0.0 END)
      + 0.2 * (CASE WHEN CAST(n_chars - greatest(n_words - 1, 0) AS DOUBLE) / greatest(n_words, 1) >= 2.0
                     AND CAST(n_chars - greatest(n_words - 1, 0) AS DOUBLE) / greatest(n_words, 1) <= 12.0 THEN 1.0 ELSE 0.0 END)
      + 0.3 * (CAST(alpha_chars AS DOUBLE) / greatest(n_chars, 1))
      + 0.2 * least(CAST(sw AS DOUBLE) / greatest(n_words, 1) * 5, 1.0), 6) AS quality
FROM m
"""


def q_doc_fingerprint(spark, sf):
    return text_analysis.fingerprint(_t(spark, sf, "documents"))


ORACLE_FINGERPRINT = """
WITH base AS (
  SELECT CAST(doc_id AS BIGINT) AS doc_id, text,
         regexp_split_to_array(trim(text), '\\s+') AS w
  FROM documents),
sh AS (
  SELECT doc_id, text,
    list_distinct(list_transform(generate_series(1, greatest(len(w) - 4, 1)),
                                 i -> array_to_string(list_slice(w, i, i + 4), ' '))) AS s
  FROM base)
SELECT doc_id,
  md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS content_md5,
  list_aggregate(list_transform(s, x -> md5(x)), 'min') AS min_shingle_md5
FROM sh
"""


def q_pii_scrub(spark, sf):
    return text_analysis.pii_scrub(_t(spark, sf, "documents"))


def _oracle_pii() -> str:
    from dataingestion_spark.operators.text_analysis import PII_PATTERNS

    scrubbed = "text"
    count_exprs = []
    for name, pat, repl in PII_PATTERNS:
        esc = pat.replace("'", "''")  # SQL literals keep backslashes as-is
        count_exprs.append(
            f"CAST(len(regexp_extract_all({scrubbed}, '{esc}')) AS INT) AS n_{name}"
        )
        scrubbed = f"regexp_replace({scrubbed}, '{esc}', '{repl}', 'g')"
    return f"""
SELECT CAST(doc_id AS BIGINT) AS doc_id, {scrubbed} AS text_scrubbed,
  {", ".join(count_exprs)}
FROM documents
"""


def q_repetition_signals(spark, sf):
    """Gopher-style repetition quality signals (operators/text_analysis.py
    ::repetition_signals): duplicate-line ratios + most-frequent n-gram
    share per document — the standard boilerplate/keyword-stuffing filter
    inputs. All map-side-combinable aggregates; no text in any shuffle."""
    from dataingestion_spark.operators.text_analysis import repetition_signals

    return repetition_signals(_t(spark, sf, "documents"))


ORACLE_REPETITION = """
WITH lc AS (
  SELECT doc_id, l, COUNT(*) AS c, len(l) AS chars FROM (
    SELECT CAST(doc_id AS BIGINT) AS doc_id,
           unnest(string_split(text, chr(10))) AS l
    FROM documents) WHERE trim(l) <> '' GROUP BY 1, 2),
line_sig AS (
  SELECT doc_id,
    round(SUM(CASE WHEN c > 1 THEN c ELSE 0 END) / CAST(SUM(c) AS DOUBLE), 6)
      AS dup_line_ratio,
    round(SUM(CASE WHEN c > 1 THEN c * chars ELSE 0 END)
          / CAST(SUM(c * chars) AS DOUBLE), 6) AS dup_line_char_ratio
  FROM lc GROUP BY 1),
w AS (SELECT CAST(doc_id AS BIGINT) AS doc_id,
             regexp_split_to_array(trim(text), '\\s+') AS w FROM documents),
g2c AS (
  SELECT doc_id, g, COUNT(*) AS c FROM (
    SELECT doc_id,
      unnest(list_transform(generate_series(1, greatest(len(w) - 1, 1)),
                            i -> array_to_string(list_slice(w, i, i + 1), ' '))) AS g
    FROM w) GROUP BY 1, 2),
g2 AS (SELECT doc_id, round(MAX(c) / CAST(SUM(c) AS DOUBLE), 6)
                      AS top_2gram_ratio FROM g2c GROUP BY 1),
g3c AS (
  SELECT doc_id, g, COUNT(*) AS c FROM (
    SELECT doc_id,
      unnest(list_transform(generate_series(1, greatest(len(w) - 2, 1)),
                            i -> array_to_string(list_slice(w, i, i + 2), ' '))) AS g
    FROM w) GROUP BY 1, 2),
g3 AS (SELECT doc_id, round(MAX(c) / CAST(SUM(c) AS DOUBLE), 6)
                      AS top_3gram_ratio FROM g3c GROUP BY 1)
SELECT doc_id, dup_line_ratio, dup_line_char_ratio, top_2gram_ratio, top_3gram_ratio
FROM line_sig JOIN g2 USING (doc_id) JOIN g3 USING (doc_id)
"""


def q_hash_split(spark, sf):
    """Deterministic train/valid/test assignment by md5-derived uniform
    (operators/sharding.py): reproducible on any cluster size, stable under
    appends — unlike randomSplit. Counts per split oracle-check exactly."""
    from dataingestion_spark.operators.sharding import hash_split

    return (
        hash_split(_t(spark, sf, "documents"))
        .groupBy("split")
        .agg(F.count("*").alias("n_docs"), F.sum("n_chars").alias("n_chars_total"))
    )


def _oracle_hash_split() -> str:
    from dataingestion_spark.operators.sharding import hash_split_sql

    return f"""
SELECT {hash_split_sql("doc_id")} AS split,
       COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS n_chars_total
FROM documents GROUP BY 1
"""


def q_assign_shards(spark, sf):
    """Fixed-token-budget shard assignment: exclusive running sum over the
    doc_id order DIV budget — the pure-window form a shard writer consumes,
    executed as a distributed range-partitioned sort."""
    from dataingestion_spark.operators.sharding import assign_shards

    docs = _t(spark, sf, "documents").select("doc_id", "n_chars")
    return (
        assign_shards(docs, "n_chars", budget=50000)
        .groupBy("shard_id")
        .agg(F.count("*").alias("n_docs"), F.sum("n_chars").alias("n_chars_total"))
    )


ORACLE_SHARDS = """
SELECT CAST(FLOOR(prior / 50000) AS BIGINT) AS shard_id,
       COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS n_chars_total
FROM (
  SELECT n_chars,
    COALESCE(SUM(n_chars) OVER (ORDER BY doc_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prior
  FROM documents) t
GROUP BY 1
"""


def q_stratified_sample(spark, sf):
    """Per-stratum document sampling (operators/sampling.py): at most 8
    docs per source, chosen by md5 order — reproducible across engines and
    cluster sizes, per-stratum stable under appends to other strata."""
    from dataingestion_spark.operators.sampling import stratified_sample

    return stratified_sample(_t(spark, sf, "documents"), "source", 8).select(
        "doc_id", "source", "sample_rank"
    )


def _oracle_stratified() -> str:
    from dataingestion_spark.operators.sampling import stratified_sample_sql

    return (
        "SELECT doc_id, source, sample_rank FROM ("
        + stratified_sample_sql("documents", "source", 8, cols="doc_id, source")
        + ")"
    )


def q_mixture_sample(spark, sf):
    """Domain mixing to per-source token budgets (operators/sampling.py):
    docs taken in md5 order until the exclusive running char sum crosses
    the source's budget (fixed-offset packing, same rule as assign_shards).
    src0/src1 get tight budgets; everything else a default."""
    from dataingestion_spark.operators.sampling import mixture_sample

    docs = _t(spark, sf, "documents").select("doc_id", "source", "n_chars")
    return mixture_sample(
        docs, "source", "n_chars", {"src0": 4000, "src1": 1}, default_budget=20000
    ).select("doc_id", "source", "tokens_before")


def q_temperature_mixture(spark, sf):
    """Temperature-based domain mixing (sampling.temperature_mixture_sample,
    alpha=0.5 → sampling temperature T=2): per-source budgets ∝ sqrt of the
    source's token total over a 6000-char corpus budget — the multilingual
    up/down-sampling rule, one knob instead of hand-written budgets. sqrt
    is IEEE-exact and the weight sum folds in sorted-source order, so the
    budgets (and therefore the kept set) are oracle-checked bit-for-bit."""
    from dataingestion_spark.operators.sampling import temperature_mixture_sample

    docs = _t(spark, sf, "documents").select("doc_id", "source", "n_chars")
    return temperature_mixture_sample(
        docs, "source", "n_chars", total_tokens=6000, alpha=0.5
    ).select("doc_id", "source", "tokens_before")


def _oracle_temperature_mixture() -> str:
    from dataingestion_spark.operators.sampling import temperature_mixture_sql

    return temperature_mixture_sql(
        "documents", "source", "n_chars", total_tokens=6000, alpha=0.5,
        cols="doc_id, source",
    )


def _oracle_mixture() -> str:
    from dataingestion_spark.operators.sampling import mixture_sample_sql

    return (
        "SELECT doc_id, source, tokens_before FROM ("
        + mixture_sample_sql(
            "documents", "source", "n_chars", {"src0": 4000, "src1": 1},
            default_budget=20000, cols="doc_id, source",
        )
        + ")"
    )


def q_upsample_epochs(spark, sf):
    """Fractional-epoch upsampling (operators/sampling.py): ⌊w⌋ copies
    per doc plus a deterministic md5-Bernoulli extra — expected count w,
    realized count a pure function of (salt, id). Shuffle-free explode."""
    from dataingestion_spark.operators.sampling import upsample_by_epochs

    docs = _t(spark, sf, "documents").select("doc_id", "source")
    return upsample_by_epochs(
        docs, "source", {"src0": 3.2, "src1": 0.5, "src2": 0.0},
        default_epochs=1.25,
    ).select("doc_id", "source", "copy")


def _oracle_upsample() -> str:
    from dataingestion_spark.operators.sampling import upsample_by_epochs_sql

    return upsample_by_epochs_sql(
        "documents", "source", {"src0": 3.2, "src1": 0.5, "src2": 0.0},
        default_epochs=1.25, cols="doc_id, source",
    )


def q_pack_sequences(spark, sf):
    """Document-boundary greedy packing into 4096-token training
    sequences, shard-parallel (operators/packing.py). Chars stand in for
    tokens (deterministic; swap in token_count upstream for real runs)."""
    from dataingestion_spark.operators.packing import pack_sequences

    docs = _t(spark, sf, "documents").select("doc_id", "n_chars").withColumn(
        "shard_id", F.col("doc_id") % 8
    )
    return pack_sequences(docs, "n_chars", 4096, "shard_id").select(
        "doc_id", "shard_id", "seq_in_shard", "offset_in_seq"
    )


def _oracle_pack() -> str:
    from dataingestion_spark.operators.packing import pack_sequences_sql

    return (
        "SELECT doc_id, shard_id, seq_in_shard, offset_in_seq FROM ("
        + pack_sequences_sql("documents", "n_chars", 4096, "doc_id % 8",
                             "doc_id", "doc_id")
        + ")"
    )


def q_concat_spans(spark, sf):
    """GPT-style concat-and-chunk placement (operators/packing.py): each
    doc's sequence span is closed-form in its exclusive global prefix sum
    — one range shuffle for the whole corpus."""
    from dataingestion_spark.operators.packing import concat_chunk_spans

    docs = _t(spark, sf, "documents").select("doc_id", "n_chars")
    return concat_chunk_spans(docs, "n_chars", 4096).select(
        "doc_id", "seq_first", "seq_last", "n_seqs", "offset_in_first"
    )


ORACLE_CONCAT_SPANS = """
SELECT doc_id, CAST(floor(p / 4096) AS BIGINT) AS seq_first,
       CAST(floor((p + greatest(t - 1, 0)) / 4096) AS BIGINT) AS seq_last,
       CAST(floor((p + greatest(t - 1, 0)) / 4096) - floor(p / 4096) + 1 AS BIGINT) AS n_seqs,
       CAST(p % 4096 AS BIGINT) AS offset_in_first
FROM (SELECT doc_id, CAST(n_chars AS BIGINT) AS t,
             COALESCE(SUM(CAST(n_chars AS BIGINT)) OVER (
               ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS p
      FROM documents)
"""


def q_topk_quantized(spark, sf):
    """Brute-force top-k over int8-quantized embeddings
    (operators/similarity.py): integer dot + one float op per pair, 4×
    less scan/shuffle bandwidth than float vectors at equal shape."""
    from dataingestion_spark.operators import similarity

    e = _t(spark, sf, "embeddings")
    queries = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    out = similarity.topk_cosine_quantized(e, queries, k=10)
    return out.select(
        "query_id", "rank", "vec_id", F.round("score", 6).alias("score_r")
    )


ORACLE_TOPK_QUANTIZED = """
WITH qz AS (
  SELECT vec_id, list_transform(embedding, x ->
           CASE WHEN amax <> 0
                THEN CAST(floor(CAST(x AS DOUBLE) * 127.0 / amax + 0.5) AS INT)
                ELSE 0 END) AS qv
  FROM (SELECT vec_id, embedding,
               list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) AS amax
        FROM embeddings)
),
q AS (SELECT vec_id AS query_id, qv FROM qz WHERE vec_id < 5),
s AS (
  SELECT q.query_id, e.vec_id,
    list_reduce(list_transform(list_zip(e.qv, q.qv),
                               s -> CAST(s[1]*s[2] AS BIGINT)), (x,y)->x+y) AS idot,
    list_reduce(list_transform(e.qv, x -> CAST(x*x AS BIGINT)), (x,y)->x+y)
      * list_reduce(list_transform(q.qv, x -> CAST(x*x AS BIGINT)), (x,y)->x+y) AS nd
  FROM qz e CROSS JOIN q
)
SELECT query_id, CAST(rank AS INT) AS rank, vec_id, round(score, 6) AS score_r FROM (
  SELECT query_id, vec_id,
    CASE WHEN nd <> 0 THEN CAST(idot AS DOUBLE) / sqrt(CAST(nd AS DOUBLE)) ELSE 0.0 END AS score,
    row_number() OVER (PARTITION BY query_id ORDER BY
      CASE WHEN nd <> 0 THEN CAST(idot AS DOUBLE) / sqrt(CAST(nd AS DOUBLE)) ELSE 0.0 END DESC,
      vec_id) AS rank
  FROM s) WHERE rank <= 10
"""


def q_topk_ann(spark, sf):
    """LSH-bucketed ANN top-k (operators/similarity.py::topk_cosine_ann):
    exact cosine ranking restricted to the query's random-hyperplane
    bucket. Deterministic md5-derived planes make even the RECALL TRADE
    oracle-checkable — the SQL mirror recomputes the same buckets."""
    from dataingestion_spark.operators import similarity

    e = _t(spark, sf, "embeddings")
    queries = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    out = similarity.topk_cosine_ann(e, queries, k=10, dim=64, planes=8)
    return out.select(
        "query_id", "rank", "vec_id", F.round("score", 6).alias("score_r")
    )


def _oracle_topk_ann() -> str:
    from dataingestion_spark.operators.similarity import hyperplane_bucket_sql

    b = hyperplane_bucket_sql("embedding", dim=64, planes=8)
    return f"""
WITH eb AS (SELECT vec_id, embedding, {b} AS bucket FROM embeddings),
q AS (SELECT vec_id AS query_id, embedding AS qv, bucket FROM eb WHERE vec_id < 5),
s AS (
  SELECT q.query_id, e.vec_id,
         {_COS_SQL.format(a="e.embedding", b="q.qv")} AS score
  FROM eb e JOIN q ON e.bucket = q.bucket)
SELECT query_id, CAST(rank AS INT) AS rank, vec_id, round(score, 6) AS score_r FROM (
  SELECT query_id, vec_id, score,
         row_number() OVER (PARTITION BY query_id ORDER BY score DESC, vec_id) AS rank
  FROM s) WHERE rank <= 10
"""


def q_topk_ivf(spark, sf):
    """IVF ANN top-k (operators/similarity.py::topk_cosine_ivf) with the
    deterministic stride-sampled centroids (no Lloyd iterations), so the
    ENTIRE inverted-file path — assignment, probe selection, in-list
    ranking — is oracle-checked in SQL. n_probe=2 of 8 lists."""
    from dataingestion_spark.operators import similarity

    e = _t(spark, sf, "embeddings")
    queries = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    out = similarity.topk_cosine_ivf(e, queries, k=10, n_centroids=8, n_probe=2)
    return out.select(
        "query_id", "rank", "vec_id", F.round("score", 6).alias("score_r")
    )


def _oracle_topk_ivf() -> str:
    cos = _COS_SQL
    return f"""
WITH cents AS (
  SELECT rn AS centroid_id, embedding AS cvec FROM (
    SELECT embedding, row_number() OVER (ORDER BY vec_id) AS rn,
           GREATEST(1, (SELECT COUNT(*) FROM embeddings) // 8) AS stride
    FROM embeddings)
  WHERE (rn - 1) % stride = 0 ORDER BY rn LIMIT 8
),
assigned AS (
  SELECT vec_id, embedding, centroid_id FROM (
    SELECT e.vec_id, e.embedding, c.centroid_id,
           row_number() OVER (PARTITION BY e.vec_id ORDER BY
             {cos.format(a="e.embedding", b="c.cvec")} DESC, c.centroid_id) AS crk
    FROM embeddings e CROSS JOIN cents c)
  WHERE crk = 1
),
probes AS (
  SELECT query_id, qv, centroid_id FROM (
    SELECT q.vec_id AS query_id, q.embedding AS qv, c.centroid_id,
           row_number() OVER (PARTITION BY q.vec_id ORDER BY
             {cos.format(a="q.embedding", b="c.cvec")} DESC, c.centroid_id) AS crk
    FROM embeddings q CROSS JOIN cents c WHERE q.vec_id < 5)
  WHERE crk <= 2
),
s AS (
  SELECT p.query_id, a.vec_id,
         {cos.format(a="a.embedding", b="p.qv")} AS score
  FROM assigned a JOIN probes p ON a.centroid_id = p.centroid_id
)
SELECT query_id, CAST(rank AS INT) AS rank, vec_id, round(score, 6) AS score_r FROM (
  SELECT query_id, vec_id, score,
         row_number() OVER (PARTITION BY query_id ORDER BY score DESC, vec_id) AS rank
  FROM s) WHERE rank <= 10
"""


_PQ_M, _PQ_K, _PQ_SUB = 8, 16, 8          # m subspaces x k codewords, sub dims each
_PQ_NPROBE, _PQ_NCENT = 4, 16


def _pq_d2_tree(a, b, j):
    """((t1+t2)+(t3+t4))+((t5+t6)+(t7+t8)) — numpy's 8-way unrolled
    pairwise combination for an 8-element sum (encode side)."""
    t = [f"((CAST({a}[{j}*{_PQ_SUB}+{d+1}] AS DOUBLE) - CAST({b}[{j}*{_PQ_SUB}+{d+1}] AS DOUBLE)) * (CAST({a}[{j}*{_PQ_SUB}+{d+1}] AS DOUBLE) - CAST({b}[{j}*{_PQ_SUB}+{d+1}] AS DOUBLE)))" for d in range(_PQ_SUB)]
    return (f"((({t[0]} + {t[1]}) + ({t[2]} + {t[3]})) + "
            f"(({t[4]} + {t[5]}) + ({t[6]} + {t[7]})))")


def _pq_d2_chain(a, b, j):
    """strictly left-assoc fold — matches _adc_lut_df's sequential
    accumulation (query-LUT side)."""
    t = [f"((CAST({a}[{j}*{_PQ_SUB}+{d+1}] AS DOUBLE) - CAST({b}[{j}*{_PQ_SUB}+{d+1}] AS DOUBLE)) * (CAST({a}[{j}*{_PQ_SUB}+{d+1}] AS DOUBLE) - CAST({b}[{j}*{_PQ_SUB}+{d+1}] AS DOUBLE)))" for d in range(_PQ_SUB)]
    out = t[0]
    for x in t[1:]:
        out = f"({out} + {x})"
    return out


def _pq_common_ctes():
    return f"""samp AS MATERIALIZED (
  SELECT embedding, row_number() OVER (ORDER BY vec_id) AS rn
  FROM (SELECT * FROM embeddings ORDER BY vec_id LIMIT 100000)),
cw AS MATERIALIZED (
  SELECT CAST((rn - 1) // s AS INTEGER) AS c, embedding FROM samp,
    (SELECT GREATEST(1, (SELECT COUNT(*) FROM samp) // {_PQ_K}) AS s)
  WHERE (rn - 1) % s = 0 AND (rn - 1) // s < {_PQ_K}),
subs AS (SELECT CAST(unnest(range(0, {_PQ_M})) AS INTEGER) AS j),
codes AS MATERIALIZED (
  SELECT vec_id, j, c AS code FROM (
    SELECT e.vec_id, s.j, cw.c,
      row_number() OVER (PARTITION BY e.vec_id, s.j
        ORDER BY {_pq_d2_tree('e.embedding', 'cw.embedding', 's.j')} ASC, cw.c ASC) AS rk
    FROM embeddings e, subs s, cw) WHERE rk = 1),
qlut AS MATERIALIZED (
  SELECT q.vec_id AS query_id, s.j, cw.c,
         {_pq_d2_chain('q.embedding', 'cw.embedding', 's.j')} AS d2
  FROM embeddings q, subs s, cw WHERE q.vec_id < 5)"""


def _pq_score_total():
    total = "l0.d2"
    for j in range(1, _PQ_M):
        total = f"({total} + l{j}.d2)"
    return total


def _pq_code_joins(anchor):
    return " ".join(
        f"JOIN (SELECT vec_id, code FROM codes WHERE j = {j}) c{j} "
        f"ON c{j}.vec_id = {anchor}.vec_id" for j in range(_PQ_M))


def _pq_lut_joins(qref):
    return " ".join(
        f"JOIN qlut l{j} ON l{j}.query_id = {qref}.query_id AND l{j}.j = {j} "
        f"AND l{j}.c = c{j}.code" for j in range(_PQ_M))


def _oracle_topk_pq():
    return f"""WITH {_pq_common_ctes()},
base AS (SELECT DISTINCT vec_id FROM codes),
s AS (
  SELECT q.query_id, base.vec_id, -({_pq_score_total()}) AS score
  FROM base
  {_pq_code_joins('base')}
  CROSS JOIN (SELECT DISTINCT query_id FROM qlut) q
  {_pq_lut_joins('q')})
SELECT query_id, CAST(rank AS INT) AS rank, vec_id,
  round(score, 6) + 0.0 AS score_r FROM (
  SELECT query_id, vec_id, score,
    row_number() OVER (PARTITION BY query_id ORDER BY score DESC, vec_id) AS rank
  FROM s) WHERE rank <= 10"""


def _oracle_topk_pq_rerank(cos_sql, candidates=100):
    return f"""WITH {_pq_common_ctes()},
base AS (SELECT DISTINCT vec_id FROM codes),
s AS (
  SELECT q.query_id, base.vec_id, -({_pq_score_total()}) AS adc
  FROM base
  {_pq_code_joins('base')}
  CROSS JOIN (SELECT DISTINCT query_id FROM qlut) q
  {_pq_lut_joins('q')}),
shortlist AS (
  SELECT query_id, vec_id FROM (
    SELECT query_id, vec_id,
      row_number() OVER (PARTITION BY query_id ORDER BY adc DESC, vec_id) AS ark
    FROM s) WHERE ark <= {candidates}),
rer AS (
  SELECT sl.query_id, sl.vec_id,
    {cos_sql.format(a='qe.embedding', b='ce.embedding')} AS score
  FROM shortlist sl
  JOIN embeddings ce ON ce.vec_id = sl.vec_id
  JOIN embeddings qe ON qe.vec_id = sl.query_id)
SELECT query_id, CAST(rank AS INT) AS rank, vec_id,
  round(score, 6) + 0.0 AS score_r FROM (
  SELECT query_id, vec_id, score,
    row_number() OVER (PARTITION BY query_id ORDER BY score DESC, vec_id) AS rank
  FROM rer) WHERE rank <= 10"""


def _oracle_topk_ivf_pq(cos_sql):
    return f"""WITH {_pq_common_ctes()},
cents AS MATERIALIZED (
  SELECT CAST((rn - 1) // s AS INTEGER) + 1 AS centroid_id, embedding AS cvec
  FROM samp, (SELECT GREATEST(1, (SELECT COUNT(*) FROM samp) // {_PQ_NCENT}) AS s)
  WHERE (rn - 1) % s = 0 AND (rn - 1) // s < {_PQ_NCENT}),
assigned AS MATERIALIZED (
  SELECT vec_id, centroid_id FROM (
    SELECT e.vec_id, c.centroid_id,
      row_number() OVER (PARTITION BY e.vec_id ORDER BY
        {cos_sql.format(a='e.embedding', b='c.cvec')} DESC, c.centroid_id) AS crk
    FROM embeddings e CROSS JOIN cents c) WHERE crk = 1),
probes AS MATERIALIZED (
  SELECT query_id, centroid_id FROM (
    SELECT q.vec_id AS query_id, c.centroid_id,
      row_number() OVER (PARTITION BY q.vec_id ORDER BY
        {cos_sql.format(a='q.embedding', b='c.cvec')} DESC, c.centroid_id) AS crk
    FROM embeddings q CROSS JOIN cents c WHERE q.vec_id < 5) WHERE crk <= {_PQ_NPROBE}),
s AS (
  SELECT p.query_id, a.vec_id, -({_pq_score_total()}) AS score
  FROM assigned a
  JOIN probes p ON a.centroid_id = p.centroid_id
  {_pq_code_joins('a')}
  {_pq_lut_joins('p')})
SELECT query_id, CAST(rank AS INT) AS rank, vec_id,
  round(score, 6) + 0.0 AS score_r FROM (
  SELECT query_id, vec_id, score,
    row_number() OVER (PARTITION BY query_id ORDER BY score DESC, vec_id) AS rank
  FROM s) WHERE rank <= 10"""


def q_topk_pq(spark, sf):
    """Product-quantization ANN (operators/pq.py): m=8 × k=16 STRIDE
    codebooks (iters=0 — every ⌈n/k⌉-th subvector of the id-ordered
    sample, which makes the whole encode + ADC path SQL-expressible),
    numpy-batched encode, asymmetric-distance top-k. Fully oracled:
    the SQL mirrors numpy's exact 8-way pairwise summation tree for
    encode distances and the LUT's sequential fold, so codes and scores
    are bit-identical (Lloyd-trained codebooks are exercised by the
    recall tests and tests/test_vector_index.py). The billion-vector
    memory layout: 8 bytes/vector at scoring time."""
    from dataingestion_spark.operators.pq import pq_encode, pq_train, topk_pq_adc

    e = _t(spark, sf, "embeddings")
    books = pq_train(e, m=8, k=16, iters=0, init="stride")
    # encode only the columns ADC needs — the Arrow roundtrip through the
    # Python encoder shouldn't carry payload columns it just passes through
    enc = pq_encode(e.select("vec_id", "embedding"), books)
    queries = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    out = topk_pq_adc(enc, books, queries, k=10)
    # + 0.0 normalizes IEEE signed zero (-0.0 → +0.0) so the driver's
    # value hash agrees with the DuckDB oracle (which does the same)
    return out.select(
        "query_id", "rank", "vec_id",
        (F.round("score", 6) + F.lit(0.0)).alias("score_r"),
    )


def q_topk_pq_rerank(spark, sf):
    """Two-stage PQ serving (operators/pq.py::topk_pq_rerank): ADC over
    m-byte codes shortlists 100 candidates per query, exact cosine
    re-ranks only the shortlist — the standard production ANN shape,
    measured in SCALE.md to lift the m=8,k=16 ADC recall ceiling
    (0.23) to 0.63 at C=100 / 0.90 at C=400. Stride codebooks make
    both stages SQL-expressible; the whole shortlist→join→re-rank chain
    is restated in the oracle."""
    from dataingestion_spark.operators.pq import (
        pq_encode, pq_train, topk_pq_rerank,
    )

    e = _t(spark, sf, "embeddings")
    books = pq_train(e, m=8, k=16, iters=0, init="stride")
    enc = pq_encode(e.select("vec_id", "embedding"), books)
    queries = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    out = topk_pq_rerank(enc, books, queries, e, k=10, candidates=100)
    # + 0.0 normalizes IEEE signed zero (-0.0 → +0.0) — see q_topk_pq
    return out.select(
        "query_id", "rank", "vec_id",
        (F.round("score", 6) + F.lit(0.0)).alias("score_r"),
    )


def q_topk_ivf_pq(spark, sf):
    """IVF-PQ composition (operators/pq.py::topk_ivf_pq): coarse inverted
    lists bound WHAT each query scans (n_probe/n_centroids of the corpus),
    PQ codes bound what each candidate COSTS (m bytes + m LUT lookups) —
    the Faiss-style billion-vector layout. Stride centroids + stride
    codebooks (iters=0) make assignment, probing, encode, and ADC all
    SQL-expressible — fully oracled end to end (_oracle_topk_ivf_pq);
    Lloyd training is covered by the recall tests."""
    from dataingestion_spark.operators.pq import pq_train, topk_ivf_pq

    e = _t(spark, sf, "embeddings")
    n = e.count()
    srows = e.orderBy("vec_id").limit(100_000).collect()
    # stride over the CAPPED sample (len(srows)), not the full count —
    # n > 100k would otherwise index past the sample (and diverge from
    # the oracle, whose stride is computed over the same capped CTE)
    stride = max(1, len(srows) // 16)
    cents = [(i + 1, list(srows[i * stride]["embedding"]))
             for i in range(min(16, len(srows)))]
    books = pq_train(e, m=8, k=16, iters=0, init="stride")
    queries = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    out = topk_ivf_pq(e, queries, k=10, n_centroids=16, n_probe=4,
                      m=8, k_codes=16, iters=0, centroids=cents,
                      codebooks=books)
    # + 0.0 normalizes IEEE signed zero (-0.0 → +0.0) — see q_topk_pq
    return out.select(
        "query_id", "rank", "vec_id",
        (F.round("score", 6) + F.lit(0.0)).alias("score_r"),
    )


def q_topk_ivfpq_persisted(spark, sf):
    """Persisted IVF-PQ (sinks/vector_index.py::build_ivfpq_index /
    search_ivfpq_index): the on-disk Faiss-IVFADC layout — inverted
    lists partitioned by centroid_id whose rows carry m-byte PQ codes,
    so a query physically reads ~n_probe/C of the corpus AND never
    touches a float vector (ReadSchema is (vec_id, pq_code);
    plan-asserted in tests). Stride centroids + stride codebooks make
    the whole build+serve path SQL-expressible: same oracle as the
    in-memory search_topk_ivf_pq, which this must agree with exactly."""
    import tempfile

    from dataingestion_spark.operators.pq import pq_train
    from dataingestion_spark.sinks.vector_index import (
        build_ivfpq_index, search_ivfpq_index,
    )

    e = _t(spark, sf, "embeddings")
    srows = e.orderBy("vec_id").limit(100_000).collect()
    stride = max(1, len(srows) // 16)
    cents = [(i + 1, list(srows[i * stride]["embedding"]))
             for i in range(min(16, len(srows)))]
    books = pq_train(e, m=8, k=16, iters=0, init="stride")
    path = tempfile.mkdtemp(prefix="ivfpq_idx_") + "/idx"
    build_ivfpq_index(e, path, centroids=cents, codebooks=books)
    queries = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    out = search_ivfpq_index(spark, path, queries, k=10, n_probe=4)
    # + 0.0 normalizes IEEE signed zero (-0.0 → +0.0) — see q_topk_pq
    return out.select(
        "query_id", "rank", "vec_id",
        (F.round("score", 6) + F.lit(0.0)).alias("score_r"),
    )


def q_c4_filters(spark, sf):
    """C4-style web-scrape cleaning signals + keep decision
    (operators/text_analysis.py::c4_signals): terminal-punctuation line
    ratio, short-line ratio, lorem-ipsum/brace tells, sentence count.
    Pure projection — scan-speed at any scale."""
    from dataingestion_spark.operators.text_analysis import c4_signals

    out = c4_signals(_t(spark, sf, "documents"))
    return out.withColumn("n_sentences", F.col("n_sentences").cast("int"))


def _oracle_c4() -> str:
    from dataingestion_spark.operators.text_analysis import c4_signals_sql

    return (
        "SELECT doc_id, punct_line_ratio, short_line_ratio, has_lorem_ipsum,"
        " has_brace, CAST(n_sentences AS INT) AS n_sentences, c4_keep FROM ("
        + c4_signals_sql("documents") + ")"
    )


def q_gopher_filters(spark, sf):
    """Gopher-style quality rules (operators/text_analysis.py::
    gopher_signals): word-count/word-length bands, alpha-word ratio,
    bullet/ellipsis line ratios, symbol density, composite keep."""
    from dataingestion_spark.operators.text_analysis import gopher_signals

    return gopher_signals(_t(spark, sf, "documents"))


def _oracle_gopher() -> str:
    from dataingestion_spark.operators.text_analysis import gopher_signals_sql

    return gopher_signals_sql("documents")


def q_curation_funnel(spark, sf):
    """End-to-end training-data curation funnel (dataingestion_spark/
    curation.py): lang filter → quality filter → exact dedup → near-dup
    cluster dedup, reporting (stage, docs_kept, words_kept). Every keep
    decision is MIN-id deterministic, so the whole funnel oracle-checks."""
    from dataingestion_spark.curation import curation_funnel

    return curation_funnel(_t(spark, sf, "documents"))


def _oracle_funnel() -> str:
    mins = ", ".join(_minhash_sql(j) for j in range(16))
    return f"""
WITH RECURSIVE
lq AS (
  SELECT d_.doc_id, d_.text, l.detected_lang, q.quality, q.n_words
  FROM (SELECT CAST(doc_id AS BIGINT) AS doc_id, text FROM documents) d_
  JOIN ({_oracle_lang_id()}) l ON d_.doc_id = l.doc_id
  JOIN ({ORACLE_QUALITY}) q ON d_.doc_id = q.doc_id),
s1 AS (SELECT * FROM lq WHERE detected_lang IN ('en')),
s2 AS (SELECT * FROM s1 WHERE quality >= 0.5 AND n_words >= 5),
ex AS (
  SELECT md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS h,
         MIN(doc_id) AS canon
  FROM s2 GROUP BY 1),
s3 AS (
  SELECT s2.* FROM s2 JOIN ex
    ON md5(trim(regexp_replace(lower(s2.text), '\\s+', ' ', 'g'))) = ex.h
   AND s2.doc_id = ex.canon),
sh AS (
  SELECT doc_id,
    list_distinct(list_transform(generate_series(1, greatest(len(w) - 2, 1)),
                                 i -> array_to_string(list_slice(w, i, i + 2), ' '))) AS s
  FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS w FROM s3)),
sig AS (SELECT doc_id, [{mins}] AS sig FROM sh),
bands AS (
  SELECT doc_id, b, md5(array_to_string(list_slice(sig, b*4 + 1, b*4 + 4), '|')) AS bk
  FROM sig, (SELECT unnest([0,1,2,3]) AS b)),
pairs AS (
  SELECT a.doc_id AS id_a, c.doc_id AS id_b
  FROM bands a JOIN bands c ON a.b = c.b AND a.bk = c.bk AND a.doc_id < c.doc_id
  GROUP BY 1, 2),
edges AS (SELECT id_a AS u, id_b AS v FROM pairs
          UNION SELECT id_b AS u, id_a AS v FROM pairs),
reach(u, v) AS (
  SELECT u, v FROM edges
  UNION
  SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u),
canon4 AS (SELECT u AS doc_id, LEAST(u, MIN(v)) AS canonical_id FROM reach GROUP BY u),
s4 AS (
  SELECT s3.* FROM s3 LEFT JOIN canon4 c ON s3.doc_id = c.doc_id
  WHERE c.doc_id IS NULL OR c.canonical_id = s3.doc_id)
SELECT '0_input' AS stage, COUNT(*) AS docs_kept,
       CAST(COALESCE(SUM(n_words), 0) AS BIGINT) AS words_kept FROM lq
UNION ALL SELECT '1_lang', COUNT(*), CAST(COALESCE(SUM(n_words), 0) AS BIGINT) FROM s1
UNION ALL SELECT '2_quality', COUNT(*), CAST(COALESCE(SUM(n_words), 0) AS BIGINT) FROM s2
UNION ALL SELECT '3_exact_dedup', COUNT(*), CAST(COALESCE(SUM(n_words), 0) AS BIGINT) FROM s3
UNION ALL SELECT '4_neardup', COUNT(*), CAST(COALESCE(SUM(n_words), 0) AS BIGINT) FROM s4
"""


def q_dedup_exact(spark, sf):
    return dedup.exact_dedup(_t(spark, sf, "documents"))


ORACLE_DEDUP_EXACT = """
WITH h AS (
  SELECT CAST(doc_id AS BIGINT) AS doc_id,
         md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS content_hash
  FROM documents),
g AS (SELECT content_hash, MIN(doc_id) AS canonical_id, COUNT(*) AS group_size
      FROM h GROUP BY content_hash)
SELECT h.doc_id, g.canonical_id, g.group_size, h.content_hash
FROM h JOIN g USING (content_hash)
"""


_SHINGLE_SQL = """
  SELECT CAST(doc_id AS BIGINT) AS doc_id,
    list_distinct(list_transform(generate_series(1, greatest(len(w) - 2, 1)),
                                 i -> array_to_string(list_slice(w, i, i + 2), ' '))) AS s
  FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS w FROM documents)
"""


def q_minhash_signature(spark, sf):
    sigs = dedup.minhash_signature(_t(spark, sf, "documents"), num_hashes=8)
    return sigs.select(
        "doc_id", *[F.col("signature")[j].alias(f"h{j}") for j in range(8)]
    )


def _minhash_sql(j: int) -> str:
    """SQL form of minhash family j — must mirror dedup.minhash_signature:
    8-hex-char slice of md5((j div 4) || ':' || shingle)."""
    g, off = j // 4, 8 * (j % 4) + 1
    return f"list_aggregate(list_transform(s, x -> substr(md5(concat('{g}:', x)), {off}, 8)), 'min')"


def _oracle_minhash_signature() -> str:
    mins = ", ".join(f"{_minhash_sql(j)} AS h{j}" for j in range(8))
    return f"WITH sh AS ({_SHINGLE_SQL}) SELECT doc_id, {mins} FROM sh"


def q_minhash_lsh_pairs(spark, sf):
    return dedup.minhash_lsh_pairs(
        _t(spark, sf, "documents"), num_hashes=16, bands=4
    )


def _oracle_minhash_pairs() -> str:
    mins = ", ".join(_minhash_sql(j) for j in range(16))
    return f"""
WITH sh AS ({_SHINGLE_SQL}),
sig AS (SELECT doc_id, [{mins}] AS sig FROM sh),
bands AS (
  SELECT doc_id, b, md5(array_to_string(list_slice(sig, b*4 + 1, b*4 + 4), '|')) AS bk
  FROM sig, (SELECT unnest([0,1,2,3]) AS b))
SELECT a.doc_id AS id_a, c.doc_id AS id_b
FROM bands a JOIN bands c ON a.b = c.b AND a.bk = c.bk AND a.doc_id < c.doc_id
GROUP BY 1, 2
"""


def q_dedup_clusters(spark, sf):
    """Near-dup clusters: MinHash-LSH pairs → connected components (iterative
    min-label propagation, one shuffle per round) → canonical id per doc.
    The oracle recomputes the same pairs and closes them with a recursive
    CTE — pinning the distributed iteration against a transitive closure."""
    return dedup.neardup_clusters(_t(spark, sf, "documents"), num_hashes=16, bands=4)


def _oracle_cluster() -> str:
    return f"""
WITH RECURSIVE pairs AS ({_oracle_minhash_pairs()}),
edges AS (SELECT id_a AS u, id_b AS v FROM pairs
          UNION SELECT id_b AS u, id_a AS v FROM pairs),
reach(u, v) AS (
  SELECT u, v FROM edges
  UNION
  SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u)
SELECT u AS doc_id, LEAST(u, MIN(v)) AS canonical_id FROM reach GROUP BY u
"""


def q_sketch_quantiles(spark, sf):
    """Histogram quantile sketch over l_extendedprice — the mergeable
    fixed-size alternative to exact percentiles (shuffle ≤ nbins rows
    whatever the input size). Same IEEE interpolation both engines."""
    from dataingestion_spark.operators import sketches

    return sketches.histogram_quantiles(
        _t(spark, sf, "lineitem"), "l_extendedprice",
        lo=0.0, hi=110000.0, nbins=220,
    )


def _oracle_hist_quantiles() -> str:
    from dataingestion_spark.operators import sketches

    return sketches.histogram_quantiles_oracle_sql(
        "lineitem", "l_extendedprice", lo=0.0, hi=110000.0, nbins=220
    )


def q_sketch_hll_users(spark, sf):
    """Deterministic HyperLogLog distinct-users per event type (md5 bucket +
    rank, expression-only — sketches.py). The estimate is bit-exact across
    engines: the harmonic sum adds only powers of two, so no float
    order-dependence survives."""
    from dataingestion_spark.operators import sketches

    return sketches.hll_distinct(_events(spark, sf), "user_id", ["event_type"])


def _oracle_hll() -> str:
    from dataingestion_spark.operators import sketches

    return sketches.hll_oracle_sql("events", "user_id", ["event_type"])


def q_sketch_hll_merged(spark, sf):
    """Sketch MERGEABILITY under the oracle (sketches.py::hll_registers /
    hll_merge): per-event_type register tables folded to a GLOBAL
    estimate by max-per-bucket — bit-exactly equal to sketching all
    users directly, so the ungrouped direct-sketch oracle pins the merge
    path. This is the daily-registers→monthly-rollup shape that makes
    sketches useful at 100 TB."""
    from dataingestion_spark.operators import sketches

    regs = sketches.hll_registers(_events(spark, sf), "user_id",
                                  ["event_type"])
    return sketches.hll_merge(regs)


def _oracle_hll_merged() -> str:
    from dataingestion_spark.operators import sketches

    return sketches.hll_oracle_sql("events", "user_id")


def q_cm_heavy_hitters(spark, sf):
    """Count-min heavy hitters (sketches.cm_sketch / cm_estimate): users
    with an estimated event count ≥ 75 from a depth-4 × 4096 sketch — the
    fixed-size alternative to an exact groupBy when the key space is
    huge. Sketch build shuffles (row, col) int cells with map-side
    combine; estimation broadcasts the ≤ 16k-row sketch. Deterministic
    (md5-sliced columns, integer counters) so the estimate itself —
    including any collision overestimates — is oracle-checked."""
    from dataingestion_spark.operators import sketches

    ev = _events(spark, sf).select("user_id")
    sk = sketches.cm_sketch(ev, "user_id")
    est = sketches.cm_estimate(sk, ev.distinct(), "user_id")
    return est.filter(F.col("cm_estimate") >= 75)


def _oracle_cm() -> str:
    from dataingestion_spark.operators import sketches

    inner = sketches.cm_oracle_sql(
        "SELECT user_id FROM events",
        "SELECT DISTINCT user_id FROM events",
        value_col="user_id",
    )
    return f"SELECT user_id, cm_estimate FROM ({inner}) WHERE cm_estimate >= 75"


def q_bloom_membership(spark, sf):
    """Bloom-filter membership (sketches.bloom_build / bloom_might_contain):
    a 65536-bit / 4-hash filter over one nation's customer keys probed with
    every ordering customer, reported as the (bloom_maybe, actual)
    confusion counts — the false-positive trade itself is the oracle-checked
    result. The filter is ≤ m int rows broadcast to probe tasks; the probe
    side never shuffles more than (key, bit)."""
    from dataingestion_spark.operators import sketches

    cust = _t(spark, sf, "customer")
    nation = _t(spark, sf, "nation")
    orders = _t(spark, sf, "orders")
    members = (
        cust.join(nation, cust.c_nationkey == nation.n_nationkey)
        .filter(F.col("n_name") == "NATION_7")
        .select(F.col("c_custkey").alias("k"))
    )
    bloom = sketches.bloom_build(members, "k")
    probes = orders.select(F.col("o_custkey").alias("k")).distinct()
    maybe = sketches.bloom_might_contain(bloom, probes, "k")
    actual = probes.join(
        members.withColumn("_in", F.lit(1)), "k", "left"
    ).select("k", F.col("_in").isNotNull().alias("actual"))
    return (
        maybe.join(actual, "k")
        .groupBy("bloom_maybe")
        .agg(
            F.sum(F.when(F.col("actual"), 1).otherwise(0)).alias("n_true"),
            F.sum(F.when(F.col("actual"), 0).otherwise(1)).alias("n_false"),
        )
    )


ORACLE_BLOOM = """
WITH members AS (
  SELECT c_custkey AS k FROM customer
  JOIN nation ON c_nationkey = n_nationkey WHERE n_name = 'NATION_7'),
bits AS (
  SELECT DISTINCT
    (instr('0123456789abcdef', substr(h, 1 + j*4, 1)) - 1) * 4096
    + (instr('0123456789abcdef', substr(h, 2 + j*4, 1)) - 1) * 256
    + (instr('0123456789abcdef', substr(h, 3 + j*4, 1)) - 1) * 16
    + (instr('0123456789abcdef', substr(h, 4 + j*4, 1)) - 1) AS bit
  FROM (SELECT md5(CAST(k AS VARCHAR)) AS h FROM members),
       (SELECT unnest(generate_series(0, 3)) AS j)),
probes AS (SELECT DISTINCT o_custkey AS k FROM orders),
probe_bits AS (
  SELECT k,
    (instr('0123456789abcdef', substr(h, 1 + j*4, 1)) - 1) * 4096
    + (instr('0123456789abcdef', substr(h, 2 + j*4, 1)) - 1) * 256
    + (instr('0123456789abcdef', substr(h, 3 + j*4, 1)) - 1) * 16
    + (instr('0123456789abcdef', substr(h, 4 + j*4, 1)) - 1) AS bit
  FROM (SELECT k, md5(CAST(k AS VARCHAR)) AS h FROM probes),
       (SELECT unnest(generate_series(0, 3)) AS j)),
maybe AS (
  SELECT pb.k, (SUM(CASE WHEN bits.bit IS NULL THEN 0 ELSE 1 END) = 4) AS bloom_maybe
  FROM probe_bits pb LEFT JOIN bits USING (bit) GROUP BY pb.k),
actual AS (
  SELECT p.k, (m.k IS NOT NULL) AS actual
  FROM probes p LEFT JOIN (SELECT DISTINCT k FROM members) m USING (k))
SELECT bloom_maybe,
  CAST(SUM(CASE WHEN actual THEN 1 ELSE 0 END) AS BIGINT) AS n_true,
  CAST(SUM(CASE WHEN actual THEN 0 ELSE 1 END) AS BIGINT) AS n_false
FROM maybe JOIN actual USING (k) GROUP BY bloom_maybe
"""


def q_ngram_jaccard(spark, sf):
    pairs = dedup.ngram_jaccard_pairs(
        _t(spark, sf, "documents"), threshold=0.2, num_hashes=16, bands=4
    )
    return pairs.select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))


def _oracle_jaccard() -> str:
    return f"""
WITH sh AS ({_SHINGLE_SQL}),
sig AS (SELECT doc_id,
  [{", ".join(_minhash_sql(j) for j in range(16))}] AS sig,
  s FROM sh),
bands AS (
  SELECT doc_id, b, md5(array_to_string(list_slice(sig, b*4 + 1, b*4 + 4), '|')) AS bk
  FROM sig, (SELECT unnest([0,1,2,3]) AS b)),
cand AS (
  SELECT a.doc_id AS id_a, c.doc_id AS id_b
  FROM bands a JOIN bands c ON a.b = c.b AND a.bk = c.bk AND a.doc_id < c.doc_id
  GROUP BY 1, 2)
SELECT id_a, id_b,
  round(CAST(len(list_intersect(x.s, y.s)) AS DOUBLE)
        / (len(x.s) + len(y.s) - len(list_intersect(x.s, y.s))), 6) AS jaccard
FROM cand JOIN sh x ON cand.id_a = x.doc_id JOIN sh y ON cand.id_b = y.doc_id
WHERE CAST(len(list_intersect(x.s, y.s)) AS DOUBLE)
      / (len(x.s) + len(y.s) - len(list_intersect(x.s, y.s))) >= 0.2
"""


def q_cross_doc_shingles(spark, sf):
    return dedup.cross_doc_shingle_stats(_t(spark, sf, "documents"), shingle_n=5)


ORACLE_CROSS_DOC = """
WITH sh AS (
  SELECT CAST(doc_id AS BIGINT) AS doc_id, unnest(s) AS sh FROM (
    SELECT doc_id,
      list_distinct(list_transform(generate_series(1, greatest(len(w) - 4, 1)),
                                   i -> array_to_string(list_slice(w, i, i + 4), ' '))) AS s
    FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS w FROM documents))),
g AS (SELECT sh, COUNT(DISTINCT doc_id) AS n_docs FROM sh GROUP BY sh)
SELECT doc_id, CAST(COUNT(*) AS INT) AS n_shingles,
  CAST(SUM(CASE WHEN g.n_docs > 1 THEN 1 ELSE 0 END) AS INT) AS n_shared,
  round(CAST(SUM(CASE WHEN g.n_docs > 1 THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*), 6) AS shared_ratio
FROM sh JOIN g USING (sh) GROUP BY doc_id
"""


def q_span_removal(spark, sf):
    """Exact-substring span removal (dedup.remove_duplicate_spans): every
    4-word span occurring ≥2 times corpus-wide is cut from ALL documents —
    the distributed approximation of Lee et al. 2022's suffix-array
    ExactSubstr dedup. Text never shuffles: the count groupBy carries md5
    hashes, covered positions are int sets, and the cleaned text is rebuilt
    in place by an index-aware array filter on the document row."""
    return dedup.remove_duplicate_spans(
        _t(spark, sf, "documents"), span_words=4, min_count=2
    )


ORACLE_SPAN_REMOVAL = """
WITH w AS (SELECT CAST(doc_id AS BIGINT) AS doc_id,
                  regexp_split_to_array(trim(text), '\\s+') AS w FROM documents),
occ AS (
  SELECT doc_id, i - 1 AS start,
         md5(array_to_string(list_slice(w, i, i + 3), ' ')) AS gh
  FROM (SELECT doc_id, w,
               unnest(generate_series(1, greatest(len(w) - 3, 1))) AS i FROM w)),
dup AS (SELECT gh FROM occ GROUP BY gh HAVING COUNT(*) >= 2),
cov AS (SELECT DISTINCT doc_id, start + o AS pos
        FROM (SELECT occ.doc_id, occ.start FROM occ JOIN dup USING (gh)),
             (SELECT unnest(generate_series(0, 3)) AS o)),
words AS (SELECT doc_id, unnest(w) AS word,
                 generate_subscripts(w, 1) - 1 AS pos FROM w),
kept AS (SELECT words.doc_id, word, pos FROM words ANTI JOIN cov USING (doc_id, pos)),
agg AS (SELECT doc_id, string_agg(word, ' ' ORDER BY pos) AS clean_text,
               COUNT(*) AS n_kept FROM kept GROUP BY doc_id)
SELECT w.doc_id, coalesce(agg.clean_text, '') AS clean_text,
  CAST(len(w.w) AS INT) AS n_words,
  CAST(len(w.w) - coalesce(agg.n_kept, 0) AS INT) AS n_removed,
  CAST(len(w.w) - coalesce(agg.n_kept, 0) AS DOUBLE) / len(w.w) AS dup_ratio
FROM w LEFT JOIN agg USING (doc_id)
"""


def q_contamination(spark, sf):
    """Benchmark decontamination (operators/dedup.py::contamination_check):
    corpus docs sharing >= 2 distinct word 3-gram shingles with a held-out
    'benchmark' slice (doc_id % 97 == 0). The benchmark side broadcasts —
    the corpus is never shuffled on text. (Real decontamination uses 8-13
    grams; the synthetic corpus only collides at n=3.)"""
    docs = _t(spark, sf, "documents")
    bench = docs.filter(F.col("doc_id") % 97 == 0)
    corpus = docs.filter(F.col("doc_id") % 97 != 0)
    return dedup.contamination_check(
        corpus, bench, shingle_n=3, min_overlap=2
    ).select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("bench_id").cast("long").alias("bench_id"),
        "n_overlap",
    )


ORACLE_CONTAMINATION = """
WITH sh AS (
  SELECT CAST(doc_id AS BIGINT) AS doc_id, unnest(s) AS sh FROM (
    SELECT doc_id,
      list_distinct(list_transform(generate_series(1, greatest(len(w) - 2, 1)),
                                   i -> array_to_string(list_slice(w, i, i + 2), ' '))) AS s
    FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS w FROM documents)))
SELECT c.doc_id AS doc_id, b.doc_id AS bench_id, CAST(COUNT(*) AS INT) AS n_overlap
FROM (SELECT * FROM sh WHERE doc_id % 97 <> 0) c
JOIN (SELECT * FROM sh WHERE doc_id % 97 = 0) b USING (sh)
GROUP BY 1, 2 HAVING COUNT(*) >= 2
"""


def q_simhash(spark, sf):
    return dedup.simhash(_t(spark, sf, "documents"), bits=32)


def q_minhash_fast_pairs(spark, sf):
    """xxhash64 MinHash-LSH (dedup.minhash_lsh_pairs_fast) — the
    throughput twin of dedup_minhash_lsh_pairs, restated as an ORACLED
    invariant (r6/r7/r8 ask): the corpus is doubled with exact clones
    (doc_id + 10_000_000, same text), the fast banding proposes
    candidates, and exact n-gram Jaccard keeps pairs at jaccard = 1.0.
    Recall is PROVABLE, not statistical: jaccard 1 ⇔ identical shingle
    sets ⇒ identical xxhash64 signatures ⇒ identical band keys ⇒
    candidate — so the output equals the full-truth jaccard-1 pair set,
    which DuckDB computes with no banding at all. The engine-specific
    seed layout never reaches the output; a broken fast signature,
    banding join, or verify drops clone pairs and goes red. Throughput
    of the fast family is still measured by bench.py (minhash_fast)."""
    docs = _t(spark, sf, "documents").select(
        F.col("doc_id").cast("long").alias("doc_id"), "text")
    doubled = docs.unionByName(
        docs.select((F.col("doc_id") + 10_000_000).alias("doc_id"), "text"))
    cands = dedup.minhash_lsh_pairs_fast(doubled)
    verified = dedup.ngram_jaccard_pairs(doubled, threshold=1.0,
                                         candidates=cands)
    return verified.select(
        F.col("id_a").cast("long").alias("id_a"),
        F.col("id_b").cast("long").alias("id_b"),
        F.round("jaccard", 6).alias("jaccard"))


ORACLE_MINHASH_FAST = r"""
WITH d AS (
  SELECT CAST(doc_id AS BIGINT) AS doc_id, text FROM documents
  UNION ALL
  SELECT CAST(doc_id AS BIGINT) + 10000000, text FROM documents),
sh AS (
  SELECT doc_id,
    md5(array_to_string(list_sort(list_distinct(
      list_transform(generate_series(1, greatest(len(w) - 2, 1)),
                     i -> array_to_string(list_slice(w, i, i + 2), ' ')))),
      chr(1))) AS sig
  FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w FROM d))
SELECT a.doc_id AS id_a, b.doc_id AS id_b, CAST(1.0 AS DOUBLE) AS jaccard
FROM sh a JOIN sh b ON a.sig = b.sig AND a.doc_id < b.doc_id
"""


def q_simhash_fast(spark, sf):
    """xxhash64 SimHash twin of dedup_simhash, restated as an ORACLED
    order-invariance check (r6/r7/r8 ask): each document is paired with
    a WORD-REVERSED clone (doc_id + 10_000_000). SimHash is a pure
    function of the word-count multiset, so fast-simhash(text) and
    fast-simhash(reversed text) must agree bit-for-bit — the output is
    the per-pair Hamming distance, provably 0, which DuckDB restates in
    closed form. The engine-specific xxhash64 values cancel out of the
    output; any impurity or order-dependence in the vote/bit pipeline
    makes hamming > 0 and goes red."""
    docs = _t(spark, sf, "documents").select(
        F.col("doc_id").cast("long").alias("doc_id"), "text")
    rev = docs.select(
        (F.col("doc_id") + 10_000_000).alias("doc_id"),
        F.array_join(
            F.reverse(F.split(F.trim(F.col("text")), r"\s+")), " "
        ).alias("text"))
    sh = dedup.simhash_fast(docs.unionByName(rev), bits=32)
    a = sh.filter(F.col("doc_id") < 10_000_000).alias("a")
    b = sh.filter(F.col("doc_id") >= 10_000_000).alias("b")
    return (
        a.join(b, F.col("a.doc_id") + 10_000_000 == F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("id_a"),
            F.col("b.doc_id").alias("id_b"),
            F.bit_count(
                F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
            ).alias("hamming"))
    )


ORACLE_SIMHASH_FAST = """
SELECT CAST(doc_id AS BIGINT) AS id_a,
       CAST(doc_id AS BIGINT) + 10000000 AS id_b,
       0 AS hamming
FROM documents
"""


def _oracle_simhash() -> str:
    terms = []
    for p in range(32):
        digit = f"(strpos('0123456789abcdef', substring(md5(w), {p // 4 + 1}, 1)) - 1)"
        bit = f"(({digit} >> {3 - p % 4}) & 1)"
        terms.append(
            f"CASE WHEN SUM(cnt * ({bit} * 2 - 1)) > 0 THEN CAST({2 ** p} AS BIGINT) ELSE 0 END"
        )
    total = " + ".join(terms)
    return f"""
WITH words AS (
  SELECT CAST(doc_id AS BIGINT) AS doc_id,
         unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS w
  FROM documents),
counted AS (SELECT doc_id, w, COUNT(*) AS cnt FROM words GROUP BY doc_id, w)
SELECT doc_id, CAST({total} AS BIGINT) AS simhash FROM counted GROUP BY doc_id
"""


# ---------------------------------------------------------------------------
# C. similarity search
# ---------------------------------------------------------------------------

_COS_SQL = """(
  list_reduce(list_transform(list_zip({a}, {b}), p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)), (x, y) -> x + y)
  / (sqrt(list_reduce(list_transform({a}, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (x, y) -> x + y))
     * sqrt(list_reduce(list_transform({b}, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (x, y) -> x + y)))
)"""


def q_emb_topk(spark, sf):
    e = _t(spark, sf, "embeddings")
    queries = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    out = similarity.topk_cosine(e, queries, k=10)
    return out.select(
        "query_id", "rank", "vec_id", F.round("score", 6).alias("score_r")
    )


ORACLE_EMB_TOPK = f"""
WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 5),
s AS (
  SELECT q.query_id, e.vec_id,
         {_COS_SQL.format(a="e.embedding", b="q.qv")} AS score
  FROM embeddings e CROSS JOIN q)
SELECT query_id, CAST(rank AS INT) AS rank, vec_id, round(score, 6) AS score_r FROM (
  SELECT query_id, vec_id, score,
         row_number() OVER (PARTITION BY query_id ORDER BY score DESC, vec_id) AS rank
  FROM s) WHERE rank <= 10
"""


def q_recall_ivf(spark, sf):
    """Retrieval evaluation (operators/similarity.py::recall_at_k):
    per-query recall@10 of the IVF path (8 stride centroids, n_probe=2)
    against the exact ranking — the operational metric for every ANN
    trade. The oracle recomputes BOTH rankings in SQL and joins them, so
    even the evaluation harness is hash-checked."""
    from dataingestion_spark.operators.similarity import recall_at_k

    e = _t(spark, sf, "embeddings")
    queries = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    exact = similarity.topk_cosine(e, queries, k=10)
    approx = similarity.topk_cosine_ivf(e, queries, k=10,
                                        n_centroids=8, n_probe=2)
    return recall_at_k(exact, approx, 10)


def q_recall_matryoshka(spark, sf):
    """Matryoshka truncation evaluation (Kusupati et al. 2022): recall@10
    of cosine retrieval on the FIRST HALF of the embedding dims against
    the full-dim exact ranking — the question every MRL deployment asks
    before cutting its vector storage in half. Pure composition of
    slice + the exact top-k + recall_at_k; both rankings re-derived in
    SQL by the oracle."""
    from dataingestion_spark.operators.similarity import recall_at_k

    e = _t(spark, sf, "embeddings")
    half = F.slice("embedding", 1, 32)
    e_half = e.select("vec_id", half.alias("embedding"))
    queries = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec"))
    q_half = e_half.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec"))
    exact = similarity.topk_cosine(e, queries, k=10)
    trunc = similarity.topk_cosine(e_half, q_half, k=10)
    return recall_at_k(exact, trunc, 10)


def q_search_eval_ndcg_mrr(spark, sf):
    """Ranking-quality evaluation (operators/similarity.py::ndcg_at_k +
    mrr_at_k): exact cosine top-10 for 5 query vectors scored against
    deterministic graded judgments (doc relevant to query q iff
    vec_id % 37 == q, grade 1 + vec_id % 3 — the self-match is always
    judged, so every query has a hit). Returns per-query
    dcg/idcg/ndcg@10 and first_rank/rr@10 side by side; the oracle
    recomputes the ranking, the ideal ranking, and both metrics in SQL
    (exponential-gain DCG, trec_eval drop-unjudged semantics)."""
    from dataingestion_spark.operators.similarity import mrr_at_k, ndcg_at_k

    e = _t(spark, sf, "embeddings")
    queries = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    results = similarity.topk_cosine(e, queries, k=10)
    rel = (
        e.select("vec_id").crossJoin(
            queries.select("query_id"))
        .filter(F.col("vec_id") % 37 == F.col("query_id"))
        .select("query_id", "vec_id",
                (F.lit(1) + F.col("vec_id") % 3).cast("double").alias("rel"))
    )
    nd = ndcg_at_k(results, rel, 10)
    rr = mrr_at_k(results, rel, 10)
    return nd.join(rr, "query_id").select(
        "query_id", "dcg", "idcg", "ndcg",
        F.col("first_rank").cast("int").alias("first_rank"), "rr")


ORACLE_NDCG_MRR = f"""
WITH q AS (SELECT vec_id AS query_id, embedding AS qv
           FROM embeddings WHERE vec_id < 5),
res AS (
  SELECT query_id, vec_id, rank FROM (
    SELECT q.query_id, e.vec_id,
           row_number() OVER (PARTITION BY q.query_id
                              ORDER BY {{cos}} DESC, e.vec_id) AS rank
    FROM embeddings e CROSS JOIN q)
  WHERE rank <= 10),
rel AS (
  SELECT q.query_id, e.vec_id,
         CAST(1 + e.vec_id % 3 AS DOUBLE) AS rel
  FROM embeddings e CROSS JOIN (SELECT query_id FROM q) q
  WHERE e.vec_id % 37 = q.query_id),
dcg AS (
  SELECT r.query_id,
         SUM((pow(2.0, rel) - 1) / log2(r.rank + 1.0)) AS dcg
  FROM res r JOIN rel USING (query_id, vec_id) GROUP BY 1),
ideal AS (
  SELECT query_id, SUM((pow(2.0, rel) - 1) / log2(irank + 1.0)) AS idcg
  FROM (SELECT query_id, rel,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY rel DESC, vec_id) AS irank
        FROM rel)
  WHERE irank <= 10 GROUP BY 1),
firsts AS (
  SELECT r.query_id, MIN(r.rank) AS first_rank
  FROM res r JOIN (SELECT DISTINCT query_id, vec_id FROM rel) j
       USING (query_id, vec_id)
  GROUP BY 1)
SELECT i.query_id,
       COALESCE(round(d.dcg, 6) + 0.0, 0.0) AS dcg,
       round(i.idcg, 6) + 0.0 AS idcg,
       CASE WHEN i.idcg > 0
            THEN round(COALESCE(d.dcg, 0.0) / i.idcg, 6) + 0.0
            ELSE 0.0 END AS ndcg,
       CAST(f.first_rank AS INT) AS first_rank,
       COALESCE(round(1.0 / f.first_rank, 6) + 0.0, 0.0) AS rr
FROM ideal i
LEFT JOIN dcg d USING (query_id)
LEFT JOIN firsts f USING (query_id)
""".replace("{cos}", _COS_SQL.format(a="e.embedding", b="q.qv"))


def _oracle_recall_matryoshka() -> str:
    def ranking(vec_a: str, vec_b: str, name: str) -> str:
        return f"""
{name} AS (
  SELECT query_id, vec_id FROM (
    SELECT q.query_id, e.vec_id,
           row_number() OVER (PARTITION BY q.query_id
                              ORDER BY {_COS_SQL.format(a=vec_a, b=vec_b)} DESC,
                                       e.vec_id) AS rank
    FROM embeddings e
    CROSS JOIN (SELECT vec_id AS query_id, embedding AS qv
                FROM embeddings WHERE vec_id < 5) q)
  WHERE rank <= 10)"""

    ex = ranking("e.embedding", "q.qv", "ex")
    tr = ranking("list_slice(e.embedding, 1, 32)", "list_slice(q.qv, 1, 32)", "tr")
    return f"""
WITH {ex}, {tr},
tot AS (SELECT query_id, CAST(COUNT(*) AS BIGINT) AS n_exact FROM ex GROUP BY 1),
hit AS (SELECT ex.query_id, CAST(COUNT(*) AS BIGINT) AS n_hit
        FROM ex JOIN tr ON ex.query_id = tr.query_id AND ex.vec_id = tr.vec_id
        GROUP BY 1)
SELECT t.query_id, t.n_exact, COALESCE(h.n_hit, 0) AS n_hit,
       CAST(COALESCE(h.n_hit, 0) AS DOUBLE) / LEAST(10, t.n_exact) AS recall
FROM tot t LEFT JOIN hit h USING (query_id)
"""


def _oracle_recall_ivf() -> str:
    return f"""
WITH exact AS (SELECT * FROM ({ORACLE_EMB_TOPK})),
approx AS (SELECT * FROM ({_oracle_topk_ivf()})),
tot AS (SELECT query_id, COUNT(*) AS n_exact FROM exact GROUP BY 1),
hit AS (
  SELECT e.query_id, COUNT(*) AS n_hit
  FROM exact e JOIN approx a
    ON e.query_id = a.query_id AND e.vec_id = a.vec_id
  GROUP BY 1)
SELECT t.query_id, t.n_exact,
       CAST(COALESCE(h.n_hit, 0) AS BIGINT) AS n_hit,
       CAST(COALESCE(h.n_hit, 0) AS BIGINT)
         / LEAST(10, t.n_exact) AS recall
FROM tot t LEFT JOIN hit h ON t.query_id = h.query_id
"""


def q_emb_topk_filtered(spark, sf):
    e = _t(spark, sf, "embeddings")
    queries = e.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    out = similarity.topk_cosine(e, queries, k=5, filter_expr=F.col("label") == 3)
    return out.select(
        "query_id", "rank", "vec_id", F.round("score", 6).alias("score_r")
    )


ORACLE_EMB_TOPK_FILTERED = f"""
WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 3),
s AS (
  SELECT q.query_id, e.vec_id,
         {_COS_SQL.format(a="e.embedding", b="q.qv")} AS score
  FROM embeddings e CROSS JOIN q WHERE e.label = 3)
SELECT query_id, CAST(rank AS INT) AS rank, vec_id, round(score, 6) AS score_r FROM (
  SELECT query_id, vec_id, score,
         row_number() OVER (PARTITION BY query_id ORDER BY score DESC, vec_id) AS rank
  FROM s) WHERE rank <= 5
"""


_BM25_QUERIES = [(0, "join hash row"), (1, "customer filter small"),
                 (2, "slow scan batch")]


def _bm25_queries_df(spark):
    return spark.createDataFrame(_BM25_QUERIES, "query_id long, query_text string")


def q_bm25(spark, sf):
    """BM25 keyword top-10 (text_search.bm25_topk): postings via one
    explode+groupBy, document frequencies computed only for the broadcast
    query-term set, per-doc score as a sorted-term float fold (ln verified
    bit-identical vs libm) — the lexical half of hybrid retrieval."""
    from dataingestion_spark.operators import text_search

    out = text_search.bm25_topk(
        _t(spark, sf, "documents"), _bm25_queries_df(spark), k=10
    )
    return out.select(
        "query_id", "rank", "doc_id", F.round("score", 6).alias("score_r")
    )


def _bm25_sql(k: int) -> str:
    """DuckDB BM25 with the exact expression tree of text_search.bm25_topk
    (k1=1.2, b=0.75; every literal CAST to DOUBLE; sorted-term fold)."""
    vals = ", ".join(f"(CAST({q} AS BIGINT), '{t}')" for q, t in _BM25_QUERIES)
    return f"""
WITH q(query_id, qtext) AS (VALUES {vals}),
qt AS (SELECT query_id, unnest(list_distinct(string_split_regex(trim(qtext), '\\s+'))) AS term FROM q),
w AS (SELECT CAST(doc_id AS BIGINT) AS doc_id,
             regexp_split_to_array(trim(text), '\\s+') AS w FROM documents),
dl AS (SELECT doc_id, len(w) AS dl FROM w),
stats AS (SELECT COUNT(*) AS n_docs, SUM(dl) AS sum_dl FROM dl),
tfs AS (SELECT doc_id, unnest(w) AS term FROM w),
tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM tfs GROUP BY 1, 2),
rel AS (SELECT tf.* FROM tf JOIN (SELECT DISTINCT term FROM qt) USING (term)),
dfreq AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM rel GROUP BY 1),
scored AS (
  SELECT qt.query_id, rel.doc_id, rel.term,
    ln(CAST(1.0 AS DOUBLE) + (n_docs - df + CAST(0.5 AS DOUBLE)) / (df + CAST(0.5 AS DOUBLE)))
    * ((rel.tf * CAST(2.2 AS DOUBLE))
       / (rel.tf + CAST(1.2 AS DOUBLE)
          * (CAST(0.25 AS DOUBLE) + CAST(0.75 AS DOUBLE)
             * (dl.dl / (CAST(sum_dl AS DOUBLE) / n_docs))))) AS s
  FROM rel JOIN qt USING (term) JOIN dfreq USING (term) JOIN dl USING (doc_id), stats),
agg AS (SELECT query_id, doc_id,
               list_reduce(list(s ORDER BY term), (a, b) -> a + b) AS score
        FROM scored GROUP BY 1, 2),
bm AS (SELECT query_id, CAST(rank AS INT) AS rank, doc_id, score FROM (
  SELECT query_id, doc_id, score,
    row_number() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id) AS rank
  FROM agg) WHERE rank <= {k})
"""


ORACLE_BM25 = (
    _bm25_sql(10)
    + "SELECT query_id, rank, doc_id, round(score, 6) AS score_r FROM bm"
)


def q_hybrid_rrf(spark, sf):
    """Hybrid retrieval: BM25 top-20 over documents fused with cosine
    top-20 over embeddings by reciprocal-rank fusion
    (text_search.rrf_fuse, k0=60). The fused score is a fixed two-term
    expression — deterministic with no aggregation-order caveats — so the
    whole hybrid ranking is oracle-checked end to end."""
    from dataingestion_spark.operators import text_search

    bm = text_search.bm25_topk(
        _t(spark, sf, "documents"), _bm25_queries_df(spark), k=20
    )
    e = _t(spark, sf, "embeddings")
    qv = e.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    cos = similarity.topk_cosine(e, qv, k=20).select(
        "query_id", F.col("vec_id").alias("doc_id"), "rank"
    )
    fused = text_search.rrf_fuse(bm, cos, k=10)
    return fused.select(
        "query_id", "rank", "doc_id", F.round("rrf_score", 9).alias("rrf_r")
    )


ORACLE_HYBRID_RRF = (
    _bm25_sql(20)
    + f""",
qv AS (SELECT vec_id AS query_id, embedding AS qvec FROM embeddings WHERE vec_id < 3),
cs_s AS (
  SELECT qv.query_id, e.vec_id AS doc_id,
         {_COS_SQL.format(a="e.embedding", b="qv.qvec")} AS score
  FROM embeddings e CROSS JOIN qv),
cs AS (SELECT query_id, doc_id, CAST(rank AS INT) AS rank FROM (
  SELECT query_id, doc_id,
    row_number() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id) AS rank
  FROM cs_s) WHERE rank <= 20),
fused AS (
  SELECT coalesce(bm.query_id, cs.query_id) AS query_id,
         coalesce(bm.doc_id, cs.doc_id) AS doc_id,
         coalesce(CAST(1.0 AS DOUBLE) / (60 + bm.rank), CAST(0.0 AS DOUBLE))
         + coalesce(CAST(1.0 AS DOUBLE) / (60 + cs.rank), CAST(0.0 AS DOUBLE)) AS rrf_score
  FROM bm FULL JOIN cs ON bm.query_id = cs.query_id AND bm.doc_id = cs.doc_id)
SELECT query_id, CAST(rank AS INT) AS rank, doc_id, round(rrf_score, 9) AS rrf_r FROM (
  SELECT query_id, doc_id, rrf_score,
    row_number() OVER (PARTITION BY query_id ORDER BY rrf_score DESC, doc_id) AS rank
  FROM fused) WHERE rank <= 10
"""
)


def q_emb_neardup(spark, sf):
    return dedup.embedding_neardup_pairs(
        _t(spark, sf, "embeddings"), threshold=0.43
    ).select("id_a", "id_b")


ORACLE_EMB_NEARDUP = f"""
SELECT a.vec_id AS id_a, b.vec_id AS id_b
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE {_COS_SQL.format(a="a.embedding", b="b.embedding")} >= 0.43
"""


def q_semantic_dedup(spark, sf):
    """SemDeDup (operators/dedup.py::semantic_dedup; Abbas et al. 2023):
    stride-centroid clustering bounds the quadratic near-dup search to
    within-cluster blocks; min-id member of each duplicate chain survives.
    Centroids are the RAW stride vectors (ids 1..8) so the assignment
    expression is bit-identical to the SQL oracle's."""
    e = _t(spark, sf, "embeddings")
    n = e.count()
    stride = max(1, n // 8)
    rows = (
        e.withColumn("rn", F.row_number().over(W.orderBy(F.asc("vec_id"))))
        .filter((F.col("rn") - 1) % stride == 0)
        .orderBy("rn").limit(8).select("embedding").collect()
    )
    cents = [(i + 1, [float(x) for x in r[0]]) for i, r in enumerate(rows)]
    out = dedup.semantic_dedup(e, threshold=0.43, centroids=cents)
    return out.select("vec_id", "cluster_id", "keep")


ORACLE_SEMANTIC_DEDUP = f"""
WITH cents AS (
  SELECT row_number() OVER (ORDER BY rn) AS centroid_id, embedding AS cvec FROM (
    SELECT embedding, rn FROM (
      SELECT embedding, row_number() OVER (ORDER BY vec_id) AS rn,
             GREATEST(1, (SELECT COUNT(*) FROM embeddings) // 8) AS stride
      FROM embeddings)
    WHERE (rn - 1) % stride = 0 ORDER BY rn LIMIT 8)),
assigned AS (
  SELECT vec_id, embedding, centroid_id FROM (
    SELECT e.vec_id, e.embedding, c.centroid_id,
           row_number() OVER (PARTITION BY e.vec_id ORDER BY
             {_COS_SQL.format(a="e.embedding", b="c.cvec")} DESC, c.centroid_id) AS crk
    FROM embeddings e CROSS JOIN cents c)
  WHERE crk = 1),
dupb AS (
  SELECT DISTINCT b.vec_id FROM assigned a JOIN assigned b
    ON a.centroid_id = b.centroid_id AND a.vec_id < b.vec_id
  WHERE {_COS_SQL.format(a="a.embedding", b="b.embedding")} >= 0.43)
SELECT a.vec_id, a.centroid_id AS cluster_id, (d.vec_id IS NULL) AS keep
FROM assigned a LEFT JOIN dupb d ON a.vec_id = d.vec_id
"""


_DSIR_TARGET_SOURCES = ("src0", "src1", "src2", "src3", "src4")


def q_dsir_weights(spark, sf):
    """DSIR importance resampling (operators/lm.py::dsir_log_weights;
    Xie et al. 2023): target LM trained on the src0-src4 slice (the
    'trusted' corpus), raw LM on everything; log w = (nll_raw -
    nll_target) * n_bigrams, top-100 selected deterministically. The
    oracle re-derives BOTH models and the ranking in SQL."""
    from dataingestion_spark.operators import lm

    docs = _t(spark, sf, "documents")
    target = lm.train_bigram_lm(docs.filter(F.col("source").isin(*_DSIR_TARGET_SOURCES)))
    raw = lm.train_bigram_lm(docs)
    w = lm.dsir_log_weights(docs, target, raw)
    out = lm.dsir_select(w, n=100)
    return out.select(
        "doc_id", "n_bigrams",
        F.round("log_weight", 6).alias("log_weight_r"), "selected",
    )


def _lm_score_cte(prefix: str, ref_where: str) -> str:
    """LM scoring CTE chain (model from `dg` rows passing ``ref_where``,
    every doc scored) with name-prefix ``prefix`` — shared by the
    perplexity and DSIR oracles. Expects CTEs `dg` (doc bigram counts)
    and `docsrc` (doc_id → source) upstream."""
    p = prefix
    return f"""
{p}ref AS (SELECT w1, w2, CAST(SUM(cnt) AS BIGINT) AS c2
           FROM dg JOIN docsrc USING (doc_id) WHERE {ref_where} GROUP BY 1, 2),
{p}ctx AS (SELECT w1, CAST(SUM(c2) AS BIGINT) AS c1 FROM {p}ref GROUP BY 1),
{p}vocab AS (SELECT COUNT(DISTINCT wd) AS v FROM
             (SELECT w1 AS wd FROM {p}ref UNION ALL SELECT w2 FROM {p}ref)),
{p}sc AS (SELECT dg.doc_id, dg.w1, dg.w2, dg.cnt,
         CAST(dg.cnt AS DOUBLE)
         * ln((CAST(coalesce({p}ref.c2, 0) AS DOUBLE) + CAST(0.5 AS DOUBLE))
              / (CAST(coalesce({p}ctx.c1, 0) AS DOUBLE) + CAST(0.5 AS DOUBLE) * v)) AS s
       FROM dg LEFT JOIN {p}ref USING (w1, w2) LEFT JOIN {p}ctx USING (w1), {p}vocab),
{p}agg AS (SELECT doc_id, CAST(SUM(cnt) AS BIGINT) AS n_bigrams,
               -list_reduce(list(s ORDER BY w1, w2), (a, b) -> a + b) / SUM(cnt) AS nll
        FROM {p}sc GROUP BY doc_id)"""


def _oracle_dsir() -> str:
    srcs = ", ".join(f"'{s}'" for s in _DSIR_TARGET_SOURCES)
    return r"""
WITH w AS (SELECT CAST(doc_id AS BIGINT) AS doc_id,
                  regexp_split_to_array(trim(lower(text)), '\s+') AS w FROM documents),
docsrc AS (SELECT CAST(doc_id AS BIGINT) AS doc_id, source FROM documents),
g0 AS (SELECT doc_id, unnest(list_transform(range(1, len(w)), i -> {'w1': w[i], 'w2': w[i+1]})) AS g FROM w),
g AS (SELECT doc_id, g.w1 AS w1, g.w2 AS w2 FROM g0),
dg AS (SELECT doc_id, w1, w2, COUNT(*) AS cnt FROM g GROUP BY 1, 2, 3),""" + \
        _lm_score_cte("t_", f"source IN ({srcs})") + "," + \
        _lm_score_cte("r_", "TRUE") + """,
joined AS (SELECT t_agg.doc_id, t_agg.n_bigrams,
                  (r_agg.nll - t_agg.nll) * t_agg.n_bigrams AS log_weight
           FROM t_agg JOIN r_agg USING (doc_id)),
ranked AS (SELECT *, row_number() OVER (ORDER BY log_weight DESC, doc_id) AS rk FROM joined)
SELECT doc_id, n_bigrams, round(log_weight, 6) AS log_weight_r, rk <= 100 AS selected
FROM ranked
"""


def q_char_entropy(spark, sf):
    """Character-distribution Shannon entropy (operators/
    text_analysis.py::char_entropy) — gibberish/blob detector. Pure
    expression (no explode/shuffle); sorted-char fold makes the double
    bit-identical to the oracle."""
    return text_analysis.char_entropy(_t(spark, sf, "documents"))


ORACLE_CHAR_ENTROPY = r"""
WITH c AS (SELECT CAST(doc_id AS BIGINT) AS doc_id,
                  list_filter(string_split_regex(text, ''), x -> len(x) > 0) AS cs
           FROM documents),
u AS (SELECT doc_id, cs, len(cs) AS n, list_sort(list_distinct(cs)) AS uniq FROM c)
SELECT doc_id, CAST(n AS INT) AS n_chars, CAST(len(uniq) AS INT) AS n_distinct_chars,
  CASE WHEN n > 0 THEN round(-list_reduce(
    list_transform(uniq, ch ->
      (CAST(len(list_filter(cs, x -> x = ch)) AS DOUBLE) / n)
      * ln(CAST(len(list_filter(cs, x -> x = ch)) AS DOUBLE) / n)),
    (a, b) -> a + b), 6) ELSE 0.0 END AS entropy
FROM u
"""


def q_pagerank_nations(spark, sf):
    """PageRank (operators/graph.py) over the nation trade graph: edge
    c_nation → s_nation for every distinct trading pair in
    lineitem⋈orders⋈customer⋈supplier, 3 damped power iterations with
    the deterministic sorted contribution fold — the ENTIRE iterative
    computation is bit-identical to the oracle's unrolled SQL."""
    from dataingestion_spark.operators.graph import pagerank

    li, o = _t(spark, sf, "lineitem"), _t(spark, sf, "orders")
    # NOT fanned: the edge build is join-dominated, and a round-robin
    # exchange ahead of the join's own hash exchange re-shuffles
    # lineitem for nothing (interleaved A/B at sf0.1: 2.51s plain vs
    # 3.16s fanned, min-of-4 — the r14 "win" was a loaded-host pair)
    c, s = _t(spark, sf, "customer"), _t(spark, sf, "supplier")
    edges = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .filter(F.col("c_nationkey") != F.col("s_nationkey"))
        .select(F.col("c_nationkey").alias("src"), F.col("s_nationkey").alias("dst"))
        .distinct()
    )
    ranks = pagerank(edges, iters=3)
    n = _t(spark, sf, "nation")
    return ranks.join(n, ranks.node == n.n_nationkey).select(
        F.col("n_name").alias("nation"), F.round("rank", 12).alias("rank_r")
    )


def q_ppr_nations(spark, sf):
    """PERSONALIZED PageRank (operators/graph.py::pagerank(seeds=...)):
    teleport mass confined to the EUROPE nations — "how relevant is each
    trading partner to Europe's neighborhood", the crawl-frontier /
    related-items scoring. Same deterministic fold; the oracle unrolls
    the seeded iteration with per-node teleport."""
    from dataingestion_spark.operators.graph import pagerank

    li, o = _t(spark, sf, "lineitem"), _t(spark, sf, "orders")
    # NOT fanned: the edge build is join-dominated, and a round-robin
    # exchange ahead of the join's own hash exchange re-shuffles
    # lineitem for nothing (interleaved A/B at sf0.1: 2.51s plain vs
    # 3.16s fanned, min-of-4 — the r14 "win" was a loaded-host pair)
    c, s = _t(spark, sf, "customer"), _t(spark, sf, "supplier")
    edges = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .filter(F.col("c_nationkey") != F.col("s_nationkey"))
        .select(F.col("c_nationkey").alias("src"), F.col("s_nationkey").alias("dst"))
        .distinct()
    )
    n, r = _t(spark, sf, "nation"), _t(spark, sf, "region")
    seeds = (n.join(r, n.n_regionkey == r.r_regionkey)
             .filter(F.col("r_name") == "EUROPE")
             .select(F.col("n_nationkey").alias("node")))
    ranks = pagerank(edges, iters=3, seeds=seeds)
    return ranks.join(n, ranks.node == n.n_nationkey).select(
        F.col("n_name").alias("nation"), F.round("rank", 12).alias("rank_r")
    )


def _oracle_ppr() -> str:
    it = """
c{i} AS (SELECT e.dst, list_reduce(list(r.rank / e.odeg ORDER BY e.src), (a, b) -> a + b) AS inr
        FROM e JOIN r{p} r ON e.src = r.node GROUP BY e.dst),
r{i} AS (SELECT nodes.node,
               (CASE WHEN nodes.is_seed
                     THEN (CAST(1.0 AS DOUBLE) - CAST(0.85 AS DOUBLE)) / ns
                     ELSE CAST(0.0 AS DOUBLE) END)
               + CAST(0.85 AS DOUBLE) * coalesce(c{i}.inr, CAST(0.0 AS DOUBLE)) AS rank
        FROM nodes CROSS JOIN sn LEFT JOIN c{i} ON nodes.node = c{i}.dst),
"""
    iters = "".join(it.format(i=i, p=i - 1) for i in (1, 2, 3))
    return f"""
WITH e0 AS (SELECT DISTINCT c.c_nationkey AS src, s.s_nationkey AS dst
            FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
            JOIN customer c ON o.o_custkey = c.c_custkey
            JOIN supplier s ON l.l_suppkey = s.s_suppkey
            WHERE c.c_nationkey <> s.s_nationkey),
seeds AS (SELECT n.n_nationkey AS node FROM nation n
          JOIN region r ON n.n_regionkey = r.r_regionkey
          WHERE r.r_name = 'EUROPE'),
nodes AS (SELECT node, EXISTS (SELECT 1 FROM seeds s WHERE s.node = q.node) AS is_seed
          FROM (SELECT DISTINCT node FROM
                (SELECT src AS node FROM e0 UNION ALL SELECT dst FROM e0)) q),
sn AS (SELECT COUNT(*) AS ns FROM seeds),
od AS (SELECT src, COUNT(*) AS odeg FROM e0 GROUP BY src),
e AS (SELECT e0.src, e0.dst, od.odeg FROM e0 JOIN od USING (src)),
r0 AS (SELECT node, CASE WHEN is_seed THEN CAST(1.0 AS DOUBLE) / ns
                         ELSE CAST(0.0 AS DOUBLE) END AS rank
       FROM nodes CROSS JOIN sn),
{iters}
final AS (SELECT node, rank FROM r3)
SELECT n.n_name AS nation, round(f.rank, 12) AS rank_r
FROM final f JOIN nation n ON f.node = n.n_nationkey
"""


def _oracle_pagerank() -> str:
    it = """
c{i} AS (SELECT e.dst, list_reduce(list(r.rank / e.odeg ORDER BY e.src), (a, b) -> a + b) AS inr
        FROM e JOIN r{p} r ON e.src = r.node GROUP BY e.dst),
r{i} AS (SELECT nodes.node,
               ((CAST(1.0 AS DOUBLE) - CAST(0.85 AS DOUBLE)) / n)
               + CAST(0.85 AS DOUBLE) * coalesce(c{i}.inr, CAST(0.0 AS DOUBLE)) AS rank
        FROM nodes CROSS JOIN nn LEFT JOIN c{i} ON nodes.node = c{i}.dst),
"""
    iters = "".join(it.format(i=i, p=i - 1) for i in (1, 2, 3))
    return f"""
WITH e0 AS (SELECT DISTINCT c.c_nationkey AS src, s.s_nationkey AS dst
            FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
            JOIN customer c ON o.o_custkey = c.c_custkey
            JOIN supplier s ON l.l_suppkey = s.s_suppkey
            WHERE c.c_nationkey <> s.s_nationkey),
nodes AS (SELECT DISTINCT node FROM (SELECT src AS node FROM e0 UNION ALL SELECT dst FROM e0)),
nn AS (SELECT COUNT(*) AS n FROM nodes),
od AS (SELECT src, COUNT(*) AS odeg FROM e0 GROUP BY src),
e AS (SELECT e0.src, e0.dst, od.odeg FROM e0 JOIN od USING (src)),
r0 AS (SELECT node, CAST(1.0 AS DOUBLE) / n AS rank FROM nodes CROSS JOIN nn),
{iters}
final AS (SELECT node, rank FROM r3)
SELECT n.n_name AS nation, round(f.rank, 12) AS rank_r
FROM final f JOIN nation n ON f.node = n.n_nationkey
"""


def q_boilerplate_lines(spark, sf):
    """Line-level boilerplate removal (operators/dedup.py::
    remove_boilerplate_lines; the CCNet/RefinedWeb paragraph-dedup pass):
    docs synthesized with a shared cookie-banner line (2 of 3 docs), a
    shared footer line (2 of 3), and a per-doc unique trailer; lines in
    ≥ 3 distinct docs are removed, everything else survives in order.
    The oracle states the expected cleaned text in closed form."""
    docs = _t(spark, sf, "documents")
    m = F.col("doc_id") % 3
    banner = F.lit("accept cookies to continue")
    footer = F.lit("copyright footer")
    nl = F.lit("\n")
    text2 = (
        F.when(m == 0, F.concat(banner, nl, F.col("text"), nl, footer))
        .when(m == 1, F.concat(banner, nl, F.col("text")))
        .otherwise(F.concat(
            F.col("text"), nl, footer, nl,
            F.lit("unique trailer "), F.col("doc_id").cast("string"),
        ))
    )
    out = dedup.remove_boilerplate_lines(
        docs.select("doc_id", text2.alias("text")), min_docs=3
    )
    return out.select("doc_id", "n_lines", "n_removed", "clean_text")


ORACLE_BOILERPLATE = """
SELECT CAST(doc_id AS BIGINT) AS doc_id,
  CASE doc_id % 3 WHEN 1 THEN 2 ELSE 3 END AS n_lines,
  CASE doc_id % 3 WHEN 0 THEN 2 ELSE 1 END AS n_removed,
  CASE doc_id % 3
    WHEN 2 THEN text || chr(10) || 'unique trailer ' || CAST(doc_id AS VARCHAR)
    ELSE text END AS clean_text
FROM documents
"""


def q_lm_perplexity(spark, sf):
    """CCNet-style bigram-LM log-perplexity filter (operators/lm.py;
    Wenzek et al. 2020): model trained on the doc_id %% 10 < 8 slice,
    every document scored by add-k smoothed nats/bigram, keep = below
    the corpus-median 3.39. Train = two groupBy counts; score = gram
    equi-join + sorted deterministic float fold (the BM25 fold shape)."""
    from dataingestion_spark.operators import lm

    docs = _t(spark, sf, "documents")
    model = lm.train_bigram_lm(docs.filter(F.col("doc_id") % 10 < 8))
    out = lm.perplexity_filter(docs, model, threshold=3.39)
    return out.select(
        "doc_id", "n_bigrams", F.round("nll", 6).alias("nll_r"), "keep"
    )


ORACLE_LM_PERPLEXITY = r"""
WITH w AS (SELECT CAST(doc_id AS BIGINT) AS doc_id,
                  regexp_split_to_array(trim(lower(text)), '\s+') AS w FROM documents),
g0 AS (SELECT doc_id, unnest(list_transform(range(1, len(w)), i -> {'w1': w[i], 'w2': w[i+1]})) AS g FROM w),
g AS (SELECT doc_id, g.w1 AS w1, g.w2 AS w2 FROM g0),
dg AS (SELECT doc_id, w1, w2, COUNT(*) AS cnt FROM g GROUP BY 1, 2, 3),
ref AS (SELECT w1, w2, CAST(SUM(cnt) AS BIGINT) AS c2 FROM dg WHERE doc_id % 10 < 8 GROUP BY 1, 2),
ctx AS (SELECT w1, CAST(SUM(c2) AS BIGINT) AS c1 FROM ref GROUP BY 1),
vocab AS (SELECT COUNT(DISTINCT wd) AS v FROM (SELECT w1 AS wd FROM ref UNION ALL SELECT w2 FROM ref)),
sc AS (SELECT dg.doc_id, dg.w1, dg.w2, dg.cnt,
         CAST(dg.cnt AS DOUBLE)
         * ln((CAST(coalesce(ref.c2, 0) AS DOUBLE) + CAST(0.5 AS DOUBLE))
              / (CAST(coalesce(ctx.c1, 0) AS DOUBLE) + CAST(0.5 AS DOUBLE) * v)) AS s
       FROM dg LEFT JOIN ref USING (w1, w2) LEFT JOIN ctx USING (w1), vocab),
agg AS (SELECT doc_id, CAST(SUM(cnt) AS BIGINT) AS n_bigrams,
               -list_reduce(list(s ORDER BY w1, w2), (a, b) -> a + b) / SUM(cnt) AS nll
        FROM sc GROUP BY doc_id)
SELECT doc_id, n_bigrams, round(nll, 6) AS nll_r, nll < CAST(3.39 AS DOUBLE) AS keep FROM agg
"""


# ---------------------------------------------------------------------------
# D. ingestion operators (fixture goldens + relational token chunker)
# ---------------------------------------------------------------------------

def q_md_parse_elements(spark, sf):
    el = _fixture_elements_df(spark)
    return el.select(
        "doc_id", "seq", "elem_type", "markdown", "header_level"
    )


# -- native office readers (sources/docx.py, sources/pdf.py): the Spark
# query parses fixture bytes distributed (mapInPandas); the oracle is the
# same parser run locally on the driver → VALUES. Fixture bytes come from
# the repo's own writers (docx_writer/pdf_writer), pinning the reference's
# conformance shape (DocumentReaderConformanceTests.cs:56-100).

def _office_fixture_bytes():
    from dataingestion_spark.sources.docx_writer import (
        VMERGE, build_docx, sample_docx_bytes,
    )
    from dataingestion_spark.sources.pdf_writer import build_pdf, sample_pdf_bytes

    docx_files = {
        "Sample.docx": sample_docx_bytes(),
        "Merged.docx": build_docx([
            ("h1", "Merged Cells"),
            ("table", [["Years", ("Span2", 2)],
                       ["2020-2025", "a", "b"],
                       [VMERGE, "c", "d"]]),
        ], footer="merged footer"),
        "Lists.docx": build_docx([
            ("title", "List Doc"), ("list", ["alpha", "beta", "gamma"]),
            ("p", "tail paragraph"),
        ]),
    }
    pdf_files = {
        "Sample.pdf": sample_pdf_bytes(),
        "TwoPage.pdf": build_pdf([
            [(18, "Page One Heading"), (11, "first page body text")],
            [(18, "Page Two Heading"), (11, "second page body text"),
             ("footer", "p2 footer")],
        ]),
    }
    return docx_files, pdf_files


_READER_COLS = ["doc_id", "seq", "elem_type", "markdown", "header_level",
                "page_number", "cells_json"]
_READER_TYPES = ["VARCHAR", "BIGINT", "VARCHAR", "VARCHAR", "INTEGER",
                 "INTEGER", "VARCHAR"]


def _reader_golden_rows(files: dict, parse_fn):
    import json as _json

    rows = []
    for doc_id in sorted(files):
        for r in parse_fn(files[doc_id], doc_id):
            cells = r["table_cells"]
            rows.append((
                r["doc_id"], r["seq"], r["elem_type"], r["markdown"],
                r["header_level"], r["page_number"],
                _json.dumps(cells, separators=(",", ":")) if cells is not None else None,
            ))
    return rows


def _reader_select(el):
    return el.select(
        "doc_id", "seq", "elem_type", "markdown", "header_level",
        "page_number",
        F.when(F.col("table_cells").isNotNull(),
               F.to_json("table_cells")).alias("cells_json"),
    )


def q_docx_elements(spark, sf):
    from dataingestion_spark.sources.docx import parse_docx_df

    docx_files, _ = _office_fixture_bytes()
    src = spark.createDataFrame(
        [(k, bytearray(v)) for k, v in sorted(docx_files.items())],
        "doc_id string, content binary",
    )
    return _reader_select(parse_docx_df(src))


def _oracle_docx() -> str:
    from dataingestion_spark.sources.docx import parse_docx

    docx_files, _ = _office_fixture_bytes()
    return _values_oracle(_reader_golden_rows(docx_files, parse_docx),
                          _READER_COLS, _READER_TYPES)


def q_pdf_elements(spark, sf):
    from dataingestion_spark.sources.pdf import parse_pdf_df

    _, pdf_files = _office_fixture_bytes()
    src = spark.createDataFrame(
        [(k, bytearray(v)) for k, v in sorted(pdf_files.items())],
        "doc_id string, content binary",
    )
    return _reader_select(parse_pdf_df(src))


def _oracle_pdf() -> str:
    from dataingestion_spark.sources.pdf import parse_pdf

    _, pdf_files = _office_fixture_bytes()
    return _values_oracle(_reader_golden_rows(pdf_files, parse_pdf),
                          _READER_COLS, _READER_TYPES)


_HTML_FIXTURE = """<!DOCTYPE html><html><head><title>T</title>
<style>p{color:red}</style><script>var x=1;</script></head><body>
<h1>Engine Overview</h1>
<p>First <strong>bold</strong> and <em>italic</em> and <a href="http://e.com">a link</a>.</p>
<h2>Details</h2>
<ul><li>alpha item</li><li>beta item</li></ul>
<blockquote><p>a quoted thought</p></blockquote>
<table><tr><th>K</th><th colspan="2">Wide</th></tr>
<tr><td rowspan="2">a</td><td>b</td><td>c</td></tr><tr><td>d</td><td>e</td></tr></table>
<footer><p>page footer line</p></footer>
</body></html>"""


def _office_extra_fixture_bytes():
    from dataingestion_spark.sources.pptx import build_pptx
    from dataingestion_spark.sources.xlsx import build_xlsx

    xlsx_files = {
        "Workbook.xlsx": build_xlsx({
            "Budget": [["Item", "Q1", "Q2"],
                       ["Widgets", 100, 230.5],
                       ["Gadgets", True, None]],
            "Notes": [["only a note"]],
        }),
    }
    pptx_files = {
        "Deck.pptx": build_pptx([
            {"title": "Deck Title", "subtitle": "For Review"},
            {"title": "Data Slide", "bullets": ["first point", "second point"],
             "table": [["Q", "Rev"], ["Q1", "10"], ["Q2", "20"]]},
        ]),
    }
    return xlsx_files, pptx_files


def q_html_elements(spark, sf):
    """Native HTML reader (sources/html_reader.py): block structure →
    elements with inline markdown, merged-cell tables, footer tags."""
    from dataingestion_spark.sources.html_reader import parse_html_df

    src = spark.createDataFrame(
        [("Page.html", bytearray(_HTML_FIXTURE.encode()))],
        "doc_id string, content binary",
    )
    return _reader_select(parse_html_df(src))


def _oracle_html() -> str:
    from dataingestion_spark.sources.html_reader import parse_html

    return _values_oracle(
        _reader_golden_rows({"Page.html": _HTML_FIXTURE.encode()}, parse_html),
        _READER_COLS, _READER_TYPES)


def q_xlsx_elements(spark, sf):
    """Native XLSX reader (sources/xlsx.py): sheets → sections + table
    elements, shared/inline strings, typed cells, sparse-grid padding."""
    from dataingestion_spark.sources.xlsx import parse_xlsx_df

    xlsx_files, _ = _office_extra_fixture_bytes()
    src = spark.createDataFrame(
        [(k, bytearray(v)) for k, v in sorted(xlsx_files.items())],
        "doc_id string, content binary",
    )
    return _reader_select(parse_xlsx_df(src))


def _oracle_xlsx() -> str:
    from dataingestion_spark.sources.xlsx import parse_xlsx

    xlsx_files, _ = _office_extra_fixture_bytes()
    return _values_oracle(_reader_golden_rows(xlsx_files, parse_xlsx),
                          _READER_COLS, _READER_TYPES)


def q_pptx_elements(spark, sf):
    """Native PPTX reader (sources/pptx.py): slides → page-numbered
    sections, placeholder titles → headers, tables, bullet text."""
    from dataingestion_spark.sources.pptx import parse_pptx_df

    _, pptx_files = _office_extra_fixture_bytes()
    src = spark.createDataFrame(
        [(k, bytearray(v)) for k, v in sorted(pptx_files.items())],
        "doc_id string, content binary",
    )
    return _reader_select(parse_pptx_df(src))


def _oracle_pptx() -> str:
    from dataingestion_spark.sources.pptx import parse_pptx

    _, pptx_files = _office_extra_fixture_bytes()
    return _values_oracle(_reader_golden_rows(pptx_files, parse_pptx),
                          _READER_COLS, _READER_TYPES)


_OFFICE_CORPUS_DIR = [None]  # per-process cache of the generated corpus


def _office_corpus_files():
    """Deterministic mixed office corpus (~360 docs, content varied by
    index): the throughput fixture for office-format ingestion."""
    from dataingestion_spark.sources.docx_writer import build_docx
    from dataingestion_spark.sources.pdf_writer import build_pdf
    from dataingestion_spark.sources.pptx import build_pptx
    from dataingestion_spark.sources.xlsx import build_xlsx

    files = {}
    for i in range(120):
        files[f"doc{i:03d}.docx"] = build_docx([
            ("h1", f"Report {i}"),
            ("p", f"Summary paragraph number {i} covering metric {i % 7}."),
            ("table", [["k", "v"], [f"row{i}", str(i * 3)],
                       [f"row{i + 1}", str(i * 5)]]),
            ("p", f"Closing remark {i}."),
        ])
    for i in range(120):
        files[f"page{i:03d}.html"] = (
            f"<h1>Page {i}</h1><p>Body text for page {i} with "
            f"<b>bold{i}</b>.</p><ul><li>item a{i}</li><li>item b{i}</li></ul>"
        ).encode()
    for i in range(60):
        files[f"memo{i:03d}.pdf"] = build_pdf([[
            (18, f"Memo {i}"),
            (11, f"First line of memo number {i}."),
            (11, f"Second line with figure {i * 11}."),
        ]])
    for i in range(30):
        files[f"book{i:03d}.xlsx"] = build_xlsx(
            {"Data": [["id", "value"], [str(i), str(i * 2)],
                      [str(i + 1), str(i * 4)]]})
    for i in range(30):
        files[f"deck{i:03d}.pptx"] = build_pptx([
            {"title": f"Deck {i}", "bullets": [f"point {i}", f"point {i + 1}"]},
        ])
    return files


def _office_corpus_dir():
    import os as _os
    import tempfile as _tf

    if _OFFICE_CORPUS_DIR[0] is None or not _os.path.isdir(_OFFICE_CORPUS_DIR[0]):
        d = _tf.mkdtemp(prefix="office_corpus_")
        for name, data in _office_corpus_files().items():
            with open(_os.path.join(d, name), "wb") as fh:
                fh.write(data)
        _OFFICE_CORPUS_DIR[0] = d
    return _OFFICE_CORPUS_DIR[0]


def q_office_ingest(spark, sf):
    """Mixed office-corpus ingestion throughput: ~360 generated
    docx/html/pdf/xlsx/pptx files through the media-type dispatcher in
    ONE binaryFile scan + mapInPandas pass; checked output = per-format
    element-type counts (the oracle restates them from the same
    deterministic fixtures parsed locally)."""
    from dataingestion_spark.sources.dispatch import read_documents

    el = read_documents(spark, _office_corpus_dir())
    ext = F.regexp_extract("doc_id", r"\.(\w+)$", 1)
    return (
        el.groupBy(ext.alias("fmt"), "elem_type")
        .agg(F.count("*").alias("n"))
    )


def _oracle_office_ingest() -> str:
    from dataingestion_spark.sources.dispatch import parse_any

    counts = {}
    for name, data in _office_corpus_files().items():
        fmt = name.rsplit(".", 1)[1]
        for r in parse_any(data, name):
            counts[(fmt, r["elem_type"])] = counts.get((fmt, r["elem_type"]), 0) + 1
    rows = [(fmt, et, n) for (fmt, et), n in sorted(counts.items())]
    return _values_oracle(rows, ["fmt", "elem_type", "n"],
                          ["VARCHAR", "VARCHAR", "BIGINT"])


_RTF_FIXTURE = (
    b"{\\rtf1\\ansi\\deff0\n"
    b"{\\fonttbl{\\f0 Times;}}{\\info{\\title Hidden}}\n"
    b"\\pard\\outlinelevel0 Quarterly Report\\par\n"
    b"\\pard Opening summary with \\b bold\\b0  emphasis.\\par\n"
    b"\\pard\\outlinelevel1 Numbers\\par\n"
    b"\\trowd\\intbl Metric\\cell Value\\cell\\row\n"
    b"\\trowd\\intbl Revenue\\cell 42\\cell\\row\n"
    b"\\pard Closing remark.\\par\n}")


def _epub_fixture_bytes():
    from dataingestion_spark.sources.epub import build_epub

    return build_epub([
        ("One", "<h1>Chapter One</h1><p>First chapter text with "
                "<b>bold</b>.</p>"),
        ("Two", "<h1>Chapter Two</h1><p>Second chapter.</p>"
                "<ul><li>alpha</li><li>beta</li></ul>"),
    ])


def q_epub_elements(spark, sf):
    """Native EPUB reader (sources/epub.py): container → OPF spine →
    XHTML chapters via the HTML block collector; chapters =
    page-numbered sections."""
    from dataingestion_spark.sources.epub import parse_epub_df

    src = spark.createDataFrame(
        [("Book.epub", bytearray(_epub_fixture_bytes()))],
        "doc_id string, content binary",
    )
    return _reader_select(parse_epub_df(src))


def _oracle_epub() -> str:
    from dataingestion_spark.sources.epub import parse_epub

    return _values_oracle(
        _reader_golden_rows({"Book.epub": _epub_fixture_bytes()}, parse_epub),
        _READER_COLS, _READER_TYPES)


def q_rtf_elements(spark, sf):
    """Native RTF reader (sources/rtf.py): group/control-word tokenizer,
    outlinelevel headers, bold/italic markdown, trowd/cell/row tables,
    skipped non-content destinations."""
    from dataingestion_spark.sources.rtf import parse_rtf_df

    src = spark.createDataFrame(
        [("Note.rtf", bytearray(_RTF_FIXTURE))],
        "doc_id string, content binary",
    )
    return _reader_select(parse_rtf_df(src))


def _oracle_rtf() -> str:
    from dataingestion_spark.sources.rtf import parse_rtf

    return _values_oracle(
        _reader_golden_rows({"Note.rtf": _RTF_FIXTURE}, parse_rtf),
        _READER_COLS, _READER_TYPES)


def _odf_fixture_bytes():
    from dataingestion_spark.sources.odf import build_odp, build_ods, build_odt

    return {
        "Doc.odt": build_odt([
            ("h", 1, "ODT Report"),
            ("p", "Opening paragraph."),
            ("pb", "bold words"),
            ("list", ["alpha item", "beta item"]),
            ("table", [["k", "v"], ["row1", "10"], ["row2", "20"]]),
            ("h", 2, "Closing"),
        ]),
        "Book.ods": build_ods({
            "Data": [["id", "value", "flag"],
                     [1.0, 2.5, True],
                     [2.0, "text cell", False]],
        }),
        "Deck.odp": build_odp([
            {"title": "ODP Deck", "points": ["first point", "second point"]},
            {"title": "Slide Two"},
        ]),
    }


def q_odf_elements(spark, sf):
    """Native OpenDocument reader (sources/odf.py): one content.xml
    parser covering text (.odt), spreadsheet (.ods), and presentation
    (.odp) bodies — headers from outline levels, bold/italic span
    markdown, typed spreadsheet cells, page-numbered slides."""
    from dataingestion_spark.sources.odf import parse_odf_df

    src = spark.createDataFrame(
        [(k, bytearray(v)) for k, v in sorted(_odf_fixture_bytes().items())],
        "doc_id string, content binary",
    )
    return _reader_select(parse_odf_df(src))


def _oracle_odf() -> str:
    from dataingestion_spark.sources.odf import parse_odf

    return _values_oracle(
        _reader_golden_rows(_odf_fixture_bytes(), parse_odf),
        _READER_COLS, _READER_TYPES)


def _doc_fixture_bytes():
    from dataingestion_spark.sources.doc_legacy import build_doc

    return build_doc([
        "First legacy paragraph of the binary Word document.",
        "Second paragraph with a MERGEFIELD placeholder stripped.",
        "Closing line.",
    ])


def q_doc_legacy_elements(spark, sf):
    """Legacy .doc reader (sources/doc_legacy.py): OLE2 compound file →
    FIB → piece table → paragraph elements (documented partial parity:
    text complete, no styles/tables)."""
    from dataingestion_spark.sources.doc_legacy import parse_doc_df

    src = spark.createDataFrame(
        [("Old.doc", bytearray(_doc_fixture_bytes()))],
        "doc_id string, content binary",
    )
    return _reader_select(parse_doc_df(src))


def _oracle_doc_legacy() -> str:
    from dataingestion_spark.sources.doc_legacy import parse_doc

    return _values_oracle(
        _reader_golden_rows({"Old.doc": _doc_fixture_bytes()}, parse_doc),
        _READER_COLS, _READER_TYPES)


def _xls_fixture_bytes():
    from dataingestion_spark.sources.xls_legacy import build_xls

    return build_xls({
        "Budget": [["Item", "Q1", "Q2"],
                   ["Widgets", 100, 230.5],
                   ["Gadgets", True, ""]],
        "Notes": [["only a legacy note"]],
    })


def q_xls_legacy_elements(spark, sf):
    """Legacy .xls reader (sources/xls_legacy.py): OLE2 + BIFF8 record
    stream (SST, BOUNDSHEET, LABELSST/NUMBER/RK/BOOLERR cells) →
    sheet sections + tables, same shape as the XLSX reader."""
    from dataingestion_spark.sources.xls_legacy import parse_xls_df

    src = spark.createDataFrame(
        [("Old.xls", bytearray(_xls_fixture_bytes()))],
        "doc_id string, content binary",
    )
    return _reader_select(parse_xls_df(src))


def _oracle_xls_legacy() -> str:
    from dataingestion_spark.sources.xls_legacy import parse_xls

    return _values_oracle(
        _reader_golden_rows({"Old.xls": _xls_fixture_bytes()}, parse_xls),
        _READER_COLS, _READER_TYPES)


def q_reader_dispatch(spark, sf):
    """Mixed-format ingestion through the media-type dispatcher
    (sources/dispatch.py): md + docx + pdf in one elements DataFrame."""
    from dataingestion_spark.sources.dispatch import parse_any
    from dataingestion_spark.sources.docx import parse_docx_df  # noqa: F401

    files = _dispatch_fixture_files()
    src = spark.createDataFrame(
        [(k, bytearray(v)) for k, v in sorted(files.items())],
        "doc_id string, content binary",
    )

    def run(batches):
        import pandas as pd

        from dataingestion_spark.model import ELEMENTS_SCHEMA as _ES
        cols = [f.name for f in _ES.fields]
        for pdf in batches:
            out = []
            for doc_id, raw in zip(pdf["doc_id"], pdf["content"]):
                out.extend(parse_any(bytes(raw), str(doc_id)))
            yield pd.DataFrame(out, columns=cols) if out else pd.DataFrame(columns=cols)

    from dataingestion_spark.model import ELEMENTS_SCHEMA
    el = src.mapInPandas(run, schema=ELEMENTS_SCHEMA)
    return el.groupBy("doc_id").agg(
        F.count("*").alias("n_elements"),
        F.sum(F.when(F.col("elem_type") == "header", 1).otherwise(0)).alias("n_headers"),
        F.sum(F.when(F.col("elem_type") == "table", 1).otherwise(0)).alias("n_tables"),
        F.max("page_number").alias("max_page"),
    )


def _image_fixture_bytes():
    """Deterministic standalone-image fixtures: a real PNG from the repo's
    own encoder, hand-built GIF/BMP headers, a JPEG SOI blob, a PNG with
    a lying .jpg extension (probe must win), and a WebP the probe doesn't
    parse (extension media type must win)."""
    import struct

    from dataingestion_spark.sources.pdf import _wrap_png

    raw = bytes((i * 7) % 256 for i in range(4 * 3 * 3))
    png = _wrap_png(raw, 4, 3, 3)
    gif = b"GIF89a" + struct.pack("<HH", 12, 34) + b"\x00" * 10
    bmp = b"BM" + b"\x00" * 16 + struct.pack("<ii", 20, -30) + b"\x00" * 8
    jpeg = b"\xff\xd8\xff\xe0\x00\x10JFIF\x00" + bytes(range(64))
    webp = b"RIFF\x28\x00\x00\x00WEBPVP8 " + bytes(16)
    return {
        "photo.png": png,
        "anim.gif": gif,
        "scan.bmp": bmp,
        "cam.jpg": jpeg,
        "mislabeled.jpg": png,
        "modern.webp": webp,
    }


def q_image_elements(spark, sf):
    """Standalone image documents through the one-scan dispatcher
    (sources/image_reader.py): every image/* extension of the reference
    MIME map (IngestionDocumentReader.cs:80-171) becomes a single
    Image-element document — decode-free bytes + media type + header
    metadata, the IngestionDocumentImage shape
    (IngestionDocument.cs:225-250). Oracle = the same parser run locally
    on the driver → VALUES."""
    from dataingestion_spark.model import ELEMENTS_SCHEMA
    from dataingestion_spark.sources.dispatch import parse_any

    files = _image_fixture_bytes()
    src = spark.createDataFrame(
        [(k, bytearray(v)) for k, v in sorted(files.items())],
        "doc_id string, content binary",
    )

    def run(batches):
        import pandas as pd

        cols = [f.name for f in ELEMENTS_SCHEMA.fields]
        for pdf in batches:
            out = []
            for doc_id, raw in zip(pdf["doc_id"], pdf["content"]):
                out.extend(parse_any(bytes(raw), str(doc_id)))
            yield pd.DataFrame(out, columns=cols) if out else pd.DataFrame(columns=cols)

    el = src.mapInPandas(run, schema=ELEMENTS_SCHEMA)
    return el.select(
        "doc_id", "elem_type", "markdown",
        F.col("image_media_type").alias("media_type"),
        el["metadata"]["format"].alias("fmt"),
        el["metadata"]["width"].cast("int").alias("width"),
        el["metadata"]["height"].cast("int").alias("height"),
        el["metadata"]["n_bytes"].cast("long").alias("n_bytes"),
        el["metadata"]["sha256"].alias("sha256"),
        F.length("image_content").cast("long").alias("content_len"),
    )


def _oracle_image_elements() -> str:
    from dataingestion_spark.sources.image_reader import parse_image

    rows = []
    for doc_id, data in sorted(_image_fixture_bytes().items()):
        r = parse_image(data, doc_id)[0]
        m = r["metadata"]
        rows.append((doc_id, r["elem_type"], r["markdown"],
                     r["image_media_type"], m["format"], m.get("width"),
                     m.get("height"), int(m["n_bytes"]), m["sha256"],
                     len(r["image_content"])))
    return _values_oracle(
        rows,
        ["doc_id", "elem_type", "markdown", "media_type", "fmt", "width",
         "height", "n_bytes", "sha256", "content_len"],
        ["VARCHAR", "VARCHAR", "VARCHAR", "VARCHAR", "VARCHAR", "INTEGER",
         "INTEGER", "BIGINT", "VARCHAR", "BIGINT"],
    )


def _container_fixture_files():
    """Deterministic .ipynb / .eml / .wav fixtures for the container-ish
    formats markitdown reaches: a notebook (markdown + code + output
    cells), an email with RFC 2047 subject, plain body, and a markdown
    attachment (recursed like a zip member), and a WAV with a real fmt
    header."""
    import json
    import struct

    nb = {
        "cells": [
            {"cell_type": "markdown",
             "source": ["# Notebook Title\n", "\n", "intro paragraph"]},
            {"cell_type": "code", "source": "print('hi')",
             "outputs": [{"output_type": "stream", "text": ["hi\n"]}]},
            {"cell_type": "markdown", "source": "## Analysis\n\nresult text"},
        ],
        "metadata": {"kernelspec": {"language": "python"}},
        "nbformat": 4,
    }
    eml = (b"From: a@example.com\r\nTo: b@example.com\r\n"
           b"Subject: Weekly =?utf-8?q?r=C3=A9sum=C3=A9?=\r\n"
           b"Date: Mon, 1 Jan 2024 00:00:00 +0000\r\nMIME-Version: 1.0\r\n"
           b"Content-Type: multipart/mixed; boundary=B\r\n\r\n"
           b"--B\r\nContent-Type: text/plain; charset=utf-8\r\n\r\n"
           b"Hello body text\r\n\r\n"
           b"--B\r\nContent-Type: text/markdown; name=notes.md\r\n"
           b"Content-Disposition: attachment; filename=notes.md\r\n\r\n"
           b"# Attached\r\n\r\nnote body\r\n"
           b"--B--\r\n")
    wav = (b"RIFF" + struct.pack("<I", 36 + 16000) + b"WAVE"
           + b"fmt " + struct.pack("<I", 16)
           + struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
           + b"data" + struct.pack("<I", 16000) + b"\x00" * 16000)
    from dataingestion_spark.sources.msg import build_msg

    msg = build_msg("Quarterly report", "Numbers look **good**.\n\nDetails attached.",
                    sender="Alice Chen", to="Bob Singh")
    return {
        "report.ipynb": json.dumps(nb).encode(),
        "mail.eml": eml,
        "clip.wav": wav,
        "memo.msg": msg,
    }


def q_tile_pixel_bytes(spark, sf):
    """REAL tile extraction through the stdlib codecs
    (operators/multimodal.py::image_tile_pixels over png_codec /
    jpeg_codec): a deterministic PNG and a deterministic baseline JPEG
    decode once per image, each grid rectangle crops and re-encodes as a
    PNG tile. The PNG path is bit-deterministic (zlib at a fixed level),
    so tile md5s pin exact pixel bytes; JPEG tiles pin dims + byte count
    via the same local-compute oracle. Oracle = the identical pipeline
    run locally on the driver → VALUES."""
    rows = [(k, bytearray(v)) for k, v in _tile_fixture_images()]
    src = spark.createDataFrame(rows, "doc_id string, image_content binary")
    from dataingestion_spark.operators.multimodal import image_tile_pixels

    t = image_tile_pixels(src, tile_w=8, tile_h=8)
    return t.select(
        "doc_id", "tile_x", "tile_y", "x0", "y0", "x1", "y1",
        F.md5(F.col("tile")).alias("tile_md5"),
        F.length("tile").cast("long").alias("tile_bytes"),
    )


def _tile_fixture_images():
    from dataingestion_spark.operators.gif_codec import encode_gif
    from dataingestion_spark.operators.jpeg_codec import encode_jpeg
    from dataingestion_spark.operators.png_codec import encode_png

    w, h = 20, 12
    pixels = bytes((i * 13) % 256 for i in range(w * h * 3))
    gif_px = bytes(b for i in range(w * h)
                   for b in ((i * 13) % 200, (i * 7) % 200, 99))
    return [("grad.png", encode_png(pixels, w, h, 3)),
            ("grad.jpg", encode_jpeg(pixels, w, h, 3, quality=90,
                                     subsampling="420")),
            ("grad.gif", encode_gif(gif_px, w, h, 3))]


def _frame_fixture_videos():
    """Deterministic video fixtures: a 12-frame MJPEG-AVI (frames from
    the repo's own JPEG encoder), a 5-frame animated GIF, and one
    foreign-container byte blob that must yield zero rows."""
    from dataingestion_spark.operators.gif_codec import encode_gif_animation
    from dataingestion_spark.operators.jpeg_codec import encode_jpeg
    from dataingestion_spark.operators.video_demux import encode_avi_mjpeg

    w, h = 16, 8
    jf = [encode_jpeg(bytes(((i * 37 + k * 11) % 256)
                            for i in range(w * h * 3)), w, h, 3, quality=90)
          for k in range(12)]
    gf = [bytes(b for i in range(w * h)
                for b in ((k * 40) % 200, (i % 8) * 20, 7))
          for k in range(5)]
    return [("clip.avi", encode_avi_mjpeg(jf, w, h, fps=10)),
            ("anim.gif", encode_gif_animation(gf, w, h, 3,
                                              delays_ms=[200] * 5)),
            ("movie.mp4", b"\x00\x00\x00\x18ftypmp42" + b"x" * 64)]


def q_frame_sample(spark, sf):
    """REAL video frame sampling with zero external libs
    (operators/multimodal.py::frame_sample over
    operators/video_demux.py): MJPEG-in-AVI demuxes via the RIFF walk
    (frames = the contained JPEGs verbatim), animated GIF via the GCE
    frame iterator (frames re-encoded as deterministic PNG), the first
    frame at or past each every_n_ms boundary is kept, and foreign
    containers (the mp4 blob) produce zero rows. Frame md5s pin exact
    bytes; each frame is also probed for dims through
    decode_image_bytes. Oracle = the identical pipeline run locally on
    the driver → VALUES (same pattern as multimodal_tile_pixels)."""
    from dataingestion_spark.operators.multimodal import frame_sample

    rows = [(k, bytearray(v)) for k, v in _frame_fixture_videos()]
    src = spark.createDataFrame(rows, "doc_id string, video_content binary")
    out = frame_sample(src, every_n_ms=400)
    return out.select(
        "doc_id", "ts_ms",
        F.md5(F.col("frame")).alias("frame_md5"),
        F.length("frame").cast("long").alias("frame_bytes"),
    )


def _oracle_frame_sample() -> str:
    import hashlib

    from dataingestion_spark.operators.video_demux import video_frame_decoder

    rows = []
    for doc_id, data in _frame_fixture_videos():
        try:
            sampled = video_frame_decoder(data, 400)
        except (ValueError, NotImplementedError):
            continue
        for ts_ms, frame in sampled:
            rows.append((doc_id, ts_ms,
                         hashlib.md5(frame).hexdigest(), len(frame)))
    return _values_oracle(
        rows, ["doc_id", "ts_ms", "frame_md5", "frame_bytes"],
        ["VARCHAR", "BIGINT", "VARCHAR", "BIGINT"])


def _oracle_tile_pixels() -> str:
    import hashlib

    from dataingestion_spark.operators.multimodal import decode_image_bytes
    from dataingestion_spark.operators.png_codec import crop, encode_png

    rows = []
    for doc_id, data in _tile_fixture_images():
        pixels, w, h, ch = decode_image_bytes(data)
        for ty in range((h + 7) // 8):
            for tx in range((w + 7) // 8):
                x0, y0 = tx * 8, ty * 8
                x1, y1 = min(x0 + 8, w), min(y0 + 8, h)
                tile = encode_png(crop(pixels, w, h, ch, x0, y0, x1, y1),
                                  x1 - x0, y1 - y0, ch)
                rows.append((doc_id, tx, ty, x0, y0, x1, y1,
                             hashlib.md5(tile).hexdigest(), len(tile)))
    return _values_oracle(
        rows,
        ["doc_id", "tile_x", "tile_y", "x0", "y0", "x1", "y1",
         "tile_md5", "tile_bytes"],
        ["VARCHAR", "INTEGER", "INTEGER", "BIGINT", "BIGINT", "BIGINT",
         "BIGINT", "VARCHAR", "BIGINT"],
    )


def q_container_elements(spark, sf):
    """Notebook / email / audio documents through the one-scan dispatcher
    (sources/ipynb.py, eml.py, audio_reader.py — the remaining format
    families markitdown reaches that the native readers now cover):
    .ipynb renders to markdown then parses structurally, .eml yields
    subject header + envelope + body + recursed attachments, .wav yields
    a probe-metadata paragraph. Oracle = the same parsers run locally →
    VALUES."""
    from dataingestion_spark.model import ELEMENTS_SCHEMA
    from dataingestion_spark.sources.dispatch import parse_any

    files = _container_fixture_files()
    src = spark.createDataFrame(
        [(k, bytearray(v)) for k, v in sorted(files.items())],
        "doc_id string, content binary",
    )

    def run(batches):
        import pandas as pd

        cols = [f.name for f in ELEMENTS_SCHEMA.fields]
        for pdf in batches:
            out = []
            for doc_id, raw in zip(pdf["doc_id"], pdf["content"]):
                out.extend(parse_any(bytes(raw), str(doc_id)))
            yield pd.DataFrame(out, columns=cols) if out else pd.DataFrame(columns=cols)

    el = src.mapInPandas(run, schema=ELEMENTS_SCHEMA)
    return el.select("doc_id", "seq", "elem_type", "markdown", "header_level")


def _oracle_container_elements() -> str:
    from dataingestion_spark.sources.dispatch import parse_any

    rows = []
    for doc_id, data in sorted(_container_fixture_files().items()):
        for r in parse_any(data, doc_id):
            rows.append((r["doc_id"], r["seq"], r["elem_type"], r["markdown"],
                         r["header_level"]))
    return _values_oracle(
        rows,
        ["doc_id", "seq", "elem_type", "markdown", "header_level"],
        ["VARCHAR", "BIGINT", "VARCHAR", "VARCHAR", "INTEGER"],
    )


def _dispatch_fixture_files():
    docx_files, pdf_files = _office_fixture_bytes()
    xlsx_files, pptx_files = _office_extra_fixture_bytes()
    return {
        "guide.md": FIXTURE_DOCS["fx_guide"].encode(),
        "Sample.docx": docx_files["Sample.docx"],
        "TwoPage.pdf": pdf_files["TwoPage.pdf"],
        "Page.html": _HTML_FIXTURE.encode(),
        "Workbook.xlsx": xlsx_files["Workbook.xlsx"],
        "Deck.pptx": pptx_files["Deck.pptx"],
        "Book.epub": _epub_fixture_bytes(),
        "Note.rtf": _RTF_FIXTURE,
        "Doc.odt": _odf_fixture_bytes()["Doc.odt"],
    }


def _oracle_dispatch() -> str:
    from dataingestion_spark.sources.dispatch import parse_any

    rows = []
    for doc_id, data in sorted(_dispatch_fixture_files().items()):
        els = parse_any(data, doc_id)
        rows.append((
            doc_id, len(els),
            sum(1 for e in els if e["elem_type"] == "header"),
            sum(1 for e in els if e["elem_type"] == "table"),
            max((e["page_number"] or 0 for e in els), default=0) or None,
        ))
    return _values_oracle(
        rows, ["doc_id", "n_elements", "n_headers", "n_tables", "max_page"],
        ["VARCHAR", "BIGINT", "BIGINT", "BIGINT", "INTEGER"],
    )


def _oracle_parse() -> str:
    rows = [
        (r["doc_id"], r["seq"], r["elem_type"], r["markdown"], r["header_level"])
        for r in _fixture_rows_local()
    ]
    return _values_oracle(
        rows,
        ["doc_id", "seq", "elem_type", "markdown", "header_level"],
        ["VARCHAR", "BIGINT", "VARCHAR", "VARCHAR", "INTEGER"],
    )


def q_header_chunks(spark, sf):
    ch = header_chunker(_fixture_elements_df(spark), _FIXED_OPTS)
    return ch.select(*_CHUNK_COLS)


def q_section_chunks(spark, sf):
    ch = section_chunker(_fixture_elements_df(spark), _FIXED_OPTS)
    return ch.select(*_CHUNK_COLS)


def q_markdown_chunks(spark, sf):
    ch = markdown_chunker(_fixture_elements_df(spark), split_level=3)
    return ch.select(*_CHUNK_COLS)


def q_removal_footers(spark, sf):
    el = remove_footers(_fixture_elements_df(spark))
    return el.select("doc_id", "seq", "elem_type", "markdown")


def _oracle_removal() -> str:
    rows = [
        (r["doc_id"], r["seq"], r["elem_type"], r["markdown"])
        for r in _fixture_rows_local()
        if r["elem_type"] != "footer"
    ]
    return _values_oracle(
        rows,
        ["doc_id", "seq", "elem_type", "markdown"],
        ["VARCHAR", "BIGINT", "VARCHAR", "VARCHAR"],
    )


def q_multimodal_image_meta(spark, sf):
    """Multimodal plumbing (operators/multimodal.py::image_metadata):
    media bytes live in an opaque binary column, typed metadata is
    extracted by an Arrow-batched mapInPandas probe — here over
    deterministic synthesized PNGs so the real header-parse path
    (struct.unpack of IHDR) is oracle-checked end to end; the sha256
    column the operator also emits is dropped only because this image's
    DuckDB lacks a BLOB sha256 to mirror it with."""
    docs = _t(spark, sf, "documents")
    w = (F.col("doc_id") % 640 + 1).cast("int")
    h = (F.col("doc_id") % 480 + 1).cast("int")
    from dataingestion_spark.operators.multimodal import image_metadata

    binary = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.concat(
            F.unhex(
                F.concat(
                    F.lit("89504E470D0A1A0A0000000D49484452"),
                    F.format_string("%08x", w),
                    F.format_string("%08x", h),
                )
            ),
            F.col("text").cast("binary"),
        ).alias("image_content"),
    )
    out = image_metadata(binary, id_cols=(("doc_id", "long"),))
    return out.select("doc_id", "width", "height", "format", "n_bytes")


ORACLE_MULTIMODAL_IMAGE = """
SELECT CAST(doc_id AS BIGINT) AS doc_id,
  CAST(doc_id % 640 + 1 AS INT) AS width,
  CAST(doc_id % 480 + 1 AS INT) AS height,
  'png' AS format,
  CAST(24 + octet_length(encode(text)) AS BIGINT) AS n_bytes
FROM documents
"""


def q_multimodal_audio_meta(spark, sf):
    """Audio twin of the image probe (multimodal.py::audio_metadata): a
    44-byte RIFF/WAVE header synthesized per document (channels at offset
    22, sample rate at 24, byte rate pinned to 1000 so duration_ms =
    payload bytes exactly — no float-division edge), text bytes as PCM
    payload. Exercises the little-endian fmt-chunk parse."""
    docs = _t(spark, sf, "documents")
    from dataingestion_spark.operators.multimodal import audio_metadata

    channels = (F.col("doc_id") % 2 + 1).cast("int")
    rate = (F.lit(8000) + F.col("doc_id") % 8).cast("int")

    def le(col, nbytes):
        parts = [
            F.format_string("%02x", F.shiftright(col, 8 * i).bitwiseAND(F.lit(0xFF)))
            for i in range(nbytes)
        ]
        return F.concat(*parts)

    header_hex = F.concat(
        F.lit("52494646"),            # "RIFF"
        F.lit("24080000"),            # chunk size (unused by the probe)
        F.lit("57415645"),            # "WAVE"
        F.lit("666d7420"),            # "fmt "
        F.lit("10000000"),            # fmt chunk size 16 (LE)
        F.lit("0100"),                # PCM
        le(channels, 2),              # channels @ 22
        le(rate, 4),                  # sample rate @ 24
        le(F.lit(1000), 4),           # byte rate @ 28 -> duration == payload
        F.lit("0200"), F.lit("1000"),  # block align, bits/sample
        F.lit("64617461"),            # "data"
        F.lit("00000000"),            # data size (unused by the probe)
    )
    binary = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.concat(F.unhex(header_hex), F.col("text").cast("binary"))
        .alias("audio_content"),
    )
    out = audio_metadata(binary, id_cols=(("doc_id", "long"),))
    return out.select("doc_id", "sample_rate", "channels", "duration_ms", "n_bytes")


ORACLE_MULTIMODAL_AUDIO = """
SELECT CAST(doc_id AS BIGINT) AS doc_id,
  CAST(8000 + doc_id % 8 AS INT) AS sample_rate,
  CAST(doc_id % 2 + 1 AS INT) AS channels,
  CAST(octet_length(encode(text)) AS BIGINT) AS duration_ms,
  CAST(44 + octet_length(encode(text)) AS BIGINT) AS n_bytes
FROM documents
"""


def q_reader_wet_split(spark, sf):
    """Member-per-record gzip WARC splitting (r11, sources/warc.py::
    read_warc_split — the Common Crawl segment layout): documents →
    one .wet.gz whose every record is its own gzip member (payload =
    text + a 1024-char incompressible hash tail so sf0.1 spans
    multiple 1 MB splits) → byte-range reads resyncing on validated
    member headers. Oracle restates uri/byte-length/char-length from
    the parquet source, so a member lost or doubled at any split
    boundary goes red."""
    import gzip as _gz
    import hashlib as _h
    import os as _os
    import tempfile

    from dataingestion_spark.sources.warc import (
        read_warc_split, wet_record_bytes,
    )

    pdf = (_t(spark, sf, "documents").select("doc_id", "text")
           .toPandas().sort_values("doc_id"))
    d = tempfile.mkdtemp(prefix="wet_split_") + "/seg"
    _os.makedirs(d)
    members = []
    for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
        tail = _h.sha256(str(int(doc_id)).encode()).hexdigest() * 16
        payload = (text + tail).encode("utf-8")
        members.append(_gz.compress(wet_record_bytes(
            f"http://synth.local/{int(doc_id)}", payload)))
    with open(_os.path.join(d, "part.wet.gz"), "wb") as fh:
        fh.write(b"".join(members))
    recs = read_warc_split(spark, d, split_mb=1)
    return recs.select(
        F.col("target_uri").alias("uri"),
        "content_length",
        F.length("payload").cast("long").alias("n_chars"))


ORACLE_WET_SPLIT = """
SELECT 'http://synth.local/' || CAST(doc_id AS VARCHAR) AS uri,
       strlen(text) + 1024 AS content_length,
       length(text) + 1024 AS n_chars
FROM documents
"""


def q_reader_wet_records(spark, sf):
    """WARC/WET web-archive reader (sources/warc.py — the Common Crawl
    container layout; the reference has no archive source, cf.
    IngestionDocumentReader.cs). Documents are WET-serialized entirely
    JVM-side (wet_record_expr), concatenated 8-records-per-"file" in
    doc_id order, and the real mapInPandas parser splits the blobs back
    into records — version/header parse, case-insensitive header names,
    Content-Length BYTE slicing (multi-byte UTF-8 payloads included) and
    in-file record ordering are all oracle-checked end to end."""
    from dataingestion_spark.sources.warc import parse_warc_files, wet_record_expr

    docs = _t(spark, sf, "documents")
    uri = F.concat(
        F.lit("http://synth.local/"), F.col("source"),
        F.lit("/"), F.col("doc_id").cast("string"),
    )
    recs = docs.select(
        (F.col("doc_id") % 8).cast("string").alias("path"),
        F.struct(
            F.col("doc_id"),
            wet_record_expr(uri, F.col("text")).alias("rec"),
        ).alias("s"),
    )
    files = recs.groupBy("path").agg(
        F.concat_ws(
            "", F.transform(F.array_sort(F.collect_list("s")), lambda s: s["rec"])
        ).cast("binary").alias("content")
    )
    return parse_warc_files(files).select(
        F.col("target_uri").alias("uri"),
        "record_idx",
        "content_length",
        F.length("payload").cast("long").alias("n_chars"),
    )


def q_events_zorder(spark, sf):
    """Morton/Z-order key (operators/zorder.py::zvalue) over two event
    dimensions — the multi-dimensional data-skipping layout
    (write_zordered range-partitions+sorts by this key; per-file
    min/max tightening on BOTH columns is pinned by
    tests/test_zorder.py::test_zvalue_locality_beats_single_sort).
    Pure integer bit interleaving, mirrored bit-for-bit in SQL."""
    from dataingestion_spark.operators.zorder import zvalue

    ev = _events(spark, sf)
    x = (F.col("user_id") % 1024).cast("long")
    y = (F.col("event_id") % 1024).cast("long")
    return ev.select(
        F.col("event_id").cast("long").alias("event_id"),
        x.alias("x"),
        y.alias("y"),
        zvalue([x, y], bits=10).alias("zval"),
    )


def _oracle_zorder() -> str:
    terms = " + ".join(
        f"(((x >> {i}) & 1) << {2 * i}) + (((y >> {i}) & 1) << {2 * i + 1})"
        for i in range(10)
    )
    return f"""
WITH m AS (
  SELECT CAST(event_id AS BIGINT) AS event_id,
         CAST(user_id % 1024 AS BIGINT) AS x,
         CAST(event_id % 1024 AS BIGINT) AS y
  FROM events)
SELECT event_id, x, y, CAST({terms} AS BIGINT) AS zval FROM m
"""


def q_webdataset_shards(spark, sf):
    """WebDataset tar-shard export (sinks/webdataset.py): documents
    become {key}.txt + {key}.json members in per-shard USTAR archives
    built by the real writer (dry-run mode — archives built in memory,
    nothing written). Byte determinism makes the archive size a closed
    form of the member sizes (512-block members + 1024 end marker,
    10240 record padding), so the manifest — member counts, exact tar
    byte sizes, key ranges — is fully oracle-checked; the on-disk
    round trip is pinned by tests/test_webdataset.py."""
    from dataingestion_spark.sinks.webdataset import write_webdataset

    docs = _t(spark, sf, "documents").select(
        (F.col("doc_id") % 16).alias("shard_id"),
        F.format_string("%06d", F.col("doc_id")).alias("key"),
        "text",
        F.concat(
            F.lit('{"lang":"'), F.col("lang"),
            F.lit('","source":"'), F.col("source"), F.lit('"}'),
        ).alias("meta"),
    )
    return write_webdataset(docs, out_dir=None)


ORACLE_WEBDATASET = """
WITH m AS (
  SELECT doc_id % 16 AS shard_id,
         printf('%06d', doc_id) AS key,
         octet_length(encode(text)) AS tsize,
         octet_length(encode('{"lang":"' || lang || '","source":"' || source || '"}'))
           AS jsize
  FROM documents)
SELECT CAST(shard_id AS BIGINT) AS shard_id,
  CAST(2 * COUNT(*) AS INT) AS n_members,
  CAST((SUM(512 + (tsize + 511) // 512 * 512)
      + SUM(512 + (jsize + 511) // 512 * 512)
      + 1024 + 10239) // 10240 * 10240 AS BIGINT) AS tar_nbytes,
  MIN(key) AS first_key,
  MAX(key) AS last_key
FROM m GROUP BY shard_id
"""


def q_html_extract(spark, sf):
    """HTML → text extraction (operators/html_extract.py): documents are
    wrapped in synthesized page chrome — title, script+style blocks, a
    comment, entity-encoded tail, doc_id%3 list items with anchors —
    and the expression-only extractor (tag strip, block newlines,
    entity decode, whitespace collapse, link/script density) must
    recover the exact visible text; the oracle states every output
    (text, line/char counts, densities, text_ratio) in closed form."""
    from dataingestion_spark.operators.html_extract import html_extract

    docs = _t(spark, sf, "documents")
    k = (F.col("doc_id") % 3).cast("int")
    html = F.concat(
        F.lit("<html><head><title>"), F.col("source"),
        F.lit("</title><script>var a=1;</script><style>.x{}</style>"
              "</head><body><h1>Doc "),
        F.col("doc_id").cast("string"),
        F.lit("</h1><p>"), F.col("text"),
        F.lit("</p><!-- c --><ul>"),
        F.repeat(F.lit('<li><a href="#">link</a></li>'), k),
        F.lit("</ul><p>Tail &amp; &lt;end&gt;</p></body></html>"),
    )
    return html_extract(docs.select("doc_id", html.alias("html")))


ORACLE_HTML_EXTRACT = """
WITH h AS (
  SELECT CAST(doc_id AS BIGINT) AS doc_id, CAST(doc_id % 3 AS INT) AS k,
    source || chr(10) || 'Doc ' || CAST(doc_id AS VARCHAR) || chr(10) || text
      || repeat(chr(10) || 'link', CAST(doc_id % 3 AS INT))
      || chr(10) || 'Tail & <end>' AS txt,
    length('<html><head><title>' || source
      || '</title><script>var a=1;</script><style>.x{}</style></head><body><h1>Doc '
      || CAST(doc_id AS VARCHAR) || '</h1><p>' || text || '</p><!-- c --><ul>'
      || repeat('<li><a href="#">link</a></li>', CAST(doc_id % 3 AS INT))
      || '</ul><p>Tail &amp; &lt;end&gt;</p></body></html>') AS hlen
  FROM documents)
SELECT doc_id, txt AS text,
  CAST(4 + k AS INT) AS n_lines,
  CAST(length(txt) AS BIGINT) AS n_chars,
  k AS n_links,
  CAST(1 AS INT) AS n_scripts,
  CAST(length(txt) AS DOUBLE) / hlen AS text_ratio
FROM h
"""


def q_quality_classifier(spark, sf):
    """Fasttext-shaped linear classifier inference
    (operators/classifier.py::hashed_classifier_score): unigram+bigram
    features, hashing-trick integer weights, mean-weight score — one
    codegen'd expression, no join, no UDF. The md5-derived weights make
    the whole inference (featurize → look up → exact integer sum →
    threshold) reproducible in DuckDB; the broadcast-join path for real
    trained weight tables is pinned equivalent by
    tests/test_classifier.py::test_explicit_weight_table_matches_hashed."""
    from dataingestion_spark.operators.classifier import hashed_classifier_score

    return hashed_classifier_score(_t(spark, sf, "documents"))


def _oracle_classifier() -> str:
    def nib(i):
        return f"(instr('0123456789abcdef', substr(h, {i}, 1)) - 1)"

    val = f"({nib(1)}*4096 + {nib(2)}*256 + {nib(3)}*16 + {nib(4)})"
    return f"""
WITH f AS (
  SELECT CAST(doc_id AS BIGINT) AS doc_id,
         list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                     w -> len(w) > 0) AS ws
  FROM documents),
feats AS (
  SELECT doc_id,
         ws || CASE WHEN len(ws) >= 2
               THEN list_transform(range(1, len(ws)), i -> ws[i] || ' ' || ws[i+1])
               ELSE [] END AS fs
  FROM f),
agg AS (
  SELECT doc_id, len(fs) AS n,
         COALESCE(list_aggregate(
           list_transform(list_transform(fs, x -> md5('w:' || x)),
                          h -> {val} % 2001 - 1000), 'sum'), 0) AS wsum
  FROM feats)
SELECT doc_id, CAST(n AS INT) AS n_features, CAST(wsum AS BIGINT) AS weight_sum,
  CASE WHEN n > 0 THEN CAST(wsum AS DOUBLE) / (CAST(1000 AS DOUBLE) * n)
       ELSE 0.0 END AS score,
  (CASE WHEN n > 0 THEN CAST(wsum AS DOUBLE) / (CAST(1000 AS DOUBLE) * n)
        ELSE 0.0 END) > 0.0 AS keep
FROM agg
"""


def q_url_signals(spark, sf):
    """URL curation (operators/urls.py): deterministic synthetic URLs —
    uppercase scheme/host, default port, userinfo-free, tracking params,
    fragment, co.uk public-suffix cases — pushed through the real
    normalize / eTLD+1 / blocklist projections; the oracle states the
    expected outputs arithmetically, so the whole synthesize→extract
    round trip is pinned. Pure codegen'd expressions: runs at scan
    speed at 100 TB."""
    from dataingestion_spark.operators.urls import url_signals

    docs = _t(spark, sf, "documents")
    tld = F.when(F.col("doc_id") % 5 == 0, ".Example.CO.UK").otherwise(".Example.COM")
    url = F.concat(
        F.lit("HTTPS://WWW."), F.col("source"), tld,
        F.repeat(F.lit("/p"), (F.col("doc_id") % 4).cast("int")),
        F.lit("?utm_source=x&id="), (F.col("doc_id") % 7).cast("string"),
        F.lit("&q=z#frag"),
    )
    return url_signals(
        docs.select("doc_id", url.alias("url")),
        blocklist=("example.co.uk",),
    )


ORACLE_URL_SIGNALS = """
SELECT CAST(doc_id AS BIGINT) AS doc_id,
  'https://www.' || source
    || CASE WHEN doc_id % 5 = 0 THEN '.example.co.uk' ELSE '.example.com' END
    || repeat('/p', CAST(doc_id % 4 AS INT))
    || '?id=' || CAST(doc_id % 7 AS VARCHAR) || '&q=z' AS normalized_url,
  'www.' || source
    || CASE WHEN doc_id % 5 = 0 THEN '.example.co.uk' ELSE '.example.com' END AS host,
  CASE WHEN doc_id % 5 = 0 THEN 'example.co.uk' ELSE 'example.com' END
    AS registered_domain,
  CAST(doc_id % 4 AS INT) AS path_depth,
  CAST(2 AS INT) AS n_query_params,
  (doc_id % 5 = 0) AS is_blocked
FROM documents
"""


def q_url_psl_domain(spark, sf):
    """Full Public-Suffix-List eTLD+1 (operators/urls.py::
    registered_domain_psl): synthetic hosts exercising normal, wildcard
    (*.ck), exception (!www.ck, !city.kobe.jp), and longest-match rules,
    resolved via the broadcast rule join. The oracle states every case's
    public suffix + registered domain in closed form, so the full PSL
    precedence algorithm is pinned end to end."""
    from dataingestion_spark.operators.urls import psl_rules, registered_domain_psl

    docs = _t(spark, sf, "documents")
    m = F.col("doc_id") % 6
    host = (
        F.when(m == 0, F.concat(F.lit("a."), F.col("source"), F.lit(".com")))
        .when(m == 1, F.concat(F.lit("b."), F.col("source"), F.lit(".co.uk")))
        .when(m == 2, F.concat(F.col("source"), F.lit(".ck")))
        .when(m == 3, F.concat(F.lit("x."), F.col("source"), F.lit(".ck")))
        .when(m == 4, F.lit("sub.www.ck"))
        .otherwise(F.lit("y.city.kobe.jp"))
    )
    rules = psl_rules(spark, [
        "com", "uk", "co.uk", "ck", "*.ck", "!www.ck",
        "jp", "kobe.jp", "*.kobe.jp", "!city.kobe.jp",
    ])
    out = registered_domain_psl(
        docs.select("doc_id", host.alias("host")), rules
    )
    return out.select("doc_id", "host", "public_suffix", "registered_domain")


ORACLE_URL_PSL = """
SELECT CAST(doc_id AS BIGINT) AS doc_id,
  CASE doc_id % 6
    WHEN 0 THEN 'a.' || source || '.com'
    WHEN 1 THEN 'b.' || source || '.co.uk'
    WHEN 2 THEN source || '.ck'
    WHEN 3 THEN 'x.' || source || '.ck'
    WHEN 4 THEN 'sub.www.ck'
    ELSE 'y.city.kobe.jp' END AS host,
  CASE doc_id % 6
    WHEN 0 THEN 'com'
    WHEN 1 THEN 'co.uk'
    WHEN 2 THEN lower(source) || '.ck'
    WHEN 3 THEN lower(source) || '.ck'
    WHEN 4 THEN 'ck'
    ELSE 'kobe.jp' END AS public_suffix,
  CASE doc_id % 6
    WHEN 0 THEN lower(source) || '.com'
    WHEN 1 THEN lower(source) || '.co.uk'
    WHEN 2 THEN NULL
    WHEN 3 THEN 'x.' || lower(source) || '.ck'
    WHEN 4 THEN 'www.ck'
    ELSE 'city.kobe.jp' END AS registered_domain
FROM documents
"""


def q_warc_responses(spark, sf):
    """The full crawl-to-corpus chain in one plan: WARC *response*
    records (HTTP status line + headers + HTML body, synthesized
    JVM-side per document) → mapInPandas record parse → expression-only
    HTTP split (sources/warc.py::split_http_payload) → expression-only
    HTML extraction (operators/html_extract.py). Three real operators
    composed; the oracle states the end-to-end expected output in
    closed form."""
    from dataingestion_spark.operators.html_extract import html_to_text
    from dataingestion_spark.sources.warc import (
        parse_warc_files,
        split_http_payload,
        wet_record_expr,
    )

    docs = _t(spark, sf, "documents")
    uri = F.concat(
        F.lit("http://synth.local/"), F.col("source"),
        F.lit("/"), F.col("doc_id").cast("string"),
    )
    html = F.concat(
        F.lit("<html><body><h1>"), F.col("source"),
        F.lit("</h1><p>"), F.col("text"), F.lit("</p></body></html>"),
    )
    payload = F.concat(
        F.lit("HTTP/1.1 200 OK\r\nContent-Type: text/html\r\nX-Doc: "),
        F.col("doc_id").cast("string"), F.lit("\r\n\r\n"), html,
    )
    recs = docs.select(
        (F.col("doc_id") % 8).cast("string").alias("path"),
        F.struct(
            F.col("doc_id"),
            wet_record_expr(
                uri, payload, warc_type="response",
                content_type="application/http; msgtype=response",
            ).alias("rec"),
        ).alias("s"),
    )
    files = recs.groupBy("path").agg(
        F.concat_ws(
            "", F.transform(F.array_sort(F.collect_list("s")), lambda s: s["rec"])
        ).cast("binary").alias("content")
    )
    parsed = split_http_payload(parse_warc_files(files))
    return parsed.select(
        F.col("target_uri").alias("uri"),
        "http_status",
        F.col("http_content_type").alias("content_type"),
        html_to_text(F.col("http_body")).alias("text"),
        F.length(html_to_text(F.col("http_body"))).cast("long").alias("n_chars"),
    )


ORACLE_WARC_RESPONSES = """
SELECT 'http://synth.local/' || source || '/' || CAST(doc_id AS VARCHAR) AS uri,
  CAST(200 AS INT) AS http_status,
  'text/html' AS content_type,
  source || chr(10) || text AS text,
  CAST(length(source) + 1 + length(text) AS BIGINT) AS n_chars
FROM documents
"""


ORACLE_WET_RECORDS = """
SELECT 'http://synth.local/' || source || '/' || CAST(doc_id AS VARCHAR) AS uri,
  CAST(ROW_NUMBER() OVER (PARTITION BY doc_id % 8 ORDER BY doc_id) - 1 AS BIGINT)
    AS record_idx,
  CAST(octet_length(encode(text)) AS BIGINT) AS content_length,
  CAST(length(text) AS BIGINT) AS n_chars
FROM documents
"""


def q_token_chunks(spark, sf):
    return token_chunk_text(
        _t(spark, sf, "documents"), text_col="text", id_col="doc_id",
        max_tokens=64, overlap=16,
    )


ORACLE_TOKEN_CHUNKS = """
WITH w AS (
  SELECT CAST(doc_id AS VARCHAR) AS doc_id,
         regexp_split_to_array(trim(text), '\\s+') AS toks
  FROM documents),
x AS (
  SELECT doc_id, toks,
         unnest(generate_series(0, greatest(CAST(ceil(len(toks) / 48.0) AS BIGINT) - 1, 0))) AS win
  FROM w)
SELECT printf('%s#%06d', doc_id, win) AS chunk_id, doc_id,
       CAST(win AS INT) AS chunk_seq,
       array_to_string(list_slice(toks, win*48 + 1, win*48 + 64), ' ') AS content
FROM x
"""


def q_enrich_fakes(spark, sf):
    d = fan_out(_t(spark, sf, "documents")).select(
        F.col("doc_id").cast("long").alias("doc_id"), F.col("text").alias("content")
    )
    d = summary_enricher(d)
    d = classification_enricher(d, classes=["join", "stream", "vector"])
    d = sentiment_enricher(d)
    d = keyword_enricher(d)
    return d.select(
        "doc_id", "summary", "classification", "sentiment",
        F.array_join("keywords", ",").alias("keywords_csv"),
    )


def _oracle_enrich() -> str:
    from dataingestion_spark.operators.enrichers import NEGATIVE_WORDS, POSITIVE_WORDS

    pos = ", ".join(f"'{w}'" for w in POSITIVE_WORDS)
    neg = ", ".join(f"'{w}'" for w in NEGATIVE_WORDS)
    cls_counts = {
        c: f"len(list_filter(w, x -> x = '{c}'))" for c in ["join", "stream", "vector"]
    }
    best = "greatest({})".format(", ".join(cls_counts.values()))
    case = "CASE"
    for c in ["join", "stream", "vector"]:
        case += f" WHEN {best} > 0 AND {cls_counts[c]} = {best} THEN '{c}'"
    case += " ELSE 'Unknown' END"
    return f"""
WITH base AS (
  SELECT CAST(doc_id AS BIGINT) AS doc_id, text,
         regexp_split_to_array(trim(text), '\\s+') AS w
  FROM documents),
kw AS (
  SELECT doc_id, array_to_string(list_slice(ks, 1, 5), ',') AS keywords_csv
  FROM (
    SELECT doc_id, list(kword ORDER BY cnt DESC, kword ASC) AS ks
    FROM (
      SELECT doc_id, kword, COUNT(*) AS cnt FROM (
        SELECT doc_id, unnest(list_filter(w, x -> length(x) >= 5)) AS kword
        FROM base)
      GROUP BY doc_id, kword)
    GROUP BY doc_id))
SELECT b.doc_id,
  array_to_string(list_slice(b.w, 1, 10), ' ') AS summary,
  {case} AS classification,
  CASE WHEN len(list_filter(w, x -> x IN ({pos}))) > len(list_filter(w, x -> x IN ({neg}))) THEN 'Positive'
       WHEN len(list_filter(w, x -> x IN ({neg}))) > len(list_filter(w, x -> x IN ({pos}))) THEN 'Negative'
       ELSE 'Neutral' END AS sentiment,
  coalesce(kw.keywords_csv, '') AS keywords_csv
FROM base b LEFT JOIN kw ON b.doc_id = kw.doc_id
"""


def q_vector_records(spark, sf):
    chunks = q_token_chunks(spark, sf).withColumn(
        "context", F.lit(None).cast("string")
    )
    recs = build_vector_records(
        chunks, embed=lambda c: fake_embedding(c, dims=4), deterministic_keys=True
    )
    return recs.select(
        "key", "documentid", "content",
        *[F.col("embedding")[d].cast("double").alias(f"emb{d}") for d in range(4)],
    )


def _oracle_vector_records() -> str:
    embs = []
    for d in range(4):
        h = f"md5(concat(content, ':{d}'))"
        hv1 = f"(strpos('0123456789abcdef', substring({h}, 1, 1)) - 1)"
        hv2 = f"(strpos('0123456789abcdef', substring({h}, 2, 1)) - 1)"
        embs.append(f"CAST(({hv1} * 16 + {hv2}) AS DOUBLE) / 256.0 AS emb{d}")
    return f"""
WITH c AS ({ORACLE_TOKEN_CHUNKS.strip()})
SELECT chunk_id AS key, doc_id AS documentid, content, {", ".join(embs)}
FROM c
"""


def q_semantic_chunks(spark, sf):
    from dataingestion_spark.operators.chunkers import semantic_chunker

    ch = semantic_chunker(
        _fixture_elements_df(spark), _hash_embed, _FIXED_OPTS, threshold_percentile=50.0
    )
    return ch.select(*_CHUNK_COLS)


def _hash_embed(texts):
    """Deterministic md5-derived embeddings (driver- and executor-side
    reproducible; python mirror of sinks.vector_store.fake_embedding)."""
    import hashlib

    import numpy as np

    out = []
    for t in texts:
        vec = []
        for d in range(8):
            h = hashlib.md5(f"{t}:{d}".encode()).hexdigest()
            vec.append(int(h[:2], 16) / 256.0)
        out.append(vec)
    return np.array(out)


def _oracle_semantic() -> str:
    from dataingestion_spark.operators.chunkers import semantic_chunk_doc

    return _values_oracle(
        _fixture_chunk_golden(
            lambda rows: semantic_chunk_doc(rows, _FIXED_OPTS, _hash_embed, 50.0)
        ),
        _CHUNK_COLS, _CHUNK_TYPES,
    )


def q_image_alt_enricher(spark, sf):
    from dataingestion_spark.operators.enrichers import image_alt_text_enricher

    el = image_alt_text_enricher(_fixture_elements_df(spark))
    return el.filter(F.col("elem_type") == "image").select(
        "doc_id", "seq", "image_alt_text"
    )


def _oracle_image_alt() -> str:
    rows = []
    for r in _fixture_rows_local():
        if r["elem_type"] != "image":
            continue
        alt = r["image_alt_text"]
        if alt is None and r["image_content"] is not None and r["image_media_type"]:
            alt = f"Image ({r['image_media_type']}, {len(r['image_content'])} bytes)"
        rows.append((r["doc_id"], r["seq"], alt))
    return _values_oracle(
        rows, ["doc_id", "seq", "image_alt_text"], ["VARCHAR", "BIGINT", "VARCHAR"]
    )


def q_qa_pairs(spark, sf):
    from dataingestion_spark.operators.qa import qa_pairs

    chunks = q_token_chunks(spark, sf)
    return qa_pairs(chunks)


ORACLE_QA = """
WITH c AS ({token_chunks}),
w AS (SELECT chunk_id, doc_id, regexp_split_to_array(trim(content), '\\s+') AS toks FROM c),
x AS (
  SELECT chunk_id, doc_id, toks,
    unnest(generate_series(0, least(greatest(CAST(ceil(len(toks) / 12.0) AS BIGINT) - 1, 0), 9))) AS i
  FROM w)
SELECT chunk_id, doc_id,
  concat('What is ', array_to_string(list_slice(toks, i*12 + 1, i*12 + 3), ' '), '?') AS question,
  array_to_string(list_slice(toks, i*12 + 1, i*12 + 12), ' ') AS answer
FROM x
"""


def q_image_chunks(spark, sf):
    from dataingestion_spark.operators.chunkers import image_chunker

    ch = image_chunker(_fixture_elements_df(spark))
    return ch.select(
        "chunk_id", "doc_id", "chunk_seq", "content", "content_media_type"
    )


def _oracle_image_chunks() -> str:
    rows = []
    for r in _fixture_rows_local():
        if r["elem_type"] == "image" and r["image_content"] is not None:
            rows.append(
                (
                    f"{r['doc_id']}#img{r['seq']:06d}",
                    r["doc_id"],
                    r["seq"],
                    r["image_alt_text"] or r["text"],
                    r["image_media_type"],
                )
            )
    return _values_oracle(
        rows,
        ["chunk_id", "doc_id", "chunk_seq", "content", "content_media_type"],
        ["VARCHAR", "VARCHAR", "INTEGER", "VARCHAR", "VARCHAR"],
    )


def q_writer_incremental(spark, sf):
    """Rows-only E2E: write a 3-doc vector table, incrementally replace one
    document, return the final table — pins the insert-before-swap replace
    semantics (VectorStoreWriterTests.cs:79-136) under the driver's eye."""
    import tempfile

    from dataingestion_spark.sinks.vector_store import (
        read_vector_table, write_vector_table,
    )

    docs = {k: FIXTURE_DOCS[k] for k in ("fx_guide", "fx_list", "fx_plain")}
    src = spark.createDataFrame(sorted(docs.items()), "doc_id string, markdown string")
    chunks = header_chunker(
        parse_markdown_df(src, "doc_id", "markdown"), _FIXED_OPTS
    )
    path = tempfile.mkdtemp(prefix="vt_incr_") + "/table"
    write_vector_table(chunks, path, deterministic_keys=True)

    replacement = spark.createDataFrame(
        [("fx_plain", "# Replaced\n\nnew body one\n\nnew body two")],
        "doc_id string, markdown string",
    )
    chunks2 = header_chunker(
        parse_markdown_df(replacement, "doc_id", "markdown"), _FIXED_OPTS
    )
    write_vector_table(chunks2, path, incremental=True, deterministic_keys=True)
    return read_vector_table(spark, path).select(
        "key", "documentid", "content", "context"
    )


def _oracle_writer_incremental() -> str:
    docs = {k: FIXTURE_DOCS[k] for k in ("fx_guide", "fx_list")}
    rows = []
    by_doc = {}
    for doc_id, md in sorted(docs.items()):
        by_doc[doc_id] = parse_markdown(md, doc_id)
    by_doc["fx_plain"] = parse_markdown(
        "# Replaced\n\nnew body one\n\nnew body two", "fx_plain"
    )
    for doc_id in sorted(by_doc):
        for i, c in enumerate(header_chunk_doc(by_doc[doc_id], _FIXED_OPTS)):
            rows.append(
                (f"{doc_id}#{i:06d}", doc_id, c["content"], c.get("context"))
            )
    return _values_oracle(
        rows, ["key", "documentid", "content", "context"],
        ["VARCHAR", "VARCHAR", "VARCHAR", "VARCHAR"],
    )


def q_lakehouse_merge(spark, sf):
    """Delta-style MERGE INTO on the manifest store
    (sinks/manifest_store.py::merge_table), E2E through real table commits:

    * base table = documents with doc_id % 3 != 0;
    * merge 1 (upsert): source = doc_id % 2 == 0 slice with 'v2 '-prefixed
      text and n_chars+3, matched_condition "target.n_chars % 2 = 0" —
      update only rows whose STORED n_chars is even, insert the unmatched;
    * merge 2 (conditional delete): matched doc_id % 7 == 0 keys deleted,
      unmatched source rows dropped (when_not_matched=None).

    The oracle restates both merges as joins over the same parquet. The
    updates/deletes travel as equality deletion vectors (one O(batch)
    commit each), so this also pins the DV read path under the driver."""
    import tempfile

    from dataingestion_spark.sinks import manifest_store as ms

    from concurrent.futures import ThreadPoolExecutor

    docs = _t(spark, sf, "documents").select(
        F.col("doc_id").cast("string").alias("documentid"),
        "text", "lang", "n_chars",
    )
    table = tempfile.mkdtemp(prefix="merge_lh_") + "/t"
    src1 = (
        docs.filter(F.col("doc_id") % 2 == 0)
        .withColumn("text", F.concat(F.lit("v2 "), F.col("text")))
        .withColumn("n_chars", F.col("n_chars") + F.lit(3))
    )
    src2 = docs.filter(F.col("doc_id") % 7 == 0).select("documentid")
    # §2.6 overlap: each merge's precheck job reads only its OWN source,
    # so both run from a thread pool while the seed write commits — the
    # commit ORDER (write → merge 1 → merge 2) and every commit's view
    # of prior table state are unchanged; results identical (oracled).
    with ThreadPoolExecutor(max_workers=2) as pool:
        p1 = pool.submit(ms.prepare_batch, src1)
        p2 = pool.submit(ms.prepare_batch, src2)
        ms.write_table(docs.filter(F.col("doc_id") % 3 != 0), table)
        ms.merge_table(src1, table,
                       matched_condition="target.n_chars % 2 = 0",
                       prepared=p1.result())
        ms.merge_table(src2, table, when_matched="delete",
                       when_not_matched=None, prepared=p2.result())
    return ms.read_table(spark, table).select(
        "documentid", "text", "lang", "n_chars"
    )


ORACLE_MERGE = """
WITH base AS (
  SELECT CAST(doc_id AS VARCHAR) AS documentid, text, lang, n_chars
  FROM documents WHERE doc_id % 3 <> 0),
src1 AS (
  SELECT CAST(doc_id AS VARCHAR) AS documentid, 'v2 ' || text AS text,
         lang, n_chars + 3 AS n_chars
  FROM documents WHERE doc_id % 2 = 0),
upd AS (
  SELECT s.* FROM src1 s JOIN base t ON s.documentid = t.documentid
  WHERE t.n_chars % 2 = 0),
m1 AS (
  SELECT * FROM base WHERE documentid NOT IN (SELECT documentid FROM upd)
  UNION ALL SELECT * FROM upd
  UNION ALL
  SELECT * FROM src1 WHERE documentid NOT IN (SELECT documentid FROM base))
SELECT documentid, text, lang, CAST(n_chars AS BIGINT) AS n_chars
FROM m1
WHERE documentid NOT IN
  (SELECT CAST(doc_id AS VARCHAR) FROM documents WHERE doc_id % 7 = 0)
"""


# ---------------------------------------------------------------------------
# E. streaming (rows-only check — not SQL-expressible)
# ---------------------------------------------------------------------------

def q_streaming_upsert(spark, sf):
    """Streaming MERGE INTO (streaming/pipeline.py::stream_upsert): a
    file-source stream of update batches applied per micro-batch as a
    conditional-free upsert against the manifest store — matched docs
    replaced, unmatched inserted, retried epochs no-ops via the
    merge_table (app, epoch) txn guard. The final table state is
    batching-independent (each id appears once in the source), so the
    oracle restates the merge as joins over the raw documents table —
    a fully SQL-oracled streaming+lakehouse query."""
    import tempfile

    from dataingestion_spark.sinks import manifest_store as ms
    from dataingestion_spark.streaming.pipeline import stream_upsert

    docs = _t(spark, sf, "documents").select(
        F.col("doc_id").cast("string").alias("documentid"),
        "text", "lang", "source", F.col("n_chars").cast("long").alias("n_chars"),
    )
    table = tempfile.mkdtemp(prefix="upsert_lh_") + "/t"
    ms.write_table(docs.filter(F.col("doc_id").cast("long") % 3 != 0), table)
    src_dir = tempfile.mkdtemp(prefix="upsert_src_")
    (_t(spark, sf, "documents").filter(F.col("doc_id") % 2 == 0)
     .withColumn("text", F.concat(F.lit("v2 "), F.col("text")))
     .select("doc_id", "text", "lang", "source",
             F.col("n_chars").cast("long").alias("n_chars"))
     .coalesce(1).write.mode("overwrite").parquet(src_dir))
    stream_upsert(spark, src_dir, table).awaitTermination()
    return ms.read_table(spark, table).select(
        "documentid", "text", "lang", "n_chars")


ORACLE_STREAM_UPSERT = """
WITH base AS (
  SELECT CAST(doc_id AS VARCHAR) AS documentid, text, lang, n_chars
  FROM documents WHERE doc_id % 3 <> 0),
upd AS (
  SELECT CAST(doc_id AS VARCHAR) AS documentid, 'v2 ' || text AS text,
         lang, n_chars
  FROM documents WHERE doc_id % 2 = 0)
SELECT documentid, text, lang, CAST(n_chars AS BIGINT) AS n_chars FROM (
  SELECT * FROM base WHERE documentid NOT IN (SELECT documentid FROM upd)
  UNION ALL SELECT * FROM upd)
"""


def q_streaming_events(spark, sf):
    from dataingestion_spark.streaming.pipeline import stream_events_windowed

    # The NTZ→timestamp cast in normalize_event_ts is session-timezone
    # dependent; pin UTC so window boundaries match the oracle everywhere.
    _utc(spark)
    name = "events_windowed_check"
    q = stream_events_windowed(spark, sf, query_name=name)
    q.awaitTermination()
    return spark.table(name)


def q_streaming_tws_stats(spark, sf):
    """Arbitrary stateful streaming on the state API v2
    (streaming/tws.py::stream_user_type_stats): transformWithStateInPandas
    + MapState + RocksDB state store, run LIVE — when the real protobuf
    package is absent, the repo's minimal pure-python protobuf runtime
    (shims/google/protobuf) is shipped to the workers, so the JVM state
    server protocol works end-to-end. Totals are exact and
    order-independent (count/min/max), so the drained emission log reduces
    to a plain GROUP BY — a fully SQL-oracled stateful-v2 streaming
    query."""
    from dataingestion_spark.streaming import tws

    _utc(spark)
    name = "tws_user_type_stats_check"
    q = tws.stream_user_type_stats(spark, sf, query_name=name)
    q.awaitTermination()
    return tws.final_totals(spark.table(name)).select(
        "user_id", "event_type", "n",
        F.round("min_value", 6).alias("min_r"),
        F.round("max_value", 6).alias("max_r"),
    )


ORACLE_TWS_STATS = """
SELECT user_id, event_type, COUNT(*) AS n,
       ROUND(MIN(value), 6) AS min_r, ROUND(MAX(value), 6) AS max_r
FROM events GROUP BY user_id, event_type
"""


def q_streaming_stateful(spark, sf):
    """Custom stateful streaming op (applyInPandasWithState), restated
    as an ORACLED drained-equals-batch check (r6/r7/r8 ask): the file
    stream drains with availableNow (one file per micro-batch), the
    update-mode memory sink accumulates one row per touched user per
    batch, and the FINAL emission per user — the max running n_events,
    strictly monotone per key — must equal the plain batch GROUP BY
    over the same events, which DuckDB restates in closed form. A
    dropped micro-batch, lost state, or double-applied batch changes
    the final (n_events, sum_value) and goes red. Intermediate
    emission history stays pinned by
    tests/test_streaming.py::test_stateful_running_stats."""
    from dataingestion_spark.streaming.stateful import stream_user_running_stats

    _utc(spark)
    name = "user_stats_check"
    q = stream_user_running_stats(spark, sf, query_name=name)
    q.awaitTermination()
    emitted = spark.table(name)
    w = W.partitionBy("user_id").orderBy(F.col("n_events").desc())
    return (
        emitted.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(
            F.col("user_id").cast("long").alias("user_id"),
            "n_events",
            F.round("sum_value", 4).alias("sum_value"))
    )


ORACLE_STREAMING_STATEFUL = """
SELECT CAST(user_id AS BIGINT) AS user_id,
       COUNT(*) AS n_events,
       round(SUM(value), 4) AS sum_value
FROM events GROUP BY user_id
"""


def q_phrase_search(spark, sf):
    """Positional phrase search (operators/text_search.py::phrase_search):
    documents containing consecutive tokens 'batch batch', with overlap-
    counted match totals. One explode + one groupBy — the i-th phrase
    term at position p anchors start p−i; a start where every phrase
    slot anchors is a match. The repeated term exercises the distinct-
    slot counting path."""
    from dataingestion_spark.operators.text_search import phrase_search

    docs = _t(spark, sf, "documents")
    out = phrase_search(docs, "batch batch")
    return out.select("doc_id", "n_matches")


ORACLE_PHRASE = r"""
WITH toks0 AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS ws FROM documents),
toks AS (
  SELECT doc_id, ws[CAST(i AS INTEGER) + 1] AS term, CAST(i AS INTEGER) AS pos
  FROM toks0, unnest(range(0, len(ws))) AS t(i)
  WHERE ws[CAST(i AS INTEGER) + 1] <> ''),
anchors AS (
  SELECT doc_id, pos - s.slot AS st, s.slot
  FROM toks JOIN (VALUES ('batch', 0), ('batch', 1)) AS s(term, slot)
    ON toks.term = s.term
  WHERE pos - s.slot >= 0),
m AS (
  SELECT doc_id, st FROM anchors GROUP BY doc_id, st
  HAVING COUNT(DISTINCT slot) = 2)
SELECT doc_id, COUNT(*) AS n_matches FROM m GROUP BY doc_id
"""


def q_image_tiles(spark, sf):
    """Image tiling plumbing (operators/multimodal.py::image_tiles):
    synthesized PNGs (width = doc_id%640+1, height = doc_id%480+1)
    probed by image_metadata, then a 128×128 tile grid with truncated
    edge tiles — pixel-rectangle math restated in closed form by the
    oracle."""
    from dataingestion_spark.operators.multimodal import (
        image_metadata, image_tiles,
    )

    docs = _t(spark, sf, "documents")
    w = (F.col("doc_id") % 640 + 1).cast("int")
    h = (F.col("doc_id") % 480 + 1).cast("int")
    binary = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.concat(
            F.unhex(
                F.concat(
                    F.lit("89504E470D0A1A0A0000000D49484452"),
                    F.format_string("%08x", w),
                    F.format_string("%08x", h),
                )
            ),
            F.col("text").cast("binary"),
        ).alias("image_content"),
    )
    meta = image_metadata(binary, id_cols=(("doc_id", "long"),))
    return image_tiles(meta, 128, 128)


ORACLE_IMAGE_TILES = """
WITH m AS (
  SELECT doc_id, CAST(doc_id % 640 + 1 AS BIGINT) AS w,
         CAST(doc_id % 480 + 1 AS BIGINT) AS h
  FROM documents),
g AS (
  SELECT doc_id, w, h, CAST(tx.i AS BIGINT) AS tile_x,
         CAST(ty.i AS BIGINT) AS tile_y
  FROM m,
       unnest(range(0, CAST(ceil(w / 128.0) AS BIGINT))) AS tx(i),
       unnest(range(0, CAST(ceil(h / 128.0) AS BIGINT))) AS ty(i))
SELECT doc_id, tile_x, tile_y,
       tile_x * 128 AS x0, tile_y * 128 AS y0,
       LEAST(tile_x * 128 + 128, w) AS x1,
       LEAST(tile_y * 128 + 128, h) AS y1
FROM g
"""


def q_audio_segments(spark, sf):
    """Audio segmentation plumbing
    (operators/multimodal.py::audio_segments): synthesized WAV headers
    (byte rate 1000 → duration == payload bytes) probed by
    audio_metadata, then 300 ms windows at 200 ms hop with block-aligned
    byte ranges — integer offset math the oracle restates in closed
    form. Decode stays stubbed; the slicing arithmetic is the real
    product here."""
    from dataingestion_spark.operators.multimodal import (
        audio_metadata, audio_segments,
    )

    docs = _t(spark, sf, "documents")
    channels = (F.col("doc_id") % 2 + 1).cast("int")
    rate = (F.lit(8000) + F.col("doc_id") % 8).cast("int")

    def le(col, nbytes):
        parts = [
            F.format_string("%02x", F.shiftright(col, 8 * i).bitwiseAND(F.lit(0xFF)))
            for i in range(nbytes)
        ]
        return F.concat(*parts)

    header_hex = F.concat(
        F.lit("52494646"), F.lit("24080000"), F.lit("57415645"),
        F.lit("666d7420"), F.lit("10000000"), F.lit("0100"),
        le(channels, 2), le(rate, 4), le(F.lit(1000), 4),
        F.lit("0200"), F.lit("1000"), F.lit("64617461"), F.lit("00000000"),
    )
    binary = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.concat(F.unhex(header_hex), F.col("text").cast("binary"))
        .alias("audio_content"),
    )
    meta = audio_metadata(binary, id_cols=(("doc_id", "long"),))
    return audio_segments(meta, window_ms=300, hop_ms=200)


ORACLE_AUDIO_SEGMENTS = """
WITH m AS (
  SELECT doc_id, (doc_id % 2 + 1) * 2 AS block,
         CAST(length(text) AS BIGINT) AS dur
  FROM documents WHERE length(text) > 0),
s AS (
  SELECT doc_id, block, dur, CAST(t.i AS BIGINT) AS seg
  FROM m, unnest(range(0, GREATEST(CAST(ceil(dur / 200.0) AS BIGINT), 1))) AS t(i)),
w AS (
  SELECT doc_id, seg, seg * 200 AS t0,
         LEAST(seg * 200 + 300, dur) AS t1, block, dur
  FROM s)
SELECT doc_id, seg, t0 AS t_start_ms, t1 AS t_end_ms,
       44 + (t0 // block) * block AS byte_start,
       44 + CASE WHEN t1 = dur THEN dur
                 ELSE (t1 // block) * block END AS byte_end
FROM w
"""


def q_event_transitions(spark, sf):
    """Empirical Markov transition matrix
    (operators/temporal.py::transition_counts): per-user adjacent
    event-type pairs in (ts, event_id) order, with each pair's share of
    its from-state's outgoing transitions — exact-count ratios, so the
    whole matrix hash-matches."""
    from dataingestion_spark.operators.temporal import transition_counts

    _utc(spark)
    e = _events(spark, sf)
    return transition_counts(e, "ts", "user_id", "event_type",
                             tiebreak="event_id")


ORACLE_TRANSITIONS = """
WITH seq AS (
  SELECT user_id, event_type,
         lag(event_type) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS prev
  FROM events),
pairs AS (
  SELECT prev AS from_type, event_type AS to_type, COUNT(*) AS n
  FROM seq WHERE prev IS NOT NULL GROUP BY 1, 2),
tot AS (SELECT from_type, CAST(SUM(n) AS BIGINT) AS t FROM pairs GROUP BY 1)
SELECT p.from_type, p.to_type, p.n, round(p.n / t.t, 6) AS p
FROM pairs p JOIN tot t USING (from_type)
"""


def q_cohort_retention(spark, sf):
    """Cohort retention matrix
    (operators/temporal.py::cohort_retention): users cohorted by
    first-active DAY (epoch-floor), (cohort, offset) activity counts +
    cohort sizes — integer arithmetic only, exactly oracle-checkable."""
    from dataingestion_spark.operators.temporal import cohort_retention

    _utc(spark)
    e = _events(spark, sf)
    return cohort_retention(e, "ts", "user_id", period_seconds=86400)


ORACLE_COHORT = """
WITH act AS (
  SELECT DISTINCT user_id AS k,
         (epoch_us(ts) // 1000000) // 86400 AS p
  FROM events),
coh AS (SELECT k, MIN(p) AS c FROM act GROUP BY k),
sizes AS (SELECT c, COUNT(*) AS n_cohort FROM coh GROUP BY c),
ret AS (
  SELECT coh.c, act.p - coh.c AS period_offset, COUNT(*) AS n_active
  FROM act JOIN coh USING (k) GROUP BY 1, 2)
SELECT ret.c AS cohort_period, period_offset, n_active, n_cohort
FROM ret JOIN sizes USING (c)
"""


def _compression_corpus():
    """Deterministic corpus spanning the signal's range: fixture prose,
    highly repetitive boilerplate (~0.0x ratio), and md5-chain gibberish
    (~1.0) — synthesized identically at query and oracle build time."""
    import hashlib

    gib, h = [], b"seed"
    for _ in range(64):
        h = hashlib.md5(h).digest()
        gib.append(h.hex())
    rows = dict(FIXTURE_DOCS)
    rows["fx_repetitive"] = "lorem ipsum dolor sit amet " * 120
    rows["fx_gibberish"] = "".join(gib)
    return sorted(rows.items())


def q_compression_ratio(spark, sf):
    """Deflate compression-ratio quality signal
    (operators/text_analysis.py::compression_ratio). No relational
    deflate exists in any SQL engine, so the query runs over a
    deterministic synthesized corpus and the oracle pins the per-row
    zlib byte counts as literals (DEFLATE at a fixed level is
    deterministic for a given zlib build; the goldens come from the
    same build) — zlib itself stays operator-side only."""
    from dataingestion_spark.operators.text_analysis import compression_ratio

    docs = spark.createDataFrame(_compression_corpus(),
                                 "doc_id string, text string")
    return compression_ratio(docs)


def _oracle_compression_ratio() -> str:
    import zlib

    rows = []
    for doc_id, text in _compression_corpus():
        b = text.encode("utf-8")
        n, nd = len(b), len(zlib.compress(b, 6))
        rows.append((doc_id, n, nd, round(nd / max(n, 1), 6)))
    return _values_oracle(
        rows,
        ["doc_id", "n_bytes", "n_bytes_deflate", "compression_ratio"],
        ["VARCHAR", "BIGINT", "BIGINT", "DOUBLE"],
    )


def q_profile_table(spark, sf):
    """Column profiling (operators/quality_checks.py::profile_table):
    one wide aggregation pass over lineitem — per column: rows, nulls,
    exact distinct, min/max as strings, mean for numerics. Means are
    rounded in the comparison (sum order differs across engines in the
    last ulps; everything else is exact)."""
    from dataingestion_spark.operators.quality_checks import profile_table

    cols = ["l_orderkey", "l_quantity", "l_returnflag", "l_shipdate"]
    prof = profile_table(_t(spark, sf, "lineitem").select(*cols), cols)
    return prof.select(
        "column", "n_rows", "n_nulls", "n_distinct", "min_str", "max_str",
        F.round("mean", 6).alias("mean_r"),
    )


def _oracle_profile() -> str:
    arms = []
    for c, num in [("l_orderkey", True), ("l_quantity", True),
                   ("l_returnflag", False), ("l_shipdate", False)]:
        mean = (f"round(AVG(CAST({c} AS DOUBLE)), 6)" if num
                else "CAST(NULL AS DOUBLE)")
        arms.append(f"""
SELECT '{c}' AS column, COUNT(*) AS n_rows,
       CAST(SUM(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
       COUNT(DISTINCT {c}) AS n_distinct,
       CAST(MIN({c}) AS VARCHAR) AS min_str,
       CAST(MAX({c}) AS VARCHAR) AS max_str,
       {mean} AS mean_r
FROM lineitem""")
    return " UNION ALL ".join(arms)


def q_edit_distance_pairs(spark, sf):
    """Edit-distance similarity self-join
    (operators/dedup.py::edit_distance_pairs): 15-char name keys derived
    from documents, all pairs within levenshtein ≤ 2 via LOSSLESS q-gram
    blocking + exact verification. The oracle brute-forces every pair —
    hash equality proves the blocking dropped nothing."""
    from dataingestion_spark.operators.dedup import edit_distance_pairs

    names = _t(spark, sf, "documents").select(
        "doc_id", F.substring("text", 1, 15).alias("name")
    )
    return edit_distance_pairs(names, "name", "doc_id", max_dist=2)


ORACLE_EDIT_PAIRS = """
WITH s AS (SELECT doc_id, substring(text, 1, 15) AS name FROM documents)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       CAST(levenshtein(a.name, b.name) AS INTEGER) AS dist
FROM s a JOIN s b ON a.doc_id < b.doc_id
WHERE levenshtein(a.name, b.name) <= 2
"""


def q_rake_keywords(spark, sf):
    """RAKE keyword extraction
    (operators/text_search.py::rake_keywords; Rose et al. 2010 — the
    deterministic analog of the reference's LLM KeywordEnricher): top-3
    stopword-free phrases per document by degree/frequency word scores,
    per-phrase sums folded in position order (the BM25 fold). The whole
    pipeline — segmentation, stats, scoring, ranking — restated in SQL."""
    from dataingestion_spark.operators.text_search import rake_keywords

    return rake_keywords(_t(spark, sf, "documents"), k=3)


def _oracle_rake() -> str:
    from dataingestion_spark.operators.text_analysis import STOPWORDS

    stops = ", ".join(f"'{s}'" for s in STOPWORDS["en"])
    return rf"""
WITH tok AS (
  SELECT doc_id, CAST(t.i AS INTEGER) - 1 AS pos,
         ws[CAST(t.i AS INTEGER)] AS w
  FROM (SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS ws
        FROM documents),
       unnest(range(1, len(ws) + 1)) AS t(i)
  WHERE ws[CAST(t.i AS INTEGER)] <> ''),
m AS (SELECT doc_id, pos, w,
             CASE WHEN w IN ({stops}) THEN 1 ELSE 0 END AS s FROM tok),
g AS (SELECT doc_id, pos, w, s,
             SUM(s) OVER (PARTITION BY doc_id ORDER BY pos
                          ROWS UNBOUNDED PRECEDING) AS grp FROM m),
seg AS (SELECT doc_id, grp, pos, w FROM g WHERE s = 0),
ph AS (SELECT doc_id, grp, string_agg(w, ' ' ORDER BY pos) AS phrase,
              COUNT(*) AS len
       FROM seg GROUP BY 1, 2 HAVING COUNT(*) <= 4),
occ AS (SELECT seg.doc_id, seg.grp, seg.pos, seg.w, ph.len
        FROM seg JOIN ph USING (doc_id, grp)),
sc AS (SELECT w, CAST(SUM(len) AS DOUBLE) / COUNT(*) AS score
       FROM occ GROUP BY w),
psc AS (SELECT occ.doc_id, occ.grp,
               list_reduce(list(sc.score ORDER BY occ.pos),
                           (a, b) -> a + b) AS score
        FROM occ JOIN sc USING (w) GROUP BY 1, 2),
u AS (SELECT DISTINCT ph.doc_id, ph.phrase, psc.score
      FROM ph JOIN psc USING (doc_id, grp)),
r AS (SELECT doc_id, phrase, score,
             row_number() OVER (PARTITION BY doc_id
                                ORDER BY score DESC, phrase) AS rank
      FROM u)
SELECT doc_id, CAST(rank AS INTEGER) AS rank, phrase,
       round(score, 6) AS score
FROM r WHERE rank <= 3
"""


def q_collocations(spark, sf):
    """Top-20 collocations by PMI
    (operators/text_search.py::collocations): adjacent-pair counts vs
    unigram counts, ln of an exact integer ratio, min_count=5 floor,
    deterministic (pmi desc, w1, w2) ranking — fully oracle-checked."""
    from dataingestion_spark.operators.text_search import collocations

    return collocations(_t(spark, sf, "documents"), min_count=5, k=20)


ORACLE_COLLOCATIONS = r"""
WITH toks AS (
  SELECT regexp_split_to_array(trim(lower(text)), '\s+') AS ws FROM documents),
bi AS (
  SELECT ws[CAST(i AS INTEGER)] AS w1, ws[CAST(i AS INTEGER) + 1] AS w2,
         COUNT(*) AS n_pair
  FROM toks, unnest(range(1, len(ws))) AS t(i)
  WHERE ws[CAST(i AS INTEGER)] <> '' AND ws[CAST(i AS INTEGER) + 1] <> ''
  GROUP BY 1, 2),
uni AS (
  SELECT u.w, COUNT(*) AS n_w FROM toks, unnest(ws) AS u(w)
  WHERE u.w <> '' GROUP BY 1),
tot AS (SELECT SUM(n_pair) AS n FROM bi),
scored AS (
  SELECT bi.w1, bi.w2, bi.n_pair,
         ln(CAST(bi.n_pair AS DOUBLE) * tot.n
            / (CAST(u1.n_w AS DOUBLE) * u2.n_w)) AS pmi
  FROM bi
  JOIN uni u1 ON bi.w1 = u1.w
  JOIN uni u2 ON bi.w2 = u2.w
  CROSS JOIN tot
  WHERE bi.n_pair >= 5)
SELECT CAST(rank AS INTEGER) AS rank, w1, w2, n_pair, round(pmi, 6) AS pmi
FROM (SELECT *, row_number() OVER (ORDER BY pmi DESC, w1, w2) AS rank
      FROM scored)
WHERE rank <= 20
"""


def q_tfidf_top_terms(spark, sf):
    """Characteristic terms per source
    (operators/text_search.py::tfidf_top_terms): top-5 by tf·idf with
    idf = ln(1 + G/gf) over source groups; deterministic (score desc,
    term) ranking. The ln of one exact division is engine-stable, so
    the ranking and rounded scores hash-match."""
    from dataingestion_spark.operators.text_search import tfidf_top_terms

    return tfidf_top_terms(_t(spark, sf, "documents"), "source", k=5)


ORACLE_TFIDF = r"""
WITH occ AS (
  SELECT source AS grp,
         unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS term
  FROM documents),
tf AS (SELECT grp, term, COUNT(*) AS tf FROM occ WHERE term <> ''
       GROUP BY 1, 2),
gf AS (SELECT term, COUNT(*) AS gf FROM tf GROUP BY 1),
g AS (SELECT CAST(COUNT(DISTINCT source) AS DOUBLE) AS n FROM documents),
scored AS (
  SELECT tf.grp, tf.term, tf.tf,
         tf.tf * ln(1.0 + g.n / gf.gf) AS score
  FROM tf JOIN gf USING (term) CROSS JOIN g),
ranked AS (
  SELECT grp, term, tf, score,
         row_number() OVER (PARTITION BY grp
                            ORDER BY score DESC, term) AS rank
  FROM scored)
SELECT grp AS source, CAST(rank AS INTEGER) AS rank, term,
       tf, round(score, 6) AS score
FROM ranked WHERE rank <= 5
"""


def q_events_anomaly(spark, sf):
    """Rolling z-score anomaly detection
    (operators/temporal.py::rolling_zscore): per-user z over the 20
    PRECEDING event values (point excluded so outliers can't mask
    themselves), |z| > 3 flagged. Mean/variance from ordered-frame sums
    of x and x² — running frame sums accumulate in frame order in both
    engines (the moving-sum invariant), so even the float z values
    hash-match."""
    from dataingestion_spark.operators.temporal import rolling_zscore

    _utc(spark)
    e = _events(spark, sf)
    out = rolling_zscore(e, "ts", "user_id", "value",
                         window_rows=20, tiebreak="event_id")
    return out.select(
        "event_id", "user_id", F.round("z", 6).alias("z_r"), "anomaly"
    )


ORACLE_ANOMALY = """
WITH f AS (
  SELECT event_id, user_id, CAST(value AS DOUBLE) AS x,
    COUNT(value) OVER w AS n,
    SUM(CAST(value AS DOUBLE)) OVER w AS sx,
    SUM(CAST(value AS DOUBLE) * CAST(value AS DOUBLE)) OVER w AS sxx
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING)),
z AS (
  SELECT event_id, user_id,
    CASE WHEN n >= 2
          AND sqrt(GREATEST((sxx - sx * sx / n) / (n - 1.0), 0.0)) > 0
         THEN (x - sx / n)
              / sqrt(GREATEST((sxx - sx * sx / n) / (n - 1.0), 0.0))
    END AS zval
  FROM f)
SELECT event_id, user_id, round(zval, 6) AS z_r,
       COALESCE(abs(zval) > 3.0, FALSE) AS anomaly
FROM z
"""


def q_triangle_count(spark, sf):
    """Per-node triangle counting (operators/graph.py::triangle_count)
    over the nation co-trade graph (customer-nation ↔ supplier-nation
    pairs that traded, the PageRank query's edge list): canonical a<b
    edges, wedge join + closing-edge join, one explode+groupBy. The
    oracle restates the two joins in SQL."""
    from dataingestion_spark.operators.graph import triangle_count

    li = _t(spark, sf, "lineitem")
    o = _t(spark, sf, "orders")
    c = _t(spark, sf, "customer")
    s = _t(spark, sf, "supplier")
    n = _t(spark, sf, "nation")
    edges = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .join(s, li["l_suppkey"] == s["s_suppkey"])
        .filter(c["c_nationkey"] != s["s_nationkey"])
        .select(c["c_nationkey"].alias("src"), s["s_nationkey"].alias("dst"))
    )
    out = triangle_count(edges)
    return (
        out.join(n, out["node"] == n["n_nationkey"])
        .select(F.col("n_name").alias("nation"), "n_triangles")
    )


ORACLE_TRIANGLES = """
WITH e0 AS (
  SELECT DISTINCT LEAST(c.c_nationkey, s.s_nationkey) AS a,
                  GREATEST(c.c_nationkey, s.s_nationkey) AS b
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  WHERE c.c_nationkey <> s.s_nationkey),
canon AS (SELECT a, b FROM e0 WHERE a < b),
tri AS (
  SELECT w.a, w.b, w.c FROM
    (SELECT e1.a, e1.b, e2.b AS c FROM canon e1
     JOIN canon e2 ON e1.a = e2.a AND e1.b < e2.b) w
  JOIN canon e3 ON e3.a = w.b AND e3.b = w.c),
per_node AS (
  SELECT node, COUNT(*) AS n_triangles FROM (
    SELECT a AS node FROM tri UNION ALL SELECT b FROM tri
    UNION ALL SELECT c FROM tri)
  GROUP BY node)
SELECT n.n_name AS nation, p.n_triangles
FROM per_node p JOIN nation n ON p.node = n.n_nationkey
"""


def q_kfold_assign(spark, sf):
    """K-fold CV assignment (operators/sharding.py::kfold_assign):
    append-stable md5 folds, k=5; per-fold counts and char totals.
    Same hex-fold construction as hash_split — oracle via the SQL twin."""
    from dataingestion_spark.operators.sharding import kfold_assign

    docs = _t(spark, sf, "documents").select("doc_id", "n_chars")
    return (
        kfold_assign(docs, 5)
        .groupBy("fold")
        .agg(F.count("*").alias("n_docs"),
             F.sum("n_chars").alias("n_chars_total"))
    )


def _oracle_kfold() -> str:
    from dataingestion_spark.operators.sharding import kfold_assign_sql

    return f"""
SELECT {kfold_assign_sql(5)} AS fold, COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS n_chars_total
FROM documents GROUP BY 1
"""


def q_curriculum_buckets(spark, sf):
    """Curriculum bucketing (operators/sharding.py::curriculum_buckets):
    equal-count ntile(10) over ascending n_chars (ties by doc_id) —
    identical ntile semantics in DuckDB, so the full assignment is
    hash-checked, not just bucket sizes."""
    from dataingestion_spark.operators.sharding import curriculum_buckets

    docs = _t(spark, sf, "documents").select("doc_id", "n_chars")
    return curriculum_buckets(docs, "n_chars", 10).select(
        "doc_id", "n_chars", "bucket"
    )


ORACLE_CURRICULUM = """
SELECT doc_id, n_chars,
       CAST(ntile(10) OVER (ORDER BY n_chars, doc_id) AS INTEGER) AS bucket
FROM documents
"""


def q_script_profile(spark, sf):
    """Unicode script composition
    (operators/text_analysis.py::script_profile): documents salted with
    Cyrillic/CJK/Arabic snippets by doc_id%4, per-script codepoint
    counts + dominant script. One regexp per script, fully codegen'd;
    the oracle spells the same Unicode property in RE2 (\\p{Latin}) that
    Spark spells \\p{IsLatin}."""
    from dataingestion_spark.operators.text_analysis import script_profile

    docs = _t(spark, sf, "documents")
    salted = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(F.col("doc_id") % 4 == 1, F.lit(" привет мир"))
            .when(F.col("doc_id") % 4 == 2, F.lit(" 日本語のテキスト"))
            .when(F.col("doc_id") % 4 == 3, F.lit(" مرحبا بالعالم"))
            .otherwise(F.lit("")),
        ).alias("text"),
    )
    return script_profile(salted)


def _oracle_script_profile() -> str:
    from dataingestion_spark.operators.text_analysis import SCRIPTS

    dirty = (
        "(text || CASE doc_id % 4 WHEN 1 THEN ' привет мир'"
        " WHEN 2 THEN ' 日本語のテキスト'"
        " WHEN 3 THEN ' مرحبا بالعالم' ELSE '' END)"
    )
    cols = ",\n  ".join(
        f"length(regexp_replace({dirty}, '[^{re2}]', '', 'g')) AS n_{name}"
        for name, _, re2 in SCRIPTS
    )
    names = sorted(name for name, _, _ in SCRIPTS)
    g = "greatest(" + ", ".join(f"n_{n}" for n in names) + ")"
    arms = " ".join(f"WHEN n_{n} = {g} THEN '{n}'" for n in names)
    return f"""
WITH c AS (SELECT doc_id, {cols} FROM documents)
SELECT doc_id, {', '.join('n_' + n for n in (name for name, _, _ in SCRIPTS))},
       CASE WHEN {g} = 0 THEN 'none' {arms} END AS main_script
FROM c
"""


def q_robots_gate(spark, sf):
    """robots.txt curation (operators/urls.py::parse_robots /
    robots_disallowed — RFC 9309 grouping, longest-match precedence,
    allow-wins ties, full wildcard matching): synthesized per-host robots
    bodies exercising multi-agent groups, empty Disallow, and
    allow-overrides; URLs derived from doc_id. The oracle states the
    expected verdicts in closed form."""
    from dataingestion_spark.operators.urls import parse_robots, robots_disallowed

    robots = spark.createDataFrame(
        [
            ("h0.com", "# policy\nUser-agent: *\nDisallow: /p1/\nDisallow: /p2/\n"),
            ("h1.com", "User-agent: ccbot\nUser-agent: gptbot\nDisallow: /\n"),
            ("h2.com", "User-agent: *\nDisallow:\n"),
            ("h3.com", "User-agent: *\nDisallow: /p4/\nAllow: /p4/x\n"
                       "Disallow: /p5/\n"),
            # RFC 9309 wildcards: * spans, trailing $ anchors
            ("h4.com", "User-agent: *\nDisallow: /p*1/x$\nDisallow: /p2*\n"
                       "Disallow: /p6/x.html$\n"),
        ],
        "host string, robots_txt string",
    )
    urls = _t(spark, sf, "documents").select(
        "doc_id",
        F.concat(
            F.lit("https://h"), (F.col("doc_id") % 5).cast("string"),
            F.lit(".com/p"), (F.col("doc_id") % 7).cast("string"),
            F.lit("/x"),
        ).alias("url"),
    )
    out = robots_disallowed(urls, parse_robots(robots), agent="*")
    return out.select("doc_id", "url", "disallowed")


ORACLE_ROBOTS = """
SELECT doc_id,
       'https://h' || CAST(doc_id % 5 AS VARCHAR) || '.com/p'
         || CAST(doc_id % 7 AS VARCHAR) || '/x' AS url,
       ((doc_id % 5 = 0 AND doc_id % 7 IN (1, 2))
        OR (doc_id % 5 = 3 AND doc_id % 7 = 5)
        OR (doc_id % 5 = 4 AND doc_id % 7 IN (1, 2))) AS disallowed
FROM documents
"""


def q_weighted_sample_k(spark, sf):
    """Deterministic weighted sampling without replacement
    (operators/sampling.py::weighted_sample_k; Efraimidis–Spirakis A-ES):
    exactly 100 documents drawn ∝ n_chars via exponential keys
    -ln(u)/w on a dyadic md5 uniform — one distributed top-k, bit-exact
    across engines (ln verified bit-identical; everything else IEEE)."""
    from dataingestion_spark.operators.sampling import weighted_sample_k

    out = weighted_sample_k(_t(spark, sf, "documents"), 100, "n_chars")
    return out.select("doc_id", "n_chars")


def _oracle_weighted_sample() -> str:
    from dataingestion_spark.operators.sampling import weighted_key_sql

    key = weighted_key_sql("doc_id", "n_chars")
    return f"""
SELECT doc_id, n_chars FROM (
  SELECT doc_id, n_chars, {key} AS e
  FROM documents WHERE n_chars IS NOT NULL AND n_chars > 0)
ORDER BY e, doc_id LIMIT 100
"""


def q_hybrid_indexed(spark, sf):
    """Hybrid retrieval served ENTIRELY from persisted indexes
    (sinks/text_index.py::hybrid_search_indexed): inverted-index BM25 +
    IVF ANN fused by RRF. With every centroid probed the vector side is
    exact, so the result is bit-identical to the non-indexed
    bm25_topk+topk_cosine+rrf composition and the SAME SQL oracle pins
    the whole build→persist→prune→fuse path."""
    import tempfile

    from dataingestion_spark.sinks.text_index import (
        hybrid_search_indexed, write_text_index,
    )
    from dataingestion_spark.sinks.vector_index import build_ivf_index

    e = _t(spark, sf, "embeddings")
    n = e.count()
    stride = max(1, n // 8)
    rows = (
        e.withColumn("rn", F.row_number().over(W.orderBy(F.asc("vec_id"))))
        .filter((F.col("rn") - 1) % stride == 0)
        .orderBy("rn").limit(8).select("rn", "embedding").collect()
    )
    cents = [(int(r["rn"]), [float(x) for x in r["embedding"]]) for r in rows]
    tmp = tempfile.mkdtemp(prefix="hyb_idx_")
    vpath, tpath = tmp + "/v", tmp + "/t"
    build_ivf_index(e, vpath, centroids=cents)
    write_text_index(_t(spark, sf, "documents"), tpath)
    vq = e.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"))
    fused = hybrid_search_indexed(
        spark, tpath, vpath, _bm25_queries_df(spark), vq,
        k=10, per_side_k=20, n_probe=len(cents))
    return fused.select(
        "query_id", "rank", "doc_id", F.round("rrf_score", 9).alias("rrf_r"))


def q_topk_ivf_persisted(spark, sf):
    """Persisted IVF index (sinks/vector_index.py): build with the same
    deterministic stride centroids as search_topk_ivf, write the lists
    partitioned by centroid_id, search the on-disk index with n_probe=2
    — probe selection becomes partition PRUNING (only probed lists are
    read; plan-asserted in tests). Results are identical to the
    in-memory IVF query, so the same SQL oracle pins the whole
    build→persist→prune→search path."""
    import tempfile

    from dataingestion_spark.sinks.vector_index import (
        build_ivf_index, search_ivf_index,
    )

    e = _t(spark, sf, "embeddings")
    n = e.count()
    stride = max(1, n // 8)
    rows = (
        e.withColumn("rn", F.row_number().over(W.orderBy(F.asc("vec_id"))))
        .filter((F.col("rn") - 1) % stride == 0)
        .orderBy("rn").limit(8).select("rn", "embedding").collect()
    )
    cents = [(int(r["rn"]), [float(x) for x in r["embedding"]]) for r in rows]
    path = tempfile.mkdtemp(prefix="ivf_idx_") + "/idx"
    build_ivf_index(e, path, centroids=cents)
    queries = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    out = search_ivf_index(spark, path, queries, k=10, n_probe=2)
    return out.select(
        "query_id", "rank", "vec_id", F.round("score", 6).alias("score_r")
    )


def q_topk_ivf_filtered(spark, sf):
    """Metadata-FILTERED search on the persisted IVF index
    (sinks/vector_index.py::search_ivf_index(allowed=…)): the allowed-id
    frame (vec_id % 2 == 0, the ids a metadata predicate would pass)
    semi-joins the probed lists BEFORE scoring — post-filter ANN, the
    Milvus/pgvector shape. Probing ALL 8 centroids makes the result the
    exact filtered top-k, so the oracle is closed-form: the cosine
    ranking restricted to even ids."""
    import tempfile

    from dataingestion_spark.sinks.vector_index import (
        build_ivf_index, search_ivf_index,
    )

    e = _t(spark, sf, "embeddings")
    n = e.count()
    stride = max(1, n // 8)
    rows = (
        e.withColumn("rn", F.row_number().over(W.orderBy(F.asc("vec_id"))))
        .filter((F.col("rn") - 1) % stride == 0)
        .orderBy("rn").limit(8).select("rn", "embedding").collect()
    )
    cents = [(int(r["rn"]), [float(x) for x in r["embedding"]]) for r in rows]
    path = tempfile.mkdtemp(prefix="ivf_flt_") + "/idx"
    build_ivf_index(e, path, centroids=cents)
    queries = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    allowed = e.filter(F.col("vec_id") % 2 == 0).select("vec_id")
    out = search_ivf_index(spark, path, queries, k=10, n_probe=8,
                           allowed=allowed)
    return out.select(
        "query_id", "rank", "vec_id", F.round("score", 6).alias("score_r")
    )


ORACLE_TOPK_IVF_FILTERED = """
WITH q AS (SELECT vec_id AS query_id, embedding AS qv
           FROM embeddings WHERE vec_id < 5),
s AS (
  SELECT q.query_id, e.vec_id, {cos} AS score
  FROM embeddings e CROSS JOIN q
  WHERE e.vec_id % 2 = 0)
SELECT query_id, CAST(rank AS INT) AS rank, vec_id,
       round(score, 6) AS score_r FROM (
  SELECT query_id, vec_id, score,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY score DESC, vec_id) AS rank
  FROM s) WHERE rank <= 10
"""


def q_uniform_sample_k(spark, sf):
    """Exact-k deterministic uniform sample
    (operators/sampling.py::uniform_sample_k): first 100 documents by
    md5-hash order. Plans as TakeOrderedAndProject — per-partition top-k
    heaps, no global sort (plan shape asserted in tests)."""
    from dataingestion_spark.operators.sampling import uniform_sample_k

    out = uniform_sample_k(_t(spark, sf, "documents"), 100)
    return out.select("doc_id", "source")


ORACLE_SAMPLE_K = """
SELECT doc_id, source FROM documents
ORDER BY md5(':' || CAST(doc_id AS VARCHAR)), doc_id LIMIT 100
"""


def q_quality_constraints(spark, sf):
    """Deequ-style expectation checking
    (operators/quality_checks.py::check_constraints): six rules over
    lineitem — row-local rules fold into ONE aggregation pass, unique
    adds a groupBy, the FK check is a broadcast anti-join against
    orders. Two rules are violated by construction (multi-line orders
    break unique; discounts run to 0.10 against a 0.05 cap) so the
    counting path is exercised, not just zeros."""
    from dataingestion_spark.operators import quality_checks as qc

    li = _t(spark, sf, "lineitem")
    orders = _t(spark, sf, "orders")
    report = qc.check_constraints(li, [
        qc.not_null("l_orderkey"),
        qc.unique("l_orderkey"),
        qc.in_range("l_quantity", 1.0, 50.0),
        qc.in_range("l_discount", 0.0, 0.05),
        qc.in_set("l_returnflag", ["A", "N", "R"]),
        qc.refers_to("l_orderkey", orders, "o_orderkey"),
    ])
    return report.select("rule", "violations", "n_rows")


ORACLE_QUALITY_CONSTRAINTS = """
WITH n AS (SELECT COUNT(*) AS n_rows FROM lineitem)
SELECT 'not_null(l_orderkey)' AS rule,
       (SELECT COUNT(*) FROM lineitem WHERE l_orderkey IS NULL) AS violations,
       n_rows FROM n
UNION ALL
SELECT 'unique(l_orderkey)',
       (SELECT CAST(COALESCE(SUM(c), 0) AS BIGINT) FROM
         (SELECT COUNT(*) AS c FROM lineitem GROUP BY l_orderkey
          HAVING COUNT(*) > 1)), n_rows FROM n
UNION ALL
SELECT 'in_range(l_quantity,1.0,50.0)',
       (SELECT COUNT(*) FROM lineitem
        WHERE l_quantity IS NOT NULL
          AND (l_quantity < 1.0 OR l_quantity > 50.0)), n_rows FROM n
UNION ALL
SELECT 'in_range(l_discount,0.0,0.05)',
       (SELECT COUNT(*) FROM lineitem
        WHERE l_discount IS NOT NULL
          AND (l_discount < 0.0 OR l_discount > 0.05)), n_rows FROM n
UNION ALL
SELECT 'in_set(l_returnflag)',
       (SELECT COUNT(*) FROM lineitem
        WHERE l_returnflag IS NOT NULL
          AND l_returnflag NOT IN ('A', 'N', 'R')), n_rows FROM n
UNION ALL
SELECT 'refers_to(l_orderkey->o_orderkey)',
       (SELECT COUNT(*) FROM lineitem l
        WHERE l.l_orderkey IS NOT NULL
          AND NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_orderkey = l.l_orderkey)), n_rows FROM n
"""


_DIRTY_PREFIX = " “Title” &amp; &lt;b&gt;" + "\r\n" * 4 + "\x07"
_DIRTY_SUFFIX = " \t trailing  — end\r"


def q_doc_normalize(spark, sf):
    """Web-text normalization (operators/text_analysis.py::normalize_text):
    documents wrapped in synthesized dirt — CRLF runs, a BEL control
    char, double-escaped entities, curly quotes, em-dash, tab runs,
    trailing spaces — cleaned by the expression-only pipeline. The
    oracle applies normalize_text_sql's identical DuckDB chain, so every
    replace/translate/regex step is pinned bit-for-bit."""
    from dataingestion_spark.operators.text_analysis import normalize_text

    docs = _t(spark, sf, "documents")
    dirty = docs.select(
        "doc_id",
        F.concat(F.lit(_DIRTY_PREFIX), F.col("text"),
                 F.lit(_DIRTY_SUFFIX)).alias("text"),
    )
    out = normalize_text(dirty)
    return out.select("doc_id", "clean_text", "n_removed_chars")


def _oracle_normalize() -> str:
    from dataingestion_spark.operators.text_analysis import normalize_text_sql

    dirty = (
        "(' ' || '“Title” &amp; &lt;b&gt;' || "
        + " || ".join(["chr(13) || chr(10)"] * 4)
        + " || chr(7) || text || ' ' || chr(9) || ' trailing  — end'"
        " || chr(13))"
    )
    clean = normalize_text_sql(dirty)
    return f"""
SELECT doc_id, {clean} AS clean_text,
       CAST(length({dirty}) - length({clean}) AS INTEGER) AS n_removed_chars
FROM documents
"""


def q_events_funnel(spark, sf):
    """Ordered funnel (operators/temporal.py::funnel_steps):
    signup → click → purchase per user, earliest strict-order completion
    times; t_i = min event time of step i strictly after t_{i-1}. One
    (filter → min → join) round per step, all timestamp comparisons
    exact. The oracle unrolls the same recurrence in CTEs."""
    from dataingestion_spark.operators.temporal import funnel_steps

    _utc(spark)
    e = _events(spark, sf)
    out = funnel_steps(e, ["signup", "click", "purchase"])
    return out.select("user_id", "t_1", "t_2", "t_3", "steps_completed")


ORACLE_FUNNEL = """
WITH t1 AS (SELECT user_id, MIN(ts) AS t_1 FROM events
            WHERE event_type = 'signup' GROUP BY 1),
q2 AS (SELECT e.user_id, MIN(e.ts) AS t_2 FROM events e
       JOIN t1 ON e.user_id = t1.user_id
       WHERE e.event_type = 'click' AND e.ts > t1.t_1 GROUP BY 1),
c2 AS (SELECT t1.user_id, t_1, t_2 FROM t1 LEFT JOIN q2 USING (user_id)),
q3 AS (SELECT e.user_id, MIN(e.ts) AS t_3 FROM events e
       JOIN c2 ON e.user_id = c2.user_id
       WHERE e.event_type = 'purchase' AND e.ts > c2.t_2 GROUP BY 1),
f AS (SELECT c2.user_id, t_1, t_2, t_3 FROM c2 LEFT JOIN q3 USING (user_id))
SELECT user_id, t_1, t_2, t_3,
       CAST(CASE WHEN t_3 IS NOT NULL THEN 3
                 WHEN t_2 IS NOT NULL THEN 2 ELSE 1 END AS INTEGER)
         AS steps_completed
FROM f
"""


def q_jsonl_roundtrip(spark, sf):
    """JSONL interchange (sources/jsonl.py — the Dolma/RedPajama shard
    format): documents → gzipped JSONL shards → tolerant schema-enforced
    read-back, plus two injected malformed lines that must be counted
    and excluded, not poison the scan. Lossless for string/int columns
    (JSON escapes the newlines inside text), so the read-back equals the
    parquet original exactly."""
    import os
    import tempfile

    from dataingestion_spark.sources import jsonl

    docs = _t(spark, sf, "documents")
    out = tempfile.mkdtemp(prefix="jsonl_") + "/shards"
    jsonl.write_jsonl(docs, out, shards=4)
    with open(os.path.join(out, "extra.jsonl"), "w") as fh:
        fh.write("not json at all\n{\"doc_id\": \n")
    assert jsonl.corrupt_count(spark, out) == 2
    return jsonl.read_jsonl(spark, out).select(
        "doc_id", "text", "lang", "source", "n_chars"
    )


ORACLE_JSONL = """
SELECT doc_id, text, lang, source, n_chars FROM documents
"""


def q_jsonl_zst_roundtrip(spark, sf):
    """zstd-compressed JSONL shards (sources/jsonl.py::write_jsonl_zst /
    read_jsonl_zst — the DCLM / RedPajama-v2 corpus shape): documents →
    deterministic hash-sharded .jsonl.zst (pyarrow's bundled zstd; one
    task per shard) → tolerant schema-enforced read-back (binaryFile +
    mapInPandas, one task per file), plus an injected corrupt line that
    must be excluded, not poison the scan. Lossless for string/int
    columns, so the read-back equals the parquet original exactly.
    Beyond the reference (training-corpus interchange surface, like
    JSONL/TFRecord/WebDataset)."""
    import os
    import tempfile

    import pyarrow as pa

    from dataingestion_spark.sources import jsonl

    docs = _t(spark, sf, "documents")
    out = tempfile.mkdtemp(prefix="jsonl_zst_") + "/shards"
    jsonl.write_jsonl_zst(docs, out, shards=4, order_by="doc_id")
    bad = pa.Codec("zstd").compress(b"not json at all\n").to_pybytes()
    with open(os.path.join(out, "extra.jsonl.zst"), "wb") as fh:
        fh.write(bad)
    return jsonl.read_jsonl_zst(spark, out).select(
        "doc_id", "text", "lang", "source", "n_chars"
    )


def q_io_jsonl_zst_split(spark, sf):
    """Byte-range splitting of multi-frame .jsonl.zst shards (r12,
    sources/jsonl.py::read_jsonl_zst_split): documents → ONE shard
    written with frame_lines=64 (every 64 lines its own RFC 8878
    frame, so the shard is splittable at frame boundaries) →
    byte-range reads resyncing on the frame magic validated by a
    structural block walk, each task decompressing exactly the frames
    that start in its range. Text inflated 5x so sf0.1 crosses
    several 1 MB splits (sf0.01 exercises the first-range path).
    Oracle = exact multiset restatement from the parquet source, so a
    frame lost or doubled at any boundary goes red."""
    import tempfile

    from dataingestion_spark.sources import jsonl

    docs = _t(spark, sf, "documents").select(
        "doc_id", F.repeat("text", 5).alias("text5"), "lang",
        "n_chars")
    from pyspark.sql import types as T

    out = tempfile.mkdtemp(prefix="zst_split_") + "/shards"
    jsonl.write_jsonl_zst(docs, out, shards=1, order_by="doc_id",
                          frame_lines=64)
    schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("text5", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("n_chars", T.LongType())])
    return jsonl.read_jsonl_zst_split(spark, out, schema, split_mb=1)


ORACLE_JSONL_ZST_SPLIT = """
SELECT doc_id, repeat(text, 5) AS text5, lang, n_chars FROM documents
"""


def q_io_arrow_ipc_split(spark, sf):
    """Footer-indexed Arrow IPC batch splitting (r12,
    sources/arrow_ipc.py::read_arrow_ipc_split): documents → ONE
    Feather shard at batch_rows=64 → the planner reads the footer and
    assigns contiguous batch ranges of ~1 MB to tasks; each task
    random-accesses exactly its batches (no resync heuristics — the
    format indexes every batch). Text inflated 5x so sf0.1 plans
    several genuine splits. Oracle = exact multiset restatement from
    the parquet source, so a batch lost or doubled at any range edge
    goes red."""
    import tempfile

    from dataingestion_spark.sources.arrow_ipc import (
        read_arrow_ipc_split, write_arrow_ipc,
    )

    docs = _t(spark, sf, "documents").select(
        "doc_id", F.repeat("text", 5).alias("text5"), "lang",
        "n_chars")
    out = tempfile.mkdtemp(prefix="ipc_split_") + "/shards"
    write_arrow_ipc(docs, out, shards=1, order_by="doc_id",
                    batch_rows=64)
    return read_arrow_ipc_split(spark, out, split_mb=1).select(
        "doc_id", "text5", "lang", "n_chars")


ORACLE_ARROW_IPC_SPLIT = """
SELECT doc_id, repeat(text, 5) AS text5, lang, n_chars FROM documents
"""


def q_arrow_ipc_roundtrip(spark, sf):
    """Arrow IPC / Feather v2 interchange (sources/arrow_ipc.py): the
    random-access columnar format training dataloaders mmap. Documents
    → deterministic hash-sharded .arrow files (one task/shard, pyarrow
    IPC writer, explicit record-batch granularity) → read-back with
    schema pinned from the first footer and per-file type checks, plus
    a column projection that prunes at the deserialization boundary.
    Lossless, so the read-back equals the parquet original. Beyond the
    reference (training-data interchange surface)."""
    import tempfile

    from dataingestion_spark.sources.arrow_ipc import (
        read_arrow_ipc, write_arrow_ipc,
    )

    docs = _t(spark, sf, "documents").select(
        "doc_id", "text", "lang", "source", "n_chars")
    out = tempfile.mkdtemp(prefix="arrow_ipc_") + "/shards"
    write_arrow_ipc(docs, out, shards=4, order_by="doc_id",
                    batch_rows=256)
    return read_arrow_ipc(spark, out).select(
        "doc_id", "text", "lang", "source", "n_chars")


def q_streaming_jsonl_ingest(spark, sf):
    """Continuous JSONL corpus ingestion (sources/jsonl.py::stream_jsonl
    — Spark's exactly-once file stream source + the batch reader's
    corrupt-line contract via shared _parse_lines): documents export to
    gzip shards + one injected corrupt file, the stream drains with
    availableNow paced one file per micro-batch into a memory sink, and
    the drained rows must equal the batch parse exactly — a dropped or
    double-read shard, or a corrupt line poisoning its batch, goes red.
    Beyond the reference (training-corpus landing-dir tailing)."""
    import os
    import tempfile

    from dataingestion_spark.sources import jsonl

    docs = _t(spark, sf, "documents")
    land = tempfile.mkdtemp(prefix="jsonl_stream_") + "/landing"
    jsonl.write_jsonl(docs, land, shards=4)
    with open(os.path.join(land, "bad.jsonl"), "w") as fh:
        fh.write("definitely not json\n")
    name = "jsonl_ingest_check"
    q = (jsonl.stream_jsonl(spark, land, max_files_per_trigger=1)
         .writeStream.format("memory").queryName(name)
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination()
    return spark.table(name).select(
        "doc_id", "text", "lang", "source", "n_chars")


def q_reader_wds_split(spark, sf):
    """Byte-range splitting of WebDataset tar shards (r12,
    sinks/webdataset.py::read_webdataset_split): documents → ONE
    USTAR shard (key = zero-padded doc_id, payload = text5) →
    byte-range reads resyncing on checksum-validated 512-aligned
    headers chained to the next header. Text inflated 5x so sf0.1
    plans several genuine 1 MB splits. Oracle restates key/ext/payload
    from the parquet source, so a member lost or doubled at any
    boundary goes red."""
    import tempfile

    from dataingestion_spark.sinks.webdataset import (
        read_webdataset_split, write_webdataset,
    )

    docs = _t(spark, sf, "documents").select(
        F.lit(0).alias("shard_id"),
        F.format_string("%09d", F.col("doc_id")).alias("key"),
        F.repeat("text", 5).alias("text"),
        F.lit(None).cast("string").alias("meta"))
    out = tempfile.mkdtemp(prefix="wds_split_") + "/shards"
    write_webdataset(docs, out, meta_col=None).collect()
    return read_webdataset_split(spark, out, split_mb=1).select(
        "key", "ext", "payload")


ORACLE_WDS_SPLIT = """
SELECT lpad(CAST(doc_id AS VARCHAR), 9, '0') AS key,
       'txt' AS ext,
       repeat(text, 5) AS payload
FROM documents
"""


def q_streaming_jsonl_zst_ingest(spark, sf):
    """Continuous .jsonl.zst corpus ingestion (r12,
    sources/jsonl.py::stream_jsonl_zst — the DCLM landing-dir shape
    the text-source stream can't tail, zstd having no Spark codec in
    this image): documents export to zstd shards + one injected
    corrupt-line shard, the stream drains availableNow one file per
    micro-batch into a memory sink, and the drained rows must equal
    the batch parse exactly — a dropped or double-read shard, or a
    corrupt line poisoning its batch, goes red."""
    import os
    import tempfile

    import pyarrow as pa

    from dataingestion_spark.sources import jsonl

    docs = _t(spark, sf, "documents")
    land = tempfile.mkdtemp(prefix="zst_stream_") + "/landing"
    jsonl.write_jsonl_zst(docs, land, shards=4)
    bad = pa.Codec("zstd").compress(b"definitely not json\n")
    with open(os.path.join(land, "bad.jsonl.zst"), "wb") as fh:
        fh.write(bad.to_pybytes())
    name = "jsonl_zst_ingest_check"
    q = (jsonl.stream_jsonl_zst(spark, land, max_files_per_trigger=1)
         .writeStream.format("memory").queryName(name)
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination()
    return spark.table(name).select(
        "doc_id", "text", "lang", "source", "n_chars")


def q_streaming_warc_ingest(spark, sf):
    """Continuous WARC/WET crawl-output ingestion (r12,
    sources/warc.py::stream_warc — the file stream source tailing a
    crawler's landing dir with exactly-once shard discovery; record
    parsing is the batch reader's parse_warc_files unchanged):
    documents WET-serialize into 4 landing files, the stream drains
    one file per micro-batch into a memory sink, and the drained rows
    must equal the batch parse exactly — a dropped or double-read
    shard goes red."""
    import os
    import tempfile

    from dataingestion_spark.sources.warc import (
        stream_warc, wet_record_bytes,
    )

    pdf = (_t(spark, sf, "documents").select("doc_id", "text")
           .toPandas().sort_values("doc_id"))
    land = tempfile.mkdtemp(prefix="warc_stream_") + "/landing"
    os.makedirs(land)
    for part in range(4):
        blob = b"".join(
            wet_record_bytes(f"http://synth.local/{int(i)}",
                             t.encode("utf-8"))
            for i, t in zip(pdf["doc_id"], pdf["text"])
            if int(i) % 4 == part)
        with open(os.path.join(land, f"p{part}.wet"), "wb") as fh:
            fh.write(blob)
    name = "warc_ingest_check"
    q = (stream_warc(spark, land, max_files_per_trigger=1)
         .writeStream.format("memory").queryName(name)
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination()
    return spark.table(name).select(
        F.col("target_uri").alias("uri"), "content_length",
        F.length("payload").cast("long").alias("n_chars"))


ORACLE_WARC_STREAM = """
SELECT 'http://synth.local/' || CAST(doc_id AS VARCHAR) AS uri,
       strlen(text) AS content_length,
       length(text) AS n_chars
FROM documents
"""


def q_streaming_tfrecord_ingest(spark, sf):
    """Continuous TFRecord landing-dir ingestion (r12,
    sources/tfrecord.py::stream_tfrecord — the file stream source
    tailing a TF export pipeline's output with exactly-once shard
    discovery; framing + proto decode is the batch reader's
    _example_parser unchanged): documents export to 4 TFRecord shards,
    the stream drains availableNow one file per micro-batch into a
    memory sink, and the drained rows must equal the batch parse
    exactly — a dropped or double-read shard, or a CRC slip in any
    record, goes red."""
    import tempfile

    from dataingestion_spark.sources.tfrecord import (
        stream_tfrecord, write_tfrecord,
    )

    docs = _t(spark, sf, "documents").select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("text").cast("binary").alias("text"),
        F.col("n_chars").cast("long").alias("n_chars"))
    features = {"doc_id": "int64", "text": "bytes", "n_chars": "int64"}
    land = tempfile.mkdtemp(prefix="tfrec_stream_") + "/landing"
    write_tfrecord(docs, features, land, shards=4)
    name = "tfrecord_ingest_check"
    q = (stream_tfrecord(spark, land, features, max_files_per_trigger=1)
         .writeStream.format("memory").queryName(name)
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination()
    return spark.table(name).select(
        "doc_id", F.col("text").cast("string").alias("text"), "n_chars")


ORACLE_TFRECORD_STREAM = """
SELECT doc_id, text, n_chars FROM documents
"""


def q_streaming_avro_ingest(spark, sf):
    """Continuous Avro landing-dir ingestion (r12,
    sources/avro.py::stream_avro — the file stream source tailing an
    Avro export's landing dir with exactly-once shard discovery and an
    EXPLICIT reader schema, since the dir may start empty; container
    decode is the batch reader's _container_parser unchanged):
    documents export to 4 deflate containers, the stream drains
    availableNow one file per micro-batch into a memory sink, and the
    drained rows must equal the batch parse exactly — a dropped or
    double-read shard, or a block-decode slip, goes red."""
    import tempfile

    from dataingestion_spark.sources.avro import (
        spark_to_avro_schema, stream_avro, write_avro,
    )

    docs = _t(spark, sf, "documents").select(
        "doc_id", "text", "lang", "source", "n_chars")
    land = tempfile.mkdtemp(prefix="avro_stream_") + "/landing"
    write_avro(docs, land, shards=4, codec="deflate")
    schema_js = spark_to_avro_schema(docs.schema, name="row")
    name = "avro_ingest_check"
    q = (stream_avro(spark, land, schema_js, max_files_per_trigger=1)
         .writeStream.format("memory").queryName(name)
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination()
    return spark.table(name).select(
        "doc_id", "text", "lang", "source", "n_chars")


ORACLE_AVRO_STREAM = """
SELECT doc_id, text, lang, source, n_chars FROM documents
"""


def q_streaming_wds_ingest(spark, sf):
    """Continuous WebDataset landing-dir ingestion (r12,
    sinks/webdataset.py::stream_webdataset — the file stream source
    tailing an export pipeline's shard output with exactly-once shard
    discovery; member parsing is the batch reader's _tar_member_parser
    unchanged): documents export to 4 USTAR shards, the stream drains
    availableNow one file per micro-batch into a memory sink, and the
    drained (key, ext, payload) rows must equal the batch parse
    exactly — a dropped or double-read shard, or a member lost inside
    any tar, goes red."""
    import tempfile

    from dataingestion_spark.sinks.webdataset import (
        stream_webdataset, write_webdataset,
    )

    docs = _t(spark, sf, "documents").select(
        F.pmod(F.col("doc_id"), F.lit(4)).alias("shard_id"),
        F.format_string("%09d", F.col("doc_id")).alias("key"),
        F.col("text"),
        F.lit(None).cast("string").alias("meta"))
    land = tempfile.mkdtemp(prefix="wds_stream_") + "/landing"
    write_webdataset(docs, land, meta_col=None).collect()
    name = "wds_ingest_check"
    q = (stream_webdataset(spark, land, max_files_per_trigger=1)
         .writeStream.format("memory").queryName(name)
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination()
    return spark.table(name).select("key", "ext", "payload")


ORACLE_WDS_STREAM = """
SELECT lpad(CAST(doc_id AS VARCHAR), 9, '0') AS key,
       'txt' AS ext,
       text AS payload
FROM documents
"""


def q_streaming_iceberg_tail(spark, sf):
    """Streaming reads of Iceberg tables
    (streaming/iceberg_source.py::stream_iceberg): documents → manifest
    table → Iceberg mirror, drain the CURRENT SNAPSHOT batch, then two
    more mirror snapshots (append + delete-carrying with
    skipChangeCommits) drain into the same checkpointed sink — the
    cumulative rows must equal the closed-form final state the oracle
    computes (snapshot rows, plus appended rows, with the skipped
    delete's victim still present from the snapshot batch: the
    documented skipChangeCommits trade, same as Delta's). A dropped or
    double-delivered snapshot, a lineage mix-up, or a broken delete
    application in the snapshot batch goes red. Beyond the reference
    (open-table-format streaming hand-off)."""
    import tempfile

    from dataingestion_spark.interop.iceberg import mirror_iceberg
    from dataingestion_spark.sinks import manifest_store as ms
    from dataingestion_spark.streaming.iceberg_source import (
        stream_iceberg,
    )

    docs = _t(spark, sf, "documents").select(
        F.col("doc_id").cast("string").alias("documentid"),
        "text", "lang", F.col("n_chars").cast("long").alias("n_chars"))
    td = tempfile.mkdtemp(prefix="ice_tail_")
    tbl, dst = td + "/t", td + "/ice"
    ms.write_table(docs, tbl)
    # pre-delete doc 1 so the SNAPSHOT batch itself must apply an
    # equality delete file
    ms.delete_documents(spark, tbl, ["1"])
    mirror_iceberg(spark, tbl, dst, dv_mode="equality")
    sink, sink_ckpt = td + "/sink", td + "/ckpt"

    def drain():
        # parquet sink: the memory sink cannot recover a checkpoint,
        # and this query restarts the stream across three drains
        q = (stream_iceberg(spark, dst, skip_change_commits=True)
             .writeStream.format("parquet")
             .option("path", sink)
             .option("checkpointLocation", sink_ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination()

    drain()
    extra = docs.filter(F.col("documentid").cast("long") % 7 == 0) \
        .select((F.col("documentid").cast("long") + 10 ** 6)
                .cast("string").alias("documentid"),
                "text", "lang", "n_chars")
    ms.append_table(extra, tbl)
    mirror_iceberg(spark, tbl, dst, dv_mode="equality")
    drain()
    # a delete snapshot under skipChangeCommits: victim '2' keeps its
    # snapshot-batch row; the simultaneous append still flows
    ms.delete_documents(spark, tbl, ["2"])
    ms.append_table(
        docs.filter(F.col("documentid") == "3")
        .select((F.col("documentid").cast("long") + 2 * 10 ** 6)
                .cast("string").alias("documentid"),
                "text", "lang", "n_chars"), tbl)
    mirror_iceberg(spark, tbl, dst, dv_mode="equality")
    drain()
    return spark.read.parquet(sink).select(
        "documentid", "text", "lang", "n_chars")


ORACLE_ICEBERG_TAIL = """
WITH src AS (
  SELECT CAST(doc_id AS VARCHAR) AS documentid, text, lang,
         CAST(n_chars AS BIGINT) AS n_chars, doc_id FROM documents)
SELECT documentid, text, lang, n_chars FROM src WHERE doc_id <> 1
UNION ALL
SELECT CAST(doc_id + 1000000 AS VARCHAR), text, lang, n_chars
FROM src WHERE doc_id % 7 = 0
UNION ALL
SELECT CAST(doc_id + 2000000 AS VARCHAR), text, lang, n_chars
FROM src WHERE doc_id = 3
"""


def q_export_incremental(spark, sf):
    """Incremental corpus publish (sinks/corpus_export.py): documents →
    lakehouse table → full zstd-JSONL export, then append/delete/merge
    on narrow key slices and an INCREMENTAL export that rewrites only
    the shards whose row set changed (change feed → pmod(xxhash64)
    shard ids → filtered snapshot rewrite; byte-identical to a full
    re-export because shard bytes are deterministic — pinned in
    tests/test_corpus_export.py). The read-back of the published
    directory must equal the closed-form final state; a stale shard
    (deleted rows still served) or an unrewritten update goes red.
    Asserts the rewrite list is a PROPER subset of the shard set —
    the whole point of the incremental path."""
    import tempfile

    from pyspark.sql import types as T

    from dataingestion_spark.sinks import manifest_store as ms
    from dataingestion_spark.sinks.corpus_export import (
        export_corpus, export_corpus_incremental,
    )
    from dataingestion_spark.sources.jsonl import read_jsonl_zst

    docs = _t(spark, sf, "documents").select(
        F.col("doc_id").cast("string").alias("documentid"), "n_chars")
    did = F.col("documentid").cast("long")
    table = tempfile.mkdtemp(prefix="exp_") + "/t"
    out = tempfile.mkdtemp(prefix="exp_") + "/pub"
    ms.write_table(docs, table)
    export_corpus(spark, table, out, fmt="jsonl_zst", shards=64)
    ms.append_table(
        docs.filter(did % 577 == 3).select(
            (did + 10_000_000).cast("string").alias("documentid"),
            (F.col("n_chars") + 1).alias("n_chars")), table)
    ms.delete_documents(
        spark, table,
        [r[0] for r in docs.filter(did % 251 == 0)
         .select("documentid").collect()])
    ms.merge_table(
        docs.filter(did % 313 == 1).withColumn(
            "n_chars", F.col("n_chars") + 7), table)
    st = export_corpus_incremental(spark, table, out)
    assert 0 < len(st["rewritten"]) < 64, st["rewritten"]
    schema = T.StructType([T.StructField("documentid", T.StringType()),
                           T.StructField("n_chars", T.LongType())])
    return read_jsonl_zst(spark, out, schema=schema)


ORACLE_EXPORT_INCREMENTAL = """
SELECT CAST(doc_id AS VARCHAR) AS documentid, n_chars + 7 AS n_chars
FROM documents WHERE doc_id % 313 = 1
UNION ALL
SELECT CAST(doc_id AS VARCHAR), n_chars FROM documents
WHERE doc_id % 313 <> 1 AND doc_id % 251 <> 0
UNION ALL
SELECT CAST(doc_id + 10000000 AS VARCHAR), n_chars + 1
FROM documents WHERE doc_id % 577 = 3
"""


def q_events_gapfill(spark, sf):
    """Regular-grid resampling with LOCF gap filling
    (operators/temporal.py::resample_gapfill — the TimescaleDB
    time_bucket_gapfill shape): hourly buckets per user over the events
    span; empty buckets get n=0 and the last observed value carried
    forward. Deterministic last-per-bucket via max_by on (ts, value);
    values are carried verbatim, so the whole result is bit-exact."""
    from dataingestion_spark.operators import temporal

    _utc(spark)
    e = _events(spark, sf)
    out = temporal.resample_gapfill(e, "ts", "user_id", "value",
                                    step_seconds=3600)
    return out.select("user_id", "bucket_ts", "n", "value")


ORACLE_GAPFILL = """
WITH obs AS (
  SELECT user_id, ts, value, time_bucket(INTERVAL '1 hour', ts) AS b
  FROM events),
pb AS (SELECT user_id, b, COUNT(*) AS n FROM obs GROUP BY 1, 2),
lastv AS (
  SELECT user_id, b, value FROM (
    SELECT user_id, b, value,
           row_number() OVER (PARTITION BY user_id, b
                              ORDER BY ts DESC, value DESC) AS rk
    FROM obs) WHERE rk = 1),
bounds AS (SELECT user_id, MIN(b) AS lo, MAX(b) AS hi FROM obs GROUP BY 1),
grid AS (
  SELECT user_id, unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS bucket_ts
  FROM bounds),
filled AS (
  SELECT g.user_id, g.bucket_ts, COALESCE(pb.n, 0) AS n,
         last_value(lastv.value IGNORE NULLS) OVER (
           PARTITION BY g.user_id ORDER BY g.bucket_ts
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value
  FROM grid g
  LEFT JOIN pb ON g.user_id = pb.user_id AND g.bucket_ts = pb.b
  LEFT JOIN lastv ON g.user_id = lastv.user_id AND g.bucket_ts = lastv.b)
SELECT user_id, bucket_ts, CAST(n AS BIGINT) AS n, value FROM filled
"""


def q_lakehouse_skipping(spark, sf):
    """Delta-style data skipping (sinks/manifest_store.py::
    read_table_where): three append commits with disjoint n_chars ranges
    give every file a tight per-column [min,max] recorded at write time;
    a conjunctive predicate then prunes the file list BEFORE any footer
    IO (candidate_files_where), and the surviving files are filtered
    exactly in Spark. Equivalent-by-construction to read-then-filter —
    the oracle restates the predicate over the raw documents table."""
    import tempfile

    from dataingestion_spark.sinks import manifest_store as ms

    docs = _t(spark, sf, "documents").select(
        F.col("doc_id").cast("string").alias("documentid"),
        "lang", "n_chars",
    )
    table = tempfile.mkdtemp(prefix="skip_lh_") + "/t"
    ms.write_table(docs.filter(F.col("n_chars") < 150), table)
    ms.append_table(
        docs.filter((F.col("n_chars") >= 150) & (F.col("n_chars") < 300)),
        table)
    ms.append_table(docs.filter(F.col("n_chars") >= 300), table)
    out = ms.read_table_where(
        spark, table, [("n_chars", ">=", 300), ("lang", "!=", "de")])
    return out.select("documentid", "lang", "n_chars")


ORACLE_SKIPPING = """
SELECT CAST(doc_id AS VARCHAR) AS documentid, lang, n_chars
FROM documents WHERE n_chars >= 300 AND lang <> 'de'
"""


def q_lakehouse_sync(spark, sf):
    """CDF-driven replication (sinks/manifest_store.py::sync_table): a
    downstream replica bootstraps as a full copy, then each sync applies
    ONLY the change feed between the last applied source version and
    head — updates/inserts as one replace-by-documentid DV commit,
    pure deletions as one O(batch) DV commit, the applied version
    stamped in the replica's txn map (re-sync is a no-op). The oracle
    restates the source mutations (unconditional even-id upsert, %5
    delete) as joins; the replica must equal the source exactly."""
    import tempfile

    from dataingestion_spark.sinks import manifest_store as ms

    docs = _t(spark, sf, "documents").select(
        F.col("doc_id").cast("string").alias("documentid"),
        "text", "lang", F.col("n_chars").cast("long").alias("n_chars"),
    )
    src = tempfile.mkdtemp(prefix="sync_src_") + "/t"
    dst = tempfile.mkdtemp(prefix="sync_dst_") + "/t"
    ms.write_table(docs.filter(F.col("doc_id") % 3 != 0), src)
    ms.sync_table(spark, src, dst)  # bootstrap
    ms.merge_table(
        docs.filter(F.col("doc_id") % 2 == 0)
        .withColumn("text", F.concat(F.lit("v2 "), F.col("text"))), src)
    ms.merge_table(docs.filter(F.col("doc_id") % 5 == 0).select("documentid"),
                   src, when_matched="delete", when_not_matched=None)
    ms.sync_table(spark, src, dst)
    ms.sync_table(spark, src, dst)  # idempotent re-sync
    return ms.read_table(spark, dst).select(
        "documentid", "text", "lang", "n_chars")


ORACLE_SYNC = """
WITH base AS (
  SELECT CAST(doc_id AS VARCHAR) AS documentid, text, lang, n_chars
  FROM documents WHERE doc_id % 3 <> 0),
upd AS (
  SELECT CAST(doc_id AS VARCHAR) AS documentid, 'v2 ' || text AS text,
         lang, n_chars
  FROM documents WHERE doc_id % 2 = 0),
merged AS (
  SELECT * FROM base WHERE documentid NOT IN (SELECT documentid FROM upd)
  UNION ALL SELECT * FROM upd)
SELECT documentid, text, lang, CAST(n_chars AS BIGINT) AS n_chars
FROM merged
WHERE documentid NOT IN
  (SELECT CAST(doc_id AS VARCHAR) FROM documents WHERE doc_id % 5 = 0)
"""


def q_change_feed(spark, sf):
    """CDF-lite change feed (sinks/manifest_store.py::table_diff):
    base = doc_id%3==0 slice; then append %3==1, delete %9==0, and one
    merge (update %6==1 with n_chars+5, insert %3==2). The v0→v3 feed
    must be exactly: inserts for the appended/inserted/updated net rows,
    deletes for %9==0 — the oracle states it in closed form. The
    append/DV-only history takes the O(changed-files) fast path."""
    import tempfile

    from dataingestion_spark.sinks import manifest_store as ms

    docs = _t(spark, sf, "documents").select(
        F.col("doc_id").cast("string").alias("documentid"), "n_chars"
    )
    did = F.col("documentid").cast("long")
    table = tempfile.mkdtemp(prefix="cdf_") + "/t"
    v0 = ms.write_table(docs.filter(did % 3 == 0), table)
    ms.append_table(docs.filter(did % 3 == 1), table)
    ms.delete_documents(
        spark, table,
        [r[0] for r in docs.filter(did % 9 == 0)
         .select("documentid").collect()],
    )
    src = docs.filter((did % 6 == 1) | (did % 3 == 2)).withColumn(
        "n_chars",
        F.col("n_chars") + F.when(did % 6 == 1, F.lit(5)).otherwise(F.lit(0)),
    )
    v3 = ms.merge_table(src, table)
    feed = ms.table_diff(spark, table, v0, v3)
    return feed.select("documentid", "n_chars", "_change_type")


ORACLE_CHANGE_FEED = """
SELECT CAST(doc_id AS VARCHAR) AS documentid, n_chars,
       'insert' AS _change_type
FROM documents WHERE doc_id % 3 = 1 AND doc_id % 6 <> 1
UNION ALL
SELECT CAST(doc_id AS VARCHAR), n_chars + 5, 'insert'
FROM documents WHERE doc_id % 6 = 1
UNION ALL
SELECT CAST(doc_id AS VARCHAR), n_chars, 'insert'
FROM documents WHERE doc_id % 3 = 2
UNION ALL
SELECT CAST(doc_id AS VARCHAR), n_chars, 'delete'
FROM documents WHERE doc_id % 9 = 0
"""


def q_lakehouse_restore(spark, sf):
    """Time-travel rollback (sinks/manifest_store.py::restore_table):
    write all documents at v0; a bad batch then inflates n_chars by 100
    for doc_id%4==0 (merge update) and deletes doc_id%7==0; RESTORE to
    v0 undoes both as a metadata-only commit (old files re-referenced,
    zero data IO); a post-restore append of a 'new-' slice proves the
    restored table keeps accepting commits. The oracle restates the net
    state: every original document unchanged, plus the appended slice."""
    import tempfile

    from dataingestion_spark.sinks import manifest_store as ms

    docs = _t(spark, sf, "documents").select(
        F.col("doc_id").cast("string").alias("documentid"),
        "lang", F.col("n_chars").cast("long").alias("n_chars"),
    )
    did = F.col("documentid").cast("long")
    table = tempfile.mkdtemp(prefix="restore_lh_") + "/t"
    v0 = ms.write_table(docs, table)
    ms.merge_table(
        docs.filter(did % 4 == 0)
        .withColumn("n_chars", F.col("n_chars") + 100), table)
    ms.delete_documents(
        spark, table,
        [r[0] for r in docs.filter(did % 7 == 0)
         .select("documentid").collect()])
    ms.restore_table(table, v0)
    ms.append_table(
        docs.filter(did % 11 == 0)
        .withColumn("documentid", F.concat(F.lit("new-"), "documentid")),
        table)
    return ms.read_table(spark, table).select("documentid", "lang", "n_chars")


ORACLE_RESTORE = """
SELECT CAST(doc_id AS VARCHAR) AS documentid, lang,
       CAST(n_chars AS BIGINT) AS n_chars
FROM documents
UNION ALL
SELECT 'new-' || CAST(doc_id AS VARCHAR), lang, CAST(n_chars AS BIGINT)
FROM documents WHERE doc_id % 11 = 0
"""


def q_lakehouse_clone_branch(spark, sf):
    """Zero-copy table branching (sinks/manifest_store.py::clone_table):
    prod = the doc_id%2==0 slice; a shallow clone commits in O(manifest)
    with NO data copied (the clone's manifest references prod's files by
    path). The dev branch then diverges — an upsert prefixes text for
    doc_id%6==0, an append adds the odd slice — while prod keeps writing
    too (an appended 'prod-' slice the clone must NOT see). Returned:
    the dev branch's final state; the oracle restates it in closed form
    (prod's post-clone append is absent by construction)."""
    import tempfile

    from dataingestion_spark.sinks import manifest_store as ms

    docs = _t(spark, sf, "documents").select(
        F.col("doc_id").cast("string").alias("documentid"),
        "text", F.col("n_chars").cast("long").alias("n_chars"),
    )
    did = F.col("documentid").cast("long")
    base = tempfile.mkdtemp(prefix="clone_lh_")
    prod, dev = base + "/prod", base + "/dev"
    ms.write_table(docs.filter(did % 2 == 0), prod)
    ms.clone_table(prod, dev)
    ms.merge_table(
        docs.filter(did % 6 == 0)
        .withColumn("text", F.concat(F.lit("dev "), "text")), dev)
    ms.append_table(docs.filter(did % 2 == 1), dev)
    # prod moves on independently; the clone must not observe this
    ms.append_table(
        docs.filter(did % 2 == 0).limit(5)
        .withColumn("documentid", F.concat(F.lit("prod-"), "documentid")),
        prod)
    return ms.read_table(spark, dev).select("documentid", "text", "n_chars")


ORACLE_CLONE = """
SELECT CAST(doc_id AS VARCHAR) AS documentid,
       CASE WHEN doc_id % 6 = 0 THEN 'dev ' || text ELSE text END AS text,
       CAST(n_chars AS BIGINT) AS n_chars
FROM documents WHERE doc_id % 2 = 0
UNION ALL
SELECT CAST(doc_id AS VARCHAR), text, CAST(n_chars AS BIGINT)
FROM documents WHERE doc_id % 2 = 1
"""


def q_lakehouse_zorder_read(spark, sf):
    """OPTIMIZE ZORDER (sinks/manifest_store.py::optimize_zorder): events
    land in three type-split appends (every file's user_id/value stats
    span ~the full range), then one clustered rewrite along the
    (user_id, value) Morton curve makes per-file stats tight in BOTH
    dimensions; the 2-d box read then prunes to the matching quadrant
    files via candidate_files_where before any footer IO. Equivalent by
    construction to read-then-filter — the oracle restates the box over
    the raw events table."""
    import tempfile

    from dataingestion_spark.sinks import manifest_store as ms

    ev = _t(spark, sf, "events").select(
        F.col("event_id").cast("string").alias("documentid"),
        "event_type", "user_id", "value",
    )
    table = tempfile.mkdtemp(prefix="zorder_lh_") + "/t"
    types = [r[0] for r in ev.select("event_type").distinct().collect()]
    third = max(1, len(types) // 3)
    ms.write_table(ev.filter(F.col("event_type").isin(types[:third])), table)
    ms.append_table(
        ev.filter(F.col("event_type").isin(types[third:2 * third])), table)
    ms.append_table(
        ev.filter(~F.col("event_type").isin(types[:2 * third])), table)
    ms.optimize_zorder(spark, table, ["user_id", "value"],
                       files_per_bucket=8)
    out = ms.read_table_where(
        spark, table, [("user_id", "<", 30), ("value", ">=", 100.0)])
    return out.select("documentid", "user_id",
                      (F.round("value", 6) + F.lit(0.0)).alias("value"))


ORACLE_ZORDER = """
SELECT CAST(event_id AS VARCHAR) AS documentid, user_id,
       round(value, 6) + 0.0 AS value
FROM events WHERE user_id < 30 AND value >= 100.0
"""


def q_lakehouse_constraints(spark, sf):
    """Write-time CHECK constraints (sinks/manifest_store.py::
    add_constraint): after the constraint lands, a batch with negated
    n_chars is rejected ATOMICALLY (ConstraintViolation before the
    manifest commit — its files stay invisible orphans) and the valid
    odd slice then appends normally. The oracle restates the net state:
    exactly the original documents, nothing from the rejected batch."""
    import tempfile

    from dataingestion_spark.sinks import manifest_store as ms

    docs = _t(spark, sf, "documents").select(
        F.col("doc_id").cast("string").alias("documentid"),
        "lang", F.col("n_chars").cast("long").alias("n_chars"),
    )
    did = F.col("documentid").cast("long")
    table = tempfile.mkdtemp(prefix="ck_lh_") + "/t"
    ms.write_table(docs.filter(did % 2 == 0), table)
    ms.add_constraint(spark, table, "chars_nonneg", "n_chars >= 0")
    bad = (docs.filter(did % 2 == 1)
           .withColumn("n_chars", -F.col("n_chars") - 1))
    try:
        ms.append_table(bad, table)
        raise AssertionError("constraint must reject the bad batch")
    except ms.ConstraintViolation:
        pass
    ms.append_table(docs.filter(did % 2 == 1), table)
    return ms.read_table(spark, table).select("documentid", "lang", "n_chars")


ORACLE_CONSTRAINTS = """
SELECT CAST(doc_id AS VARCHAR) AS documentid, lang,
       CAST(n_chars AS BIGINT) AS n_chars
FROM documents
"""


def q_bpe_encode_roundtrip(spark, sf):
    """Distributed BPE encode/decode (operators/bpe_train.py::
    bpe_encode_df / bpe_decode_df): train a 300-symbol vocab on the
    corpus (distributed piece counts -> driver merge loop), broadcast
    the ranks, Arrow-batch encode every document, decode back. Two
    invariants are externally pinned per document: byte-level BPE is
    LOSSLESS (decode(encode(text)) == text) and merges only ever shrink
    (n_tokens <= utf-8 byte length). Exact token ids are pinned by
    golden tests (no SQL engine can restate the merge loop)."""
    from dataingestion_spark.operators.bpe_train import (
        bpe_decode_df,
        bpe_encode_df,
        train_bpe_distributed,
    )

    docs = _t(spark, sf, "documents").select(
        F.col("doc_id").cast("string").alias("documentid"), "text")
    ranks = train_bpe_distributed(docs, vocab_size=300)
    enc = bpe_encode_df(docs, ranks)
    dec = bpe_decode_df(enc, ranks)
    return dec.select(
        "documentid",
        (F.col("decoded") == F.col("text")).alias("roundtrip_ok"),
        (F.col("n_tokens") <= F.octet_length("text")).alias("tokens_le_bytes"),
    )


ORACLE_BPE_ENCODE = """
SELECT CAST(doc_id AS VARCHAR) AS documentid,
       TRUE AS roundtrip_ok, TRUE AS tokens_le_bytes
FROM documents
"""


def q_preference_pairs(spark, sf):
    """DPO/RLHF preference-pair prep (operators/sft.py::
    preference_pairs): synthetic scored completions (prompt = doc_id%40,
    score = n_chars%101) -> one (chosen, rejected) row per prompt via
    max_by/min_by on the (score, completion) struct — deterministic
    tie-breaks, ONE map-side-combinable groupBy, text shuffled once.
    The oracle restates the tie-break as rank-1 windows."""
    from dataingestion_spark.operators.sft import preference_pairs

    d = _t(spark, sf, "documents").select(
        (F.col("doc_id") % 40).cast("string").alias("prompt_id"),
        F.col("text").alias("completion"),
        (F.col("n_chars") % 101).cast("double").alias("score"),
    )
    return preference_pairs(d)


ORACLE_PREF_PAIRS = """
WITH s AS (
  SELECT CAST(doc_id % 40 AS VARCHAR) AS prompt_id, text AS completion,
         CAST(n_chars % 101 AS DOUBLE) AS score
  FROM documents),
r AS (
  SELECT *,
    row_number() OVER (PARTITION BY prompt_id
                       ORDER BY score DESC, completion DESC) AS rmax,
    row_number() OVER (PARTITION BY prompt_id
                       ORDER BY score ASC, completion ASC) AS rmin
  FROM s),
c AS (SELECT prompt_id, completion AS chosen, score AS cs FROM r WHERE rmax = 1),
j AS (SELECT prompt_id, completion AS rejected, score AS rs FROM r WHERE rmin = 1)
SELECT prompt_id, chosen, rejected, cs AS chosen_score, rs AS rejected_score
FROM c JOIN j USING (prompt_id)
WHERE cs - rs > 0
"""


def q_best_of_n(spark, sf):
    """Rejection sampling / best-of-n (operators/sft.py::best_of_n):
    top-2 completions per prompt by (score desc, completion asc) with a
    deterministic rank column — the oversample -> reward-score -> keep
    winners distillation shape, one window on the prompt key."""
    from dataingestion_spark.operators.sft import best_of_n

    d = _t(spark, sf, "documents").select(
        (F.col("doc_id") % 40).cast("string").alias("prompt_id"),
        F.col("text").alias("completion"),
        (F.col("n_chars") % 101).cast("double").alias("score"),
    )
    return best_of_n(d, n=2).select(
        "prompt_id", "completion", "score", "rank")


ORACLE_BEST_OF_N = """
WITH s AS (
  SELECT CAST(doc_id % 40 AS VARCHAR) AS prompt_id, text AS completion,
         CAST(n_chars % 101 AS DOUBLE) AS score
  FROM documents),
r AS (
  SELECT *, CAST(row_number() OVER (PARTITION BY prompt_id
                 ORDER BY score DESC, completion ASC) AS INTEGER) AS rank
  FROM s)
SELECT prompt_id, completion, score, rank FROM r WHERE rank <= 2
"""


def q_lakehouse_maintenance(spark, sf):
    """Policy-driven maintenance (sinks/manifest_store.py::
    maintain_table): two unclustered event commits push clustering_drift
    (metadata-only loose-file fraction) past the threshold; maintain
    re-clusters via optimize_zorder (materializing the pending deletes),
    vacuums history, and a second call no-ops. Layout changes only —
    the oracle restates the surviving rows over raw events."""
    import tempfile

    from dataingestion_spark.sinks import manifest_store as ms

    ev = _t(spark, sf, "events").select(
        F.col("event_id").cast("string").alias("documentid"),
        "user_id", "value")
    eid = F.col("documentid").cast("long")
    table = tempfile.mkdtemp(prefix="maint_lh_") + "/t"
    ms.write_table(ev.filter(eid % 2 == 0), table)
    ms.append_table(ev.filter(eid % 2 == 1), table)
    ms.delete_documents(
        spark, table,
        [r[0] for r in ev.filter(eid % 13 == 0)
         .select("documentid").collect()])
    rep = ms.maintain_table(spark, table, zorder_by=["user_id", "value"],
                            keep_versions=1, min_file_age_seconds=0)
    assert any(a["op"] == "optimize_zorder" for a in rep["actions"])
    rep2 = ms.maintain_table(spark, table, zorder_by=["user_id", "value"],
                             keep_versions=1, min_file_age_seconds=0)
    assert rep2["actions"] == []
    return ms.read_table(spark, table).select(
        "documentid", "user_id",
        (F.round("value", 6) + F.lit(0.0)).alias("value"))


ORACLE_MAINTENANCE = """
SELECT CAST(event_id AS VARCHAR) AS documentid, user_id,
       round(value, 6) + 0.0 AS value
FROM events WHERE event_id % 13 <> 0
"""


def q_lakehouse_bloom_read(spark, sf):
    """Bloom-indexed equality skipping (sinks/manifest_store.py::
    set_bloom_columns): documents get a synthetic high-cardinality url
    (md5(doc_id) — identical in both engines), the url column is
    declared bloom-indexed, a compact back-fills per-file blooms, and
    the point read prunes to ~the one file that can contain the value
    before any footer IO. Equivalent by construction to
    read-then-filter; the oracle restates the md5 point predicate."""
    import tempfile

    from dataingestion_spark.sinks import manifest_store as ms

    docs = _t(spark, sf, "documents").select(
        F.col("doc_id").cast("string").alias("documentid"),
        "lang", F.col("n_chars").cast("long").alias("n_chars"),
    ).withColumn("url", F.concat(F.lit("https://x/"),
                                 F.md5(F.col("documentid"))))
    table = tempfile.mkdtemp(prefix="bloom_lh_") + "/t"
    ms.write_table(docs, table)
    ms.set_bloom_columns(table, ["url"])
    ms.compact(spark, table, max_files_per_bucket=0)  # back-fill blooms
    import hashlib

    target = "https://x/" + hashlib.md5(b"7").hexdigest()
    out = ms.read_table_where(spark, table, [("url", "=", target)])
    return out.select("documentid", "lang", "n_chars", "url")


ORACLE_BLOOM_READ = """
SELECT CAST(doc_id AS VARCHAR) AS documentid, lang,
       CAST(n_chars AS BIGINT) AS n_chars,
       'https://x/' || md5(CAST(doc_id AS VARCHAR)) AS url
FROM documents
WHERE 'https://x/' || md5(CAST(doc_id AS VARCHAR))
      = 'https://x/' || md5('7')
"""


def q_lakehouse_medallion(spark, sf):
    """Bronze→silver→gold medallion flow (examples/medallion_tour.py
    distilled; r6 #8 / r7 #7 / r8 #7 ask): raw documents land on a
    bronze manifest table, a second bronze append updates every
    doc_id%5==0 document to a 'rev2 '-prefixed body, a Structured
    Streaming job tails bronze commits (streaming/table_source.py::
    stream_table) and MERGEs each cleaned micro-batch into silver
    exactly-once ((app, epoch) txn guard), and gold is an
    incrementally-maintained per-lang matview (sinks/matview.py) —
    refresh #1 is full, refresh #2 folds only the churn. The oracle
    restates the FINAL gold state in closed form: per-lang token sums
    and row counts over the rev2-patched corpus with the n_tokens>=3
    quality gate. A dropped commit, double-applied batch, stale view,
    or broken merge changes the totals and goes red."""
    import tempfile

    from dataingestion_spark.sinks import manifest_store as ms
    from dataingestion_spark.sinks import matview
    from dataingestion_spark.streaming.table_source import stream_table

    _utc(spark)
    root = tempfile.mkdtemp(prefix="medallion_q_")
    bronze, silver = root + "/bronze", root + "/silver"
    gold, ckpt = root + "/gold", root + "/ckpt"

    raw = _t(spark, sf, "documents").select(
        F.col("doc_id").cast("string").alias("documentid"),
        "text", "lang",
        F.col("doc_id").cast("long").alias("_did"))

    def run_silver(epoch_tag):
        def apply_batch(df, epoch):
            cleaned = (
                df.withColumn("text", F.trim("text"))
                .withColumn("n_tokens",
                            F.size(F.split(F.trim("text"), r"\s+")))
                .filter(F.col("n_tokens") >= 3)
                .select("documentid", "text", "lang", "n_tokens")
            )
            if cleaned.isEmpty():
                return
            ms.merge_table(cleaned, silver,
                           txn=("medallion-q-silver", epoch))

        q = (
            stream_table(spark, bronze)
            .writeStream.foreachBatch(apply_batch)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    spec = (["lang"], [("n_tokens", "sum"), ("documentid", "count")])
    ms.write_table(raw.drop("_did"), bronze)
    run_silver(1)
    matview.refresh(spark, silver, gold, *spec)          # full
    ms.append_table(                                      # rev2 churn
        raw.filter(F.col("_did") % 5 == 0)
        .withColumn("text", F.concat(F.lit("rev2 "), F.col("text")))
        .drop("_did"),
        bronze)
    run_silver(2)
    matview.refresh(spark, silver, gold, *spec)          # incremental
    return matview.read_view(spark, gold).select(
        "lang", "sum_n_tokens", "n_rows")


ORACLE_MEDALLION = r"""
WITH final AS (
  SELECT lang,
         CASE WHEN doc_id % 5 = 0 THEN 'rev2 ' || trim(text)
              ELSE trim(text) END AS text
  FROM documents),
tok AS (
  SELECT lang, len(regexp_split_to_array(text, '\s+')) AS n_tokens
  FROM final)
SELECT lang, CAST(SUM(n_tokens) AS BIGINT) AS sum_n_tokens,
       COUNT(*) AS n_rows
FROM tok WHERE n_tokens >= 3 GROUP BY lang
"""


def q_pack_token_id_rows(spark, sf):
    """Token-ID-level sequence packing (operators/packing.py::
    pack_token_ids): synthetic per-document id streams (doc_id*100000+p,
    length n_chars%50+5 — reproducible in any engine) concatenate in
    documentid string order and cut every 256 ids; full sequences only.
    Pins the distributed prefix-sum placement, the explode/regroup
    ordering, and the partial-tail drop exactly. The REAL chain (BPE
    ids) is pinned by a decode-the-packed-stream round-trip test."""
    from dataingestion_spark.operators.packing import pack_token_ids

    d = _t(spark, sf, "documents").select(
        F.col("doc_id").cast("string").alias("documentid"),
        (F.col("n_chars") % 50 + 5).cast("int").alias("n"),
    )
    df = d.select(
        "documentid",
        F.expr("transform(sequence(0, n - 1), p -> "
               "CAST(CAST(documentid AS BIGINT) * 100000 + p AS INT))")
        .alias("token_ids"),
    )
    out = pack_token_ids(df, seq_len=256)
    # Scalar-only output: the driver canon sorts with raw pandas and
    # cannot handle list cells, so the packed ids ship as a CSV string
    # (same pattern as keywords_csv).
    return out.select(
        "seq_id",
        F.array_join(F.expr("transform(tokens, x -> CAST(x AS STRING))"),
                     ",").alias("tokens_csv"),
        "n")


ORACLE_PACK_IDS = """
WITH d AS (
  SELECT CAST(doc_id AS VARCHAR) AS documentid, doc_id,
         n_chars % 50 + 5 AS n
  FROM documents),
o AS (
  SELECT *, COALESCE(SUM(n) OVER (ORDER BY documentid
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prior
  FROM d),
t AS (
  SELECT CAST((o.prior + u.p) // 256 AS BIGINT) AS seq_id,
         (o.prior + u.p) % 256 AS pos,
         CAST(o.doc_id * 100000 + u.p AS INTEGER) AS id
  FROM o, LATERAL unnest(range(o.n)) AS u(p))
SELECT seq_id,
       list_aggregate(list(CAST(id AS VARCHAR) ORDER BY pos),
                      'string_agg', ',') AS tokens_csv,
       CAST(count(*) AS INTEGER) AS n
FROM t GROUP BY seq_id HAVING count(*) = 256
"""


def q_lakehouse_schema_evolution(spark, sf):
    """Commit-time schema evolution (sinks/manifest_store.py::
    _schema_union): the base commit has (documentid, lang); an append
    then WIDENS the table with n_chars, and a merge widens again with
    src_tag — old files surface typed NULLs for columns they predate
    (recorded schema, no footer scans at read). The oracle restates the
    widened union with explicit NULL fills."""
    import tempfile

    from dataingestion_spark.sinks import manifest_store as ms

    docs = _t(spark, sf, "documents").select(
        F.col("doc_id").cast("string").alias("documentid"),
        "lang", F.col("n_chars").cast("long").alias("n_chars"),
    )
    did = F.col("documentid").cast("long")
    table = tempfile.mkdtemp(prefix="schev_lh_") + "/t"
    ms.write_table(docs.filter(did % 3 == 0).select("documentid", "lang"),
                   table)
    ms.append_table(docs.filter(did % 3 == 1), table)  # + n_chars
    ms.merge_table(
        docs.filter(did % 3 == 2).withColumn("src_tag", F.lit("m")), table)
    return ms.read_table(spark, table).select(
        "documentid", "lang", "n_chars", "src_tag")


ORACLE_SCHEMA_EVOLUTION = """
SELECT CAST(doc_id AS VARCHAR) AS documentid, lang,
       CAST(NULL AS BIGINT) AS n_chars, CAST(NULL AS VARCHAR) AS src_tag
FROM documents WHERE doc_id % 3 = 0
UNION ALL
SELECT CAST(doc_id AS VARCHAR), lang, CAST(n_chars AS BIGINT), NULL
FROM documents WHERE doc_id % 3 = 1
UNION ALL
SELECT CAST(doc_id AS VARCHAR), lang, CAST(n_chars AS BIGINT), 'm'
FROM documents WHERE doc_id % 3 = 2
"""


def q_lakehouse_update_where(spark, sf):
    """Predicate update (sinks/manifest_store.py::update_where):
    UPDATE events SET value = round(value,6) + 1000 WHERE user_id < 10 —
    matched documents rewrite as one replace-by-documentid DV commit
    from the affected buckets only. Oracle restates the mutation."""
    import tempfile

    from dataingestion_spark.sinks import manifest_store as ms

    ev = _t(spark, sf, "events").select(
        F.col("event_id").cast("string").alias("documentid"),
        "user_id", (F.round("value", 6) + F.lit(0.0)).alias("value"))
    table = tempfile.mkdtemp(prefix="uw_lh_") + "/t"
    ms.write_table(ev, table)
    ms.update_where(spark, table, [("user_id", "<", 10)],
                    {"value": "value + 1000"})
    return ms.read_table(spark, table).select(
        "documentid", "user_id", "value")


ORACLE_UPDATE_WHERE = """
SELECT CAST(event_id AS VARCHAR) AS documentid, user_id,
       round(value, 6) + 0.0
         + CASE WHEN user_id < 10 THEN 1000 ELSE 0 END AS value
FROM events
"""


def q_lakehouse_scd2(spark, sf):
    """SCD Type 2 dimension maintenance (sinks/scd.py::scd2_merge): three
    snapshot batches over the customer dimension — batch 1 seeds every
    key; batch 2 re-observes every key but only custkey%3==0 changed
    (balance+100), the rest must be detected unchanged and left alone;
    batch 3 observes only custkey%2==0 with a new segment. Changed keys
    close their current row (valid_to=effective, is_current=false) and
    open a new one in ONE O(batch) DV commit. The oracle restates the
    final history in closed form (valid_to = next version's stamp).
    Beyond the reference (its writer is whole-document upsert,
    VectorStoreWriter.cs:76-108)."""
    import tempfile

    from dataingestion_spark.sinks import manifest_store as ms
    from dataingestion_spark.sinks.scd import scd2_merge

    cust = _t(spark, sf, "customer").select(
        F.col("c_custkey").cast("string").alias("documentid"),
        F.col("c_mktsegment").alias("segment"),
        (F.round("c_acctbal", 2) + F.lit(0.0)).alias("balance"))
    from concurrent.futures import ThreadPoolExecutor

    key = F.col("documentid").cast("long")
    bal2 = F.col("balance") + F.when(key % 3 == 0, 100.0).otherwise(0.0)
    table = tempfile.mkdtemp(prefix="scd2_lh_") + "/dim"
    b2 = (cust.withColumn("balance", bal2)
          .withColumn("effective_ts", F.lit(2.0)))
    b3 = (cust.withColumn("balance", bal2)
          .withColumn("segment", F.lit("CHURNED"))
          .withColumn("effective_ts", F.lit(3.0))
          .filter(key % 2 == 0))
    # §2.6 overlap: batches 2/3's precheck jobs read only their own
    # source frames, so they run from a thread pool while batch 1 seeds
    # the dimension — merge ORDER and each merge's view of prior history
    # are unchanged; results identical (oracled).
    with ThreadPoolExecutor(max_workers=2) as pool:
        p2 = pool.submit(ms.prepare_batch, b2)
        p3 = pool.submit(ms.prepare_batch, b3)
        scd2_merge(cust.withColumn("effective_ts", F.lit(1.0)),
                   table, tracked=["segment", "balance"])
        scd2_merge(b2, table, tracked=["segment", "balance"],
                   prepared=p2.result())
        scd2_merge(b3, table, tracked=["segment", "balance"],
                   prepared=p3.result())
    return ms.read_table(spark, table).select(
        "documentid", "segment", "balance",
        "valid_from", "valid_to", "is_current")


ORACLE_SCD2 = """
WITH base AS (
  SELECT c_custkey AS k, CAST(c_custkey AS VARCHAR) AS documentid,
         c_mktsegment AS seg0, round(c_acctbal, 2) + 0.0 AS bal0
  FROM customer)
SELECT documentid, seg0 AS segment, bal0 AS balance,
       CAST(1.0 AS DOUBLE) AS valid_from,
       CAST(CASE WHEN k % 3 = 0 THEN 2.0 WHEN k % 2 = 0 THEN 3.0 END AS DOUBLE) AS valid_to,
       (k % 3 <> 0 AND k % 2 <> 0) AS is_current
FROM base
UNION ALL
SELECT documentid, seg0 AS segment, bal0 + 100 AS balance,
       CAST(2.0 AS DOUBLE) AS valid_from,
       CAST(CASE WHEN k % 2 = 0 THEN 3.0 END AS DOUBLE) AS valid_to,
       (k % 2 <> 0) AS is_current
FROM base WHERE k % 3 = 0
UNION ALL
SELECT documentid, 'CHURNED' AS segment,
       bal0 + CASE WHEN k % 3 = 0 THEN 100 ELSE 0 END AS balance,
       CAST(3.0 AS DOUBLE) AS valid_from, CAST(NULL AS DOUBLE) AS valid_to,
       TRUE AS is_current
FROM base WHERE k % 2 = 0
"""


def q_lakehouse_stream_read(spark, sf):
    """Structured Streaming READ of a manifest table
    (streaming/table_source.py::stream_table — a Spark 4 Python streaming
    data source, the Delta ``readStream.format("delta")`` analog): v0 =
    documents doc_id%3==0 slice; first availableNow pass emits the
    snapshot batch into a parquet sink; then doc_id%3==1 is APPENDED and
    a second pass tails exactly that commit through the checkpointed
    version offsets (one input partition per added file, executor-side
    Arrow reads). The returned frame is the sink — snapshot ∪ tailed
    append — which the oracle restates in closed form; exactly-once,
    change-commit failure, and startingVersion are pinned in
    tests/test_table_stream.py."""
    import tempfile

    from dataingestion_spark.sinks import manifest_store as ms
    from dataingestion_spark.streaming.table_source import stream_table

    docs = _t(spark, sf, "documents").select(
        F.col("doc_id").cast("string").alias("documentid"),
        "lang", "n_chars")
    tmp = tempfile.mkdtemp(prefix="stream_lh_")
    table, sink, ckpt = tmp + "/t", tmp + "/sink", tmp + "/ckpt"
    ms.write_table(docs.filter(F.col("doc_id") % 3 == 0), table)

    def drain():
        q = (stream_table(spark, table)
             .writeStream.format("parquet").option("path", sink)
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination()

    drain()  # snapshot batch
    ms.append_table(docs.filter(F.col("doc_id") % 3 == 1), table)
    drain()  # tail the append commit
    return spark.read.parquet(sink).select("documentid", "lang", "n_chars")


ORACLE_STREAM_READ = """
SELECT CAST(doc_id AS VARCHAR) AS documentid, lang, n_chars
FROM documents WHERE doc_id % 3 IN (0, 1)
"""


def q_lakehouse_delta_mirror(spark, sf):
    """Continuous Delta mirroring (interop/delta.py::mirror_delta):
    first call full-exports the documents doc_id%2==0 slice; the
    doc_id%2==1, %3==0 slice is appended and a doc_id%10==0 slice
    deleted (DVs materialized by bucket-scoped compaction); the second
    mirror call writes ONE incremental Delta commit of remove+add
    actions (O(changed files), diffed against the mirror's live file
    set — no watermark state). Returned frame re-reads the mirror
    through read_delta; the oracle restates the surviving rows."""
    import tempfile

    from dataingestion_spark.interop.delta import mirror_delta, read_delta
    from dataingestion_spark.sinks import manifest_store as ms

    docs = _t(spark, sf, "documents").select(
        F.col("doc_id").cast("string").alias("documentid"),
        "lang", "n_chars")
    tmp = tempfile.mkdtemp(prefix="mirror_lh_")
    table, dst = tmp + "/t", tmp + "/mirror"
    ms.write_table(docs.filter(F.col("doc_id") % 2 == 0), table)
    mirror_delta(spark, table, dst)
    ms.append_table(docs.filter((F.col("doc_id") % 2 == 1)
                                & (F.col("doc_id") % 3 == 0)), table)
    dels = [r["documentid"] for r in
            docs.filter(F.col("doc_id") % 10 == 0)
            .select("documentid").collect()]
    ms.delete_documents(spark, table, dels)
    mirror_delta(spark, table, dst)
    return read_delta(spark, dst).select("documentid", "lang", "n_chars")


ORACLE_DELTA_MIRROR = """
SELECT CAST(doc_id AS VARCHAR) AS documentid, lang, n_chars
FROM documents
WHERE (doc_id % 2 = 0 OR (doc_id % 2 = 1 AND doc_id % 3 = 0))
  AND doc_id % 10 <> 0
"""


def q_lakehouse_meta_minmax(spark, sf):
    """MIN/MAX answered from manifest file stats
    (sinks/manifest_store.py::metadata_minmax — the Delta log-answered
    min/max analog): the events table is written once, then the extremes
    of a numeric, an integer, and a string column are folded from the
    per-file [min,max] ranges recorded at write time — zero data files
    opened (the test passes spark=None to prove no scan can run). The
    oracle computes the same aggregates directly."""
    import tempfile

    from dataingestion_spark.sinks import manifest_store as ms

    ev = _t(spark, sf, "events").select(
        F.col("event_id").cast("string").alias("documentid"),
        "user_id", "event_type",
        (F.round("value", 6) + F.lit(0.0)).alias("value"))
    table = tempfile.mkdtemp(prefix="mm_lh_") + "/t"
    ms.write_table(ev, table)
    mm = ms.metadata_minmax(None, table, ["user_id", "event_type", "value"])
    return spark.createDataFrame(
        [(mm["user_id"][0], mm["user_id"][1],
          mm["event_type"][0], mm["event_type"][1],
          mm["value"][0], mm["value"][1])],
        "uid_min bigint, uid_max bigint, et_min string, et_max string, "
        "val_min double, val_max double")


ORACLE_META_MINMAX = """
SELECT MIN(user_id) AS uid_min, MAX(user_id) AS uid_max,
       MIN(event_type) AS et_min, MAX(event_type) AS et_max,
       MIN(round(value, 6) + 0.0) AS val_min,
       MAX(round(value, 6) + 0.0) AS val_max
FROM events
"""


def q_lakehouse_change_stream(spark, sf):
    """Streaming CHANGE FEED (streaming/table_source.py::stream_changes —
    Delta readChangeFeed analog): v0 writes the doc_id%3!=2 slice, v1 is
    a MERGE of the doc_id%2==0 slice with n_chars+1000 (updates emit
    delete+insert pairs at the same version), v2 deletes the surviving
    doc_id%7==0 keys. One availableNow drain of the feed returns every
    per-commit row change with _change_type/_commit_version; the oracle
    restates all five change sets in closed form. Per-commit equality
    with table_diff is pinned in tests/test_change_stream.py."""
    import tempfile

    from dataingestion_spark.sinks import manifest_store as ms
    from dataingestion_spark.streaming.table_source import stream_changes

    docs = _t(spark, sf, "documents").select(
        F.col("doc_id").cast("string").alias("documentid"),
        "lang", "n_chars")
    tmp = tempfile.mkdtemp(prefix="cdc_lh_")
    table, sink, ckpt = tmp + "/t", tmp + "/sink", tmp + "/ckpt"
    ms.write_table(docs.filter(F.col("doc_id") % 3 != 2), table)
    ms.merge_table(
        docs.filter(F.col("doc_id") % 2 == 0)
        .withColumn("n_chars", F.col("n_chars") + F.lit(1000)), table)
    dels = [r["documentid"] for r in
            ms.read_table(spark, table)
            .filter(F.col("documentid").cast("bigint") % 7 == 0)
            .select("documentid").collect()]
    ms.delete_documents(spark, table, dels)
    q = (stream_changes(spark, table)
         .writeStream.format("parquet").option("path", sink)
         .option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    q.awaitTermination()
    return spark.read.parquet(sink).select(
        "documentid", "lang", "n_chars", "_change_type",
        F.col("_commit_version").alias("commit_v"))


def q_lakehouse_rename_column(spark, sf):
    """Metadata-only column RENAME (sinks/manifest_store.py::
    rename_column — Delta column-mapping analog): events commit as a
    table, `value` renames to `amount` (no file touched), an UPDATE and
    an append land THROUGH the mapping (logical batch, frozen physical
    file names), and the final read + a stats-pruned filter both speak
    the new name. The oracle restates the mutations."""
    import tempfile

    from dataingestion_spark.sinks import manifest_store as ms

    ev = _t(spark, sf, "events").select(
        F.col("event_id").cast("string").alias("documentid"),
        "user_id", (F.round("value", 6) + F.lit(0.0)).alias("value"))
    table = tempfile.mkdtemp(prefix="rn_lh_") + "/t"
    ms.write_table(ev.filter(F.col("user_id") % 2 == 0), table)
    ms.rename_column(table, "value", "amount")
    ms.update_where(spark, table, [("user_id", "<", 10)],
                    {"amount": "amount + 1000"})
    ms.append_table(
        ev.filter(F.col("user_id") % 2 != 0)
        .withColumnRenamed("value", "amount"), table)
    return ms.read_table(spark, table).select(
        "documentid", "user_id", "amount")


ORACLE_RENAME_COLUMN = """
SELECT CAST(event_id AS VARCHAR) AS documentid, user_id,
       round(value, 6) + 0.0
         + CASE WHEN user_id % 2 = 0 AND user_id < 10
                THEN 1000 ELSE 0 END AS amount
FROM events
"""


def q_lakehouse_history_stream(spark, sf):
    """CDC feed -> SCD Type 2 history (streaming/pipeline.py::
    stream_history + sinks/scd.py tombstones): the source table takes a
    write (v0), a MERGE update (v1, n_chars+1000 for doc_id%2==0 — also
    INSERTING the %3==2 evens), and a delete of the surviving %7==0 keys
    (v2). One drain turns the change feed into a dimension whose
    valid_from/valid_to stamps are the source commit versions; deletes
    close histories without reopening. Oracle restates the final
    history in closed form. Beyond the reference."""
    import tempfile

    from dataingestion_spark.sinks import manifest_store as ms
    from dataingestion_spark.streaming.pipeline import stream_history

    docs = _t(spark, sf, "documents").select(
        F.col("doc_id").cast("string").alias("documentid"),
        "lang", "n_chars")
    tmp = tempfile.mkdtemp(prefix="hist_lh_")
    src, dim = tmp + "/src", tmp + "/dim"
    ms.write_table(docs.filter(F.col("doc_id") % 3 != 2), src)
    ms.merge_table(
        docs.filter(F.col("doc_id") % 2 == 0)
        .withColumn("n_chars", F.col("n_chars") + F.lit(1000)), src)
    dels = [r["documentid"] for r in
            ms.read_table(spark, src)
            .filter(F.col("documentid").cast("bigint") % 7 == 0)
            .select("documentid").collect()]
    ms.delete_documents(spark, src, dels)
    stream_history(spark, src, dim,
                   tracked=["lang", "n_chars"]).awaitTermination()
    return ms.read_table(spark, dim).select(
        "documentid", "lang", "n_chars",
        "valid_from", "valid_to", "is_current")


ORACLE_HISTORY_STREAM = """
WITH base AS (
  SELECT doc_id AS k, CAST(doc_id AS VARCHAR) AS documentid, lang, n_chars
  FROM documents)
SELECT documentid, lang, n_chars,
       CAST(0.0 AS DOUBLE) AS valid_from,
       CAST(CASE WHEN k % 2 = 0 THEN 1.0
                 WHEN k % 7 = 0 THEN 2.0 END AS DOUBLE) AS valid_to,
       (k % 2 <> 0 AND k % 7 <> 0) AS is_current
FROM base WHERE k % 3 <> 2
UNION ALL
SELECT documentid, lang, n_chars + 1000 AS n_chars,
       CAST(1.0 AS DOUBLE) AS valid_from,
       CAST(CASE WHEN k % 7 = 0 THEN 2.0 END AS DOUBLE) AS valid_to,
       (k % 7 <> 0) AS is_current
FROM base WHERE k % 2 = 0
"""


ORACLE_CHANGE_STREAM = """
WITH a AS (SELECT CAST(doc_id AS VARCHAR) AS documentid, lang, n_chars
           FROM documents WHERE doc_id % 3 <> 2),
b AS (SELECT CAST(doc_id AS VARCHAR) AS documentid, lang,
             n_chars + 1000 AS n_chars
      FROM documents WHERE doc_id % 2 = 0),
state AS (
  SELECT * FROM b
  UNION ALL
  SELECT * FROM a WHERE documentid NOT IN (SELECT documentid FROM b))
SELECT documentid, lang, n_chars, 'insert' AS _change_type,
       CAST(0 AS BIGINT) AS commit_v FROM a
UNION ALL
SELECT documentid, lang, n_chars, 'insert', 1 FROM b
UNION ALL
SELECT a.documentid, a.lang, a.n_chars, 'delete', 1
FROM a JOIN b ON a.documentid = b.documentid
UNION ALL
SELECT documentid, lang, n_chars, 'delete', 2
FROM state WHERE CAST(documentid AS BIGINT) % 7 = 0
"""


def q_lakehouse_meta_count(spark, sf):
    """Metadata-only COUNT(*) (sinks/manifest_store.py::metadata_count):
    two append commits, count answered from the summed per-file row
    stats in the manifest — zero data files opened (pinned by a
    stats-poisoning unit test); with live DVs or missing stats it falls
    back to the DV-applied scan, same number. Here the clean path runs
    and the oracle recomputes the count from the raw rows."""
    import tempfile

    from dataingestion_spark.sinks import manifest_store as ms

    docs = _t(spark, sf, "documents").select(
        F.col("doc_id").cast("string").alias("documentid"), "n_chars")
    table = tempfile.mkdtemp(prefix="cnt_lh_") + "/t"
    ms.write_table(docs.filter(F.col("doc_id") % 2 == 0), table)
    ms.append_table(docs.filter((F.col("doc_id") % 2 == 1)
                                & (F.col("doc_id") % 3 == 0)), table)
    n = ms.metadata_count(spark, table)
    return spark.createDataFrame([(int(n),)], "n_rows bigint")


ORACLE_META_COUNT = """
SELECT CAST(COUNT(*) AS BIGINT) AS n_rows FROM documents
WHERE doc_id % 2 = 0 OR (doc_id % 2 = 1 AND doc_id % 3 = 0)
"""


def q_lakehouse_delta_roundtrip(spark, sf):
    """Delta Lake protocol interop (interop/delta.py): a manifest table
    (documents doc_id%4!=3, then doc_id%5==0 DELETED — live equality
    DVs) is published with export_delta, which first MATERIALIZES the
    DVs (compacting only DV-carrying buckets), then writes a spec-
    conformant _delta_log commit — protocol v1/v2, metaData carrying the
    tracked Spark schema verbatim, one add per live file with
    numRecords/minValues/maxValues translated from manifest stats. The
    returned frame re-reads the export through read_delta (JSON commit
    replay). Foreign-log replay (removes, partitions, checkpoints,
    feature rejection) is pinned in tests/test_delta_interop.py."""
    import tempfile

    from dataingestion_spark.interop.delta import export_delta, read_delta
    from dataingestion_spark.sinks import manifest_store as ms

    docs = _t(spark, sf, "documents").select(
        F.col("doc_id").cast("string").alias("documentid"),
        "lang", "n_chars")
    tmp = tempfile.mkdtemp(prefix="delta_lh_")
    table, dst = tmp + "/t", tmp + "/delta"
    ms.write_table(docs.filter(F.col("doc_id") % 4 != 3), table)
    dels = [r["documentid"] for r in
            docs.filter((F.col("doc_id") % 4 != 3)
                        & (F.col("doc_id") % 5 == 0))
            .select("documentid").collect()]
    ms.delete_documents(spark, table, dels)
    export_delta(spark, table, dst, mode="copy")
    return read_delta(spark, dst).select("documentid", "lang", "n_chars")


ORACLE_DELTA_ROUNDTRIP = """
SELECT CAST(doc_id AS VARCHAR) AS documentid, lang, n_chars
FROM documents WHERE doc_id % 4 <> 3 AND doc_id % 5 <> 0
"""


def q_lakehouse_delete_where(spark, sf):
    """Predicate delete (sinks/manifest_store.py::delete_where): three
    range-disjoint event commits, then DELETE WHERE user_id >= 100 AND
    value < 50 — stats prune the scan to candidate files, matching ids
    become one distributed equality-DV commit (no file rewritten, no
    driver collect). The oracle restates the survivors."""
    import tempfile

    from dataingestion_spark.sinks import manifest_store as ms

    ev = _t(spark, sf, "events").select(
        F.col("event_id").cast("string").alias("documentid"),
        "user_id", "value")
    table = tempfile.mkdtemp(prefix="dw_lh_") + "/t"
    ms.write_table(ev.filter(F.col("user_id") < 50), table)
    ms.append_table(
        ev.filter((F.col("user_id") >= 50) & (F.col("user_id") < 100)), table)
    ms.append_table(ev.filter(F.col("user_id") >= 100), table)
    ms.delete_where(spark, table,
                    [("user_id", ">=", 100), ("value", "<", 50.0)])
    return ms.read_table(spark, table).select(
        "documentid", "user_id",
        (F.round("value", 6) + F.lit(0.0)).alias("value"))


ORACLE_DELETE_WHERE = """
SELECT CAST(event_id AS VARCHAR) AS documentid, user_id,
       round(value, 6) + 0.0 AS value
FROM events
WHERE NOT (user_id >= 100 AND value < 50.0)
"""


def q_incremental_agg_view(spark, sf):
    """Incrementally-maintained aggregate view (sinks/matview.py): base
    table = documents slice doc_id%3==0, full refresh; append the
    doc_id%3==1 slice, second refresh folds ONLY the appended files'
    partial aggregates into the stored view (asserted incremental —
    silently recomputing would mask a broken delta rule); then a CDF
    view (count/sum spec) absorbs a DELETE of doc_id%9==1 and an
    n_chars+10 UPDATE of doc_id%6==4 from the SIGNED change feed
    (asserted incremental_cdf — r6 Materialize-style delta path). The
    oracle restates the surviving mutated rows in closed form."""
    import tempfile

    from dataingestion_spark.sinks import manifest_store as ms
    from dataingestion_spark.sinks import matview as mv

    docs = _t(spark, sf, "documents").select(
        F.col("doc_id").cast("string").alias("documentid"),
        "source", "n_chars",
    )
    base = tempfile.mkdtemp(prefix="mv_base_") + "/t"
    view = tempfile.mkdtemp(prefix="mv_view_") + "/v"
    spec = (["source"], [("n_chars", "count"), ("n_chars", "sum"),
                         ("n_chars", "min"), ("n_chars", "max")])
    ms.write_table(docs.filter(F.col("documentid").cast("long") % 3 == 0), base)
    mode1 = mv.refresh(spark, base, view, *spec)
    ms.append_table(docs.filter(F.col("documentid").cast("long") % 3 == 1), base)
    mode2 = mv.refresh(spark, base, view, *spec)
    assert (mode1, mode2) == ("full", "incremental"), (mode1, mode2)

    # count/sum view: deletes and updates refresh from the change feed
    view2 = tempfile.mkdtemp(prefix="mv_view2_") + "/v"
    spec2 = (["source"], [("n_chars", "count"), ("n_chars", "sum")])
    did = F.col("documentid").cast("long")
    mv.refresh(spark, base, view2, *spec2)
    ms.delete_documents(
        spark, base,
        [r[0] for r in docs.filter(did % 9 == 1)
         .select("documentid").collect()])
    ms.merge_table(
        docs.filter(did % 6 == 4)
        .withColumn("n_chars", F.col("n_chars") + 10), base,
        when_not_matched=None)
    mode3 = mv.refresh(spark, base, view2, *spec2)
    assert mode3 == "incremental_cdf", mode3
    a = mv.read_view(spark, view).select(
        "source", "n_rows", "sum_n_chars", "min_n_chars", "max_n_chars")
    b = mv.read_view(spark, view2).select(
        F.col("source").alias("source2"),
        F.col("n_rows").alias("n_rows_cdf"),
        F.col("sum_n_chars").alias("sum_n_chars_cdf"))
    return a.join(b, a["source"] == b["source2"], "inner").drop("source2")


ORACLE_INCR_AGG = """
WITH slab AS (
  SELECT source, n_chars FROM documents WHERE doc_id % 3 IN (0, 1)),
mutated AS (
  SELECT source,
         n_chars + CASE WHEN doc_id % 6 = 4 THEN 10 ELSE 0 END AS n_chars
  FROM documents
  WHERE doc_id % 3 IN (0, 1) AND doc_id % 9 <> 1)
SELECT a.source, a.n_rows, a.sum_n_chars, a.min_n_chars, a.max_n_chars,
       b.n_rows_cdf, b.sum_n_chars_cdf
FROM (SELECT source, COUNT(*) AS n_rows,
             CAST(SUM(n_chars) AS BIGINT) AS sum_n_chars,
             MIN(n_chars) AS min_n_chars, MAX(n_chars) AS max_n_chars
      FROM slab GROUP BY source) a
JOIN (SELECT source, COUNT(*) AS n_rows_cdf,
             CAST(SUM(n_chars) AS BIGINT) AS sum_n_chars_cdf
      FROM mutated GROUP BY source) b USING (source)
"""


def q_streaming_dedup_watermark(spark, sf):
    """Native streaming dedup (streaming/pipeline.py::stream_events_dedup):
    every event delivered twice (source unioned with itself — the
    at-least-once shape), dropDuplicatesWithinWatermark on event_id.
    State is bounded by rate × watermark instead of growing forever, and
    the drained output is exactly one row per event_id — equal to the
    batch DISTINCT, so this streaming query is FULLY oracle-checked."""
    from dataingestion_spark.streaming.pipeline import stream_events_dedup

    _utc(spark)
    name = "events_dedup_check"
    q = stream_events_dedup(spark, sf, query_name=name)
    q.awaitTermination()
    return spark.table(name)


ORACLE_STREAM_DEDUP_WM = """
SELECT event_id, ts, user_id, event_type, value FROM events
"""


def q_streaming_sessions(spark, sf):
    """Watermarked merging session windows (F.session_window under
    Structured Streaming), fully oracled: the drained append output is
    exactly the batch sessionization restricted to sessions the final
    watermark passed (end < max(ts) − 10 min, strict — pinned
    empirically and in tests/test_streaming.py)."""
    from dataingestion_spark.streaming.pipeline import stream_events_sessions

    _utc(spark)
    name = "events_sessions_check"
    q = stream_events_sessions(spark, sf, query_name=name)
    q.awaitTermination()
    return spark.table(name)


def q_streaming_interval_join(spark, sf):
    """Watermarked stream-stream interval join
    (streaming/pipeline.py::stream_events_interval_join): purchases
    attributed to a same-user click within 30 minutes. Join state is
    bounded by watermark + interval on both sides; inner matches emit
    within their micro-batch, so the drained availableNow output equals
    the batch join — which is why this one streaming query IS fully
    oracle-checkable (exact equality pinned in
    tests/test_streaming.py::test_stream_interval_join_matches_batch)."""
    from dataingestion_spark.streaming.pipeline import stream_events_interval_join

    _utc(spark)
    name = "events_interval_join_check"
    q = stream_events_interval_join(spark, sf, query_name=name)
    q.awaitTermination()
    return spark.table(name)


# Streamed append-mode output = the batch aggregation restricted to
# windows/sessions the FINAL watermark passed (strictly: end < max(ts) -
# delay; the boundary case was pinned empirically — a window ending
# exactly at the horizon is NOT emitted). That closed form makes both
# streaming queries fully oracle-checkable, not rows-only.
ORACLE_STREAM_WINDOWED = """
SELECT time_bucket(INTERVAL '5 minutes', ts) AS win_start,
       time_bucket(INTERVAL '5 minutes', ts) + INTERVAL 5 MINUTE AS win_end,
       event_type,
       COUNT(*) AS n,
       CAST(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) AS sum_value
FROM events
GROUP BY 1, 2, 3
HAVING time_bucket(INTERVAL '5 minutes', ts) + INTERVAL 5 MINUTE
       < (SELECT MAX(ts) - INTERVAL 10 MINUTE FROM events)
"""


ORACLE_STREAM_SESSIONS = """
WITH g AS (
  SELECT user_id, event_id, ts,
    CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
              >= INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS brk
  FROM events),
s AS (
  SELECT user_id, ts,
    SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS UNBOUNDED PRECEDING) AS sid
  FROM g)
SELECT user_id, MIN(ts) AS session_start,
       MAX(ts) + INTERVAL 30 MINUTE AS session_end,
       COUNT(*) AS n_events
FROM s GROUP BY user_id, sid
HAVING MAX(ts) + INTERVAL 30 MINUTE
       < (SELECT MAX(ts) - INTERVAL 10 MINUTE FROM events)
"""


ORACLE_STREAM_INTERVAL_JOIN = """
SELECT a.user_id AS user_id,
       a.event_id AS left_id,
       b.event_id AS right_id,
       a.ts AS left_ts,
       b.ts AS right_ts
FROM events a
JOIN events b
  ON a.user_id = b.user_id
 AND a.event_type = 'click' AND b.event_type = 'purchase'
 AND b.ts >= a.ts AND b.ts <= a.ts + INTERVAL 30 MINUTE
"""


def q_streaming_dedup(spark, sf):
    """Streaming content-dedup ingest: the documents table streamed through
    stream_ingest_dedup must land exactly one row per distinct content —
    which duplicate survives is run-dependent, but the distinct-content
    count is not, so THAT is the oracle-checked output. Restart idempotence
    is pinned by tests/test_streaming.py::test_stream_ingest_dedup_idempotent."""
    import tempfile

    from dataingestion_spark.sinks import manifest_store as ms
    from dataingestion_spark.streaming.pipeline import stream_ingest_dedup

    work = tempfile.mkdtemp(prefix="stream_dedup_")
    inp, table = f"{work}/in", f"{work}/table"
    docs = _t(spark, sf, "documents")
    docs.write.mode("overwrite").parquet(inp)
    stream_ingest_dedup(spark, inp, table).awaitTermination()
    t = ms.read_table(spark, table)
    return t.agg(
        F.count("*").alias("n_rows"),
        F.countDistinct("content_hash").alias("n_unique_contents"),
    )


ORACLE_STREAM_DEDUP = """
SELECT COUNT(DISTINCT md5(text)) AS n_rows,
       COUNT(DISTINCT md5(text)) AS n_unique_contents
FROM documents
"""


# --- SFT chat rendering + loss masks (operators/sft.py) -------------------

_SFT_MSGS_SQL = """
SELECT CAST(doc_id % 37 AS BIGINT) AS conv_id,
       CAST(doc_id AS BIGINT) AS pos,
       CASE WHEN doc_id % 2 = 0 THEN 'user' ELSE 'assistant' END AS role,
       substr(text, 1, 160) AS content
FROM documents
WHERE doc_id < 600
"""


def _sft_messages(spark, sf):
    """Deterministic message stream derived from documents: 37
    conversations, alternating user/assistant turns in doc_id order,
    content = first 160 chars. Mirrors _SFT_MSGS_SQL exactly."""
    docs = _t(spark, sf, "documents").filter(F.col("doc_id") < 600)
    return docs.select(
        (F.col("doc_id") % 37).cast("long").alias("conv_id"),
        F.col("doc_id").cast("long").alias("pos"),
        F.when(F.col("doc_id") % 2 == 0, F.lit("user"))
         .otherwise(F.lit("assistant")).alias("role"),
        F.substring("text", 1, 160).alias("content"),
    )


def q_sft_offsets(spark, sf):
    """ChatML-template rendering with per-message character offsets
    (operators/sft.py::render_messages): one window cumulative sum per
    conversation, expression-only. The offsets are what lets a trainer
    loss-mask non-assistant spans without re-tokenizing."""
    from dataingestion_spark.operators.sft import render_messages

    out = render_messages(_sft_messages(spark, sf))
    return out.select("conv_id", "pos", "role", "start_off", "end_off",
                      "content_start", "content_end")


def q_sft_chat(spark, sf):
    """Per-conversation rendered prompt + loss-mask scalars
    (operators/sft.py::render_chat): ordered string fold + masked-char
    accounting, grouped on the same conv_id partitioning the offsets
    pass already established."""
    from dataingestion_spark.operators.sft import render_chat, render_messages

    return render_chat(render_messages(_sft_messages(spark, sf)))


def q_sft_token_mask(spark, sf):
    """Character-span loss mask projected onto the space-token stream
    (operators/sft.py::token_loss_mask): split + posexplode + one
    intra-piece cumulative sum; the span test rides the same row, so no
    join. Restricted to 4 conversations to keep the oracle volume sane."""
    from dataingestion_spark.operators.sft import render_messages, token_loss_mask

    rendered = render_messages(_sft_messages(spark, sf)).filter(F.col("conv_id") < 4)
    return token_loss_mask(rendered)


def _oracle_sft_offsets() -> str:
    from dataingestion_spark.operators.sft import render_messages_sql

    return (
        "SELECT conv_id, pos, role, start_off, end_off, content_start, content_end "
        f"FROM ({render_messages_sql(_SFT_MSGS_SQL)})"
    )


def _oracle_sft_chat() -> str:
    from dataingestion_spark.operators.sft import render_chat_sql

    return render_chat_sql(_SFT_MSGS_SQL)


def _oracle_sft_token_mask() -> str:
    from dataingestion_spark.operators.sft import token_loss_mask_sql

    return (
        f"SELECT * FROM ({token_loss_mask_sql(_SFT_MSGS_SQL)}) WHERE conv_id < 4"
    )


# --- KMV / theta sketch set algebra (operators/kmv.py) ---------------------

_KMV_K = 256


def q_kmv_distinct(spark, sf):
    """KMV distinct-count sketch (operators/kmv.py::kmv_sample/estimate)
    of orders.o_custkey, k=256, alongside the exact distinct count. The
    sketch build is a distinct-hash aggregate + TakeOrderedAndProject
    top-k; values never shuffle, only 13-char hashes."""
    from dataingestion_spark.operators.kmv import kmv_estimate, kmv_sample

    orders = _t(spark, sf, "orders")
    est = kmv_estimate(kmv_sample(orders, "o_custkey", _KMV_K), _KMV_K)
    exact = orders.agg(F.countDistinct("o_custkey").cast("long").alias("n_exact"))
    return (est.crossJoin(exact)
            .select("n_sample", F.round("est", 6).alias("est"), "n_exact"))


def q_kmv_setops(spark, sf):
    """Theta-sketch union/intersection/difference estimates between the
    customer sets of even- and odd-keyed orders, checked against the
    exact overlap. Two independent sketches + ≤2k-row set algebra —
    the two streams are never joined."""
    from dataingestion_spark.operators.kmv import kmv_sample, kmv_set_estimates

    orders = _t(spark, sf, "orders")
    a = kmv_sample(orders.filter(F.col("o_orderkey") % 2 == 0), "o_custkey", _KMV_K)
    b = kmv_sample(orders.filter(F.col("o_orderkey") % 2 == 1), "o_custkey", _KMV_K)
    ests = kmv_set_estimates(a, b, _KMV_K)
    ea = orders.filter(F.col("o_orderkey") % 2 == 0).select("o_custkey").distinct()
    eb = orders.filter(F.col("o_orderkey") % 2 == 1).select("o_custkey").distinct()
    exact = (ea.withColumnRenamed("o_custkey", "ck").join(
                 eb.withColumnRenamed("o_custkey", "ck"), "ck", "inner")
             .agg(F.count("*").cast("long").alias("n_exact_intersect")))
    return (ests.crossJoin(exact)
            .select(F.round("est_union", 6).alias("est_union"),
                    F.round("est_intersect", 6).alias("est_intersect"),
                    F.round("est_diff_a", 6).alias("est_diff_a"),
                    "n_union", "n_intersect", "n_exact_intersect"))


def _oracle_kmv_distinct() -> str:
    from dataingestion_spark.operators.kmv import kmv_estimate_sql

    est = kmv_estimate_sql("SELECT o_custkey FROM orders", "o_custkey", _KMV_K)
    return f"""
SELECT e.n_sample, ROUND(e.est, 6) AS est, x.n_exact
FROM ({est}) e,
     (SELECT CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_exact FROM orders) x
"""


def _oracle_kmv_setops() -> str:
    from dataingestion_spark.operators.kmv import kmv_sample_sql, kmv_set_estimates_sql

    a = kmv_sample_sql("SELECT o_custkey FROM orders WHERE o_orderkey % 2 = 0",
                       "o_custkey", _KMV_K)
    b = kmv_sample_sql("SELECT o_custkey FROM orders WHERE o_orderkey % 2 = 1",
                       "o_custkey", _KMV_K)
    ests = kmv_set_estimates_sql(a, b, _KMV_K)
    return f"""
SELECT ROUND(e.est_union, 6) AS est_union,
       ROUND(e.est_intersect, 6) AS est_intersect,
       ROUND(e.est_diff_a, 6) AS est_diff_a,
       e.n_union, e.n_intersect, x.n_exact_intersect
FROM ({ests}) e,
     (SELECT CAST(COUNT(*) AS BIGINT) AS n_exact_intersect FROM (
        SELECT DISTINCT o_custkey FROM orders WHERE o_orderkey % 2 = 0
        INTERSECT
        SELECT DISTINCT o_custkey FROM orders WHERE o_orderkey % 2 = 1)) x
"""


# --- incremental near-dup vs persisted MinHash index -----------------------

def q_dedup_incremental(spark, sf):
    """Probe a new batch against a persisted corpus MinHash index
    (operators/dedup_index.py): index all documents once (bands
    partitioned by band idx, signatures stored for verification), then
    match a batch of re-crawled copies (doc_id+1000000, every 11th doc)
    without touching corpus text. Output is the verified match list with
    the Broder signature-agreement estimate."""
    import tempfile

    from dataingestion_spark.operators.dedup_index import (
        probe_minhash_index, write_minhash_index,
    )

    docs = _t(spark, sf, "documents")
    idx = tempfile.mkdtemp(prefix="mh_idx_") + "/idx"
    os.makedirs(idx, exist_ok=True)
    write_minhash_index(docs, idx, num_hashes=16, bands=4)
    batch = (docs.filter(F.col("doc_id") % 11 == 0)
             .select((F.col("doc_id") + 1000000).alias("doc_id"), "text"))
    out = probe_minhash_index(batch, idx, min_est_jaccard=0.5)
    return out.select("batch_id", "corpus_id", "n_agree", "est_jaccard")


def _oracle_dedup_incremental() -> str:
    mins = ", ".join(_minhash_sql(j) for j in range(16))
    shingle = """
  SELECT CAST(doc_id AS BIGINT) AS doc_id,
    list_distinct(list_transform(generate_series(1, greatest(len(w) - 2, 1)),
                                 i -> array_to_string(list_slice(w, i, i + 2), ' '))) AS s
  FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS w FROM src)
"""
    return f"""
WITH corpus_src AS (SELECT doc_id, text FROM documents),
batch_src AS (SELECT doc_id + 1000000 AS doc_id, text FROM documents WHERE doc_id % 11 = 0),
corpus_sig AS (
  WITH src AS (SELECT * FROM corpus_src), sh AS ({shingle})
  SELECT doc_id, [{mins}] AS sig FROM sh),
batch_sig AS (
  WITH src AS (SELECT * FROM batch_src), sh AS ({shingle})
  SELECT doc_id, [{mins}] AS sig FROM sh),
corpus_bands AS (
  SELECT doc_id, b, md5(array_to_string(list_slice(sig, b*4 + 1, b*4 + 4), '|')) AS bk
  FROM corpus_sig, (SELECT unnest([0,1,2,3]) AS b)),
batch_bands AS (
  SELECT doc_id, b, md5(array_to_string(list_slice(sig, b*4 + 1, b*4 + 4), '|')) AS bk
  FROM batch_sig, (SELECT unnest([0,1,2,3]) AS b)),
cand AS (
  SELECT DISTINCT p.doc_id AS batch_id, c.doc_id AS corpus_id
  FROM batch_bands p JOIN corpus_bands c ON p.b = c.b AND p.bk = c.bk
  WHERE p.doc_id != c.doc_id),
agree AS (
  SELECT cand.batch_id, cand.corpus_id,
         CAST((SELECT COUNT(*) FROM generate_series(1, 16) g(j)
               WHERE bs.sig[j] = cs.sig[j]) AS INTEGER) AS n_agree
  FROM cand
  JOIN batch_sig bs ON bs.doc_id = cand.batch_id
  JOIN corpus_sig cs ON cs.doc_id = cand.corpus_id)
SELECT batch_id, corpus_id, n_agree,
       CAST(n_agree AS DOUBLE) / 16.0 AS est_jaccard
FROM agree
WHERE CAST(n_agree AS DOUBLE) / 16.0 >= 0.5
"""


def q_kmv_by_group(spark, sf):
    """Per-group KMV sketches (operators/kmv.py::kmv_estimate_by):
    estimated distinct users per event_type (k=128) next to the exact
    count — distinct (group, hash) shuffle + per-group top-k window,
    no global sort, no collect."""
    from dataingestion_spark.operators.kmv import kmv_estimate_by

    ev = _t(spark, sf, "events")
    est = kmv_estimate_by(ev, "user_id", "event_type", k=128)
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").cast("long").alias("n_exact"))
    return (est.join(exact, "event_type")
            .select("event_type", "n_sample", F.round("est", 6).alias("est"),
                    "n_exact"))


def _oracle_kmv_by_group() -> str:
    from dataingestion_spark.operators.kmv import kmv_estimate_by_sql

    inner = kmv_estimate_by_sql("SELECT event_type, user_id FROM events",
                                "user_id", "event_type", k=128)
    return f"""
SELECT e.event_type, e.n_sample, ROUND(e.est, 6) AS est, x.n_exact
FROM ({inner}) e
JOIN (SELECT event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_exact
      FROM events GROUP BY event_type) x USING (event_type)
"""


def q_io_orc_roundtrip(spark, sf):
    """ORC interchange: write the events table to ORC (Spark-native
    columnar alternate format), read it back, aggregate. The oracle runs
    the same aggregate on the parquet source, so the check pins
    write→read byte fidelity of values and timestamps through the ORC
    path. Decimal-exact sums."""
    import tempfile

    ev = _t(spark, sf, "events")
    path = tempfile.mkdtemp(prefix="orc_io_") + "/events_orc"
    ev.write.mode("overwrite").orc(path)
    back = spark.read.orc(path)
    return (back.groupBy("event_type")
            .agg(F.count("*").cast("long").alias("n_events"),
                 F.countDistinct("user_id").cast("long").alias("n_users"),
                 F.sum(F.col("value").cast("decimal(18,6)")).cast("double")
                  .alias("sum_value"),
                 F.min("ts").alias("min_ts"), F.max("ts").alias("max_ts")))


ORACLE_ORC_ROUNDTRIP = """
SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
       CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value,
       MIN(ts) AS min_ts, MAX(ts) AS max_ts
FROM events GROUP BY event_type
"""


def q_io_tfrecord_split_read(spark, sf):
    """Byte-range TFRecord splitting (r11, sources/tfrecord.py::
    read_tfrecord_split): ONE uncompressed shard with 5x-inflated
    text → split_mb=1 byte ranges, each task resyncing on the
    self-validating header CRC (batched crc32c over every candidate
    offset + chain check) and decoding only records whose header
    starts in its range. Oracle = closed-form restatement from the
    parquet source, so a record lost/doubled at any boundary goes
    red; sf0.1 plans multiple genuine splits."""
    import tempfile

    from dataingestion_spark.sources.tfrecord import (
        read_tfrecord_split, write_tfrecord,
    )

    docs = _t(spark, sf, "documents").select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.repeat("text", 5).cast("binary").alias("text5"),
        F.col("n_chars").cast("long").alias("n_chars"))
    features = {"doc_id": "int64", "text5": "bytes",
                "n_chars": "int64"}
    out = tempfile.mkdtemp(prefix="tfrec_split_") + "/shards"
    write_tfrecord(docs, features, out, shards=1, order_by="doc_id")
    back = read_tfrecord_split(spark, out, features, split_mb=1)
    return back.select(
        "doc_id", F.col("text5").cast("string").alias("text5"),
        "n_chars")


ORACLE_TFRECORD_SPLIT = """
SELECT doc_id, repeat(text, 5) AS text5, n_chars FROM documents
"""


def q_io_tfrecord_roundtrip(spark, sf):
    """TFRecord interchange (sources/tfrecord.py): documents become
    tf.train.Example records — doc_id int64, text as a bytes feature,
    score float32, neighbors int64_list — hash-sharded into framed
    TFRecord files (masked-crc32c, hand-coded proto3 wire format, no
    tensorflow dependency), then read back with per-record CRC
    verification. The oracle restates the expected content from the
    parquet source in closed form, so the check pins write→read byte
    fidelity of every feature kind through the framing + protobuf
    codec. Beyond the reference (training-data interchange surface,
    like the WebDataset sink)."""
    import tempfile

    from dataingestion_spark.sources.tfrecord import (
        read_tfrecord, write_tfrecord,
    )

    docs = _t(spark, sf, "documents").select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("text").cast("binary").alias("text"),
        (F.col("n_chars") * 0.5).cast("float").alias("score"),
        F.array(F.col("doc_id"), F.col("doc_id") + 1).alias("neighbors"),
    )
    features = {"doc_id": "int64", "text": "bytes", "score": "float",
                "neighbors": "int64_list"}
    out = tempfile.mkdtemp(prefix="tfrec_io_") + "/shards"
    write_tfrecord(docs, features, out, shards=4)
    back = read_tfrecord(spark, out, features)
    return back.select(
        "doc_id",
        F.col("text").cast("string").alias("text"),
        "score",
        F.array_join(F.expr(
            "transform(neighbors, x -> CAST(x AS STRING))"), ",")
        .alias("neighbors_csv"))


ORACLE_TFRECORD_ROUNDTRIP = """
SELECT CAST(doc_id AS BIGINT) AS doc_id, text,
       CAST(n_chars * 0.5 AS REAL) AS score,
       CAST(doc_id AS VARCHAR) || ',' ||
       CAST(doc_id + 1 AS VARCHAR) AS neighbors_csv
FROM documents
"""


def q_io_avro_snappy_roundtrip(spark, sf):
    """Avro snappy codec + vectorized columnar decode (r11,
    sources/avro.py + avro_vec.py): documents → one .avro shard with
    snappy-compressed blocks (pyarrow's bundled Snappy + the
    spec-required 4-byte big-endian CRC32 of each uncompressed block)
    at block_rows=4, so the read-back runs the numpy LOCK-STEP block
    decoder (≥64 blocks engages it; strings materialize through one
    XOR-scan gather into Arrow, zero per-row python) — the oracle
    equality therefore pins codec AND vector path end to end."""
    import tempfile

    from dataingestion_spark.sources.avro import read_avro, write_avro

    docs = _t(spark, sf, "documents").select(
        "doc_id", "text", "lang", "source", "n_chars")
    out = tempfile.mkdtemp(prefix="avro_sn_") + "/shards"
    write_avro(docs, out, shards=1, order_by="doc_id", codec="snappy",
               block_rows=4)
    return read_avro(spark, out).select(
        "doc_id", "text", "lang", "source", "n_chars")


def q_io_avro_struct_vec(spark, sf):
    """Nested-record Avro decode through the VECTORIZED path (r13,
    sources/avro_vec.py: non-nullable records flatten into the wave
    plan and the struct reassembles from child arrays at finalize —
    measured 2.5-4.9x scalar, scripts/scale_probe_avro_struct.py):
    documents gain a non-nullable inner struct, write ONE shard at
    block_rows=4 so the read-back clears the >=64-block gate and runs
    the lock-step decoder, then FLATTEN on output (the driver canon
    cannot sort struct cells). Oracle equality pins wire fidelity and
    the struct assembly end to end."""
    import tempfile

    from dataingestion_spark.sources.avro import read_avro, write_avro

    docs = _t(spark, sf, "documents").select(
        "doc_id", "text",
        F.struct(
            F.col("source").alias("src"),
            (F.col("n_chars") * 2).alias("n2"),
            (F.col("n_chars") * 0.5).alias("half")).alias("meta"))
    out = tempfile.mkdtemp(prefix="avro_struct_") + "/shards"
    write_avro(docs, out, shards=1, order_by="doc_id", block_rows=4)
    return read_avro(spark, out).select(
        "doc_id", "text",
        F.col("meta.src").alias("src"),
        F.col("meta.n2").alias("n2"),
        F.col("meta.half").alias("half"))


ORACLE_AVRO_STRUCT = """
SELECT doc_id, text, source AS src,
       n_chars * 2 AS n2, CAST(n_chars AS DOUBLE) * 0.5 AS half
FROM documents
"""


def q_io_avro_nullable_struct_vec(spark, sf):
    """NULLABLE nested-record Avro decode through the vectorized path
    (r14, sources/avro_vec.py: ['null', record] compiles to a
    record_group step — one branch wave -> validity mask, sub-fields
    on the reduced wave, mask applied by pa.StructArray — measured
    2.85-4.43x scalar after the proxy probe cleared the bar,
    scripts/scale_probe_avro_nullable_struct.py): documents gain an
    inner struct that is NULL for every third row, write ONE shard at
    block_rows=4 to clear the >=64-block gate, read back vectorized,
    then flatten (null structs surface as null leaf columns). Oracle
    equality pins the branch wave, the skipped wire bytes, and the
    mask end to end."""
    import tempfile

    from dataingestion_spark.sources.avro import read_avro, write_avro

    docs = _t(spark, sf, "documents").select(
        "doc_id", "text",
        F.when(F.col("n_chars") % 3 != 0, F.struct(
            F.col("source").alias("src"),
            (F.col("n_chars") * 2).alias("n2"),
            (F.col("n_chars") * 0.5).alias("half"))).alias("meta"))
    out = tempfile.mkdtemp(prefix="avro_nstruct_") + "/shards"
    write_avro(docs, out, shards=1, order_by="doc_id", block_rows=4)
    return read_avro(spark, out).select(
        "doc_id", "text",
        F.col("meta.src").alias("src"),
        F.col("meta.n2").alias("n2"),
        F.col("meta.half").alias("half"))


ORACLE_AVRO_NULLABLE_STRUCT = """
SELECT doc_id, text,
       CASE WHEN n_chars % 3 != 0 THEN source END AS src,
       CASE WHEN n_chars % 3 != 0 THEN n_chars * 2 END AS n2,
       CASE WHEN n_chars % 3 != 0
            THEN CAST(n_chars AS DOUBLE) * 0.5 END AS half
FROM documents
"""


def q_io_avro_array_struct_vec(spark, sf):
    """ARRAY-OF-RECORDS Avro decode through the vectorized path (r14,
    sources/avro_vec.py: per-element per-FIELD waves scatter into flat
    element-granularity arrays, one gather per string field, a single
    LargeList<Struct> assembly — proxy-measured 4.2-5.4x before the
    decoder was written, shipped at 2.4-4.3x,
    scripts/scale_probe_avro_array_struct.py): documents gain a
    two-entity array<struct> column (empty for every fifth doc), write
    ONE shard at block_rows=4 to clear the >=64-block gate, read back
    vectorized, then EXPLODE (the driver canon cannot sort array-of-
    struct cells). Oracle equality pins count waves, element field
    waves, and the list/struct assembly end to end."""
    import tempfile

    from dataingestion_spark.sources.avro import read_avro, write_avro

    docs = _t(spark, sf, "documents").select(
        "doc_id",
        F.when(F.col("n_chars") % 5 == 0, F.array().cast(
            "array<struct<a:bigint,b:string>>")).otherwise(F.array(
                F.struct((F.col("n_chars") * 2).alias("a"),
                         F.col("source").alias("b")),
                F.struct((F.col("n_chars") * 3).alias("a"),
                         F.upper(F.col("source")).alias("b"))))
        .alias("ents"))
    out = tempfile.mkdtemp(prefix="avro_astruct_") + "/shards"
    write_avro(docs, out, shards=1, order_by="doc_id", block_rows=4)
    return read_avro(spark, out).select(
        "doc_id", F.explode("ents").alias("e")).select(
        "doc_id", F.col("e.a").alias("a"), F.col("e.b").alias("b"))


ORACLE_AVRO_ARRAY_STRUCT = """
SELECT doc_id, n_chars * 2 AS a, source AS b
FROM documents WHERE n_chars % 5 != 0
UNION ALL
SELECT doc_id, n_chars * 3 AS a, UPPER(source) AS b
FROM documents WHERE n_chars % 5 != 0
"""


def q_iceberg_prune_bucket(spark, sf):
    """Foreign-table partition-transform pruning (r11,
    interop/iceberg.py): documents → a hand-built Iceberg v2 table
    partitioned by bucket[4](doc_id) (spec Appendix-B murmur3; four
    parquet files, partition tuples in the manifest) → five separate
    ``where=(doc_id, ==, k)`` reads, each planned against the bucket
    transform so only the one matching file scans (pinned by
    tests/test_iceberg_transforms.py; here the DuckDB oracle pins that
    the PRUNED reads still return exactly the right rows)."""
    import os as _os
    import tempfile

    import pyarrow as _pa
    import pyarrow.parquet as _pq

    from dataingestion_spark.interop.iceberg import (
        _manifest_entry_schema, _manifest_list_schema, _murmur3_32,
        read_iceberg,
    )
    from dataingestion_spark.sources.avro import write_container

    pdf = (_t(spark, sf, "documents")
           .select("doc_id", "lang", "n_chars").toPandas()
           .sort_values("doc_id"))

    def bucket4(v):
        return (_murmur3_32(int(v).to_bytes(8, "little", signed=True))
                & 0x7FFFFFFF) % 4

    root = tempfile.mkdtemp(prefix="ice_bkt_") + "/t"
    _os.makedirs(root + "/metadata")
    _os.makedirs(root + "/data")
    pdf["_b"] = pdf["doc_id"].map(bucket4)
    entries = []
    for b, grp in pdf.groupby("_b"):
        p = f"{root}/data/b{b}.parquet"
        _pq.write_table(_pa.table({
            "doc_id": _pa.array(grp["doc_id"], _pa.int64()),
            "lang": _pa.array(grp["lang"], _pa.string()),
            "n_chars": _pa.array(grp["n_chars"], _pa.int64())}), p)
        entries.append({
            "status": 1, "snapshot_id": 7, "sequence_number": 1,
            "file_sequence_number": 1,
            "data_file": {
                "content": 0, "file_path": "file://" + p,
                "file_format": "PARQUET", "partition": {"pb": int(b)},
                "record_count": len(grp),
                "file_size_in_bytes": _os.path.getsize(p)}})
    part_avro = [{"name": "pb", "type": ["null", "int"],
                  "default": None, "field-id": 1000}]
    mp = root + "/metadata/m0.avro"
    write_container(mp, _manifest_entry_schema(part_avro), entries)
    lp = root + "/metadata/snap-7-1-x.avro"
    write_container(lp, _manifest_list_schema(), [{
        "manifest_path": "file://" + mp,
        "manifest_length": _os.path.getsize(mp),
        "partition_spec_id": 0, "content": 0, "sequence_number": 1,
        "min_sequence_number": 1, "added_snapshot_id": 7,
        "added_files_count": len(entries), "existing_files_count": 0,
        "deleted_files_count": 0, "added_rows_count": len(pdf),
        "existing_rows_count": 0, "deleted_rows_count": 0}])
    import json as _json
    meta = {"format-version": 2, "table-uuid": "x", "location": root,
            "last-sequence-number": 1, "last-updated-ms": 0,
            "last-column-id": 3, "current-schema-id": 0,
            "schemas": [{"type": "struct", "schema-id": 0, "fields": [
                {"id": 1, "name": "doc_id", "required": False,
                 "type": "long"},
                {"id": 2, "name": "lang", "required": False,
                 "type": "string"},
                {"id": 3, "name": "n_chars", "required": False,
                 "type": "long"}]}],
            "default-spec-id": 0,
            "partition-specs": [{"spec-id": 0, "fields": [
                {"name": "pb", "transform": "bucket[4]",
                 "source-id": 1, "field-id": 1000}]}],
            "last-partition-id": 1000, "default-sort-order-id": 0,
            "sort-orders": [{"order-id": 0, "fields": []}],
            "current-snapshot-id": 7,
            "snapshots": [{"snapshot-id": 7, "sequence-number": 1,
                           "timestamp-ms": 0, "schema-id": 0,
                           "manifest-list": "file://" + lp,
                           "summary": {"operation": "append"}}],
            "snapshot-log": [], "metadata-log": []}
    with open(root + "/metadata/v1.metadata.json", "w") as fh:
        _json.dump(meta, fh)
    with open(root + "/metadata/version-hint.text", "w") as fh:
        fh.write("1")

    out = None
    for k in (7, 11, 23, 37, 42):
        one = (read_iceberg(spark, root, where=("doc_id", "==", k))
               .filter(F.col("doc_id") == k))
        out = one if out is None else out.unionByName(one)
    return out.select("doc_id", "lang", "n_chars")


ORACLE_ICEBERG_PRUNE = """
SELECT doc_id, lang, n_chars FROM documents
WHERE doc_id IN (7, 11, 23, 37, 42)
"""


def q_io_avro_split_read(spark, sf):
    """Sync-marker split reading (r11, sources/avro.py::
    read_avro_split): documents → ONE uncompressed container (so there
    is a single oversized shard, the case `read_avro`'s one-task-per-file
    contract handles worst) → byte-range splits at split_mb=1, each
    task scanning to its first sync and decoding only the blocks that
    start in its range. The oracle pins that no block is lost or
    doubled at any split boundary (exact multiset equality with the
    source); text is inflated 5x so sf0.1 plans multiple genuine
    splits (sf0.01 stays single-split, exercising the is_first
    path)."""
    import tempfile

    from dataingestion_spark.sources.avro import (
        read_avro_split, write_avro,
    )

    docs = _t(spark, sf, "documents").select(
        "doc_id", F.repeat("text", 5).alias("text5"), "lang",
        "n_chars")
    out = tempfile.mkdtemp(prefix="avro_split_") + "/shards"
    write_avro(docs, out, shards=1, order_by="doc_id", codec="null",
               block_rows=16)
    return read_avro_split(spark, out, split_mb=1).select(
        "doc_id", "text5", "lang", "n_chars")


ORACLE_AVRO_SPLIT = """
SELECT doc_id, repeat(text, 5) AS text5, lang, n_chars FROM documents
"""


def q_io_avro_tokens_vec(spark, sf):
    """array<string> through the Avro interchange path (r12,
    sources/avro_vec.py): documents → whitespace tokens (the
    tokenized-text corpus shape) → write_avro → read_avro, whose
    columnar fast path now decodes string-element arrays with one
    varint wave per element index and a single multi-range gather.
    The oracle recomputes token count and the joined token stream from
    the parquet source, so an element lost, reordered, or
    mis-sliced at any (start,len) goes red."""
    import tempfile

    from dataingestion_spark.sources.avro import read_avro, write_avro

    docs = _t(spark, sf, "documents").select(
        "doc_id", F.split("text", " ").alias("tokens"))
    out = tempfile.mkdtemp(prefix="avro_tok_") + "/shards"
    write_avro(docs, out, shards=1, order_by="doc_id", codec="null",
               block_rows=64)
    back = read_avro(spark, out)
    return back.select(
        "doc_id",
        F.size("tokens").cast("long").alias("n_tokens"),
        F.array_join("tokens", "|").alias("joined"))


ORACLE_AVRO_TOKENS = """
SELECT doc_id,
       len(string_split(text, ' ')) AS n_tokens,
       array_to_string(string_split(text, ' '), '|') AS joined
FROM documents
"""


def q_io_avro_split_backend(spark, sf):
    """Sync-marker split reading through a NON-POSIX range-read
    backend (r12, sinks/data_backend.py::DataBackend.read_range +
    sources/avro.py::read_avro_split): the container bytes live only
    in a MemoryDataBackend (flat namespace, no open()/seek — the
    object-store emulation), so planning must come from
    backend.size(), the header from read_range, and every task's
    block reads from the RangedFile adapter. Text inflated 5x so
    sf0.01+ plans several genuine 1 MB splits; oracle = exact multiset
    restatement from the parquet source."""
    import tempfile

    from dataingestion_spark.sinks.data_backend import (
        MemoryDataBackend,
    )
    from dataingestion_spark.sources.avro import (
        read_avro_split, write_avro,
    )

    docs = _t(spark, sf, "documents").select(
        "doc_id", F.repeat("text", 5).alias("text5"), "lang")
    out = tempfile.mkdtemp(prefix="avro_mem_") + "/shards"
    names = write_avro(docs, out, shards=1, order_by="doc_id",
                       codec="null", block_rows=16)
    mem = MemoryDataBackend()
    import os as _os
    for n in names:
        mem.write_bytes(f"bucket/corpus/{n}",
                        open(_os.path.join(out, n), "rb").read())
    return read_avro_split(spark, "bucket/corpus", split_mb=1,
                           backend=mem).select(
        "doc_id", "text5", "lang")


ORACLE_AVRO_SPLIT_BACKEND = """
SELECT doc_id, repeat(text, 5) AS text5, lang FROM documents
"""


def q_iceberg_manifest_split(spark, sf):
    """Bounded Iceberg manifests (r12, interop/iceberg.py
    manifest_split): export with a 2-entry cap writes
    ceil(files/2) manifests, each with its own partition field
    summaries; the query RAISES if any written manifest exceeds the
    cap or only one was written, then reads the table back through
    the manifest-list walk — so both the bound and the multi-manifest
    read path are driver-verified. Oracle restates the per-lang
    aggregate from the parquet source."""
    import json as _json
    import os as _os
    import tempfile

    from dataingestion_spark.interop.iceberg import (
        export_iceberg, read_iceberg,
    )
    from dataingestion_spark.sinks.manifest_store import write_table
    from dataingestion_spark.sources.avro import read_container

    docs = _t(spark, sf, "documents").select(
        F.col("doc_id").cast("string").alias("documentid"),
        "text", "lang", F.col("n_chars").cast("long").alias("n_chars"))
    td = tempfile.mkdtemp(prefix="iceberg_msplit_")
    write_table(docs, td + "/t")
    dst = td + "/ice"
    export_iceberg(spark, td + "/t", dst, mode="copy",
                   partition_by=("doc_bucket",), manifest_split=2)
    meta = _json.load(open(_os.path.join(dst, "metadata",
                                         "v1.metadata.json")))
    snap = meta["snapshots"][0]
    lrows = read_container(
        open(snap["manifest-list"][7:], "rb").read(), "l")[1]
    data_rows = [r for r in lrows if r.get("content", 0) == 0]
    if len(data_rows) < 2:
        raise ValueError("expected several manifests under the cap")
    for r in data_rows:
        n = r["added_files_count"] + r["existing_files_count"]
        if n > 2:
            raise ValueError(f"manifest exceeds cap: {n} entries")
        if not r["partitions"]:
            raise ValueError("split manifest lost its summaries")
    back = read_iceberg(spark, dst)
    return (back.groupBy("lang")
            .agg(F.count("*").cast("long").alias("n_docs"),
                 F.sum("n_chars").cast("long").alias("sum_chars"),
                 F.min("documentid").alias("min_doc"),
                 F.max("documentid").alias("max_doc")))


ORACLE_ICEBERG_MSPLIT = """
SELECT lang,
       COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
       MIN(CAST(doc_id AS VARCHAR)) AS min_doc,
       MAX(CAST(doc_id AS VARCHAR)) AS max_doc
FROM documents
GROUP BY lang
"""


def q_io_avro_roundtrip(spark, sf):
    """Avro container interchange (sources/avro.py): documents →
    deterministic hash-sharded .avro files (hand-coded Avro 1.12 wire
    format — zigzag varints, block framing with sync markers, deflate
    codec; the spark-avro connector is absent from this image) →
    read-back with schema from the first file's header and per-file
    field checks. Lossless for string/int columns, so the read-back
    equals the parquet original exactly. Beyond the reference
    (training-corpus interchange surface, like JSONL/TFRecord/Arrow).
    Also the codec Iceberg manifests ride (interop/iceberg.py)."""
    import tempfile

    from dataingestion_spark.sources.avro import read_avro, write_avro

    docs = _t(spark, sf, "documents").select(
        "doc_id", "text", "lang", "source", "n_chars")
    out = tempfile.mkdtemp(prefix="avro_io_") + "/shards"
    write_avro(docs, out, shards=4, order_by="doc_id", codec="deflate")
    return read_avro(spark, out).select(
        "doc_id", "text", "lang", "source", "n_chars")


def q_iceberg_roundtrip(spark, sf):
    """Iceberg v2 export + read-back (interop/iceberg.py): documents →
    manifest-store table → export_iceberg (schema with field-ids,
    Avro manifest + manifest list carrying per-file record counts and
    field-id-keyed bounds, metadata JSON + version hint) →
    read_iceberg (manifest-list walk) → per-lang aggregate. The oracle
    computes the same aggregate from the parquet source, so a file
    lost or duplicated anywhere in the manifest chain goes red.
    Beyond the reference (open-table-format interchange, the Iceberg
    counterpart of the Delta export family)."""
    import tempfile

    from dataingestion_spark.interop.iceberg import (
        export_iceberg, read_iceberg,
    )
    from dataingestion_spark.sinks.manifest_store import write_table

    docs = _t(spark, sf, "documents").select(
        F.col("doc_id").cast("string").alias("documentid"),
        "text", "lang", F.col("n_chars").cast("long").alias("n_chars"))
    td = tempfile.mkdtemp(prefix="iceberg_io_")
    write_table(docs, td + "/t")
    export_iceberg(spark, td + "/t", td + "/ice", mode="copy")
    back = read_iceberg(spark, td + "/ice")
    return (back.groupBy("lang")
            .agg(F.count("*").cast("long").alias("n_docs"),
                 F.sum("n_chars").cast("long").alias("sum_chars"),
                 F.min("documentid").alias("min_doc"),
                 F.max("documentid").alias("max_doc")))


ORACLE_ICEBERG_ROUNDTRIP = """
SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
       MIN(CAST(doc_id AS VARCHAR)) AS min_doc,
       MAX(CAST(doc_id AS VARCHAR)) AS max_doc
FROM documents GROUP BY lang
"""


def q_bm25_indexed(spark, sf):
    """BM25 over a PERSISTED inverted index (sinks/text_index.py): build
    postings partitioned by term-hash bucket from most documents, append
    the rest O(batch), then search — term selection becomes partition
    pruning over ~|query terms|/64 of the postings. Scores are
    bit-identical to the from-scratch bm25_topk, so the same SQL oracle
    pins build→append→prune→search."""
    import tempfile

    from dataingestion_spark.sinks.text_index import (
        append_text_index, search_text_index, write_text_index,
    )

    docs = _t(spark, sf, "documents")
    path = tempfile.mkdtemp(prefix="text_idx_") + "/idx"
    write_text_index(docs.filter(F.col("doc_id") % 5 != 0), path)
    append_text_index(docs.filter(F.col("doc_id") % 5 == 0), path)
    out = search_text_index(spark, path, _bm25_queries_df(spark), k=10)
    return out.select("query_id", "rank", "doc_id",
                      F.round("score", 6).alias("score_r"))


def q_dedup_representatives(spark, sf):
    """Quality-aware dedup survivors (dedup.select_representatives):
    near-dup clusters keep their longest member (n_chars, ties → min id)
    instead of the min-id canonical; singletons keep themselves. The
    oracle recomputes clusters via recursive-CTE closure and applies the
    same ranking."""
    docs = _t(spark, sf, "documents")
    clusters = dedup.neardup_clusters(docs, num_hashes=16, bands=4)
    out = dedup.select_representatives(docs, clusters, "n_chars")
    return out.select("doc_id", "cluster_id",
                      F.col("quality").cast("long").alias("quality"), "keep")


def _oracle_representatives() -> str:
    return f"""
WITH clusters AS ({_oracle_cluster()}),
j AS (
  SELECT d.doc_id, COALESCE(c.canonical_id, d.doc_id) AS cluster_id,
         CAST(d.n_chars AS BIGINT) AS quality
  FROM documents d LEFT JOIN clusters c ON d.doc_id = c.doc_id)
SELECT doc_id, cluster_id, quality,
       (ROW_NUMBER() OVER (PARTITION BY cluster_id
                           ORDER BY quality DESC, doc_id) = 1) AS keep
FROM j
"""


def q_vocab_coverage(spark, sf):
    """Vocabulary coverage / OOV audit: vocab = top-500 corpus tokens
    (count desc, token asc — deterministic), per-document OOV token
    share. The vocab is a broadcast side; the per-doc pass is one
    explode + left-semi-style membership aggregation."""
    docs = _t(spark, sf, "documents")
    toks = docs.select("doc_id",
                       F.explode(F.split(F.trim("text"), r"\s+")).alias("tok"))
    vocab = (toks.groupBy("tok").agg(F.count("*").alias("n"))
             .orderBy(F.desc("n"), F.asc("tok")).limit(500)
             .select("tok", F.lit(1).alias("_in_vocab")))
    per_doc = (toks.join(F.broadcast(vocab), "tok", "left")
               .groupBy("doc_id")
               .agg(F.count("*").cast("long").alias("n_tokens"),
                    F.sum(F.when(F.col("_in_vocab").isNull(), 1).otherwise(0))
                     .cast("long").alias("n_oov")))
    return per_doc.select(
        "doc_id", "n_tokens", "n_oov",
        (F.col("n_oov").cast("double") / F.col("n_tokens")).alias("oov_rate"))


ORACLE_VOCAB_COVERAGE = r"""
WITH toks AS (
  SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS tok
  FROM documents),
vocab AS (
  SELECT tok FROM (
    SELECT tok, COUNT(*) AS n FROM toks GROUP BY tok
    ORDER BY n DESC, tok LIMIT 500)),
per AS (
  SELECT t.doc_id,
         CAST(COUNT(*) AS BIGINT) AS n_tokens,
         CAST(SUM(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov
  FROM toks t LEFT JOIN vocab v ON t.tok = v.tok
  GROUP BY t.doc_id)
SELECT doc_id, n_tokens, n_oov,
       CAST(n_oov AS DOUBLE) / n_tokens AS oov_rate
FROM per
"""


# --- privacy release gate (operators/privacy.py) ---------------------------

def q_privacy_kanon(spark, sf):
    """k-anonymity / l-diversity release gate over customer
    (operators/privacy.py::k_anonymity_report): quasi-identifiers =
    (c_nationkey, c_mktsegment, phone country-code prefix), sensitive =
    c_acctbal, k=5, l=3 — one groupBy, no joins; the violation counts
    and the gate verdict come from the same aggregate."""
    from dataingestion_spark.operators.privacy import k_anonymity_report

    c = _t(spark, sf, "customer").select(
        "c_nationkey", "c_mktsegment",
        F.floor(F.col("c_acctbal") / 1000).cast("long").alias("bal_band"),
        "c_name")
    return k_anonymity_report(c, ["c_nationkey", "c_mktsegment", "bal_band"],
                              k=5, sensitive_col="c_name", l=3)


def _oracle_privacy_kanon() -> str:
    from dataingestion_spark.operators.privacy import k_anonymity_report_sql

    return k_anonymity_report_sql(
        "SELECT c_nationkey, c_mktsegment, "
        "CAST(FLOOR(c_acctbal / 1000) AS BIGINT) AS bal_band, c_name "
        "FROM customer",
        ["c_nationkey", "c_mktsegment", "bal_band"], k=5,
        sensitive_col="c_name", l=3)


# --- snapshot drift detection (operators/drift.py) -------------------------

_DRIFT_EDGES = [0.0, 10000.0, 20000.0, 30000.0, 40000.0, 50000.0,
                60000.0, 70000.0, 80000.0, 100000.0]


def q_drift_numeric(spark, sf):
    """Histogram drift between the even/odd-orderkey halves of lineitem
    on l_extendedprice (operators/drift.py::drift_report): one fixed-bin
    aggregation pass per side, decimal-summed TVD + chi-square. PSI is
    computed by the operator but excluded here (ln is not bit-stable
    across engines)."""
    from dataingestion_spark.operators.drift import drift_report

    li = _t(spark, sf, "lineitem")
    a = li.filter(F.col("l_orderkey") % 2 == 0)
    b = li.filter(F.col("l_orderkey") % 2 == 1)
    rep = drift_report(a, b, "l_extendedprice", _DRIFT_EDGES)
    return rep.select("tvd", "chi2", "n_bins_hit", "max_bin_gap",
                      "n_total_a", "n_total_b")


def q_drift_categorical(spark, sf):
    """Per-category proportion drift for documents.lang between the
    doc_id parity halves (operators/drift.py::categorical_drift), with
    the exact TVD on every row."""
    from dataingestion_spark.operators.drift import categorical_drift

    docs = _t(spark, sf, "documents")
    return categorical_drift(docs.filter(F.col("doc_id") % 2 == 0),
                             docs.filter(F.col("doc_id") % 2 == 1), "lang")


def _oracle_drift_numeric() -> str:
    from dataingestion_spark.operators.drift import drift_report_sql

    return drift_report_sql(
        "SELECT l_extendedprice FROM lineitem WHERE l_orderkey % 2 = 0",
        "SELECT l_extendedprice FROM lineitem WHERE l_orderkey % 2 = 1",
        "l_extendedprice", _DRIFT_EDGES)


def _oracle_drift_categorical() -> str:
    from dataingestion_spark.operators.drift import categorical_drift_sql

    return categorical_drift_sql(
        "SELECT lang FROM documents WHERE doc_id % 2 = 0",
        "SELECT lang FROM documents WHERE doc_id % 2 = 1", "lang")


# ---------------------------------------------------------------------------
# contract surface
# ---------------------------------------------------------------------------

def entry(spark: SparkSession) -> DataFrame:
    """Flagship: documents → markdown corpus → parse → de-footer → header
    chunks → enrich → embed → top-5 cosine search, at sf0.001."""
    _utc(spark)
    sf = "/root/testdata/sf0.001"
    docs = _t(spark, sf, "documents").limit(100)
    elements = parse_markdown_df(documents_to_markdown(docs), "doc_id", "markdown")
    elements = remove_footers(elements)
    chunks = header_chunker(elements, ChunkerOptions(WordTokenizer(), 300))
    chunks = sentiment_enricher(summary_enricher(chunks))
    records = build_vector_records(
        chunks, embed=lambda c: fake_embedding(c, dims=8), deterministic_keys=True
    )
    qv = [0.5] * 8
    from dataingestion_spark.operators.similarity import cosine_sim

    q = F.array(*[F.lit(float(x)) for x in qv])
    return (
        records.withColumn("score", F.round(cosine_sim(F.col("embedding"), q), 6))
        .orderBy(F.desc("score"), F.asc("key"))
        .limit(5)
        .select("key", "documentid", "score", "summary", "sentiment")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    # Dict ORDER matters: the driver's correctness gate oracles the FIRST
    # 50 entries.  r14 rotation (standing prefix-shift policy): head-50 =
    # the 2 queries NEW this round (vectorized nullable-struct and
    # array-of-records Avro roundtrips; new queries enter the head)
    # plus the whole stale r9 block of 48 (doc_char_entropy .. tpch_q9).
    # All 50 verified green against the sf0.01 DuckDB replica before
    # landing.  Entries 51+ continue in stalest-first order (r10, r11,
    # r12, with the r13-green block -- freshest external confirmation --
    # at the very end), so future rotations stay a simple prefix shift;
    # scripts/rotation_stats.py --check mechanizes the audit.
    return {
        # --- NEW r14 (new queries enter the sample head) ---
        "io_avro_nullable_struct_vec": q_io_avro_nullable_struct_vec,
        "io_avro_array_struct_vec": q_io_avro_array_struct_vec,
        # --- last green r9 ---
        "doc_char_entropy": q_char_entropy,
        "doc_compression_ratio": q_compression_ratio,
        "doc_gopher_filters": q_gopher_filters,
        "events_json_stats": q_events_json_stats,
        "events_pivot_by_user": q_events_pivot,
        "events_session_window": q_events_session_window,
        "events_sessionize": q_events_sessionize,
        "events_topk_per_type": q_events_topk_per_type,
        "events_unpivot_long": q_events_unpivot,
        "events_windowed_5min": q_events_windowed,
        "graph_pagerank_nations": q_pagerank_nations,
        "graph_ppr_europe": q_ppr_nations,
        "lakehouse_medallion": q_lakehouse_medallion,
        "lineitem_quantiles": q_lineitem_quantiles,
        "lineitem_rank_windows": q_lineitem_rank_windows,
        "orders_cube_grouping": q_orders_cube,
        "orders_grouping_sets": q_orders_grouping_sets,
        "orders_rollup": q_orders_rollup,
        "pack_concat_spans": q_concat_spans,
        "pack_token_id_rows": q_pack_token_id_rows,
        "part_set_ops": q_part_set_ops,
        "sample_temperature_mixture": q_temperature_mixture,
        "sample_upsample_epochs": q_upsample_epochs,
        "sketch_hll_merged": q_sketch_hll_merged,
        "split_kfold_assignment": q_kfold_assign,
        "streaming_stateful_counts": q_streaming_stateful,
        "tpch_q10_returned_revenue": q_tpch_q10,
        "tpch_q11_important_parts": q_tpch_q11,
        "tpch_q12_late_shipments": q_tpch_q12,
        "tpch_q13_order_distribution": q_tpch_q13,
        "tpch_q14_promo_share": q_tpch_q14,
        "tpch_q15_top_supplier": q_tpch_q15,
        "tpch_q16_supplier_counts": q_tpch_q16,
        "tpch_q17_small_qty_revenue": q_tpch_q17,
        "tpch_q18_large_orders": q_tpch_q18,
        "tpch_q19_disjunctive_preds": q_tpch_q19,
        "tpch_q1_pricing_summary": q_tpch_q1,
        "tpch_q20_excess_shipments": q_tpch_q20,
        "tpch_q21_waiting_suppliers": q_tpch_q21,
        "tpch_q22_dormant_customers": q_tpch_q22,
        "tpch_q2_min_cost_supplier": q_tpch_q2,
        "tpch_q3_shipping_priority": q_tpch_q3,
        "tpch_q4_priority_exists": q_tpch_q4,
        "tpch_q5_local_supplier": q_tpch_q5,
        "tpch_q6_forecast_revenue": q_tpch_q6,
        "tpch_q7_nation_volume": q_tpch_q7,
        "tpch_q8_market_share": q_tpch_q8,
        "tpch_q9_product_profit": q_tpch_q9,
        # ================= head-50 boundary: entries below are NOT in
        # the driver's correctness sample this round =================
        # --- last green r10 ---
        "chunker_header": q_header_chunks,
        "chunker_image_binary": q_image_chunks,
        "chunker_markdown": q_markdown_chunks,
        "chunker_section": q_section_chunks,
        "chunker_semantic": q_semantic_chunks,
        "chunker_token_sliding": q_token_chunks,
        "customers_with_urgent_orders": q_customers_with_urgent_orders,
        "customers_without_orders": q_customers_without_orders,
        "dedup_contamination_check": q_contamination,
        "dedup_cross_doc_shingles": q_cross_doc_shingles,
        "dedup_exact": q_dedup_exact,
        "dedup_minhash_lsh_pairs": q_minhash_lsh_pairs,
        "dedup_minhash_signature": q_minhash_signature,
        "dedup_ngram_jaccard": q_ngram_jaccard,
        "dedup_simhash": q_simhash,
        "dedup_span_removal": q_span_removal,
        "doc_bpe_tokens": q_doc_bpe_tokens,
        "doc_fingerprint": q_doc_fingerprint,
        "doc_lang_id": q_doc_lang_id,
        "doc_pii_scrub": q_pii_scrub,
        "doc_predicate_forms": q_doc_predicate_forms,
        "doc_quality_score": q_doc_quality,
        "doc_repetition_signals": q_repetition_signals,
        "doc_token_counts": q_doc_token_counts,
        "enricher_fakes": q_enrich_fakes,
        "enricher_image_alt": q_image_alt_enricher,
        "events_anomaly_zscore": q_events_anomaly,
        "events_asof_forward": q_events_asof_forward,
        "events_asof_join": q_events_asof_join,
        "events_cohort_retention": q_cohort_retention,
        "events_funnel_ordered": q_events_funnel,
        "events_gapfill_locf": q_events_gapfill,
        "events_markov_transitions": q_event_transitions,
        "events_moving_sum": q_events_moving_sum,
        "events_range_join": q_events_range_join,
        "events_zorder_key": q_events_zorder,
        "io_arrow_roundtrip": q_arrow_ipc_roundtrip,
        "io_avro_roundtrip": q_io_avro_roundtrip,
        "io_jsonl_zst_roundtrip": q_jsonl_zst_roundtrip,
        "io_tfrecord_roundtrip": q_io_tfrecord_roundtrip,
        "lakehouse_change_feed": q_change_feed,
        "lakehouse_export_incremental": q_export_incremental,
        "lakehouse_iceberg_roundtrip": q_iceberg_roundtrip,
        "lakehouse_incremental_agg": q_incremental_agg_view,
        "lakehouse_merge_upsert": q_lakehouse_merge,
        "multimodal_audio_meta": q_multimodal_audio_meta,
        "multimodal_audio_segments": q_audio_segments,
        "streaming_iceberg_tail": q_streaming_iceberg_tail,
        "streaming_jsonl_ingest": q_streaming_jsonl_ingest,
        "tokenizer_bpe_pair_counts": q_bpe_pair_counts,
        # --- last green r11 ---
        "dedup_cluster_canonical": q_dedup_clusters,
        "dedup_cluster_split": q_cluster_split,
        "dedup_edit_distance_pairs": q_edit_distance_pairs,
        "dedup_embedding_pairs": q_emb_neardup,
        "dedup_incremental_probe": q_dedup_incremental,
        "dedup_representatives": q_dedup_representatives,
        "dedup_semantic_clusters": q_semantic_dedup,
        "doc_html_extract": q_html_extract,
        "doc_normalize_text": q_doc_normalize,
        "doc_prefix_lm_split": q_prefix_lm,
        "io_avro_snappy_roundtrip": q_io_avro_snappy_roundtrip,
        "io_avro_split_read": q_io_avro_split_read,
        "io_tfrecord_split_read": q_io_tfrecord_split_read,
        "lakehouse_iceberg_prune_bucket": q_iceberg_prune_bucket,
        "multimodal_image_meta": q_multimodal_image_meta,
        "multimodal_image_tiles": q_image_tiles,
        "multimodal_tile_pixels": q_tile_pixel_bytes,
        "processor_removal_footers": q_removal_footers,
        "reader_container_elements": q_container_elements,
        "reader_doc_legacy_elements": q_doc_legacy_elements,
        "reader_docx_elements": q_docx_elements,
        "reader_epub_elements": q_epub_elements,
        "reader_html_elements": q_html_elements,
        "reader_image_elements": q_image_elements,
        "reader_jsonl_roundtrip": q_jsonl_roundtrip,
        "reader_markdown_elements": q_md_parse_elements,
        "reader_mixed_dispatch": q_reader_dispatch,
        "reader_odf_elements": q_odf_elements,
        "reader_office_ingest": q_office_ingest,
        "reader_pdf_elements": q_pdf_elements,
        "reader_pptx_elements": q_pptx_elements,
        "reader_rtf_elements": q_rtf_elements,
        "reader_warc_responses": q_warc_responses,
        "reader_wet_records": q_reader_wet_records,
        "reader_wet_split": q_reader_wet_split,
        "reader_xls_legacy_elements": q_xls_legacy_elements,
        "reader_xlsx_elements": q_xlsx_elements,
        "search_recall_at_k": q_recall_ivf,
        "search_recall_matryoshka": q_recall_matryoshka,
        "search_topk_ann": q_topk_ann,
        "search_topk_cosine": q_emb_topk,
        "search_topk_filtered": q_emb_topk_filtered,
        "search_topk_ivf": q_topk_ivf,
        "search_topk_ivf_persisted": q_topk_ivf_persisted,
        "search_topk_quantized": q_topk_quantized,
        "streaming_tws_type_stats": q_streaming_tws_stats,
        "writer_incremental_replace": q_writer_incremental,
        "writer_qa_pairs": q_qa_pairs,
        "writer_vector_records": q_vector_records,
        "writer_webdataset_shards": q_webdataset_shards,
        # --- last green r12 ---
        "curation_funnel": q_curation_funnel,
        "dedup_boilerplate_lines": q_boilerplate_lines,
        "doc_quality_classifier": q_quality_classifier,
        "doc_rake_keywords": q_rake_keywords,
        "doc_span_corruption": q_span_corruption,
        "doc_url_signals": q_url_signals,
        "doc_vocab_coverage": q_vocab_coverage,
        "drift_by_group": q_drift_by_group,
        "drift_categorical_lang": q_drift_categorical,
        "drift_numeric_report": q_drift_numeric,
        "io_arrow_ipc_split": q_io_arrow_ipc_split,
        "io_avro_split_backend": q_io_avro_split_backend,
        "io_avro_tokens_vec": q_io_avro_tokens_vec,
        "io_jsonl_zst_split": q_io_jsonl_zst_split,
        "io_orc_roundtrip": q_io_orc_roundtrip,
        "lakehouse_change_stream": q_lakehouse_change_stream,
        "lakehouse_check_constraints": q_lakehouse_constraints,
        "lakehouse_clone_branch": q_lakehouse_clone_branch,
        "lakehouse_delete_where": q_lakehouse_delete_where,
        "lakehouse_delta_roundtrip": q_lakehouse_delta_roundtrip,
        "lakehouse_iceberg_manifest_split": q_iceberg_manifest_split,
        "lakehouse_maintenance": q_lakehouse_maintenance,
        "lakehouse_meta_minmax": q_lakehouse_meta_minmax,
        "lakehouse_restore": q_lakehouse_restore,
        "lakehouse_scd2_merge": q_lakehouse_scd2,
        "lakehouse_schema_evolution": q_lakehouse_schema_evolution,
        "lakehouse_stream_read": q_lakehouse_stream_read,
        "lakehouse_update_where": q_lakehouse_update_where,
        "lakehouse_zorder_read": q_lakehouse_zorder_read,
        "privacy_k_anonymity": q_privacy_kanon,
        "reader_wds_split": q_reader_wds_split,
        "search_bm25": q_bm25,
        "search_bm25_indexed": q_bm25_indexed,
        "search_hard_negatives": q_hard_negatives,
        "search_hybrid_rrf": q_hybrid_rrf,
        "search_phrase_positions": q_phrase_search,
        "search_pmi_collocations": q_collocations,
        "search_tfidf_top_terms": q_tfidf_top_terms,
        "sft_chat_text": q_sft_chat,
        "sft_render_offsets": q_sft_offsets,
        "sft_token_loss_mask": q_sft_token_mask,
        "sketch_kmv_by_group": q_kmv_by_group,
        "sketch_kmv_distinct": q_kmv_distinct,
        "sketch_kmv_setops": q_kmv_setops,
        "streaming_jsonl_zst_ingest": q_streaming_jsonl_zst_ingest,
        "streaming_warc_ingest": q_streaming_warc_ingest,
        "table_column_profile": q_profile_table,
        "table_corpus_report": q_corpus_report,
        "table_quality_constraints": q_quality_constraints,
        "tokenizer_bpe_train_merges": q_bpe_train_merges,
        # --- last green r13 ---
        "dedup_minhash_fast_pairs": q_minhash_fast_pairs,
        "dedup_simhash_fast": q_simhash_fast,
        "doc_c4_filters": q_c4_filters,
        "doc_lm_perplexity": q_lm_perplexity,
        "doc_robots_gate": q_robots_gate,
        "doc_script_profile": q_script_profile,
        "doc_url_psl_domain": q_url_psl_domain,
        "graph_triangle_count": q_triangle_count,
        "io_avro_struct_vec": q_io_avro_struct_vec,
        "lakehouse_bloom_read": q_lakehouse_bloom_read,
        "lakehouse_delta_mirror": q_lakehouse_delta_mirror,
        "lakehouse_history_stream": q_lakehouse_history_stream,
        "lakehouse_meta_count": q_lakehouse_meta_count,
        "lakehouse_rename_column": q_lakehouse_rename_column,
        "lakehouse_skipping_read": q_lakehouse_skipping,
        "lakehouse_sync_replica": q_lakehouse_sync,
        "multimodal_frame_sample": q_frame_sample,
        "pack_doc_sequences": q_pack_sequences,
        "sample_curriculum_buckets": q_curriculum_buckets,
        "sample_dsir_weights": q_dsir_weights,
        "sample_mixture_budget": q_mixture_sample,
        "sample_stratified": q_stratified_sample,
        "sample_uniform_exact_k": q_uniform_sample_k,
        "sample_weighted_exact_k": q_weighted_sample_k,
        "search_eval_ndcg_mrr": q_search_eval_ndcg_mrr,
        "search_hybrid_indexed": q_hybrid_indexed,
        "search_topk_ivf_filtered": q_topk_ivf_filtered,
        "search_topk_ivf_pq": q_topk_ivf_pq,
        "search_topk_ivfpq_persisted": q_topk_ivfpq_persisted,
        "search_topk_pq": q_topk_pq,
        "search_topk_pq_rerank": q_topk_pq_rerank,
        "sft_best_of_n": q_best_of_n,
        "sft_preference_pairs": q_preference_pairs,
        "shards_token_budget": q_assign_shards,
        "sketch_bloom_membership": q_bloom_membership,
        "sketch_cm_heavy_hitters": q_cm_heavy_hitters,
        "sketch_histogram_quantiles": q_sketch_quantiles,
        "sketch_hll_users": q_sketch_hll_users,
        "split_hash_assignment": q_hash_split,
        "streaming_avro_ingest": q_streaming_avro_ingest,
        "streaming_dedup_ingest": q_streaming_dedup,
        "streaming_dedup_watermark": q_streaming_dedup_watermark,
        "streaming_events_windowed": q_streaming_events,
        "streaming_exactly_once_ingest": q_exactly_once_ingest,
        "streaming_interval_join": q_streaming_interval_join,
        "streaming_session_windows": q_streaming_sessions,
        "streaming_tfrecord_ingest": q_streaming_tfrecord_ingest,
        "streaming_upsert_merge": q_streaming_upsert,
        "streaming_wds_ingest": q_streaming_wds_ingest,
        "tokenizer_bpe_encode_roundtrip": q_bpe_encode_roundtrip,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "io_avro_struct_vec": ORACLE_AVRO_STRUCT,
        "io_avro_nullable_struct_vec": ORACLE_AVRO_NULLABLE_STRUCT,
        "io_avro_array_struct_vec": ORACLE_AVRO_ARRAY_STRUCT,
        "streaming_tfrecord_ingest": ORACLE_TFRECORD_STREAM,
        "streaming_avro_ingest": ORACLE_AVRO_STREAM,
        "streaming_wds_ingest": ORACLE_WDS_STREAM,
        "io_avro_tokens_vec": ORACLE_AVRO_TOKENS,
        "io_jsonl_zst_split": ORACLE_JSONL_ZST_SPLIT,
        "io_arrow_ipc_split": ORACLE_ARROW_IPC_SPLIT,
        "reader_wds_split": ORACLE_WDS_SPLIT,
        "streaming_warc_ingest": ORACLE_WARC_STREAM,
        "streaming_jsonl_zst_ingest": ORACLE_JSONL,
        "io_avro_split_backend": ORACLE_AVRO_SPLIT_BACKEND,
        "lakehouse_iceberg_manifest_split": ORACLE_ICEBERG_MSPLIT,
        "tpch_q1_pricing_summary": ORACLE_Q1,
        "tpch_q3_shipping_priority": ORACLE_Q3,
        "tpch_q4_priority_exists": ORACLE_Q4,
        "tpch_q5_local_supplier": ORACLE_Q5,
        "tpch_q7_nation_volume": ORACLE_Q7,
        "tpch_q10_returned_revenue": ORACLE_Q10,
        "tpch_q14_promo_share": ORACLE_Q14,
        "tpch_q18_large_orders": ORACLE_Q18,
        "tpch_q19_disjunctive_preds": ORACLE_Q19,
        "tpch_q22_dormant_customers": ORACLE_Q22,
        "tpch_q6_forecast_revenue": ORACLE_Q6,
        "tpch_q2_min_cost_supplier": ORACLE_Q2,
        "tpch_q8_market_share": ORACLE_Q8,
        "tpch_q9_product_profit": ORACLE_Q9,
        "tpch_q11_important_parts": ORACLE_Q11,
        "tpch_q12_late_shipments": ORACLE_Q12,
        "tpch_q13_order_distribution": ORACLE_Q13,
        "tpch_q15_top_supplier": ORACLE_Q15,
        "tpch_q16_supplier_counts": ORACLE_Q16,
        "tpch_q17_small_qty_revenue": ORACLE_Q17,
        "tpch_q20_excess_shipments": ORACLE_Q20,
        "tpch_q21_waiting_suppliers": ORACLE_Q21,
        "orders_rollup": ORACLE_ROLLUP,
        "orders_cube_grouping": ORACLE_CUBE,
        "part_set_ops": ORACLE_SET_OPS,
        "events_topk_per_type": ORACLE_TOPK,
        "events_sessionize": ORACLE_SESSIONIZE,
        "events_session_window": ORACLE_SESSION_WINDOW,
        "streaming_tws_type_stats": ORACLE_TWS_STATS,
        "events_windowed_5min": ORACLE_WINDOWED,
        "events_pivot_by_user": ORACLE_PIVOT,
        "events_unpivot_long": ORACLE_UNPIVOT,
        "orders_grouping_sets": ORACLE_GROUPING_SETS,
        "lineitem_rank_windows": ORACLE_RANK_WINDOWS,
        "events_json_stats": ORACLE_JSON,
        "lineitem_quantiles": ORACLE_QUANTILES,
        "events_asof_join": ORACLE_ASOF,
        "events_asof_forward": ORACLE_ASOF_FORWARD,
        "events_range_join": ORACLE_RANGE_JOIN,
        "events_moving_sum": ORACLE_MOVING,
        "events_gapfill_locf": ORACLE_GAPFILL,
        "events_funnel_ordered": ORACLE_FUNNEL,
        "events_anomaly_zscore": ORACLE_ANOMALY,
        "events_cohort_retention": ORACLE_COHORT,
        "events_markov_transitions": ORACLE_TRANSITIONS,
        "events_zorder_key": _oracle_zorder(),
        "customers_without_orders": ORACLE_ANTI,
        "customers_with_urgent_orders": ORACLE_SEMI,
        "doc_predicate_forms": ORACLE_PREDICATES,
        "doc_token_counts": ORACLE_TOKEN_COUNTS,
        "doc_bpe_tokens": _oracle_bpe_tokens(),
        "tokenizer_bpe_pair_counts": ORACLE_BPE_PAIRS,
        "doc_lang_id": _oracle_lang_id(),
        "doc_quality_score": ORACLE_QUALITY,
        "doc_repetition_signals": ORACLE_REPETITION,
        "doc_fingerprint": ORACLE_FINGERPRINT,
        "doc_pii_scrub": _oracle_pii(),
        "doc_normalize_text": _oracle_normalize(),
        "sft_render_offsets": _oracle_sft_offsets(),
        "sft_chat_text": _oracle_sft_chat(),
        "sft_token_loss_mask": _oracle_sft_token_mask(),
        "sketch_kmv_distinct": _oracle_kmv_distinct(),
        "sketch_kmv_setops": _oracle_kmv_setops(),
        "sketch_kmv_by_group": _oracle_kmv_by_group(),
        "io_orc_roundtrip": ORACLE_ORC_ROUNDTRIP,
        "dedup_incremental_probe": _oracle_dedup_incremental(),
        "privacy_k_anonymity": _oracle_privacy_kanon(),
        "drift_numeric_report": _oracle_drift_numeric(),
        "drift_categorical_lang": _oracle_drift_categorical(),
        "drift_by_group": _oracle_drift_by_group(),
        "table_quality_constraints": ORACLE_QUALITY_CONSTRAINTS,
        "table_column_profile": _oracle_profile(),
        "table_corpus_report": ORACLE_CORPUS_REPORT,
        "doc_url_signals": ORACLE_URL_SIGNALS,
        "doc_quality_classifier": _oracle_classifier(),
        "doc_html_extract": ORACLE_HTML_EXTRACT,
        "dedup_exact": ORACLE_DEDUP_EXACT,
        "dedup_minhash_signature": _oracle_minhash_signature(),
        "dedup_minhash_lsh_pairs": _oracle_minhash_pairs(),
        "dedup_ngram_jaccard": _oracle_jaccard(),
        "dedup_edit_distance_pairs": ORACLE_EDIT_PAIRS,
        "dedup_simhash": _oracle_simhash(),
        "dedup_cross_doc_shingles": ORACLE_CROSS_DOC,
        "dedup_span_removal": ORACLE_SPAN_REMOVAL,
        "dedup_contamination_check": ORACLE_CONTAMINATION,
        "dedup_embedding_pairs": ORACLE_EMB_NEARDUP,
        "dedup_cluster_canonical": _oracle_cluster(),
        "dedup_representatives": _oracle_representatives(),
        "dedup_cluster_split": _oracle_cluster_split(),
        "doc_vocab_coverage": ORACLE_VOCAB_COVERAGE,
        "doc_span_corruption": _oracle_span_corruption(),
        "doc_prefix_lm_split": _oracle_prefix_lm(),
        "search_hard_negatives": ORACLE_HARD_NEGATIVES,
        "dedup_semantic_clusters": ORACLE_SEMANTIC_DEDUP,
        "doc_lm_perplexity": ORACLE_LM_PERPLEXITY,
        "doc_url_psl_domain": ORACLE_URL_PSL,
        "doc_robots_gate": ORACLE_ROBOTS,
        "doc_script_profile": _oracle_script_profile(),
        "dedup_boilerplate_lines": ORACLE_BOILERPLATE,
        "graph_pagerank_nations": _oracle_pagerank(),
        "graph_ppr_europe": _oracle_ppr(),
        "graph_triangle_count": ORACLE_TRIANGLES,
        "doc_char_entropy": ORACLE_CHAR_ENTROPY,
        "doc_compression_ratio": _oracle_compression_ratio(),
        "sample_dsir_weights": _oracle_dsir(),
        "sketch_hll_users": _oracle_hll(),
        "sketch_hll_merged": _oracle_hll_merged(),
        "sketch_histogram_quantiles": _oracle_hist_quantiles(),
        "sketch_cm_heavy_hitters": _oracle_cm(),
        "sketch_bloom_membership": ORACLE_BLOOM,
        "curation_funnel": _oracle_funnel(),
        "split_hash_assignment": _oracle_hash_split(),
        "split_kfold_assignment": _oracle_kfold(),
        "sample_curriculum_buckets": ORACLE_CURRICULUM,
        "shards_token_budget": ORACLE_SHARDS,
        "sample_stratified": _oracle_stratified(),
        "sample_uniform_exact_k": ORACLE_SAMPLE_K,
        "sample_weighted_exact_k": _oracle_weighted_sample(),
        "sample_mixture_budget": _oracle_mixture(),
        "sample_temperature_mixture": _oracle_temperature_mixture(),
        "sample_upsample_epochs": _oracle_upsample(),
        "pack_doc_sequences": _oracle_pack(),
        "pack_concat_spans": ORACLE_CONCAT_SPANS,
        "search_topk_quantized": ORACLE_TOPK_QUANTIZED,
        "search_topk_ann": _oracle_topk_ann(),
        "doc_c4_filters": _oracle_c4(),
        "doc_gopher_filters": _oracle_gopher(),
        "search_topk_ivf": _oracle_topk_ivf(),
        "search_topk_ivf_persisted": _oracle_topk_ivf(),
        "search_topk_ivf_filtered": ORACLE_TOPK_IVF_FILTERED.format(
            cos=_COS_SQL.format(a="e.embedding", b="q.qv")),
        "search_recall_at_k": _oracle_recall_ivf(),
        "search_eval_ndcg_mrr": ORACLE_NDCG_MRR,
        "search_recall_matryoshka": _oracle_recall_matryoshka(),
        "search_topk_cosine": ORACLE_EMB_TOPK,
        "search_bm25": ORACLE_BM25,
        "search_bm25_indexed": ORACLE_BM25,
        "search_hybrid_rrf": ORACLE_HYBRID_RRF,
        "search_phrase_positions": ORACLE_PHRASE,
        "search_tfidf_top_terms": ORACLE_TFIDF,
        "search_pmi_collocations": ORACLE_COLLOCATIONS,
        "doc_rake_keywords": _oracle_rake(),
        "search_topk_filtered": ORACLE_EMB_TOPK_FILTERED,
        "reader_markdown_elements": _oracle_parse(),
        "reader_docx_elements": _oracle_docx(),
        "reader_pdf_elements": _oracle_pdf(),
        "reader_mixed_dispatch": _oracle_dispatch(),
        "reader_html_elements": _oracle_html(),
        "reader_xlsx_elements": _oracle_xlsx(),
        "reader_pptx_elements": _oracle_pptx(),
        "reader_office_ingest": _oracle_office_ingest(),
        "reader_epub_elements": _oracle_epub(),
        "reader_rtf_elements": _oracle_rtf(),
        "reader_odf_elements": _oracle_odf(),
        "reader_doc_legacy_elements": _oracle_doc_legacy(),
        "reader_xls_legacy_elements": _oracle_xls_legacy(),
        "reader_wet_records": ORACLE_WET_RECORDS,
        "reader_jsonl_roundtrip": ORACLE_JSONL,
        "io_avro_roundtrip": ORACLE_JSONL,
        "io_avro_snappy_roundtrip": ORACLE_JSONL,
        "io_avro_split_read": ORACLE_AVRO_SPLIT,
        "io_tfrecord_split_read": ORACLE_TFRECORD_SPLIT,
        "reader_wet_split": ORACLE_WET_SPLIT,
        "lakehouse_iceberg_prune_bucket": ORACLE_ICEBERG_PRUNE,
        "lakehouse_iceberg_roundtrip": ORACLE_ICEBERG_ROUNDTRIP,
        "streaming_iceberg_tail": ORACLE_ICEBERG_TAIL,
        "io_jsonl_zst_roundtrip": ORACLE_JSONL,
        "io_arrow_roundtrip": ORACLE_JSONL,
        "streaming_jsonl_ingest": ORACLE_JSONL,
        "lakehouse_export_incremental": ORACLE_EXPORT_INCREMENTAL,
        "reader_warc_responses": ORACLE_WARC_RESPONSES,
        "reader_image_elements": _oracle_image_elements(),
        "reader_container_elements": _oracle_container_elements(),
        "chunker_header": _values_oracle(
            _fixture_chunk_golden(lambda rows: header_chunk_doc(rows, _FIXED_OPTS)),
            _CHUNK_COLS, _CHUNK_TYPES,
        ),
        "chunker_section": _values_oracle(
            _fixture_chunk_golden(lambda rows: section_chunk_doc(rows, _FIXED_OPTS)),
            _CHUNK_COLS, _CHUNK_TYPES,
        ),
        "chunker_markdown": _values_oracle(
            _fixture_chunk_golden(lambda rows: markdown_chunk_doc(rows, 3)),
            _CHUNK_COLS, _CHUNK_TYPES,
        ),
        "chunker_token_sliding": ORACLE_TOKEN_CHUNKS,
        "chunker_semantic": _oracle_semantic(),
        "chunker_image_binary": _oracle_image_chunks(),
        "processor_removal_footers": _oracle_removal(),
        "enricher_fakes": _oracle_enrich(),
        "enricher_image_alt": _oracle_image_alt(),
        "writer_vector_records": _oracle_vector_records(),
        "writer_qa_pairs": ORACLE_QA.format(token_chunks=ORACLE_TOKEN_CHUNKS.strip()),
        "writer_incremental_replace": _oracle_writer_incremental(),
        "writer_webdataset_shards": ORACLE_WEBDATASET,
        "lakehouse_merge_upsert": ORACLE_MERGE,
        "lakehouse_incremental_agg": ORACLE_INCR_AGG,
        "lakehouse_change_feed": ORACLE_CHANGE_FEED,
        "lakehouse_skipping_read": ORACLE_SKIPPING,
        "lakehouse_sync_replica": ORACLE_SYNC,
        "lakehouse_restore": ORACLE_RESTORE,
        "lakehouse_clone_branch": ORACLE_CLONE,
        "lakehouse_zorder_read": ORACLE_ZORDER,
        "lakehouse_check_constraints": ORACLE_CONSTRAINTS,
        "tokenizer_bpe_encode_roundtrip": ORACLE_BPE_ENCODE,
        "sft_preference_pairs": ORACLE_PREF_PAIRS,
        "sft_best_of_n": ORACLE_BEST_OF_N,
        "lakehouse_maintenance": ORACLE_MAINTENANCE,
        "lakehouse_bloom_read": ORACLE_BLOOM_READ,
        "pack_token_id_rows": ORACLE_PACK_IDS,
        "dedup_minhash_fast_pairs": ORACLE_MINHASH_FAST,
        "dedup_simhash_fast": ORACLE_SIMHASH_FAST,
        "streaming_stateful_counts": ORACLE_STREAMING_STATEFUL,
        "lakehouse_medallion": ORACLE_MEDALLION,
        "io_tfrecord_roundtrip": ORACLE_TFRECORD_ROUNDTRIP,
        "lakehouse_schema_evolution": ORACLE_SCHEMA_EVOLUTION,
        "lakehouse_delete_where": ORACLE_DELETE_WHERE,
        "lakehouse_update_where": ORACLE_UPDATE_WHERE,
        "lakehouse_meta_minmax": ORACLE_META_MINMAX,
        "lakehouse_history_stream": ORACLE_HISTORY_STREAM,
        "lakehouse_rename_column": ORACLE_RENAME_COLUMN,
        "search_hybrid_indexed": ORACLE_HYBRID_RRF,
        "lakehouse_scd2_merge": ORACLE_SCD2,
        "lakehouse_stream_read": ORACLE_STREAM_READ,
        "lakehouse_delta_roundtrip": ORACLE_DELTA_ROUNDTRIP,
        "lakehouse_meta_count": ORACLE_META_COUNT,
        "lakehouse_delta_mirror": ORACLE_DELTA_MIRROR,
        "lakehouse_change_stream": ORACLE_CHANGE_STREAM,
        "multimodal_image_meta": ORACLE_MULTIMODAL_IMAGE,
        "multimodal_audio_meta": ORACLE_MULTIMODAL_AUDIO,
        "multimodal_audio_segments": ORACLE_AUDIO_SEGMENTS,
        "multimodal_image_tiles": ORACLE_IMAGE_TILES,
        "multimodal_tile_pixels": _oracle_tile_pixels(),
        "multimodal_frame_sample": _oracle_frame_sample(),
        "streaming_dedup_ingest": ORACLE_STREAM_DEDUP,
        "streaming_exactly_once_ingest": ORACLE_EXACTLY_ONCE,
        "streaming_dedup_watermark": ORACLE_STREAM_DEDUP_WM,
        "streaming_interval_join": ORACLE_STREAM_INTERVAL_JOIN,
        "streaming_events_windowed": ORACLE_STREAM_WINDOWED,
        "streaming_upsert_merge": ORACLE_STREAM_UPSERT,
        "tokenizer_bpe_train_merges": _oracle_bpe_merges(24),
        "search_topk_pq": _oracle_topk_pq(),
        "search_topk_ivf_pq": _oracle_topk_ivf_pq(_COS_SQL),
        # the persisted index must agree exactly with the in-memory path
        "search_topk_ivfpq_persisted": _oracle_topk_ivf_pq(_COS_SQL),
        "search_topk_pq_rerank": _oracle_topk_pq_rerank(_COS_SQL),
        "streaming_session_windows": ORACLE_STREAM_SESSIONS,
    }


def q_span_corruption(spark, sf):
    """T5-style span corruption (operators/augment.py): deterministic
    hash-picked spans replaced by sentinels in the input and collected in
    the target — the denoising-objective data prep as ONE window pass per
    doc, expression-only, bit-identical across engines."""
    from dataingestion_spark.operators.augment import span_corruption

    docs = _t(spark, sf, "documents").filter(F.col("doc_id") < 300)
    return span_corruption(docs, mask_rate=0.15, span_len=3, salt="r3")


def _oracle_span_corruption() -> str:
    from dataingestion_spark.operators.augment import span_corruption_sql

    return span_corruption_sql("SELECT doc_id, text FROM documents WHERE doc_id < 300",
                               mask_rate=0.15, span_len=3, salt="r3")


def q_hard_negatives(spark, sf):
    """Contrastive hard-negative mining (similarity.hard_negatives): for
    each anchor embedding, the top-5 most similar vectors with a
    DIFFERENT label — the negatives a contrastive loss learns from.
    Exact two-phase ranking; label inequality as a residual filter on
    the one corpus scan."""
    from dataingestion_spark.operators.similarity import hard_negatives

    e = _t(spark, sf, "embeddings")
    anchors = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
        F.col("label").alias("query_label"),
    )
    out = hard_negatives(e, anchors, k=5)
    return out.select("query_id", "rank", "vec_id",
                      F.round("score", 6).alias("score_r"))


ORACLE_HARD_NEGATIVES = f"""
WITH q AS (SELECT vec_id AS query_id, embedding AS qv, label AS qlabel
           FROM embeddings WHERE vec_id < 5),
s AS (
  SELECT q.query_id, e.vec_id,
         {_COS_SQL.format(a="e.embedding", b="q.qv")} AS score
  FROM embeddings e CROSS JOIN q WHERE e.label <> q.qlabel)
SELECT query_id, CAST(rank AS INT) AS rank, vec_id, round(score, 6) AS score_r FROM (
  SELECT query_id, vec_id, score,
         row_number() OVER (PARTITION BY query_id ORDER BY score DESC, vec_id) AS rank
  FROM s) WHERE rank <= 5
"""


def q_prefix_lm(spark, sf):
    """UL2/prefix-LM split (operators/augment.py::prefix_lm_split):
    deterministic hash-picked boundary in [0.5, 0.9] of each doc's
    tokens, integer-only math, expression-only (no window, no UDF)."""
    from dataingestion_spark.operators.augment import prefix_lm_split

    docs = _t(spark, sf, "documents").filter(F.col("doc_id") < 400)
    return prefix_lm_split(docs, salt="r3")


def _oracle_prefix_lm() -> str:
    from dataingestion_spark.operators.augment import prefix_lm_split_sql

    return prefix_lm_split_sql(
        "SELECT doc_id, text FROM documents WHERE doc_id < 400", salt="r3")


def q_cluster_split(spark, sf):
    """Leakage-safe splitting (sharding.cluster_aware_split): near-dup
    clusters share a split because the hash key is the cluster id —
    the decontamination-by-construction a per-doc split can't give.
    The oracle recomputes the cluster closure and applies the identical
    integer-threshold draw."""
    from dataingestion_spark.operators.sharding import cluster_aware_split

    docs = _t(spark, sf, "documents")
    clusters = dedup.neardup_clusters(docs, num_hashes=16, bands=4)
    out = cluster_aware_split(docs, clusters,
                              weights={"train": 0.9, "valid": 0.05, "test": 0.05},
                              salt="r3split")
    return out.select("doc_id", "split")


def _oracle_cluster_split() -> str:
    from dataingestion_spark.operators.sharding import hash_split_sql

    split = hash_split_sql("k", weights={"train": 0.9, "valid": 0.05, "test": 0.05},
                           salt="r3split")
    return f"""
WITH clusters AS ({_oracle_cluster()}),
j AS (SELECT d.doc_id, COALESCE(c.canonical_id, d.doc_id) AS k
      FROM documents d LEFT JOIN clusters c ON d.doc_id = c.doc_id)
SELECT doc_id, {split} AS split FROM j
"""


def q_exactly_once_ingest(spark, sf):
    """Exactly-once ingest under retried micro-batches (manifest-store txn
    guard): epoch 0 writes the even docs, a RETRY of epoch 0 re-appends
    the same batch (skipped — without the guard it would double them),
    epoch 1 appends the odds, and its retry is skipped too. The output
    pins total rows == distinct docs == |documents| and the version
    counter stopping at 1 — the three facts that only hold if retries
    are no-ops."""
    import tempfile

    from dataingestion_spark.sinks import manifest_store as ms

    docs = _t(spark, sf, "documents").select(
        F.col("doc_id").cast("string").alias("documentid"), "text")
    table = tempfile.mkdtemp(prefix="eo_ingest_") + "/t"
    evens = docs.filter(F.col("documentid").cast("long") % 2 == 0)
    odds = docs.filter(F.col("documentid").cast("long") % 2 == 1)
    ms.write_table(evens, table, txn=("ingest", 0))
    ms.append_table(evens, table, txn=("ingest", 0))   # retried epoch 0
    ms.append_table(odds, table, txn=("ingest", 1))
    ms.append_table(odds, table, txn=("ingest", 1))    # retried epoch 1
    t = ms.read_table(spark, table)
    return t.agg(
        F.count("*").cast("long").alias("n_rows"),
        F.countDistinct("documentid").cast("long").alias("n_docs"),
    ).withColumn("final_version",
                 F.lit(ms.current_version(table)).cast("long"))


ORACLE_EXACTLY_ONCE = """
SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
       CAST(1 AS BIGINT) AS final_version
FROM documents
"""


def q_corpus_report(spark, sf):
    """Per-source corpus health report — the curation dashboard row:
    volume (docs, chars), language mix entropy-free summary (n_langs,
    top_lang by count with id tiebreak), exact-dup rate (md5 groups),
    and length quantiles via the mergeable histogram sketch. One scan +
    one tiny dup aggregate; everything exact/decimal so the whole
    dashboard is hash-checked."""
    docs = _t(spark, sf, "documents")
    base = docs.groupBy("source").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum(F.col("n_chars").cast("decimal(18,0)")).cast("long").alias("n_chars"),
        F.countDistinct("lang").cast("long").alias("n_langs"),
    )
    lang_counts = docs.groupBy("source", "lang").agg(
        F.count("*").alias("_n"))
    w = W.partitionBy("source").orderBy(F.desc("_n"), F.asc("lang"))
    top_lang = (lang_counts.withColumn("_rk", F.row_number().over(w))
                .filter(F.col("_rk") == 1).select("source",
                                                  F.col("lang").alias("top_lang")))
    dups = (docs.groupBy("source", F.md5(F.trim(F.lower("text"))).alias("_h"))
            .agg(F.count("*").alias("_n"))
            .groupBy("source")
            .agg((F.sum("_n") - F.count("*")).cast("long").alias("n_dup_rows")))
    out = (base.join(F.broadcast(top_lang), "source")
           .join(F.broadcast(dups), "source")
           .withColumn("dup_rate",
                       F.col("n_dup_rows").cast("double") / F.col("n_docs")))
    return out.select("source", "n_docs", "n_chars", "n_langs", "top_lang",
                      "n_dup_rows", F.round("dup_rate", 6).alias("dup_rate"))


ORACLE_CORPUS_REPORT = """
WITH base AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(CAST(n_chars AS DECIMAL(18,0))) AS BIGINT) AS n_chars,
         CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs
  FROM documents GROUP BY source),
tl AS (
  SELECT source, lang AS top_lang FROM (
    SELECT source, lang,
           row_number() OVER (PARTITION BY source
                              ORDER BY COUNT(*) DESC, lang) AS rk
    FROM documents GROUP BY source, lang) WHERE rk = 1),
dups AS (
  SELECT source, CAST(SUM(n) - COUNT(*) AS BIGINT) AS n_dup_rows FROM (
    SELECT source, md5(trim(lower(text))) AS h, COUNT(*) AS n
    FROM documents GROUP BY 1, 2) GROUP BY source)
SELECT b.source, b.n_docs, b.n_chars, b.n_langs, tl.top_lang, d.n_dup_rows,
       round(CAST(d.n_dup_rows AS DOUBLE) / b.n_docs, 6) AS dup_rate
FROM base b JOIN tl USING (source) JOIN dups d USING (source)
"""


def q_drift_by_group(spark, sf):
    """Per-group drift (operators/drift.py::drift_report_by): every
    l_returnflag's l_extendedprice distribution compared between the
    orderkey-parity halves in ONE pass per snapshot — the per-source
    monitoring dashboard, per-group windows instead of per-source
    queries."""
    from dataingestion_spark.operators.drift import drift_report_by

    li = _t(spark, sf, "lineitem")
    a = li.filter(F.col("l_orderkey") % 2 == 0)
    b = li.filter(F.col("l_orderkey") % 2 == 1)
    out = drift_report_by(a, b, "l_extendedprice", _DRIFT_EDGES, "l_returnflag")
    return out.withColumnRenamed("l_returnflag", "g")


def _oracle_drift_by_group() -> str:
    from dataingestion_spark.operators.drift import drift_report_by_sql

    return drift_report_by_sql(
        "SELECT l_returnflag, l_extendedprice FROM lineitem WHERE l_orderkey % 2 = 0",
        "SELECT l_returnflag, l_extendedprice FROM lineitem WHERE l_orderkey % 2 = 1",
        "l_extendedprice", _DRIFT_EDGES, "l_returnflag")
