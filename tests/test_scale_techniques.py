"""Bucketed co-located joins and salted skew joins — plan-shape and
equivalence tests for the 100 TB techniques."""

import pytest
from pyspark.sql import functions as F

from dataingestion_spark.observability import plan_summary
from dataingestion_spark.operators.skew import salted_join
from dataingestion_spark.sinks.bucketed import read_table, write_bucketed

SF = "/root/testdata/sf0.001"


def test_bucketed_join_elides_shuffle(spark):
    # managed tables land in ./spark-warehouse (static conf) — dropped below
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    lineitem = spark.read.parquet(f"{SF}/lineitem.parquet")
    write_bucketed(orders.withColumnRenamed("o_orderkey", "okey"), "t_orders_b", "okey", 8)
    write_bucketed(lineitem.withColumnRenamed("l_orderkey", "okey"), "t_lineitem_b", "okey", 8)

    # disable broadcast so the join strategy decision is about co-location
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        a = read_table(spark, "t_orders_b")
        b = read_table(spark, "t_lineitem_b")
        joined = a.join(b, "okey").groupBy("o_orderstatus").count()
        facts = plan_summary(joined)
        # bucketed SMJ must not exchange either side before the join:
        # 1 exchange for the final groupBy only
        assert facts["sort_merge_joins"] >= 1
        assert facts["exchanges"] <= 2  # agg partial/final only, none for the join
        rows = {r.o_orderstatus: r["count"] for r in joined.collect()}
        plain = {
            r.o_orderstatus: r["count"]
            for r in spark.read.parquet(f"{SF}/orders.parquet")
            .join(
                spark.read.parquet(f"{SF}/lineitem.parquet"),
                F.col("o_orderkey") == F.col("l_orderkey"),
            )
            .groupBy("o_orderstatus")
            .count()
            .collect()
        }
        assert rows == plain
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
        spark.sql("DROP TABLE IF EXISTS t_orders_b")
        spark.sql("DROP TABLE IF EXISTS t_lineitem_b")


def test_salted_join_matches_plain_join(spark):
    lineitem = spark.read.parquet(f"{SF}/lineitem.parquet").select(
        "l_orderkey", "l_partkey", "l_quantity"
    )
    part = spark.read.parquet(f"{SF}/part.parquet").select(
        F.col("p_partkey").alias("l_partkey"), "p_name"
    )
    salted = salted_join(lineitem, part, "l_partkey", salts=4)
    plain = lineitem.join(part, "l_partkey")
    assert salted.count() == plain.count()
    s = sorted(tuple(r) for r in salted.select("l_orderkey", "l_partkey", "p_name").collect())
    p = sorted(tuple(r) for r in plain.select("l_orderkey", "l_partkey", "p_name").collect())
    assert s == p


def test_tpch_plans_broadcast_and_prune(spark):
    """Plan-shape pins for the newly added TPC-H queries: dimension joins
    must broadcast (no sort-merge against a dim), filters and projections
    must reach the lineitem scan."""
    import __spark_entry__ as em

    sf = "/root/testdata/sf0.001"

    q2 = em.q_tpch_q2(spark, sf)
    f2 = plan_summary(q2)
    assert f2["broadcast_hash_joins"] >= 4  # part, supplier, nation, region
    assert any("l_partkey" in s and "l_quantity" in s for s in f2["read_schemas"])

    q8 = em.q_tpch_q8(spark, sf)
    f8 = plan_summary(q8)
    assert f8["broadcast_hash_joins"] >= 5  # part, supp, both nations, region
    # p_type filter must be pushed to the part scan
    assert any("p_type" in p for p in f8["pushed_filters"])

    q20 = em.q_tpch_q20(spark, sf)
    f20 = plan_summary(q20)
    # semi-join chain: no full-width join of lineitem to part
    assert any("p_name" in p or "StringStartsWith" in p for p in f20["pushed_filters"])
    assert any("l_shipdate" in p for p in f20["pushed_filters"])


def test_round2_plans_broadcast_no_nested_loop(spark):
    """Plan pins for the round-2 operators: BM25 postings must aggregate
    AFTER the broadcast query-term filter (no corpus-vocabulary shuffle),
    and IVF-PQ candidate scoring must be a broadcast equi-join on the
    inverted list — never a nested-loop join."""
    import __spark_entry__ as em

    sf = "/root/testdata/sf0.001"

    # note: BroadcastNestedLoopJoin *Cross* nodes are fine — they are the
    # deliberate crossJoins of broadcast-tiny sides (1-row corpus stats,
    # the query set); what must never appear is a sort-merge join, which
    # would mean a corpus-sized shuffle where a broadcast was intended.
    bm = em.q_hybrid_rrf(spark, sf)
    fb = plan_summary(bm)
    # the only sort-merge joins allowed are the RRF FULL OUTER fusions
    # (full outer cannot broadcast; both sides are k x queries rows) —
    # the corpus-sized BM25/cosine scoring must all be broadcast joins
    assert fb["sort_merge_joins"] <= 2
    assert fb["broadcast_hash_joins"] >= 3  # term filter, qterms, df, doclens

    ivfpq = em.q_topk_ivf_pq(spark, sf)
    fp = plan_summary(ivfpq)
    assert fp["sort_merge_joins"] == 0
    assert fp["broadcast_hash_joins"] >= 1  # probe x LUT vs encoded lists


def test_new_analytics_plan_shapes(spark):
    """Round-3 operators: pushdown reaches the scans, no nested-loop
    joins, column pruning holds."""
    import __spark_entry__ as em
    from dataingestion_spark.observability import plan_summary

    sf = "/root/testdata/sf0.001"
    for name in ("events_funnel_ordered", "events_gapfill_locf",
                 "search_tfidf_top_terms", "events_cohort_retention"):
        s = plan_summary(em.queries()[name](spark, sf))
        assert s["nested_loop_joins"] == 0, name
    s = plan_summary(em.queries()["events_funnel_ordered"](spark, sf))
    assert any("signup" in f for f in s["pushed_filters"])  # step filter pushed
    g = plan_summary(em.queries()["events_gapfill_locf"](spark, sf))
    assert all("event_type" not in rs for rs in g["read_schemas"])  # pruned


def test_round3_continuation_plan_shapes(spark):
    """SFT / KMV / drift / privacy / dedup-probe plan audits: the global
    top-k is a TakeOrderedAndProject (not a full sort), the index probe
    broadcasts the batch side, nothing falls back to nested-loop joins,
    and the window operators keep a single exchange."""
    import io, contextlib
    import __spark_entry__ as em
    from pyspark.sql import Row
    from dataingestion_spark.operators.kmv import kmv_sample
    from dataingestion_spark.observability import plan_summary

    sf = "/root/testdata/sf0.001"

    def plan_text(df):
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        return buf.getvalue()

    # KMV build: per-partition top-k, no global sort of the hash stream
    docs = spark.read.parquet(f"{sf}/orders.parquet")
    assert "TakeOrderedAndProject" in plan_text(kmv_sample(docs, "o_custkey", 64))

    # no nested-loop joins in the row-scale queries; drift/kmv attach
    # 1-row broadcast aggregates via crossJoin (a BroadcastNestedLoopJoin
    # against a scalar by design), so they assert no sort-merge instead
    for name in ("sft_render_offsets", "sft_chat_text",
                 "privacy_k_anonymity", "sketch_kmv_by_group",
                 "doc_vocab_coverage"):
        s = plan_summary(em.queries()[name](spark, sf))
        assert s["nested_loop_joins"] == 0, name
    # drift: joins touch only the constant-size bin/category frames; the
    # scale assertion that matters is that the TABLE scans are pruned to
    # the compared column (plus the split key)
    s = plan_summary(em.queries()["drift_numeric_report"](spark, sf))
    assert all("l_comment" not in rs and "l_shipdate" not in rs
               for rs in s["read_schemas"])
    # (kmv_setops' full-outer sample join runs on <=2k rows, and
    # dedup_representatives' docs<->clusters join is corpus-scale on both
    # sides — a shuffle join is the RIGHT plan there, so neither asserts
    # zero sort-merge; the nested-loop check above is the guard)
    s = plan_summary(em.queries()["dedup_representatives"](spark, sf))
    assert s["nested_loop_joins"] == 0

    # SFT offsets: exactly one exchange (the conv_id window shuffle).
    # plan_summary counts the formatted output, which names each exchange
    # twice (tree line + details header) — so one shuffle == 2 hits.
    s = plan_summary(em.queries()["sft_render_offsets"](spark, sf))
    assert s["exchanges"] <= 2

    # privacy gate reads only the projected columns
    s = plan_summary(em.queries()["privacy_k_anonymity"](spark, sf))
    assert all("c_custkey" not in rs for rs in s["read_schemas"])
