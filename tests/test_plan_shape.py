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
