"""Physical-plan quality gates: the optimizations we claim must be visible
in .explain() output, not just intended."""

import re

import pytest

import __spark_entry__ as em

SF_DIR = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_broadcast_join_is_broadcast(spark):
    plan = _plan(em.q_join_broadcast(spark, SF_DIR))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_filter_pushdown_reaches_scan(spark):
    plan = _plan(em.q_filter_project(spark, SF_DIR))
    # the quantity/returnflag predicates reach the parquet reader (the
    # plan text truncates long filter lists, so match the leading entries)
    assert "PushedFilters: [IsNotNull(l_quantity)" in plan
    assert "GreaterThanOrEqual(l_quantity,30.0)" in plan


def test_column_pruning_reaches_scan(spark):
    plan = _plan(em.q_token_count(spark, SF_DIR))
    m = re.search(r"ReadSchema: ([^\n]*)", plan)
    assert m is not None
    # only doc_id and text are read, not lang/source/n_chars
    assert "lang" not in m.group(1) and "n_chars" not in m.group(1)


def test_no_python_row_udfs_in_relational_queries(spark):
    """B19 discipline: relational/text/dedup/similarity queries are pure
    JVM - no BatchEvalPython (row UDF) anywhere; mapInPandas (ArrowEval /
    MapInPandas) only in the extraction + multimodal + crypt-kernel
    queries (doc_info_crypt builds encrypted PDFs per row)."""
    for name, fn in em.queries().items():
        plan = _plan(fn(spark, SF_DIR))
        assert "BatchEvalPython" not in plan, name
        if name not in ("extract_roundtrip", "multimodal_features",
                        "multimodal_real_decode", "webp_real_decode",
                        "vp8_real_decode", "jpeg_arith_decode",
                        "doc_info_crypt", "pdf_images",
                        "audio_features"):
            assert "MapInPandas" not in plan, name


def test_topk_uses_take_ordered(spark):
    plan = _plan(em.q_topk_orders(spark, SF_DIR))
    assert "TakeOrderedAndProject" in plan


def test_whole_stage_codegen_active(spark):
    # non-AQE plans carry the *(n) codegen-stage markers directly
    plan = _plan(em.q_filter_project(spark, SF_DIR))
    assert "*(1)" in plan
    # AQE plans reveal the final (codegen'd) plan only after execution
    df = em.q_agg_pricing(spark, SF_DIR)
    df.collect()
    plan = _plan(df)
    assert "isFinalPlan=true" in plan and "*(" in plan


def test_minhash_lsh_cap_is_broadcast_anti_join(spark):
    """The round-6 hot-bucket cap must stay a BROADCAST anti-join
    ahead of the bucket self-join (a shuffled anti-join would add a
    full shuffle of the bucket table at 100 TB), and no cross join may
    appear."""
    plan = _plan(em.queries()["dedup_minhash_lsh"](spark, SF_DIR))
    assert "LeftAnti, BuildRight" in plan or (
        "BroadcastHashJoin" in plan and "LeftAnti" in plan), plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
