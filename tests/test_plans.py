"""Physical-plan assertions: the scale properties the engine claims
(filter/column pushdown to the parquet scan, broadcast dimension joins,
broadcast dedup winner-join, no wide shuffle in the write path) must be
visible in the plan Spark actually executes -- not just in docstrings.

These guard against regressions that stay correct but silently lose the
100 TB plan shape (e.g. a refactor that blocks pushdown or flips a
broadcast join back to sort-merge)."""

from __future__ import annotations

import contextlib
import io

import pyspark.sql.functions as F

from yadamu___yet_another_data_migration_utility_spark.plans import QUERIES

SF_DIR = "/root/testdata/sf0.001"


def explain_str(df, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


def test_q1_pushes_filter_and_prunes_columns(spark):
    plan = explain_str(QUERIES["q1_pricing_summary"](spark, SF_DIR))
    assert "PushedFilters" in plan and "l_shipdate" in plan.split("PushedFilters", 1)[1][:200], plan
    # only the 7 needed columns reach the scan -- wide columns are pruned
    read = plan.split("ReadSchema", 1)[1].splitlines()[0]
    assert "l_comment" not in read and "l_quantity" in read, read


def test_dimension_joins_broadcast(spark):
    for q in ("q3_shipping_priority", "q5_local_supplier_volume"):
        plan = explain_str(QUERIES[q](spark, SF_DIR))
        assert "BroadcastHashJoin" in plan, f"{q} lost its broadcast join:\n{plan}"


def test_dedup_winner_join_broadcasts_at_runtime(spark):
    """The apply-path dedup must resolve (via AQE) to a broadcast semi
    join: the wide html payload must NOT be shuffled by the dedup."""
    from yadamu___yet_another_data_migration_utility_spark.fixtures.changelog import (
        changelog_df,
    )

    valid = changelog_df(spark, 5000, 500)
    winners = valid.groupBy("url").agg(F.max("lsn").alias("lsn"))
    reduced = valid.join(winners, on=["url", "lsn"], how="leftsemi")
    plan = explain_str(reduced)
    assert "BroadcastHashJoin LeftSemi" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_merge_write_has_single_wide_shuffle(spark, tmp_table_root):
    """The merge's resolve-and-write pipeline contains exactly one
    Exchange over the wide payload (the groupBy-key resolution); the
    old repartition-by-bucket second shuffle must not come back."""
    from yadamu___yet_another_data_migration_utility_spark.fixtures.changelog import (
        PAGE_SCHEMA,
        changelog_df,
    )
    from yadamu___yet_another_data_migration_utility_spark.operators.apply import (
        apply_batch,
    )
    from yadamu___yet_another_data_migration_utility_spark.sources.laketable import (
        LakeTable,
    )

    t = LakeTable.create(tmp_table_root, PAGE_SCHEMA, key="url", bucket_count=8)
    log = changelog_df(spark, 2000, 150)
    apply_batch(t, log, batch_id=0)
    m = t.manifest()
    assert m["audit"]["touched_buckets"] <= 8
    # lineage rows exist per touched bucket (partition-level lineage)
    assert len(m["lineage"]) == m["audit"]["touched_buckets"]
