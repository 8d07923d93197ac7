"""Driver-contract smoke tests + rows-only operators (LSH ANN,
multimodal plumbing)."""

from __future__ import annotations

import pyspark.sql.functions as F

import __spark_entry__ as entrymod

SF = "/root/testdata/sf0.001"


def test_entry_returns_rows(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
    assert set(df.columns) == {"url", "last_lsn", "event_type", "value", "ts"}


def test_contract_shapes(spark):
    qs = entrymod.queries()
    os_ = entrymod.oracle_sql()
    assert set(os_.keys()) <= set(qs.keys())
    assert len(qs) >= 20
    # only the genuinely non-SQL-expressible ops lack oracles
    assert set(qs.keys()) - set(os_.keys()) == {"ann_lsh_bucketed", "media_decode_meta"}


def test_ann_lsh_is_subset_of_bruteforce_space(spark):
    qs = entrymod.queries()
    lsh = qs["ann_lsh_bucketed"](spark, SF)
    rows = lsh.collect()
    assert rows, "LSH ANN returned nothing"
    assert {r["query_id"] for r in rows} <= set(range(8))
    # ranks are 1..5 per query, sims in [-1, 1]
    for r in rows:
        assert 1 <= r["rank"] <= 5
        assert -1.0001 <= r["sim_r"] <= 1.0001


def test_media_decode_meta_deterministic(spark):
    qs = entrymod.queries()
    a = qs["media_decode_meta"](spark, SF).orderBy("media_id").collect()
    b = qs["media_decode_meta"](spark, SF).orderBy("media_id").collect()
    assert a == b
    assert all(64 <= r["width"] <= 255 and r["n_bytes"] > 0 for r in a)


def test_frame_sample_plumbing(spark):
    from yadamu___yet_another_data_migration_utility_spark.functions.multimodal import (
        frame_sample,
    )

    d = spark.read.parquet(f"{SF}/documents.parquet").select(
        F.col("doc_id").alias("media_id"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
    )
    fs = frame_sample(d, every_n=2)
    rows = fs.groupBy("media_id").count().collect()
    assert all(1 <= r["count"] <= 2 for r in rows)  # n_frames in 1..4, every 2nd
