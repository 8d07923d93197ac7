"""Similarity search: brute-force baseline + LSH-bucketed scale path.

The brute-force cosine top-k (plans/textops.ann_cosine_topk) is the
oracle-checked baseline. This module adds the 100 TB path:
random-hyperplane LSH bucketing so each query only scans its bucket.

Hyperplanes are DETERMINISTIC pseudo-vectors derived from md5(bit, dim)
-- no RNG state, so signatures are reproducible across runs/executors
(the same property the changelog generator relies on).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _to_double(col: str) -> F.Column:
    return F.transform(F.col(col), lambda x: x.cast("double"))


def _dot(a: F.Column, b: F.Column) -> F.Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda s, x: s + x)


def _norm(a: F.Column) -> F.Column:
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda s, x: s + x))


def lsh_signature(df: DataFrame, vec_col: str = "embedding", n_bits: int = 8,
                  dim: int = 64) -> DataFrame:
    """Append an ``lsh_bucket`` int column: sign-of-dot-product with
    n_bits deterministic hyperplanes. Scale: one scan, no shuffle; the
    bucket becomes the partition key for bucket-local search."""
    emb = _to_double(vec_col)
    bits = []
    for b in range(n_bits):
        # hyperplane component h(b, i) in [-0.5, 0.5), from md5 -- cheap,
        # deterministic, computed by Catalyst (conv/md5 are builtins)
        plane = F.transform(
            F.sequence(F.lit(0), F.lit(dim - 1)),
            lambda i, b=b: (
                F.conv(F.substring(F.md5(F.concat(F.lit(f"hp{b}:"), i.cast("string"))), 1, 4), 16, 10)
                .cast("double") / F.lit(65536.0) - F.lit(0.5)
            ),
        )
        bits.append(F.when(_dot(emb, plane) >= 0, F.lit(1 << b)).otherwise(F.lit(0)))
    bucket = bits[0]
    for x in bits[1:]:
        bucket = bucket + x
    return df.withColumn("lsh_bucket", bucket.cast("int"))


def ann_lsh_topk(df: DataFrame, query_ids: list[int], k: int = 5,
                 id_col: str = "vec_id", vec_col: str = "embedding",
                 n_bits: int = 8) -> DataFrame:
    """Bucketed ANN: queries only join their own LSH bucket -- the scan
    shrinks by ~2^n_bits vs brute force (recall traded for throughput).
    Output schema matches ann_cosine_topk (query_id, neighbor_id, rank,
    sim_r)."""
    from pyspark.sql import Window as W

    sig = lsh_signature(df, vec_col, n_bits).select(
        F.col(id_col), F.col("lsh_bucket"), _to_double(vec_col).alias("_v")
    )
    q = sig.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"),
        F.col("lsh_bucket").alias("qb"),
        F.col("_v").alias("qe"),
    )
    t = sig.select(
        F.col(id_col).alias("neighbor_id"), F.col("lsh_bucket").alias("tb"),
        F.col("_v").alias("te"),
    )
    sims = (
        t.join(F.broadcast(q), (F.col("qb") == F.col("tb"))
               & (F.col("query_id") != F.col("neighbor_id")))
        .select(
            "query_id", "neighbor_id",
            (_dot(F.col("qe"), F.col("te"))
             / (_norm(F.col("qe")) * _norm(F.col("te")))).alias("sim"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("neighbor_id"))
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", F.round("sim", 4).alias("sim_r"))
    )
