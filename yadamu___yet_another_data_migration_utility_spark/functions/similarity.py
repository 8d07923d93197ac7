"""Similarity search: brute-force baseline + LSH-bucketed scale path.

The brute-force cosine top-k (plans/textops.ann_cosine_topk) is the
oracle-checked baseline. This module adds the 100 TB path:
random-hyperplane LSH bucketing so each query only scans its bucket.

Hyperplanes are DETERMINISTIC pseudo-vectors derived from md5(bit, dim)
-- no RNG state, so signatures are reproducible across runs/executors
(the same property the changelog generator relies on).
"""

from __future__ import annotations

import threading

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


#: previous invocation's cached signature set per operator -- replaced
#: (and unpersisted) on the next call, so repeated catalog invocations
#: in one long-lived session hold at most ONE cached copy per op
#: instead of piling blocks into executor storage until LRU thrash
_live_caches: dict[str, DataFrame] = {}
_live_caches_lock = threading.Lock()


def persist_scoped(key: str, df: DataFrame) -> DataFrame:
    out = df.persist()
    with _live_caches_lock:  # concurrent same-key callers must not
        prev = _live_caches.get(key)  # unpersist each other's cache or
        _live_caches[key] = out  # strand an untracked persisted df
    if prev is not None and prev is not out:
        try:
            prev.unpersist()
        except Exception:
            pass  # session of the previous call may already be stopped
    return out


def _to_double(col: str) -> F.Column:
    return F.transform(F.col(col), lambda x: x.cast("double"))


def _dot(a: F.Column, b: F.Column) -> F.Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda s, x: s + x)


def _norm(a: F.Column) -> F.Column:
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda s, x: s + x))


def plane_values(p: int, dim: int) -> list[float]:
    """Hyperplane #p's components as Python floats: component i =
    int(md5('hp{p}:{i}')[:4 hex], 16) / 65536.0 - 0.5 -- BIT-IDENTICAL
    to the DuckDB-oracle spelling (plans/moreops.py) because a 16-bit
    integer divided by the power-of-two 65536.0 is exact in IEEE
    double on every engine."""
    import hashlib

    return [
        int(hashlib.md5(f"hp{p}:{i}".encode()).hexdigest()[:4], 16) / 65536.0 - 0.5
        for i in range(dim)
    ]


def _bucket_batch_udf(n_tables: int, n_bits: int, dim: int):
    """Arrow-batched pandas UDF computing ALL ``n_tables`` bucket ids of
    one vector in a single numpy pass: ``array<int>`` indexed by table.

    Replaces the r1 Catalyst higher-order-function spelling
    on the hot path: 64 planes x 64 dims of interpreted ``aggregate``/
    ``zip_with`` lambdas cost ~5x the whole query (and the 4096-literal
    expression tree alone takes seconds to analyze). The numpy loop
    accumulates ``acc = acc + x_i * w_i`` in dimension order -- the
    EXACT IEEE-double operation sequence of the left-fold in both the
    Catalyst spelling and the DuckDB-oracle ``list_sum`` spelling
    (plans/moreops.py), so bucket ids (and therefore CORRECTNESS
    hashes) are bit-identical across all three."""
    from pyspark.sql.functions import pandas_udf

    planes = np.array(
        [plane_values(p, dim) for p in range(n_tables * n_bits)], dtype=np.float64
    )  # (n_tables*n_bits, dim)
    weights = np.array([1 << j for j in range(n_bits)], dtype=np.int64)

    @pandas_udf("array<int>")
    def buckets(emb: pd.Series) -> pd.Series:
        m = np.stack(emb.to_numpy()).astype(np.float64)  # float32 widening is exact
        acc = np.zeros((m.shape[0], planes.shape[0]), dtype=np.float64)
        for i in range(dim):  # sequential in i: matches the fold order exactly
            acc += m[:, i : i + 1] * planes[:, i]
        bits = (acc >= 0).reshape(m.shape[0], n_tables, n_bits)
        bk = (bits * weights).sum(axis=2).astype(np.int32)  # (n, n_tables)
        return pd.Series(list(bk))

    return buckets


def lsh_table_buckets(df: DataFrame, id_col: str = "vec_id",
                      vec_col: str = "embedding", n_tables: int = 16,
                      n_bits: int = 4, dim: int = 64) -> DataFrame:
    """Multi-table LSH bucketing: (id, tbl, bk) -- one row per table.
    Candidate pairs are ids sharing a (tbl, bk) key in ANY table, found
    by a plain hash equi-join (per-pair hit probability p_bit^n_bits per
    table; n_tables unioned tables drive recall toward 1 for genuinely
    close pairs). Scale: one scan + one vectorized Arrow batch + one
    posexplode per vector; bucket keys are md5-uniform, so the
    downstream self-join has no skew."""
    # repartition by id BEFORE the bucket computation: a small embedding
    # table often arrives as one parquet split, which would pin the
    # dot-product work to a single task; the shuffle moves only
    # (id, vector) and buys full-cluster parallelism for the
    # compute-bound part.
    # explicit partition count: AQE would coalesce a size-based shuffle
    # of ~MBs back to one partition, re-serializing the compute
    n_parts = df.sparkSession.sparkContext.defaultParallelism
    base = df.select(F.col(id_col), F.col(vec_col).alias("_e")).repartition(
        n_parts, F.col(id_col)
    )
    buckets = _bucket_batch_udf(n_tables, n_bits, dim)(F.col("_e"))
    return base.select(F.col(id_col), F.posexplode(buckets).alias("tbl", "bk"))


def ann_lsh_topk(df: DataFrame, query_ids: list[int], k: int = 5,
                 id_col: str = "vec_id", vec_col: str = "embedding",
                 n_tables: int = 16, n_bits: int = 4) -> DataFrame:
    """Multi-table bucketed ANN: a query's candidates are the vectors
    sharing its bucket in ANY of ``n_tables`` LSH tables; exact cosine
    + top-k rank only over candidates. Output schema matches
    ann_cosine_topk (query_id, neighbor_id, rank, sim_r).

    Single-table bucketing (the r1 shape) measured recall@5 = 0 on this
    near-orthogonal synthetic corpus -- one 8-bit table keeps ~1/256 of
    the corpus but the true neighbors are barely more correlated than
    random, so they land elsewhere. Multi-table is the standard fix:
    candidate probability 1-(1-p^bits)^tables; 16x4 measured ~0.5-0.9
    recall here, and every join stays a hash equi-join on (tbl, bk)."""
    from pyspark.sql import Window as W

    # persist: both sides of the candidate self-join read the signature
    # set -- without this the 64-dot bucket computation runs twice
    # (Spark has no cross-branch common-subtree elimination); scoped so
    # re-invocation replaces (not leaks) the cache
    sig = persist_scoped(
        "ann_lsh_topk", lsh_table_buckets(df, id_col, vec_col, n_tables, n_bits)
    )
    q = sig.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"), "tbl", "bk"
    )
    t = sig.select(F.col(id_col).alias("neighbor_id"), "tbl", "bk")
    cand = (
        q.join(t, ["tbl", "bk"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id")
        .distinct()
    )
    # norms in the per-vector projections: computed once per vector at
    # broadcast-build time, not once per candidate pair
    qe = df.select(F.col(id_col).alias("query_id"), _to_double(vec_col).alias("qe"),
                   _norm(_to_double(vec_col)).alias("qn"))
    te = df.select(F.col(id_col).alias("neighbor_id"), _to_double(vec_col).alias("te"),
                   _norm(_to_double(vec_col)).alias("tn"))
    sims = (
        cand.join(qe, "query_id")
        .join(te, "neighbor_id")
        .select(
            "query_id", "neighbor_id",
            (_dot(F.col("qe"), F.col("te"))
             / (F.col("qn") * F.col("tn"))).alias("sim"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("neighbor_id"))
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", F.round("sim", 4).alias("sim_r"))
    )
