"""IVF (inverted-file) approximate nearest neighbour -- the
cell-partitioned ANN variant next to the LSH one (plans/moreops.py).

IVF shape: train a tiny coarse quantizer (here: per-label centroids --
the k-means reduce step over the corpus' own labels, K=10), assign every
vector to its nearest cell, and answer a query by scanning only its
``NPROBE`` nearest cells. The quantizer is O(K x dim) -- it broadcasts;
assignment is one scan; the probe join is a hash equi-join on the cell
id. This is the 100 TB layout FAISS/SCaNN use: the index is a
partitioning, so queries touch (NPROBE / K) of the corpus.

Determinism/oracle contract: centroid components are DECIMAL sums
divided as double (order-independent, engine-exact -- the
embedding_label_centroids trick applied to all 64 dims); distances and
cosines use the same sequential-fold float spelling as every other
vector query, so cell assignments and similarities are bit-identical in
DuckDB and the whole IVF pipeline is hash-checked end-to-end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from .catalog import _register, load

IVF_DIM = 64
IVF_NPROBE = 2
IVF_TOPK = 5
SEMDEDUP_TAU = 0.40

# shared CTE chain: DECIMAL-exact per-label centroids -> nearest-cell
# assignment (L2, label tie-break). ann_ivf and dedup_semantic both
# build on it so the quantizer contract has one spelling per engine.
_CELLS_SQL = f"""e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ve FROM embeddings),
    dims AS (SELECT unnest(generate_series(0, {IVF_DIM - 1})) AS i),
    comp AS (
      SELECT label, i, CAST(embedding[i + 1] AS DOUBLE) AS v
      FROM embeddings, dims
    ),
    cent AS (
      SELECT label, i,
             CAST(SUM(CAST(v AS DECIMAL(18,8))) AS DOUBLE) / COUNT(*) AS c
      FROM comp GROUP BY label, i
    ),
    centv AS (SELECT label AS cell, list(c ORDER BY i) AS cv FROM cent GROUP BY label),
    dist AS (
      SELECT e.vec_id, centv.cell,
             list_sum(list_transform(list_zip(e.ve, centv.cv),
                                     p -> (p[1] - p[2]) * (p[1] - p[2]))) AS d2
      FROM e, centv
    ),
    ranked AS (
      SELECT vec_id, cell,
             ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, cell) AS crn
      FROM dist
    )"""

_IVF_SQL = f"""
    WITH {_CELLS_SQL},
    assign AS (SELECT vec_id AS neighbor_id, cell FROM ranked WHERE crn = 1),
    probes AS (
      SELECT vec_id AS query_id, cell
      FROM ranked WHERE vec_id < 8 AND crn <= {IVF_NPROBE}
    ),
    cand AS (
      SELECT DISTINCT p.query_id, a.neighbor_id
      FROM probes p JOIN assign a
        ON a.cell = p.cell AND a.neighbor_id <> p.query_id
    ),
    sims AS (
      SELECT c.query_id, c.neighbor_id,
             list_sum(list_transform(list_zip(qe.ve, te.ve), p -> p[1] * p[2]))
               / (sqrt(list_sum(list_transform(qe.ve, x -> x * x)))
                  * sqrt(list_sum(list_transform(te.ve, x -> x * x)))) AS sim
      FROM cand c
      JOIN e qe ON qe.vec_id = c.query_id
      JOIN e te ON te.vec_id = c.neighbor_id
    )
    SELECT query_id, neighbor_id, rank, ROUND(sim, 4) AS sim_r
    FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                       ORDER BY sim DESC, neighbor_id) AS rank
          FROM sims)
    WHERE rank <= {IVF_TOPK}
"""


# the bit-identity-critical fold spellings live in ONE place
# (functions/similarity.py) and are shared by every vector query
from ..functions.similarity import _dot, _norm, _to_double as _to_d


def _fold(arr: F.Column) -> F.Column:
    return F.aggregate(arr, F.lit(0.0), lambda acc, x: acc + x)


def _ranked_cells(e: DataFrame) -> DataFrame:
    """(vec_id, cell, crn): every vector's cells ranked by L2 distance
    to the DECIMAL-exact per-label centroids (cell id breaks ties).
    crn=1 is the IVF/SemDeDup assignment; crn<=NPROBE are probe cells."""
    comp = e.select("label", F.posexplode(_to_d("embedding")).alias("i", "v"))
    cent = comp.groupBy("label", "i").agg(
        (F.sum(F.col("v").cast("decimal(18,8)")).cast("double")
         / F.count(F.lit(1))).alias("c")
    )
    centv = cent.groupBy(F.col("label").alias("cell")).agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("i", "c"))), lambda s: s["c"]
        ).alias("cv")
    )
    ev = e.select("vec_id", _to_d("embedding").alias("ve"))
    d2 = _fold(F.zip_with("ve", "cv", lambda a, b: (a - b) * (a - b)))
    dist = ev.crossJoin(F.broadcast(centv)).select("vec_id", "cell", d2.alias("d2"))
    w = W.partitionBy("vec_id").orderBy("d2", "cell")
    return dist.withColumn("crn", F.row_number().over(w))


@_register("ann_ivf", _IVF_SQL)
def ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN: per-label centroids as the coarse quantizer, nearest-cell
    assignment (L2, deterministic label tie-break), NPROBE=2 probed
    cells per query, exact cosine top-5 over probed candidates only.
    Output schema matches ann_cosine_topk; recall vs brute force is
    asserted in tests/test_entry_and_extras.py.

    Scale: the quantizer is K x dim doubles -> broadcast (the crossJoin
    is a 10-row explode, not a pair join); assignment is one scan + a
    per-vector window over K rows; the probe step is a hash equi-join
    on cell. Cells are label-balanced here; a production IVF re-trains
    centroids to balance cells -- the plan shape is identical."""
    e = load(spark, sf_dir, "embeddings")
    ranked = _ranked_cells(e)
    assign = ranked.filter(F.col("crn") == 1).select(
        F.col("vec_id").alias("neighbor_id"), "cell"
    )
    probes = ranked.filter((F.col("vec_id") < 8) & (F.col("crn") <= IVF_NPROBE)).select(
        F.col("vec_id").alias("query_id"), "cell"
    )
    cand = (
        probes.join(assign, "cell")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id")
        .distinct()
    )
    # norms hoisted into the per-vector projections (computed once per
    # vector, not once per candidate pair)
    qe = e.select(F.col("vec_id").alias("query_id"), _to_d("embedding").alias("qe"),
                  _norm(_to_d("embedding")).alias("qn"))
    te = e.select(F.col("vec_id").alias("neighbor_id"), _to_d("embedding").alias("te"),
                  _norm(_to_d("embedding")).alias("tn"))
    sim = _dot(F.col("qe"), F.col("te")) / (F.col("qn") * F.col("tn"))
    rw = W.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("neighbor_id"))
    return (
        cand.join(qe, "query_id")
        .join(te, "neighbor_id")
        .select("query_id", "neighbor_id", sim.alias("sim"))
        .withColumn("rank", F.row_number().over(rw))
        .filter(F.col("rank") <= IVF_TOPK)
        .select("query_id", "neighbor_id", "rank", F.round("sim", 4).alias("sim_r"))
    )


# SemDeDup pairwise cosine, spelled once for both engines (aliases pe/te
# are fixed by the shared _COSINE_SQL contract in plans/moreops.py)
from .moreops import _COSINE_SQL

_SEMDEDUP_SQL = f"""
    WITH {_CELLS_SQL},
    assign AS (SELECT vec_id, cell FROM ranked WHERE crn = 1),
    pairs AS (
      SELECT b.vec_id AS dup_id, {_COSINE_SQL} AS sim
      FROM assign a JOIN assign b ON a.cell = b.cell AND a.vec_id < b.vec_id
      JOIN e pe ON pe.vec_id = a.vec_id
      JOIN e te ON te.vec_id = b.vec_id
    ),
    dups AS (SELECT DISTINCT dup_id FROM pairs WHERE sim >= {SEMDEDUP_TAU})
    SELECT s.vec_id, s.cell,
           CASE WHEN d.dup_id IS NULL THEN 0 ELSE 1 END AS is_dup
    FROM assign s LEFT JOIN dups d ON d.dup_id = s.vec_id
"""


@_register("dedup_semantic", _SEMDEDUP_SQL)
def dedup_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic deduplication (SemDeDup, Abbas et al. 2023): cluster
    embeddings with the shared coarse quantizer (_ranked_cells --
    DECIMAL-exact per-label centroids, nearest-cell L2 assignment),
    then prune within each cluster only: a vector is a semantic
    duplicate when an earlier (smaller vec_id) vector in the SAME cell
    has cosine >= 0.40. Output is the full corpus verdict table
    (vec_id, cell, is_dup), so the oracle hash checks the quantizer,
    the pair semantics and the keep-list in one pass.

    Scale: this is exactly why SemDeDup clusters first -- the pairwise
    cosine runs per-cell (hash equi-join on cell), never corpus x
    corpus; with K cells of n/K vectors the candidate set is n^2/K
    instead of n^2, and each cell's pairs co-locate under one shuffle
    key. The quantizer crossJoin broadcasts K=10 constant rows (same
    exemption as ann_ivf); norms are hoisted per-vector; the final
    verdict is a broadcast-able left join of the (small) dup-id set."""
    e = load(spark, sf_dir, "embeddings")
    assign = _ranked_cells(e).filter(F.col("crn") == 1).select("vec_id", "cell")
    a = assign.select(F.col("vec_id").alias("keep_id"), "cell")
    b = assign.select(F.col("vec_id").alias("dup_id"), "cell")
    cand = a.join(b, "cell").filter(F.col("keep_id") < F.col("dup_id"))
    pe = e.select(F.col("vec_id").alias("keep_id"), _to_d("embedding").alias("pe"),
                  _norm(_to_d("embedding")).alias("pn"))
    te = e.select(F.col("vec_id").alias("dup_id"), _to_d("embedding").alias("te"),
                  _norm(_to_d("embedding")).alias("tn"))
    sim = _dot(F.col("pe"), F.col("te")) / (F.col("pn") * F.col("tn"))
    dups = (
        cand.join(pe, "keep_id").join(te, "dup_id")
        .select("dup_id", sim.alias("sim"))
        .filter(F.col("sim") >= SEMDEDUP_TAU)
        .select("dup_id")
        .distinct()
    )
    return assign.join(
        F.broadcast(dups), assign["vec_id"] == dups["dup_id"], "left"
    ).select(
        "vec_id", "cell",
        F.when(F.col("dup_id").isNull(), F.lit(0)).otherwise(F.lit(1)).alias("is_dup"),
    )


_QUANT_SQL = """
    WITH e AS (
      SELECT vec_id,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings
    ),
    s AS (
      SELECT vec_id, v,
             list_max(list_transform(v, x -> abs(x))) AS amax
      FROM e
    ),
    q AS (
      SELECT vec_id, amax,
             CASE WHEN amax = 0
                  THEN list_transform(v, x -> 0)
                  ELSE list_transform(
                         v, x -> CAST(floor(x * 127.0 / amax + 0.5) AS INT))
             END AS qv
      FROM s
    )
    SELECT vec_id,
           CAST(len(qv) AS INT) AS n_dims,
           CAST(list_min(qv) AS INT) AS qmin,
           CAST(list_max(qv) AS INT) AS qmax,
           md5(array_to_string(qv, ',')) AS q_md5,
           CASE WHEN amax = 0 THEN CAST(0.0 AS DOUBLE)
                ELSE amax / 127.0 END AS scale
    FROM q
"""


@_register("embedding_quantize", _QUANT_SQL)
def embedding_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 quantization of the embedding column -- the
    storage format ANN serving stacks keep vectors in (FAISS
    ``SQ8``-style): per-vector scale = max|x| / 127, q_i =
    floor(x_i/scale + 0.5) clamped by construction to [-127, 127].
    Emitted per vector: dim count, quantized min/max, the md5 of the
    full int8 codes (so the oracle checks every code, not just
    summaries) and the de-quantization scale.

    Determinism: float32 -> double is exact; abs/max are exact; the
    quantization expression is one fixed IEEE chain (x*127.0/amax+0.5,
    left-associated in both engines) and floor is exact -- so codes and
    scale are bit-identical in DuckDB with NO rounding tolerance.
    All-zero vectors take the amax=0 branch (codes all 0, scale 0).

    Scale: a pure narrow projection -- per-row array math in codegen,
    no shuffle, no UDF; at 100 TB this is the shape you want (the
    quantized codes are 4x smaller than float32 on the way out)."""
    e = load(spark, sf_dir, "embeddings")
    v = _to_d("embedding")
    amax = F.array_max(F.transform(v, F.abs))
    qv = F.when(
        amax == 0, F.transform(v, lambda x: F.lit(0))
    ).otherwise(
        F.transform(
            v, lambda x: F.floor(x * F.lit(127.0) / amax + F.lit(0.5))
            .cast("int"))
    )
    d = e.select("vec_id", amax.alias("amax"), qv.alias("qv"))
    return d.select(
        "vec_id",
        F.size("qv").alias("n_dims"),
        F.array_min("qv").alias("qmin"),
        F.array_max("qv").alias("qmax"),
        F.md5(F.concat_ws(
            ",", F.transform("qv", lambda x: x.cast("string")))).alias("q_md5"),
        F.when(F.col("amax") == 0, F.lit(0.0))
        .otherwise(F.col("amax") / F.lit(127.0)).alias("scale"),
    )
