"""Round-2 training-data operators: SimHash, embedding-cosine near-dup,
rolling-hash fingerprints, BPE-ish token counting, staged-file round-trip.

Completes the dedup family (exact / minhash-LSH / n-gram-jaccard live in
textops.py; SimHash + embedding-cosine here) and the text-analysis
family (BPE-ish tokenizer, rolling hash). Every oracle derives hashes
from md5 only (identical in Spark and DuckDB) and spells float math with
the same operation order in both engines.

Scale notes:
- simhash: per-doc signature is one explode + groupBy (partial-agg
  friendly: 32 conditional SUMs); candidate pairs via 16-bit band
  self-join (uniform keys, no skew), hamming verify on candidates only.
- embedding cosine near-dup: probe-set x corpus broadcast join -- the
  standard "dedup new shard against index" shape; full corpus-x-corpus
  would use the LSH bucketer (functions/similarity.py).
- rolling hash: pure scan, zero shuffle, fold runs in Catalyst.
- staged round-trip: proves the CSV encode/decode path is lossless for
  timestamps/decimals/strings -- YADAMU's file-format fidelity contract
  (/root/reference/src/YADAMU/common/yadamuWriter.js:346-465 CSV
  transformations; /root/reference/src/YADAMU/loader/node/csvTransform.js
  :45-57 read side).
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from .catalog import _CDC_SQL_SRC, _register, cdc_changelog, load, _sum_dbl, _dec
from .textops import _DOCS_AUG_SQL, _SHINGLES_SQL, _MD5_LONG_SQL, _md5_long, docs_aug, shingles

# ======================================================================
# SimHash dedup (32-bit; bands of 16 for candidates; hamming <= 6)
# ======================================================================

_SIMHASH_BITS = 32
_HAMMING_MAX = 6

_SIMHASH_BIT_SUMS_SQL = ",\n             ".join(
    f"SUM(CASE WHEN (mh >> {b}) & 1 = 1 THEN 1 ELSE -1 END) AS s{b}"
    for b in range(_SIMHASH_BITS)
)
_SIMHASH_ASSEMBLE_SQL = " + ".join(
    f"(CASE WHEN s{b} >= 0 THEN {1 << b}::BIGINT ELSE 0 END)" for b in range(_SIMHASH_BITS)
)

_SIMHASH_SIG_SQL = f"""
    WITH docs_aug AS ({_DOCS_AUG_SQL}),
    sh AS ({_SHINGLES_SQL}),
    hashed AS (
      SELECT doc_id, {_MD5_LONG_SQL.format(x="shingle")} AS mh FROM sh
    ),
    bitsums AS (
      SELECT doc_id,
             {_SIMHASH_BIT_SUMS_SQL}
      FROM hashed GROUP BY doc_id
    )
    SELECT doc_id, ({_SIMHASH_ASSEMBLE_SQL}) AS simhash FROM bitsums
"""


def _simhash_sig(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, simhash:long) -- 32-bit simhash over 3-gram shingles.
    Sign convention pinned: bit set iff sum(+-1) >= 0."""
    sh = shingles(docs_aug(spark, sf_dir))
    hashed = sh.select("doc_id", _md5_long(F.col("shingle")).alias("mh"))
    sums = hashed.groupBy("doc_id").agg(
        *[
            F.sum(
                F.when(F.shiftright(F.col("mh"), b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
            ).alias(f"s{b}")
            for b in range(_SIMHASH_BITS)
        ]
    )
    simhash = None
    for b in range(_SIMHASH_BITS):
        term = F.when(F.col(f"s{b}") >= 0, F.lit(1 << b).cast("long")).otherwise(F.lit(0).cast("long"))
        simhash = term if simhash is None else simhash + term
    return sums.select("doc_id", simhash.alias("simhash"))


@_register("simhash_signatures", _SIMHASH_SIG_SQL)
def simhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document 32-bit SimHash signature (the fingerprint table a
    100 TB dedup pipeline materializes once and joins against)."""
    return _simhash_sig(spark, sf_dir)


@_register(
    "dedup_simhash",
    f"""
    WITH sig AS ({_SIMHASH_SIG_SQL}),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc1, b.doc_id AS doc2,
             a.simhash AS h1, b.simhash AS h2
      FROM sig a JOIN sig b
        ON a.doc_id < b.doc_id
       AND ((a.simhash >> 16) = (b.simhash >> 16)
            OR (a.simhash & 65535) = (b.simhash & 65535))
    )
    SELECT doc1, doc2, bit_count(xor(h1, h2)) AS hamming
    FROM cand
    WHERE bit_count(xor(h1, h2)) <= {_HAMMING_MAX}
    """,
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs: 16-bit band self-join for candidates,
    hamming(xor) <= 6 verify. Scale: band keys are md5-uniform (no
    skew); the verify only touches band-colliding pairs."""
    sig = _simhash_sig(spark, sf_dir)
    a, b = sig.alias("a"), sig.alias("b")
    hi = lambda c: F.shiftright(F.col(c), 16)  # noqa: E731
    lo = lambda c: F.col(c).bitwiseAND(F.lit(65535))  # noqa: E731
    cand = (
        a.join(
            b,
            (F.col("a.doc_id") < F.col("b.doc_id"))
            & ((hi("a.simhash") == hi("b.simhash")) | (lo("a.simhash") == lo("b.simhash"))),
        )
        .select(
            F.col("a.doc_id").alias("doc1"), F.col("b.doc_id").alias("doc2"),
            F.col("a.simhash").alias("h1"), F.col("b.simhash").alias("h2"),
        )
        .distinct()
    )
    hamming = F.bit_count(F.col("h1").bitwiseXOR(F.col("h2")))
    return cand.filter(hamming <= _HAMMING_MAX).select(
        "doc1", "doc2", hamming.alias("hamming")
    )


# ======================================================================
# Embedding-cosine near-dup (probe set vs corpus)
# ======================================================================


@_register(
    "dedup_embedding_cosine",
    """
    WITH p AS (SELECT vec_id AS probe_id, CAST(embedding AS DOUBLE[]) AS pe
               FROM embeddings WHERE vec_id % 10 = 0),
    t AS (SELECT vec_id AS cand_id, CAST(embedding AS DOUBLE[]) AS te FROM embeddings)
    SELECT probe_id, cand_id, ROUND(sim, 4) AS sim_r
    FROM (
      SELECT probe_id, cand_id,
             list_sum(list_transform(list_zip(pe, te), x -> x[1] * x[2]))
               / (sqrt(list_sum(list_transform(pe, v -> v * v)))
                  * sqrt(list_sum(list_transform(te, v -> v * v)))) AS sim
      FROM p, t WHERE probe_id < cand_id
    )
    WHERE sim >= 0.35
    """,
)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup: probe shard (every 10th vector) against the
    corpus, keep pairs with cosine >= 0.35 (synthetic embeddings are near-orthogonal; 0.35 is ~p99.9 of the pair-sim distribution). Scale: probes broadcast;
    one corpus scan; dot products in Catalyst (zip_with/aggregate)."""
    e = load(spark, sf_dir, "embeddings")
    to_d = lambda c: F.transform(F.col(c), lambda x: x.cast("double"))  # noqa: E731
    p = e.filter(F.col("vec_id") % 10 == 0).select(
        F.col("vec_id").alias("probe_id"), to_d("embedding").alias("pe")
    )
    t = e.select(F.col("vec_id").alias("cand_id"), to_d("embedding").alias("te"))

    def dot(x, y):
        return F.aggregate(F.zip_with(x, y, lambda a, b: a * b), F.lit(0.0), lambda s, v: s + v)

    def norm(x):
        return F.sqrt(F.aggregate(F.transform(x, lambda a: a * a), F.lit(0.0), lambda s, v: s + v))

    sim = dot(F.col("pe"), F.col("te")) / (norm(F.col("pe")) * norm(F.col("te")))
    return (
        t.join(F.broadcast(p), F.col("probe_id") < F.col("cand_id"))
        .select("probe_id", "cand_id", sim.alias("sim"))
        .filter(F.col("sim") >= 0.35)
        .select("probe_id", "cand_id", F.round("sim", 4).alias("sim_r"))
    )


# ======================================================================
# Rolling-hash fingerprint + BPE-ish token count
# ======================================================================

_ROLL_M = 2_147_483_647
_WORD_M = 1_000_003


@_register(
    "doc_rolling_hash",
    f"""
    SELECT doc_id,
           list_reduce(
             list_prepend(0::BIGINT,
               list_transform(string_split(lower(text), ' '),
                              w -> {_MD5_LONG_SQL.format(x="w")} % {_WORD_M})),
             (acc, x) -> (acc * 31 + x) % {_ROLL_M}) AS rolling_fp,
           len(string_split(lower(text), ' ')) AS n_words
    FROM documents
    """,
)
def doc_rolling_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-sensitive polynomial rolling hash over the word sequence
    (winnowing-style fingerprint; unlike md5-of-text it supports
    incremental/windowed variants). Pure scan, fold runs in Catalyst."""
    d = load(spark, sf_dir, "documents")
    words = F.split(F.lower(F.col("text")), " ")
    hashed = F.transform(words, lambda w: _md5_long(w) % _WORD_M)
    fp = F.aggregate(
        hashed, F.lit(0).cast("long"), lambda acc, x: (acc * 31 + x) % _ROLL_M
    )
    return d.select(
        "doc_id", fp.alias("rolling_fp"), F.size(words).alias("n_words")
    )


@_register(
    "token_count_bpe",
    """
    SELECT doc_id,
           len(string_split(text, ' ')) AS ws_tokens,
           len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS bpe_tokens,
           ROUND(CAST(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS DOUBLE)
                 / len(string_split(text, ' ')), 6) AS tokens_per_word
    FROM documents
    """,
)
def token_count_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting two ways: whitespace split and a BPE-ish regex
    (letter runs | digit runs | single punctuation) -- the
    tokens-per-word ratio is the standard tokenizer-cost estimator."""
    d = load(spark, sf_dir, "documents")
    ws = F.size(F.split(F.col("text"), " "))
    bpe = F.size(
        F.regexp_extract_all(F.lower(F.col("text")), F.lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), F.lit(0))
    )
    return d.select(
        "doc_id",
        ws.alias("ws_tokens"),
        bpe.alias("bpe_tokens"),
        F.round(bpe.cast("double") / ws, 6).alias("tokens_per_word"),
    )


# ======================================================================
# SCD2 (type-2 history) derivation from the change log
# ======================================================================


@_register(
    "cdc_scd2_history",
    f"""
    WITH chg AS ({_CDC_SQL_SRC})
    SELECT url, lsn, op, event_type, value,
           ts AS valid_from,
           LEAD(ts) OVER w AS valid_to,
           (LEAD(ts) OVER w IS NULL AND op <> 'D') AS is_current
    FROM chg
    WINDOW w AS (PARTITION BY url ORDER BY lsn)
    """,
)
def cdc_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-2 slowly-changing-dimension history: every change event
    becomes a version row valid from its own timestamp until the NEXT
    event's timestamp (open-ended + flagged current for the last
    non-delete). The standard lake-side CDC product next to the
    last-state table (the reference replicates state only -- history is
    the CDC reframing's addition, like W5). Scale: one shuffle by key +
    per-key sort for LEAD; no cross-key ordering, so the window
    parallelizes per url and spills safely."""
    chg = cdc_changelog(spark, sf_dir)
    w = W.partitionBy("url").orderBy("lsn")
    nxt = F.lead("ts").over(w)
    return chg.select(
        "url", "lsn", "op", "event_type", "value",
        F.col("ts").alias("valid_from"),
        nxt.alias("valid_to"),
        (nxt.isNull() & (F.col("op") != "D")).alias("is_current"),
    )


# ======================================================================
# Staged file round-trip (UNLOAD -> LOAD -> aggregate): the YADAMU
# file-format fidelity contract as an oracle-checked query
# ======================================================================


@_register(
    "staged_roundtrip_csv",
    """
    SELECT o_orderpriority,
           COUNT(*) AS n,
           CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(15,2))), 4) AS DOUBLE) AS sum_total,
           MIN(o_orderdate) AS min_date,
           MAX(o_orderdate) AS max_date,
           COUNT(DISTINCT o_custkey) AS n_cust
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def staged_roundtrip_csv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNLOAD orders to a staged CSV dataset (control file + data files,
    sources/staged.py), LOAD it back, aggregate. The oracle aggregates
    the ORIGINAL parquet -- matching proves the CSV encode/decode is
    lossless for timestamps, decimals and strings (YADAMU's round-trip
    acceptance applied to the file sink, SURVEY.md §2.a W6/S5)."""
    from ..sources.staged import load_staged, unload

    o = load(spark, sf_dir, "orders")
    root = tempfile.mkdtemp(prefix="staged_rt_")
    unload({"orders": o}, os.path.join(root, "ds"), fmt="csv")
    back = load_staged(spark, os.path.join(root, "ds"))["orders"]
    return back.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        _sum_dbl(_dec("o_totalprice")).alias("sum_total"),
        F.min("o_orderdate").alias("min_date"),
        F.max("o_orderdate").alias("max_date"),
        F.countDistinct("o_custkey").alias("n_cust"),
    )
