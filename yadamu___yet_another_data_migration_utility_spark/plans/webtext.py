"""Webtext-pipeline operators: URL canonicalization + boilerplate scoring.

Two steps every Common-Crawl-scale training-data pipeline runs BEFORE
content dedup, completing the dedup family (exact -> minhash/simhash ->
clusters) with the *upstream* normalizations that make it effective:

- ``url_canonical_dedup``: the same page is crawled under many URL
  spellings (host-case, default port, tracking params, fragments,
  param order). Canonicalize -> group. Reference analogue: the
  identifier-normalization layer of the migration engine
  (/root/reference/src/YADAMU/common/yadamuDBI.js:497-653 normalizes
  identifiers before matching tables across vendors); here the
  identifier is the page URL.
- ``boilerplate_score``: CCNet-style repeated-segment detection --
  a shingle occurring in >= BOILER_DF distinct documents is navigation/
  footer boilerplate, not content; per-doc boilerplate ratio drives a
  keep/drop decision.

Both are pure JVM-side column algebra + one or two hash shuffles -- no
Python in the hot path, no collect, skew-free keys. Oracles replicate
the exact same string/count algebra in DuckDB SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..functions.urltools import canonical_url
from .catalog import _CDC_SQL_SRC, _register, cdc_changelog, load
from .moreops import _CC_CTES, dedup_clusters
from .textops import _DOCS_AUG_SQL, _MINHASH_SQL, _SHINGLES_SQL, docs_aug, shingles

#: a shingle present in >= this many distinct docs is boilerplate
BOILER_DF = 10
#: a doc whose boilerplate ratio reaches this is dropped
BOILER_DROP_RATIO = 0.5
#: docs under this many words are dropped by the composed keep-list
MIN_WORDS = 5

#: shingle-document-frequency scoring over a `docs_aug` CTE -- shared
#: verbatim by the boilerplate_score oracle and the composed
#: pipeline_keep_list oracle (one source of truth)
_BOILER_CTES = f"""sh AS ({_SHINGLES_SQL}),
    marked AS (
      SELECT doc_id, COUNT(*) OVER (PARTITION BY shingle) AS df_cnt FROM sh
    ),
    boiler AS (
      SELECT doc_id,
             CAST(COUNT(*) AS BIGINT) AS n_shingles,
             CAST(SUM(CASE WHEN df_cnt >= {BOILER_DF} THEN 1 ELSE 0 END) AS BIGINT)
               AS n_boiler,
             CAST(SUM(CASE WHEN df_cnt >= {BOILER_DF} THEN 1 ELSE 0 END) AS DOUBLE)
               / COUNT(*) AS boiler_ratio
      FROM marked GROUP BY doc_id
    )"""

# ======================================================================
# URL canonicalization
# ======================================================================

#: deterministic messy-URL fixture: five spellings of each page URL the
#: way crawlers actually see them (seeded by event_id, no external data)
_MESSY_URLS_SQL = f"""
      SELECT event_id,
             CASE CAST(event_id % 5 AS INTEGER)
               WHEN 0 THEN base
               WHEN 1 THEN concat(upper(regexp_extract(base, '^[a-z]+://[^/]*')),
                                  substr(base, length(regexp_extract(base, '^[a-z]+://[^/]*')) + 1))
               WHEN 2 THEN concat(base, '?utm_source=feed&utm_campaign=w',
                                  CAST(event_id % 3 AS VARCHAR))
               WHEN 3 THEN concat(base, '?b=2&a=1&utm_medium=rss')
               ELSE replace(base, '.example.com/', '.example.com:443/') || '#frag'
             END AS raw_url
      FROM (SELECT event_id,
                   concat('https://site', CAST(user_id % 10 AS VARCHAR),
                          '.example.com/u/', CAST(user_id AS VARCHAR)) AS base
            FROM events)
"""

_CANON_SQL = f"""
    WITH messy AS ({_MESSY_URLS_SQL}),
    defrag AS (
      SELECT raw_url, regexp_replace(raw_url, '#.*$', '') AS u1 FROM messy
    ),
    lowhost AS (
      SELECT raw_url,
             regexp_replace(
               concat(lower(regexp_extract(u1, '^[A-Za-z]+://[^/?#]*')),
                      substr(u1, length(regexp_extract(u1, '^[A-Za-z]+://[^/?#]*')) + 1)),
               '^(https://[^/:?#]*):443([/?]|$)', '\\1\\2') AS u2
      FROM defrag
    ),
    parts AS (
      SELECT raw_url,
             string_split(u2, '?')[1] AS path,
             CASE WHEN len(string_split(u2, '?')) > 1
                  THEN string_split(u2, '?')[2] ELSE '' END AS q
      FROM lowhost
    ),
    cleaned AS (
      SELECT raw_url, path,
             regexp_replace(
               regexp_replace(q, '(^|&)(utm_[a-z]+|fbclid|gclid)=[^&]*', '', 'g'),
               '^&+', '') AS q2
      FROM parts
    ),
    canon AS (
      SELECT raw_url,
             CASE WHEN q2 = '' THEN path
                  ELSE concat(path, '?',
                              array_to_string(list_sort(string_split(q2, '&')), '&'))
             END AS canonical_url
      FROM cleaned
    )
    SELECT canonical_url,
           CAST(COUNT(*) AS BIGINT) AS n_raw,
           CAST(COUNT(DISTINCT raw_url) AS BIGINT) AS n_variants,
           MIN(raw_url) AS sample_raw
    FROM canon
    GROUP BY canonical_url
"""


@_register("url_canonical_dedup", _CANON_SQL)
def url_canonical_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL canonicalization + dedup over the deterministic messy-URL
    fixture (5 crawler spellings per page URL, seeded by event_id).

    Semantics check built into the fixture: tracking params vanish
    (variant 2 collapses into the bare URL) while REAL params survive
    but are order-normalized (variant 3 stays a distinct canonical URL
    with ``?a=1&b=2``) -- canonicalization must not conflate the two.

    Scale: the whole canonicalizer is one narrow projection of string
    builtins (regexp_replace/lower/split/array_sort -- all codegen'd
    JVM-side, zero Python), then ONE hash shuffle on canonical_url with
    map-side partial aggregation. Canonical URLs are near-unique ->
    uniform keys, no skew; at 100 TB this is a scan-shaped job."""
    ev = load(spark, sf_dir, "events").select("event_id", "user_id")
    base = F.concat(
        F.lit("https://site"),
        (F.col("user_id") % 10).cast("string"),
        F.lit(".example.com/u/"),
        F.col("user_id").cast("string"),
    )
    m = (F.col("event_id") % 5).cast("int")
    upper_pre = F.regexp_extract(base, "^[a-z]+://[^/]*", 0)
    raw = (
        F.when(m == 0, base)
        .when(m == 1, F.concat(F.upper(upper_pre), F.expr("substr(base, length(pre0) + 1)")))
        .when(m == 2, F.concat(base, F.lit("?utm_source=feed&utm_campaign=w"),
                               (F.col("event_id") % 3).cast("string")))
        .when(m == 3, F.concat(base, F.lit("?b=2&a=1&utm_medium=rss")))
        .otherwise(F.concat(F.regexp_replace(base, "\\.example\\.com/", ".example.com:443/"),
                            F.lit("#frag")))
    )
    messy = ev.withColumn("base", base).withColumn("pre0", upper_pre).select(
        raw.alias("raw_url")
    )
    return (
        messy.select("raw_url", canonical_url(F.col("raw_url")).alias("canonical_url"))
        .groupBy("canonical_url")
        .agg(
            F.count(F.lit(1)).alias("n_raw"),
            F.countDistinct("raw_url").alias("n_variants"),
            F.min("raw_url").alias("sample_raw"),
        )
    )


# ======================================================================
# Boilerplate scoring (CCNet-style repeated-segment detection)
# ======================================================================

_BOILER_SQL = f"""
    WITH docs_aug AS ({_DOCS_AUG_SQL}),
    {_BOILER_CTES}
    SELECT doc_id, n_shingles, n_boiler, boiler_ratio,
           boiler_ratio < {BOILER_DROP_RATIO} AS keep
    FROM boiler
"""


_KEEP_LIST_SQL = f"""
    WITH RECURSIVE
    docs_aug AS ({_DOCS_AUG_SQL}),
    pairs AS ({{minhash}}),
    {_CC_CTES},
    {_BOILER_CTES},
    base AS (
      SELECT doc_id,
             MIN(doc_id) OVER (PARTITION BY md5(text)) AS keep_id,
             len(string_split(text, ' ')) AS n_words
      FROM docs_aug
    ),
    scored AS (
      SELECT e.doc_id,
             CASE WHEN e.doc_id != e.keep_id THEN 'exact_dup'
                  WHEN c.cluster IS NOT NULL AND c.cluster != e.doc_id THEN 'near_dup'
                  WHEN b.boiler_ratio >= {BOILER_DROP_RATIO} THEN 'boilerplate'
                  WHEN e.n_words < {MIN_WORDS} THEN 'too_short'
             END AS reason
      FROM base e
      LEFT JOIN cc c ON c.doc_id = e.doc_id
      LEFT JOIN boiler b ON b.doc_id = e.doc_id
    )
    SELECT doc_id, reason IS NULL AS keep, reason FROM scored
"""


@_register(
    "pipeline_keep_list",
    _KEEP_LIST_SQL.format(minhash=_MINHASH_SQL),
)
def pipeline_keep_list(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The end-artifact of the training-data pipeline: ONE row per doc
    with a keep/drop decision and the winning drop reason, composing
    the dedup + quality family in fixed precedence:

      exact_dup (not the min-id copy of byte-identical text)
      > near_dup (MinHash cluster member, not the cluster canonical)
      > boilerplate (BOILER_DROP_RATIO+ of shingles corpus-repeated)
      > too_short (under MIN_WORDS words)

    This is the query a 100 TB pipeline materializes and then
    anti-joins the corpus against; pairs/clusters/scores alone are
    intermediates. Scale: reuses the component operators' shapes
    (hash shuffles + one iterative label propagation), then three
    LEFT equi-joins on doc_id -- uniform keys, broadcastable tails.
    Oracle: the same composition as one recursive-CTE SQL document,
    assembled from the SAME shared fragments (_CC_CTES, _BOILER_CTES)
    the component oracles use."""
    d = docs_aug(spark, sf_dir)
    w = W.partitionBy(F.md5("text"))
    base = d.select(
        "doc_id",
        F.min("doc_id").over(w).alias("keep_id"),
        F.size(F.split(F.col("text"), " ")).alias("n_words"),
    )
    clusters = dedup_clusters(spark, sf_dir).select("doc_id", "cluster")
    boiler = boilerplate_score(spark, sf_dir).select("doc_id", "boiler_ratio")
    scored = (
        base.join(clusters, "doc_id", "left")
        .join(boiler, "doc_id", "left")
        .select(
            "doc_id",
            F.when(F.col("doc_id") != F.col("keep_id"), "exact_dup")
            .when(
                F.col("cluster").isNotNull() & (F.col("cluster") != F.col("doc_id")),
                "near_dup",
            )
            .when(F.col("boiler_ratio") >= BOILER_DROP_RATIO, "boilerplate")
            .when(F.col("n_words") < MIN_WORDS, "too_short")
            .alias("reason"),
        )
    )
    return scored.select("doc_id", F.col("reason").isNull().alias("keep"), "reason")


# ======================================================================
# Hot-domain detection (skew diagnosis)
# ======================================================================


@_register(
    "hot_domains",
    f"""
    WITH chg AS ({_CDC_SQL_SRC}),
    per_host AS (
      SELECT regexp_extract(url, '^[a-z]+://([^/:?#]*)', 1) AS host,
             COUNT(*) AS n_events,
             COUNT(DISTINCT url) AS n_pages,
             MAX(lsn) AS last_lsn
      FROM chg
      GROUP BY 1
    ),
    tot AS (SELECT SUM(n_events) AS total FROM per_host)
    SELECT host, n_events, n_pages, last_lsn,
           ROUND(CAST(n_events AS DOUBLE) / total, 6) AS share,
           CAST(n_events AS DOUBLE) / total > 0.05 AS is_hot
    FROM per_host, tot
    ORDER BY n_events DESC, host
    """,
)
def hot_domains(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain event skew report over the changelog: events, distinct
    pages, traffic share, and an ``is_hot`` flag at the 5% share the
    engine's salting docs use. This is the DIAGNOSIS query feeding
    ``apply_batch(salt_buckets=)`` -- at web scale a handful of domains
    dominate the crawl, and this tells the operator which keys need the
    two-phase salted reduction. Scale: one hash shuffle on host (the
    skewed key itself, but the aggregate is algebraic so map-side
    combine flattens it), plus a broadcast of the 1-row total."""
    chg = cdc_changelog(spark, sf_dir)
    per_host = chg.groupBy(
        F.regexp_extract(F.col("url"), "^[a-z]+://([^/:?#]*)", 1).alias("host")
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("url").alias("n_pages"),
        F.max("lsn").alias("last_lsn"),
    )
    tot = per_host.agg(F.sum("n_events").alias("total"))
    share = F.col("n_events").cast("double") / F.col("total")
    return (
        per_host.crossJoin(F.broadcast(tot))
        .select(
            "host", "n_events", "n_pages", "last_lsn",
            F.round(share, 6).alias("share"),
            (share > 0.05).alias("is_hot"),
        )
        .orderBy(F.col("n_events").desc(), "host")
    )


# ======================================================================
# PII scrubbing
# ======================================================================

#: RE2-safe AND java.util.regex-safe patterns (char classes, bounded
#: quantifiers, \b word boundaries -- no lookaround, no backrefs), so
#: Spark and DuckDB match byte-identically
_PII_EMAIL = r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}"
_PII_PHONE = r"\b555-[0-9]{4}\b"
_PII_IP = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"

#: deterministic PII fixture: 3 of every 4 docs get a synthetic email /
#: phone / IP appended (seeded by doc_id -- no external data), so the
#: scrubber has real work at any SF and a known ground truth
_PII_AUG_SQL = """
      SELECT doc_id,
             concat(text,
               CASE CAST(doc_id % 4 AS INTEGER)
                 WHEN 0 THEN concat(' contact user', CAST(doc_id AS VARCHAR),
                                    '@example.com for details')
                 WHEN 1 THEN concat(' call 555-',
                                    lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0'),
                                    ' today')
                 WHEN 2 THEN concat(' from host 10.', CAST(doc_id % 256 AS VARCHAR),
                                    '.0.', CAST((doc_id * 3) % 256 AS VARCHAR), ' net')
                 ELSE ''
               END) AS text
      FROM documents
"""

_PII_SQL = f"""
    WITH aug AS ({_PII_AUG_SQL}),
    counted AS (
      SELECT doc_id, text,
             regexp_replace(
               regexp_replace(
                 regexp_replace(text, '{_PII_EMAIL}', '<EMAIL>', 'g'),
                 '{_PII_PHONE}', '<PHONE>', 'g'),
               '{_PII_IP}', '<IP>', 'g') AS scrubbed
      FROM aug
    ),
    tallied AS (
      SELECT doc_id, text, scrubbed,
             len(regexp_extract_all(scrubbed, '<EMAIL>')) AS n_emails,
             len(regexp_extract_all(scrubbed, '<PHONE>')) AS n_phones,
             len(regexp_extract_all(scrubbed, '<IP>')) AS n_ips
      FROM counted
    )
    SELECT doc_id, n_emails, n_phones, n_ips,
           n_emails + n_phones + n_ips AS n_redacted,
           length(text) - length(scrubbed) AS len_delta,
           md5(scrubbed) AS scrubbed_fp
    FROM tallied
"""


@_register("pii_scrub", _PII_SQL)
def pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction over web text: count + replace emails, phone
    numbers and IPv4 addresses with typed placeholder tokens, report
    per-doc redaction counts and the md5 of the scrubbed text (the
    hash proves the REPLACEMENT output matches, not just the counts).
    Input is the deterministic PII-augmented corpus (_PII_AUG_SQL).

    Scale: a pure narrow projection -- regexp builtins run codegen'd
    JVM-side on the scan, no shuffle, no Python; patterns are in the
    RE2/Java common subset so the same bytes match on every engine."""
    d = load(spark, sf_dir, "documents")
    m = (F.col("doc_id") % 4).cast("int")
    tail = (
        F.when(m == 0, F.concat(F.lit(" contact user"),
                                F.col("doc_id").cast("string"),
                                F.lit("@example.com for details")))
        .when(m == 1, F.concat(F.lit(" call 555-"),
                               F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
                               F.lit(" today")))
        .when(m == 2, F.concat(F.lit(" from host 10."),
                               (F.col("doc_id") % 256).cast("string"),
                               F.lit(".0."),
                               ((F.col("doc_id") * 3) % 256).cast("string"),
                               F.lit(" net")))
        .otherwise(F.lit(""))
    )
    text = F.concat(F.col("text"), tail)

    scrubbed = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(text, _PII_EMAIL, "<EMAIL>"),
            _PII_PHONE, "<PHONE>"),
        _PII_IP, "<IP>")

    # counts tally the placeholder tokens in the SCRUBBED text, so they
    # equal the replacements actually performed even when patterns
    # overlap on the raw text (an email wrapping an IP-looking host is
    # consumed by the email pass and counted once, as an email)
    def n_tokens(tok: str) -> F.Column:
        return F.size(F.regexp_extract_all(F.col("_scrubbed"), F.lit(tok), F.lit(0)))

    n_em, n_ph, n_ip = n_tokens("<EMAIL>"), n_tokens("<PHONE>"), n_tokens("<IP>")
    return d.withColumn("_scrubbed", scrubbed).select(
        "doc_id",
        n_em.alias("n_emails"),
        n_ph.alias("n_phones"),
        n_ip.alias("n_ips"),
        (n_em + n_ph + n_ip).alias("n_redacted"),
        (F.length(text) - F.length(F.col("_scrubbed"))).alias("len_delta"),
        F.md5(F.col("_scrubbed")).alias("scrubbed_fp"),
    )


@_register("boilerplate_score", _BOILER_SQL)
def boilerplate_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document boilerplate ratio: the fraction of a doc's distinct
    3-word shingles that occur in >= BOILER_DF distinct documents
    (CCNet's repeated-paragraph heuristic, shingle-granular because the
    synthetic corpus has no line structure). ``keep`` drops docs that
    are mostly boilerplate.

    Scale: shingle document-frequency via a COUNT window partitioned by
    shingle -- ONE hash shuffle on the shingle key (uniform: md5-like
    text), no self-join, no second scan of the corpus; then a groupBy
    doc_id (second shuffle, uniform). Both aggregations are algebraic
    (map-side partial). The df-count table is never materialized
    driver-side. At 100 TB you'd pre-aggregate df counts once per
    corpus snapshot and broadcast-join the tiny >=DF tail instead."""
    sh = shingles(docs_aug(spark, sf_dir))
    marked = sh.select(
        "doc_id", F.count(F.lit(1)).over(W.partitionBy("shingle")).alias("df_cnt")
    )
    boiler = F.sum((F.col("df_cnt") >= BOILER_DF).cast("long"))
    ratio = F.col("n_boiler").cast("double") / F.col("n_shingles")
    return (
        marked.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            boiler.alias("n_boiler"),
        )
        .select(
            "doc_id",
            "n_shingles",
            "n_boiler",
            ratio.alias("boiler_ratio"),
            (ratio < BOILER_DROP_RATIO).alias("keep"),
        )
    )
