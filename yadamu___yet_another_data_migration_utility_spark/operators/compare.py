"""Acceptance operator: the reference's QA comparison, in Spark.

The reference proves a migration by per-table row counts plus a
symmetric set difference over the full column list
(``COMPARE_SCHEMA`` in /root/reference/qa/sql/postgres/YADAMU_TEST.sql:
``select count(*) from (SELECT <cols> FROM src EXCEPT SELECT <cols>
FROM tgt)`` both directions; success predicates
/root/reference/src/YADAMU_QA/postgres/node/postgresQA.js:131-149).

Here: ``exceptAll`` both ways + counts. ``exceptAll`` (not ``except``)
preserves multiplicity, which is stricter than the reference's EXCEPT.

Normalization rules (reference: the rules object passed to every
vendor's SCHEMA_COMPARE --
/root/reference/src/YADAMU_QA/common/node/yadamuQA.js:327-357:
TIMESTAMP_PRECISION, SPATIAL_PRECISION/double rounding,
EMPTY_STRING_IS_NULL, INFINITY_IS_NULL/DOUBLE_PRECISION; invocation
/root/reference/qa/sql/postgres/SCHEMA_COMPARE.sql:4). A target engine
that stores less precision than the source is still a CORRECT
migration; these options truncate both sides to the shared precision
before differencing:

- ``timestamp_precision=p``: truncate timestamp columns to ``p``
  fractional-second digits (0..6);
- ``double_precision=p``: round float/double columns to ``p`` decimal
  digits;
- ``empty_string_is_null``: treat '' as NULL in string columns (Oracle
  semantics -- the reference's EMPTY_STRING_IS_NULL rule);
- ``infinity_is_null``: map NaN/±Infinity to NULL in float/double
  columns (engines that cannot store non-finite doubles);
- ``ordered_json``: canonicalize string columns holding JSON documents
  (recursive key sort, minimal separators) before differencing -- two
  stores that serialize the same document with different key order or
  whitespace still compare equal, while any VALUE drift (including
  number-vs-string type drift) still fails. The reference's
  ORDERED_JSON rule (yadamuQA.js:327-357; vendors that re-serialize
  JSON columns in their own key order);
- ``canonical_xml``: canonicalize string columns holding XML documents
  (W3C C14N via the stdlib ``xml.etree.ElementTree.canonicalize``):
  attribute order and self-closing-vs-empty-pair serialization drift
  passes, text/attribute VALUE drift still fails. The reference's XSLT
  canonicalization rule (yadamuQA.js:327-357 XML_COMPARISON_RULE).

Normalization runs on both DataFrames symmetrically, so the compare
stays one pair of exceptAll shuffles regardless of rules. Every rule
is JVM-side except ``ordered_json``/``canonical_xml``, which need real
recursive canonicalizers: Arrow-batched pandas UDFs (QA acceptance
path, one pass per compare -- not a per-event hot path; the reference
likewise canonicalizes in its host language for these rules).
"""

from __future__ import annotations

from dataclasses import dataclass

import pandas as pd  # module-level: the pandas_udf type hints resolve here
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


@dataclass
class CompareResult:
    source_rows: int
    target_rows: int
    missing_rows: int  # in source, not in target
    extra_rows: int  # in target, not in source

    @property
    def ok(self) -> bool:
        return (
            self.source_rows == self.target_rows
            and self.missing_rows == 0
            and self.extra_rows == 0
        )


def _canonical_json_udf():
    """Arrow-batched canonicalizer: values that parse as a JSON object
    or array are re-serialized with recursively sorted keys + minimal
    separators; scalars and non-JSON strings pass through UNCHANGED (so
    the rule can never equate two genuinely different plain strings)."""
    import json

    from pyspark.sql.functions import pandas_udf

    def canon_one(v):
        if v is None:
            return None
        t = v.strip()
        if not t or t[0] not in "[{":
            return v
        try:
            obj = json.loads(t)
        except ValueError:
            return v
        return json.dumps(obj, sort_keys=True, separators=(",", ":"))

    @pandas_udf("string")
    def canon(s: pd.Series) -> pd.Series:
        return s.map(canon_one)

    return canon


def _canonical_xml_udf():
    """Arrow-batched W3C-C14N canonicalizer: values that parse as XML
    are re-serialized canonically (attributes sorted, whitespace-in-tag
    and empty-element serialization normalized); non-XML strings pass
    through UNCHANGED."""
    from xml.etree.ElementTree import canonicalize

    from pyspark.sql.functions import pandas_udf

    def canon_one(v):
        if v is None:
            return None
        t = v.strip()
        if not t.startswith("<"):
            return v
        try:
            return canonicalize(xml_data=t)
        except Exception:  # noqa: BLE001 -- malformed XML compares raw
            return v

    @pandas_udf("string")
    def canon(s: pd.Series) -> pd.Series:
        return s.map(canon_one)

    return canon


def _normalize(
    df: DataFrame,
    columns: list[str],
    timestamp_precision: int | None,
    double_precision: int | None,
    empty_string_is_null: bool,
    infinity_is_null: bool,
    ordered_json: bool = False,
    canonical_xml: bool = False,
) -> DataFrame:
    by_name = {f.name: f.dataType for f in df.schema.fields}
    canon = _canonical_json_udf() if ordered_json else None
    canon_x = _canonical_xml_udf() if canonical_xml else None
    cols = []
    for name in columns:
        c = F.col(name)
        dt = by_name[name]
        if timestamp_precision is not None and isinstance(
            dt, (T.TimestampType, T.TimestampNTZType)
        ):
            # truncate (not round) to p fractional digits -- matches the
            # reference's "compare at the coarser precision" semantics.
            if isinstance(dt, T.TimestampNTZType):
                # TIMESTAMP_NTZ (what Spark 4 reads back from parquet --
                # see sources/staged.py): truncate on the STRING form,
                # which is zone-free. Anything touching the epoch (even
                # date_trunc) coerces NTZ through the session zone and
                # collapses values inside a DST spring-forward gap
                # (tested: test_compare_ntz_truncation_dst_gap_safe).
                p = min(timestamp_precision, 6)
                ln = 19 if p <= 0 else 20 + p
                c = c.cast("string").substr(1, ln).cast("timestamp_ntz")
            else:
                step = 10 ** (6 - timestamp_precision)
                c = F.timestamp_micros(
                    (F.floor(F.unix_micros(c) / step) * step).cast("long")
                )
        if double_precision is not None and isinstance(dt, (T.DoubleType, T.FloatType)):
            c = F.round(c.cast("double"), double_precision)
        if infinity_is_null and isinstance(dt, (T.DoubleType, T.FloatType)):
            c = F.when(F.isnan(c) | (F.abs(c) == float("inf")), F.lit(None)).otherwise(c)
        if empty_string_is_null and isinstance(dt, T.StringType):
            c = F.when(F.length(c) == 0, F.lit(None)).otherwise(c)
        if canon is not None and isinstance(dt, T.StringType):
            c = canon(c)
        if canon_x is not None and isinstance(dt, T.StringType):
            c = canon_x(c)
        cols.append(c.alias(name))
    return df.select(*cols)


def compare(
    source: DataFrame,
    target: DataFrame,
    columns: list[str] | None = None,
    timestamp_precision: int | None = None,
    double_precision: int | None = None,
    empty_string_is_null: bool = False,
    infinity_is_null: bool = False,
    ordered_json: bool = False,
    canonical_xml: bool = False,
) -> CompareResult:
    if columns is None:
        columns = sorted(set(source.columns) & set(target.columns))
    if timestamp_precision is not None and not (0 <= timestamp_precision <= 6):
        raise ValueError("timestamp_precision must be in 0..6")
    s = _normalize(source, columns, timestamp_precision, double_precision,
                   empty_string_is_null, infinity_is_null, ordered_json,
                   canonical_xml)
    t = _normalize(target, columns, timestamp_precision, double_precision,
                   empty_string_is_null, infinity_is_null, ordered_json,
                   canonical_xml)
    return CompareResult(
        source_rows=s.count(),
        target_rows=t.count(),
        missing_rows=s.exceptAll(t).count(),
        extra_rows=t.exceptAll(s).count(),
    )


def changelog_oracle(changes: DataFrame, key: str = "url", lsn_col: str = "lsn",
                     op_col: str = "op") -> DataFrame:
    """Trivially-correct batch oracle for the final table state: last
    event per key over the WHOLE changelog, drop keys whose final op is
    'D' (FIXTURES.md F6). Used only in tests -- the engine never sees
    the full log at once."""
    payload = [c for c in changes.columns if c != key]
    return (
        changes.groupBy(key)
        .agg(F.max_by(F.struct(*payload), F.col(lsn_col)).alias("_w"))
        .select(key, "_w.*")
        .filter(F.col(op_col) != "D")
        .drop(op_col)
        .withColumnRenamed(lsn_col, "_lsn")
    )
