"""Acceptance operator: the reference's QA comparison, in Spark.

The reference proves a migration by per-table row counts plus a
symmetric set difference over the full column list
(``COMPARE_SCHEMA`` in /root/reference/qa/sql/postgres/YADAMU_TEST.sql:
``select count(*) from (SELECT <cols> FROM src EXCEPT SELECT <cols>
FROM tgt)`` both directions; success predicates
/root/reference/src/YADAMU_QA/postgres/node/postgresQA.js:131-149).

Here: ``exceptAll`` both ways + counts. ``exceptAll`` (not ``except``)
preserves multiplicity, which is stricter than the reference's EXCEPT.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


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


def compare(source: DataFrame, target: DataFrame, columns: list[str] | None = None) -> CompareResult:
    if columns is None:
        columns = sorted(set(source.columns) & set(target.columns))
    s = source.select(*columns)
    t = target.select(*columns)
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
