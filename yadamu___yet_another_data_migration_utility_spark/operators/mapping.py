"""Identifier mapping layer: table/column rename + case transforms.

Reference: the DBI's IDENTIFIER_MAPPINGS machinery
(/root/reference/src/YADAMU/common/yadamuDBI.js:497-653 --
loadIdentifierMappings / getIdentifierMappings / applyIdentifierMappings:
a JSON document ``{table: {tableName, columnMappings: {col: newCol}}}``
applied when metadata moves between systems, plus TABLE_NAME case
transforms for case-sensitive targets).

Spark-first re-expression: a mapping is plain data; applying it to a
DataFrame is a zero-cost projection (``select`` with aliases -- Catalyst
folds it into the scan, no shuffle, no copy). ``invert`` gives the
round-trip mapping back.

Shape::

    {
      "orders": {"tableName": "ORDERS_T",
                 "columnMappings": {"o_orderkey": "ORDER_ID"}},
      "*": {"case": "upper"}          # optional default case transform
    }
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

Mappings = dict[str, Any]


def _case(name: str, mode: str | None) -> str:
    if mode == "upper":
        return name.upper()
    if mode == "lower":
        return name.lower()
    return name


def map_table_name(mappings: Mappings | None, table: str) -> str:
    """Target-side name for ``table`` (explicit rename wins over the
    '*' case transform; unmapped names pass through)."""
    if not mappings:
        return table
    entry = mappings.get(table, {})
    if "tableName" in entry:
        return entry["tableName"]
    return _case(table, mappings.get("*", {}).get("case"))


def map_columns(df: DataFrame, mappings: Mappings | None, table: str) -> DataFrame:
    """Rename columns of ``df`` per the mapping for ``table``. Pure
    projection -- free at any scale."""
    if not mappings:
        return df
    colmap = dict(mappings.get(table, {}).get("columnMappings", {}))
    case = mappings.get("*", {}).get("case")
    cols = []
    for c in df.columns:
        new = colmap.get(c, _case(c, case))
        cols.append(F.col(c).alias(new))
    return df.select(*cols)


def invert(mappings: Mappings | None) -> Mappings:
    """Reverse mapping (target -> source), for round-trips. The '*'
    case transform inverts to the opposite case (upper <-> lower),
    matching the reference's bidirectional use
    (yadamuDBI.js:557-579)."""
    if not mappings:
        return {}
    out: Mappings = {}
    for table, entry in mappings.items():
        if table == "*":
            case = entry.get("case")
            if case in ("upper", "lower"):
                out["*"] = {"case": "lower" if case == "upper" else "upper"}
            continue
        tgt_table = entry.get("tableName", table)
        inv_entry: dict[str, Any] = {}
        if "tableName" in entry:
            inv_entry["tableName"] = table
        if entry.get("columnMappings"):
            inv_entry["columnMappings"] = {v: k for k, v in entry["columnMappings"].items()}
        out[tgt_table] = inv_entry
    return out
