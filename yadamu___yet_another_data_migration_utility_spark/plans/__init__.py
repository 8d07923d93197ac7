"""Query catalog: every driver-checkable query/operator with its DuckDB
oracle SQL. __spark_entry__ and bench.py import from here."""

from .catalog import ORACLES, QUERIES  # noqa: F401
