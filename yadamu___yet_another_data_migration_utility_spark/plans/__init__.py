"""Query catalog: every driver-checkable query/operator with its DuckDB
oracle SQL. __spark_entry__ and bench.py import from here."""

from .catalog import ORACLES, QUERIES  # noqa: F401
from . import textops  # noqa: F401  (registers its queries into the dicts)
from . import moreops  # noqa: F401  (simhash, cosine dedup, rolling hash, staged round-trip)
from . import webtext  # noqa: F401  (url canonicalization, boilerplate scoring, pii scrub)
from . import temporal  # noqa: F401  (as-of join, sessionization)
from . import vectorops  # noqa: F401  (IVF ANN)
from . import migrate_types  # noqa: F401  (interval ISO-8601, spatial recode)
from . import tpch_more  # noqa: F401  (remaining TPC-H plan shapes)
from . import olap  # noqa: F401  (grouping sets, pivot, window frames)
from . import sketches  # noqa: F401  (HyperLogLog, Count-Min -- mergeable estimators)
