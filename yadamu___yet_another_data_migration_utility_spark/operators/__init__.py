"""CDC dataflow operators."""

from .apply import BatchMetrics, apply_batch, last_lsn_dedup  # noqa: F401
