"""Deterministic synthetic fixtures (seeded, pure Spark, no external data)."""

from .changelog import PAGE_SCHEMA, changelog_df, synth_html_expr  # noqa: F401
