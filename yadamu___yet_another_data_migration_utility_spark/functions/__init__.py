"""Column-level functions: extraction, text analysis, dedup signatures,
similarity. All JVM-side Catalyst builtins where possible; Arrow-batched
pandas UDFs for the rest (never per-row Python UDFs)."""
