"""Query catalog: every driver-checkable query/operator with its DuckDB
oracle SQL. __spark_entry__ and bench.py import from here.

The external correctness gate samples the HEAD of ``QUERIES`` in
iteration order (r1 covered 30/30, r2 47/47, r3 the first 50 of 112),
so after all registrations we reorder the dicts deterministically:
queries WITHOUT a current driver-green row iterate first, so each round
the gate verifies the least-recently-verified slice of the catalog.
"""

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
from . import composite  # noqa: F401  (composite-key CDC replay + skew evidence, new in r4)

# Rotation priority for the external gate (head-sampled, ~50 entries/round).
# Tier 1: new this round (never had any driver row).
# Tier 2: never driver-green in ANY round (r3 additions past the head cut).
# Tier 3: driver-green in r1/r2 only -- stale external row, refresh next.
# Everything else (green in CORRECTNESS_r03.json) iterates after these.
_GATE_PRIORITY = [
    # -- tier 1: new in round 4 ------------------------------------------
    "cdc_composite_key_replay",
    "cdc_composite_merge_into",
    "cdc_skew_salted_apply",
    # -- tier 2: never driver-green --------------------------------------
    "interval_iso8601",
    "spatial_recode",
    "dedup_semantic",
    "embedding_quantize",
    "doc_chunk_sliding",
    "events_distinct_hll",
    "events_user_cms",
    "events_funnel",
    "events_retention",
    "events_windowed_topk",
    "olap_rollup_hierarchy",
    "olap_pivot_status_priority",
    "olap_running_total",
    "olap_value_percentiles",
    "corpus_mix_weights",
    "text_length_quartiles",
    "q2_min_cost_supplier",
    "q4_order_priority",
    "q6_revenue_delta",
    "q7_volume_shipping",
    "q8_market_share",
    "q9_product_profit",
    "q10_returned_items",
    "q11_revenue_concentration",
    "q12_late_lines_by_status",
    "q13_customer_distribution",
    "q14_promo_revenue",
    "q15_top_supplier",
    "q16_supplier_variety",
    "q17_small_quantity_revenue",
    "q18_large_orders",
    "q19_disjunctive_revenue",
    "q20_dominant_suppliers",
    "q21_waiting_suppliers",
    "q22_dormant_customers",
    # -- tier 3: stale (driver-green in r1/r2 only) ----------------------
    "ann_ivf",
    "staged_roundtrip_csv",
    "staged_roundtrip_parquet",
    "export_roundtrip_json",
    "document_roundtrip",
    "cdc_scd2_history",
    "cdc_asof_join",
    "events_sessionization",
    "dedup_simhash",
    "dedup_embedding_cosine",
    "dedup_clusters",
    "ann_cosine_topk",
    "ann_lsh_bucketed",
    "simhash_signatures",
    "embedding_label_centroids",
    "doc_rolling_hash",
    "doc_repetition",
    "token_count_bpe",
    "token_stats_by_source",
    "url_canonical_dedup",
    "pipeline_keep_list",
    "hot_domains",
    "pii_scrub",
    "boilerplate_score",
    "media_metadata",
    "media_frame_sample",
    "media_decode_meta",
]


def _reorder() -> None:
    ordered = [n for n in _GATE_PRIORITY if n in QUERIES]
    ordered += [n for n in QUERIES if n not in set(ordered)]
    for d in (QUERIES, ORACLES):
        snap = {n: d[n] for n in ordered if n in d}
        d.clear()
        d.update(snap)


_reorder()
