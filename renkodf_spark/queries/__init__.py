"""Query registry: every operator surface declared in SURVEY.md §2 is
exposed as a named (spark builder, duckdb oracle SQL) pair consumed by
``__spark_entry__.py`` and the driver's correctness gate.

Importing this package populates the registry.

Ordering matters: the driver's correctness gate covers a bounded prefix
of the registry (round 1 recorded exactly the first 50 entries), so
registration is re-ordered below with a priority list — queries that
have never had a gate row (the LLM-pipeline family, the renko
state/summary/time-bar/chunked queries) and queries whose round-1 rows
need re-proving after fixes (user_sessions, sketch_value_quantiles) come
first; queries already hash-matched green in CORRECTNESS_r01 fill the
remaining slots and, if the window is still bounded, are the ones that
fall outside it (their round-1 rows stand as evidence).
"""

from renkodf_spark.queries.registry import REGISTRY, oracle_sql, queries  # noqa: F401
from renkodf_spark.queries import relational  # noqa: F401
from renkodf_spark.queries import relational2  # noqa: F401
from renkodf_spark.queries import renko_queries  # noqa: F401
from renkodf_spark.queries import pipeline  # noqa: F401

# Gate-window priority (see module docstring). Names not listed keep
# their module registration order after these.
_PRIORITY = [
    # -- never gated in round 1: LLM-pipeline family (12)
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "dedup_simhash",
    "similarity_cosine_topk",
    "similarity_blocked_neardup",
    "similarity_lsh_ann_topk",
    "text_lang_id",
    "text_quality",
    "text_token_counts",
    "text_fingerprint",
    "multimodal_image_meta",
    # -- never gated in round 1: renko tail (3)
    "time_bars_hourly",
    "renko_summary_stats",
    "renko_state_export",
    # -- new this round
    "renko_chunked_wide",
    # -- fixed this round, need fresh rows
    "user_sessions",
    "sketch_value_quantiles",
    # -- the core renko surface (green r1, kept in-window: it's the product)
    "renko_wide_bricks",
    "renko_wicks_projected",
    "renko_normal",
    "renko_wicks",
    "renko_nongap",
    "renko_reverse_wicks",
    "renko_reverse_nongap",
    "renko_fake_r_wicks",
    "renko_fake_r_nongap",
    "renko_small_brick_smoke",
    # -- one representative per relational category (green r1)
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_region_revenue",
    "asof_purchase_before_click",
    "tumbling_event_windows",
    "session_window_events",
    "rollup_lineitem_flags",
    "grouping_sets_events",
    "pivot_event_values",
    "unpivot_order_flags",
    "intersect_buyers_positive_bal",
    "event_value_percentiles",
    "approx_distinct_users",
    "top3_orders_per_customer",
    "running_order_total",
    "event_gaps",
    "customers_without_orders",
    "nation_full_outer_activity",
    "ts_conversions",
    "props_json_extract",
    "lineitem_top20_price",
    "events_time_slice",
]

_rest = [n for n in REGISTRY if n not in set(_PRIORITY)]
_ordered = {n: REGISTRY[n] for n in _PRIORITY if n in REGISTRY}
_ordered.update({n: REGISTRY[n] for n in _rest})
missing = [n for n in _PRIORITY if n not in REGISTRY]
assert not missing, f"priority list names unknown queries: {missing}"
REGISTRY.clear()
REGISTRY.update(_ordered)
