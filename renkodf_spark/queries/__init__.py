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

# Gate-window priority (see module docstring). Round-3 rotation policy
# (ADVICE r2): every query whose code changed this round or that lacks a
# round-2 row comes first; the 18 queries rotated out all have green
# CORRECTNESS_r02 rows, so after this round every registered query has a
# green row dated within the last two rounds. Names not listed keep
# their module registration order after these.
_PRIORITY = [
    # -- 16 relational queries whose only green rows are from round 1
    "segment_buyers",
    "customer_order_stats",
    "cube_order_status_priority",
    "except_unordered_parts",
    "distinct_segment_nation",
    "part_string_features",
    "monthly_order_stats",
    "acctbal_buckets",
    "sliding_event_windows",
    "orders_near_max",
    "suppliers_shipping_late",
    "union_all_actors",
    "top_words",
    "largest_order_per_customer",
    "rolling_3_order_avg",
    "part_name_normalized",
    # -- changed this round (oracle typing fix / hot-bucket cap /
    #    format column / staging lifecycle) or brand new
    "renko_summary_stats",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "dedup_cluster_labels",
    "multimodal_image_meta",
    "multimodal_real_headers",
    "renko_chunked_wide",
    # -- the core renko surface (kept in-window: it's the product)
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
    "renko_state_export",
    "time_bars_hourly",
    # -- relational/category representatives (green r2, kept fresh)
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
    "user_sessions",
    "top3_orders_per_customer",
    "running_order_total",
    "event_gaps",
    "ts_conversions",
]

_rest = [n for n in REGISTRY if n not in set(_PRIORITY)]
_ordered = {n: REGISTRY[n] for n in _PRIORITY if n in REGISTRY}
_ordered.update({n: REGISTRY[n] for n in _rest})
missing = [n for n in _PRIORITY if n not in REGISTRY]
assert not missing, f"priority list names unknown queries: {missing}"
REGISTRY.clear()
REGISTRY.update(_ordered)
