"""Global plan-regression guard over EVERY driver query.

A BroadcastNestedLoopJoin or CartesianProduct sneaking into a query is
invisible at sf0.001 and a cluster-killer at 100 TB. The only sanctioned
nested-loop shape is the scalar-subquery pattern: crossJoin of a ONE-ROW
aggregate (global average / max / count), which is O(n) work with a 1-row
broadcast side. Those queries are whitelisted explicitly; everything else
must plan hash/sort-merge joins.
"""

import pytest

from etl_mssql_to_postgres_dailysync_spark.plans.driver_queries import QUERIES

SF_DIR = "/root/testdata/sf0.001"

# queries whose plan intentionally crossJoins a 1-row aggregate (scalar
# subquery) or a metadata-sized generated spine
ALLOWED_NESTED_LOOP = {
    "set_operations",          # four 1-row aggregate counts combined
    "global_sales_opportunity",  # global avg balance, 1 row
    "kmv_distinct_sketch",     # k-th order statistic scalar
    "approx_percentile_bounds",  # 1-row stats vector
    "gap_fill_daily",          # generated date spine (31 rows) x dim
    "graph_triangle_count",    # 1-row triangle count x 1-row edge count
    "triangle_count_degree_ordered",  # 1-row aggregate cross joins
    "cms_frequency_sketch",    # broadcast estimate joined to 10-row top-k
    "tfidf_top_terms",         # 1-row corpus size N
    "daily_sync_pipeline",     # reconciliation counts (1-row observe twin)
    "event_funnel",            # three 1-row stage counts combined
    "similarity_brute_topk",   # by design: corpus x broadcast(10 queries)
    "similarity_ann_ivf",      # corpus x broadcast(8 centroids) assignment
    "important_part_value",    # Q11 scalar: global value total, 1 row
    "similarity_quantized_topk",  # by design: corpus x broadcast(10 queries)
    "drift_psi",               # 1-row period totals cross joined to 10 bins
    "domain_mixing_weights",   # two 1-row scalar totals (raw + capped mass)
    "event_rate_cusum",        # 1-row global mean error rate (scalar subquery)
    "rolling_28d_active_users",  # bounded range join vs broadcast day spine
    "session_duration_histogram",  # 1-row session total for ppm share
    "token_budget_allocation",  # two 1-row scalars (total tokens, leftover)
    "chi_square_priority_status",  # 1-row grand total of the contingency grid
    "benford_first_digit",     # 1-row order total for ppm shares
    "text_bigram_lift",        # two 1-row scalars (unigram + bigram mass)
    "dedup_semantic_prune",    # corpus x broadcast(8 centroids) assignment
    "class_weights",           # 1-row (total, k) scalar cross join
    "join_skew_audit",         # three 1-row table totals x top-5 key rows
    "winsorized_price_stats",  # 1-row (P01, P99) bounds cross join
    "text_unigram_surprisal",  # 1-row corpus token mass (scalar subquery)
    "text_bigram_lm_score",    # 1-row vocab size V (scalar subquery)
    "source_kl_divergence",    # 1-row corpus token mass (scalar subquery)
    "knn_label_agreement",     # by design: corpus x broadcast(50 queries)
    "dedup_lsh_audit",         # three 1-row audit tallies cross-joined
    "dedup_lsh_audit_wide",    # three 1-row audit tallies cross-joined
    "mixture_alpha_weights",   # 1-row (token, sqrt-mass) totals scalar
}

# queries with driver-side setup that writes real files; cheap at sf0.001
# but excluded here because building the plan EXECUTES commits/writes —
# their plan shapes are covered by their own module tests
SKIP = {"txn_table_snapshot", "txn_table_changes", "incremental_rollup_maintenance",
        "streaming_cdc_rollup",  # runs two availableNow streams at build time
        "governed_ingest",  # writes a TxnTable + quarantine dir at plan-build time
        "orc_roundtrip", "jsonl_roundtrip", "csv_roundtrip", "xml_roundtrip",
        "similarity_ann_ivf_trained",  # training loop collects per iteration
        "similarity_pq_adc",  # codebook training collects the sample
        "dedup_cluster_components", "pagerank_neardup_graph",  # iterative loops
        }


# global (no-partition) windows sitting above something OTHER than an
# aggregate/limit, each individually justified as bounded-cardinality input
ALLOWED_GLOBAL_WINDOW: dict[str, str] = {}

# physical nodes that bound the row count flowing into a global window:
# grouped aggregates (bounded by group-key cardinality — daily/nation/bucket
# grain in every registry query), global limits, and literal local spines
_BOUNDING_NODES = {
    "HashAggregateExec",
    "SortAggregateExec",
    "ObjectHashAggregateExec",
    "GlobalLimitExec",
    "TakeOrderedAndProjectExec",
    "LocalTableScanExec",
}

_PLAN_CACHE: dict[str, object] = {}


def _plan(spark, name):
    if name not in _PLAN_CACHE:
        _PLAN_CACHE[name] = (
            QUERIES[name](spark, SF_DIR)._jdf.queryExecution().executedPlan()
        )
    return _PLAN_CACHE[name]


def _walk(node):
    """Yield every physical node, descending through the AQE / query-stage
    wrapper nodes whose real subtree is not in children()."""
    name = node.getClass().getSimpleName()
    if name == "AdaptiveSparkPlanExec":
        yield from _walk(node.initialPlan())
        return
    if name.endswith("QueryStageExec"):
        yield from _walk(node.plan())
        return
    yield node
    for i in range(node.children().length()):
        yield from _walk(node.children().apply(i))


@pytest.mark.parametrize("name", sorted(set(QUERIES) - SKIP))
def test_no_unplanned_nested_loop_join(spark, name):
    plan = _plan(spark, name).toString()
    has_nlj = "BroadcastNestedLoopJoin" in plan or "CartesianProduct" in plan
    if name in ALLOWED_NESTED_LOOP:
        return  # sanctioned scalar/spine cross joins
    assert not has_nlj, f"{name} plans a nested-loop join:\n{plan[:2000]}"


@pytest.mark.parametrize("name", sorted(set(QUERIES) - SKIP))
def test_global_window_sits_above_aggregate(spark, name):
    """A window with NO partition spec funnels its whole input through ONE
    task — invisible at sf0.001, a straggler (or OOM) at 100 TB. The only
    sanctioned shape is a global window ABOVE a bounded-cardinality node
    (grouped aggregate / limit / literal spine), where the single partition
    holds group-grain rows, not data-grain rows. operators/cumsum.py exists
    exactly because the unbounded form is a real footgun; this gate makes
    the invariant structural instead of convention."""
    if name in ALLOWED_GLOBAL_WINDOW:
        return
    for node in _walk(_plan(spark, name)):
        if node.getClass().getSimpleName() != "WindowExec":
            continue
        if not node.partitionSpec().isEmpty():
            continue
        bounded = any(
            sub.getClass().getSimpleName() in _BOUNDING_NODES
            for sub in _walk(node)
        )
        assert bounded, (
            f"{name} plans a GLOBAL window over non-aggregated input "
            f"(single-task at scale):\n{node.toString()[:2000]}"
        )
