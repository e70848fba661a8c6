"""Results must not depend on the partitioning the session happens to
have — the grading harness runs OUR queries on ITS session (default 200
shuffle partitions), while local sweeps run 8-32. Any operator whose
emitted values shift with partition count (float partial-aggregation
order, nondeterministic window ties) would pass every local sweep and
fail only at the external gate — the worst failure mode available.

The probe set is the FLOAT-HEAVIEST operators (moments, regressions,
EWMA folds, cosine scoring, iterative PageRank): each runs under 3 and
then 17 shuffle partitions and must produce byte-identical sorted rows.
Integer/date operators are structurally immune (exact arithmetic), so
spending runtime on them here buys nothing.
"""

from __future__ import annotations

import pytest

pytestmark = pytest.mark.slow  # fleet-sweep tier (pytest.ini)

import __spark_entry__ as E
from tests.conftest import SF_ORACLE

#: float-accumulation-sensitive operators, one per risk family
PROBES = [
    "agg_stats",                 # avg/std per group
    "agg_corr_covar",            # second moments
    "agg_skew_kurtosis",         # third/fourth moments
    "agg_regression",            # regr_* over rescaled regressors
    "win_ewma",                  # sequential float fold
    "sim_topk",                  # Arrow cosine + score ranking
    "sim_threshold_pairs",       # BLAS block scoring
    "graph_pagerank",            # iterative float propagation
    "agg_seasonality_strength",  # variance ratios
    "ml_ols_normal_equations",   # matrix normal equations
    # r3 additions: the new float-heavy surfaces
    "agg_theil_index",           # ln-sum inequality index
    "ingest_psi_drift",          # ln-ratio drift over clamped shares
    "sim_knn_graph",             # Arrow cosine, all-population ranking
    "text_cooccurrence_pmi",     # ln PMI over integer-ranked pairs
    "win_rolling_mad",           # double-median chain + float threshold
    # r4 additions
    "ml_centroid_classify",      # float centroid avgs + cosine argmax
    "ml_embedding_drift",        # per-dim avgs, cross-half products
    "agg_hhi_concentration",     # share² sum over shuffled partials
    # r5 additions
    "sim_bm25_topk",             # per-token float sums + raw ranking
    "sim_rrf_fusion",            # two raw-ranked arms feeding rank cuts
    "sim_pq_adc_topk",           # trained floats + 8-term ADC sums
    "agg_lorenz_curve",          # rounded-spend ranking + cum shares
    "sample_neyman_allocation",  # stddev shares -> integer allocation
    "graph_hits",                # alternating normalized propagation
    # r6 additions
    "win_macd",                  # per-key sequential float struct fold
    "ml_woe_encoding",           # ln over smoothed count ratios
    "sim_item_cooccurrence",     # rounded-cosine ranking over count joins
    "agg_spearman_grid",         # cell-count windows + 128-bit moments
    # r7 additions
    "win_holt_linear",           # per-key sequential (l, b) float fold
    "ml_conformal_interval",     # integer moments -> shared-beta residual
    #                              ranking + binned k-th selection
    # r8 additions
    "join_runtime_bloom",        # rounded float revenue sum over a
    #                              bloom-pruned fact shuffle
]


def _rows(spark, name):
    return sorted(
        tuple(str(v) for v in r)
        for r in E.queries()[name](spark, SF_ORACLE).collect())


@pytest.mark.parametrize("name", PROBES)
def test_result_invariant_to_shuffle_partitions(spark, name):
    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        low = _rows(spark, name)
        spark.conf.set("spark.sql.shuffle.partitions", "17")
        high = _rows(spark, name)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    assert low == high
