"""Scaling-curve evidence: time headline operators across the three
driver scale factors (sf0.001 / sf0.01 / sf0.1 — 100x data growth)
and report per-query growth ratios. Near-linear (or sub-linear)
wall-clock growth across two decades of data is the empirical
counterpart of the plan audits in PLANS.md: the shuffles these plans
declare really do scale with data, not with pair-space.

    python tools/scaling_bench.py        # prints table + markdown

Timings are best-of-2 on a warm session, so JVM/codegen startup is
excluded; the absolute numbers are host-load sensitive (same caveat
as BASELINE.md's calibration protocol) but the RATIOS are what
matter: an O(n^2) operator would show ~100x growth on the last
column, a linear one ~10x or less (small SFs are overhead-bound, so
ratios below the data growth are expected and fine).
"""

from __future__ import annotations

import sys
import time

REPO = "/root/repo"
sys.path.insert(0, REPO)

from social_media_data_pipeline_recession_political_sentiment_spark.registry import (  # noqa: E402
    queries,
)
from social_media_data_pipeline_recession_political_sentiment_spark.session import (  # noqa: E402
    get_session,
)

SFS = ("sf0.001", "sf0.01", "sf0.1")
HEADLINERS = (
    "ext_dedup_pipeline",
    "ext_dedup_pipeline_minhash",
    "ext_sim_knn_graph",
    "ext_dedup_passage",
    "agg_sessionize_batch",
    "ext_lm_perplexity_buckets",
    "ext_corpus_datacard",
    "ext_graph_pagerank",
    "agg_rolling_wau",
    "agg_funnel_steps",
    "ext_mm_dedup_phash",
    "ext_dataset_diff",
    "ext_vocab_census",
    "join_asof_nearest",
    "ext_url_canonical",
    "ext_graph_degree_census",
    "ext_dedup_minhash_eval",
    "ext_tokenize_ids",
    "ext_doc_dup_profile",
    "ext_mm_phash_cluster",
    "ext_curation_scorecard",
    "ext_bigram_pmi",
    "agg_event_transitions",
    "stream_join_stream",
    # r6 additions
    "agg_quantiles_exact_dist",
    "agg_user_gini",
    "join_scd2_dim",
    "ext_dedup_cross_source",
    "join_null_skew_split",
    "ext_mm_audio_segments",
    # r6 continuation additions
    "ext_dup_span_profile",
    "ext_dsir_weights",
    "agg_decayed_score",
    "ext_emb_gram_int8",
    "ext_mm_dedup_exact",
    "stream_upsert_keyed",
    "join_attribution_first_touch",
    "ext_dedup_cdc",
    "ext_gopher_repetition",
    "ext_source_overlap_matrix",
    "ext_contamination_semantic",
    "ext_dedup_incremental_bloom",
    # r6 continuation additions, batches 4-9
    "ext_split_leakage",
    "ext_dsir_resample",
    "agg_new_vs_returning",
    "agg_trend_slope",
    "ext_chunk_sliding",
    "fn_confusable_fold",
    "agg_winsorize_bounds",
    "ext_fingerprint_winnow",
    "ext_lsh_bucket_census",
    "agg_benford_audit",
    "ext_emb_outlier_int8",
    "agg_hll_union_rollup",
    "ext_graph_triangle_count",
    "ext_hard_negative_mine",
    "ext_span_corruption_plan",
    "ext_bm25_topk",
    "ext_tfidf_cosine_pairs",
    "ext_dedup_containment",
    "ext_graph_jaccard_neighbors",
    "sink_scd1_merge",
    "stream_sliding_count",
    "ext_label_knn_noise",
    "ext_dedup_weighted_jaccard",
)


def main() -> int:
    spark = get_session("scaling-bench")
    qs = queries()
    rows = []
    for name in HEADLINERS:
        fn = qs[name]
        cells = []
        for sf in SFS:
            sf_dir = f"/root/testdata/{sf}"
            fn(spark, sf_dir).count()  # warm
            best = min(
                _timed(fn, spark, sf_dir) for _ in range(2)
            )
            cells.append(best)
        rows.append((name, cells))
        print(name, ["%.2fs" % c for c in cells], flush=True)

    print("\n| query | sf0.001 (s) | sf0.01 (s) | sf0.1 (s) | 0.01→0.1 growth (data 10×) |")
    print("|---|---|---|---|---|")
    for name, cells in rows:
        growth = cells[2] / cells[1] if cells[1] else float("nan")
        print(
            f"| `{name}` | {cells[0]:.2f} | {cells[1]:.2f} | {cells[2]:.2f} "
            f"| {growth:.1f}× |"
        )
    return 0


def _timed(fn, spark, sf_dir) -> float:
    t = time.time()
    fn(spark, sf_dir).count()
    return time.time() - t


if __name__ == "__main__":
    raise SystemExit(main())
