"""Oracle-checked query corpus: relational operators + training-data ops.

``QUERIES`` maps query name -> :class:`QuerySpec`. The driver contract
(``__spark_entry__.py``) derives ``queries()`` and ``oracle_sql()`` from it.
"""

from __future__ import annotations

from .base import QuerySpec

QUERIES: dict[str, QuerySpec] = {}

# All three corpora import unconditionally: a broken import must fail the
# gate loudly, never silently shrink the checked query set.
from . import connectors  # noqa: E402
from . import relational  # noqa: E402
from . import relational2  # noqa: E402
from . import relational3  # noqa: E402
from . import streamingq  # noqa: E402
from . import training  # noqa: E402

QUERIES.update(relational.SPECS)
QUERIES.update(relational2.SPECS)
QUERIES.update(relational3.SPECS)
QUERIES.update(streamingq.SPECS)
QUERIES.update(training.SPECS)
QUERIES.update(connectors.SPECS)

# Deliberate iteration order for the external correctness driver, which
# walks queries() in dict order and checks the first ~50 entries per
# round (the corpus is 124 entries as of round 7 — t40-t52, q55-q59,
# s10-s13 new — larger than the window).
#
# ROTATION INVARIANT (VERDICT r6 ask #2): with a 50-entry window over a
# 124-entry corpus, alternate-round freshness is the attainable bound —
# each round fronts (a) any entry that has NEVER had a driver row, then
# (b) every entry whose latest row is one round old, ordered so that
# entries touched by this round's code changes come first. 52 r5-stale
# entries + 22 new-this-round entries (t40-t52, q55-q59, s10-s13)
# compete for 50 slots, so twenty-four r5-stale entries slip to
# two-rounds-stale this round; they are placed at positions 51-74 and
# MUST lead _FRONT next round. Round 7 sacrifices t27_repetition_stats,
# t28_contamination_report,
# t29_per_lang_quality_filter,
# t30_source_vocab_overlap,
# t31_per_lang_threshold_gate,
# t32_unigram_logprob,
# t33_rebalance_sources, t34_boilerplate_coverage, t35_stratified_sample,
# q31_setops, q44_cube,
# q30_rolling_window, q33_unpivot, q32_pivot, q47_grouping_sets,
# q34_tumbling_window, q35_exists_subqueries, q36_window_ranks,
# q37_lateral_topk, q38_hopping_window, q39_full_outer,
# q40_sketch_aggregates, q41_salted_join, q43_range_frames
# (simple deterministic plans, unchanged since r5, oracle-verified
# in-repo by test_oracle_parity.py every session).
_FRONT = [
    # never driver-checked: the two r6 entries the r6 window cut off,
    # then this round's new entries (VERDICT r6 ask #2)
    "t38_importance_weights",
    "t39_duplicate_spans",
    "t40_gopher_rules",
    "t41_source_lang_mix",
    "t46_url_dedup",
    "t47_bloom_decontaminate",
    "t48_ccnet_buckets",
    "t49_paragraph_dedup",
    "q58_column_mapping",
    "t50_source_overlap_matrix",
    "q59_deletion_vectors",
    "t51_keep_best_dedup",
    "t52_temperature_mixture",
    "q55_snapshot_pushdown",
    "s10_cdf_net_changes",
    "q56_scd2_from_cdf",
    "t42_bigram_backoff",
    "s11_stream_snapshot_sink",
    "t43_bpe_vocab",
    "q57_table_profile",
    "t44_pagerank",
    "s12_stream_cdf_to_scd2",
    "t45_pq_adc_topk",
    "s13_snapshot_stream_roundtrip",
    # r5-stale entries touched by round-7 changes: as-of deterministic
    # salt + right-hot splitting (q52/q53), txn-ledger retention under
    # the incremental mart (q51). (t23_audio_features also changes this
    # round — FLAC subframe decode — but is r6-fresh; its parity rides
    # on the in-repo oracle gate until its next rotation.)
    "q52_asof_tolerance",
    "q53_asof_forward",
    "q51_incremental_mart",
    # remaining r5-stale entries
    "q17_apply_changes",
    "q19_sessionize",
    "q26_correlated_subquery",
    "q28_rollup",
    "q29_percentiles",
    "q45_explode_outer",
    "q48_fuzzy_blocked_join",
    "q49_gapfill_ffill",
    "q50_funnel",
    "s01_stream_tumbling",
    "s02_stream_dedup",
    "s03_stream_sessionize",
    "s04_stateful_running_counts",
    "s05_stream_stream_join",
    "s06_stream_upsert_sink",
    "s07_stream_static_enrich",
    "t01_exact_dedup",
    "t02_ngram_jaccard_pairs",
    "t03_minhash_lsh_pairs",
    "t16_embedding_ivf_topk",
    "t17_neardup_components",
    "t19_kmeans_ivf",
    "t20_training_pipeline",
    # the twenty-four sacrificed-this-round entries (positions 51-74):
    # front these FIRST next round
    "t27_repetition_stats",
    "t28_contamination_report",
    "t29_per_lang_quality_filter",
    "t30_source_vocab_overlap",
    "t31_per_lang_threshold_gate",
    "t32_unigram_logprob",
    "t33_rebalance_sources",
    "t34_boilerplate_coverage",
    "t35_stratified_sample",
    "q31_setops",
    "q44_cube",
    "q30_rolling_window",
    "q33_unpivot",
    "q32_pivot",
    "q47_grouping_sets",
    "q34_tumbling_window",
    "q35_exists_subqueries",
    "q36_window_ranks",
    "q37_lateral_topk",
    "q38_hopping_window",
    "q39_full_outer",
    "q40_sketch_aggregates",
    "q41_salted_join",
    "q43_range_frames",
    # r6-fresh remainder rides in back (dict-merge below appends them)
]
_seen = set()
_FRONT = [n for n in _FRONT if not (n in _seen or _seen.add(n))]
QUERIES = {
    **{n: QUERIES[n] for n in _FRONT},
    **{n: s for n, s in QUERIES.items() if n not in set(_FRONT)},
}
