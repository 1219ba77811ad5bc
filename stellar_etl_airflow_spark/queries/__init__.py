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
# round (the corpus is 128 entries as of round 8 — q60, t53-t55 new —
# larger than the window).
#
# ROTATION INVARIANT (VERDICT r6 ask #2): with a 50-entry window over a
# 124-entry corpus, alternate-round freshness is the attainable bound —
# each round fronts (a) any entry that has NEVER had a green driver row,
# then (b) the STALEST entries first (latest row oldest round), ordered
# within a staleness class so entries touched by this round's code
# changes come first.
#
# Round 8 window (50 slots): t43 first (r7 row was err=no_oracle — its
# oracle lands this round, making it the last entry ever to get its
# first full value-hash row), q60 (new this round: the bucketed-table
# surgery escape hatch), then t45 (pq_topk's final top-k is re-planned
# this round per VERDICT ask #2 — its green r7 row describes the old
# plan), then ALL twenty-four r5-stale entries (the r7 sacrifice list,
# honoring "MUST lead _FRONT next round"), then 20 of the 50 r6-stale
# entries — codec/ANN/stream entries whose backing code changed in r7
# (FLAC, progressive JPEG, stream-writer plumbing) ahead of untouched
# ones. The 30 r6-stale entries that miss the window are
# t09_lang_id, t10_quality_score, t11_token_stats, t12_fingerprint
# plus the early relational ports q01-q27 + q42/q46 (unchanged since
# r2-r4, oracle-verified in-repo by test_oracle_parity.py every pytest
# run); they sit at positions 51-80 and MUST lead _FRONT in round 9.
_FRONT = [
    # (a) never fully driver-verified: oracle added this round / new
    "t43_bpe_vocab",
    "q60_state_surgery",
    "t53_shard_manifest",
    "t54_leakage_free_split",
    "t55_quality_classifier",
    # re-planned this round (VERDICT r7 ask #2): bounded two-phase top-k
    "t45_pq_adc_topk",
    # (b) the 24 r5-stale entries — the r7 sacrifice list, oldest class
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
    # (c) 20 of the r6-stale entries; r7/r8-touched code first:
    # stream sink plumbing (r8 bloom type gate in the writer ctor),
    # snapshot publish paths (r8 ADVICE fixes), FLAC (r7), progressive
    # JPEG / codecs (r7), then the ANN + text families
    "s08_stream_crash_resume",
    "s09_stream_additive_exactly_once",
    "q54_schema_evolution",
    "t23_audio_features",
    "t36_image_pixel_stats",
    "t13_multimodal_meta",
    "t15_frame_sample",
    "t37_semantic_dedup",
    "t06_embedding_topk",
    "t07_embedding_lsh_topk",
    "t18_embedding_multiprobe_topk",
    "t08_embedding_neardup",
    "t04_simhash",
    "t05_simhash_neardup",
    "t14_jaccard_dfcapped",
    "t22_tfidf_top_terms",
    "t21_vocab_stats",
    "t24_deterministic_sampling",
    "t25_chunking",
    "t26_sequence_packing",
    "t09_lang_id",
    "t10_quality_score",
    "t11_token_stats",
    "t12_fingerprint",
    # --- window boundary (~50): t09-t12 above land just outside ---
    # the thirty sacrificed-this-round r6-stale entries (t09-t12 + the
    # relational ports below): front these FIRST next round (round 9)
    "q01_pricing_summary",
    "q02_latest_state_dedup",
    "q03_shipping_priority",
    "q04_oldest_wins_dedup",
    "q05_anti_join",
    "q06_semi_join_union",
    "q07_asof_price_join",
    "q08_cross_join_latest",
    "q09_scalar_functions",
    "q10_json_extract",
    "q11_validity_windows",
    "q12_ohlc",
    "q13_array_agg_ordered",
    "q14_union_branches",
    "q15_multiway_join",
    "q16_distinct_groupall",
    "q18_sequence_explode",
    "q20_export_slice",
    "q21_scalar_functions2",
    "q22_provider_accounting",
    "q23_docs_embeddings_join",
    "q24_enriched_rows",
    "q25_top_parts_per_brand",
    "q27_asof_union",
    "q42_bucketed_range_join",
    "q46_higher_order",
    # r7-fresh remainder rides in back (dict-merge below appends them)
]
_seen = set()
_FRONT = [n for n in _FRONT if not (n in _seen or _seen.add(n))]
QUERIES = {
    **{n: QUERIES[n] for n in _FRONT},
    **{n: s for n, s in QUERIES.items() if n not in set(_FRONT)},
}
