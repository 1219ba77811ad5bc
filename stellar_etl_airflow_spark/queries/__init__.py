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
# round (the corpus is 140 entries as of round 10 — q62, t61-t63, s15
# new — larger than the window; r9's driver pass checked 48).
#
# ROTATION INVARIANT (VERDICT r6 ask #2, bound restated per VERDICT r9
# ask #3): each round fronts (a) any entry that has NEVER had a green
# driver row, then (b) the STALEST entries first (latest green row
# oldest round), ordered within a staleness class so entries touched by
# this round's code changes come first. ATTAINABLE FRESHNESS BOUND:
# with a ~48-50-entry window over a 140-entry corpus, full refresh
# takes ceil(140/48) = 3 rounds — "no entry staler than 3 rounds" is
# the invariant the rotation can actually keep, and in-repo oracle
# parity (test_oracle_parity.py, every pytest run) covers the stale
# tail between driver rows.
#
# Round 10 window, honoring the VERDICT r9 asks #1 and #3:
# (a0) t60 leads everything — the corpus's only never-green driver row
# (r9 root cause found in r10: the oracle's uncast window SUM returned
# HUGEINT, which pandas lowers to float64 and hash-mismatches Spark's
# bigint; fixed with an explicit CAST + deterministic output order +
# an in-entry prefix-sum chain self-assert) — followed by any r10-new
# entries; then (a) ALL 35 r7-stale entries, exactly the list promised
# in round 9; then (b) the remaining slots go to entries whose BACKING
# CODE changes in round 10: s14 (exactly-once foreachBatch + band-index
# compaction), q17/q51 (merge.py bootstrap-race fix), and the
# snapshot-plane q55-q59/s10-s13 (concurrency-storm probe target). The
# (b) tail past slot ~48 (s11-s13) was r9-green and loses nothing if
# the window cuts it.
_FRONT = [
    # (a0) never-green first: t60's red row is the round's top ask,
    # then the r10-new entry (no driver row yet)
    "t60_token_budget_selection",
    "q62_transactional_append",
    "t61_pii_redaction",
    "t62_c4_filters",
    "t63_html_extract",
    "s15_stream_web_ingest",
    "q63_additive_mor",
    # (a) the 35 r7-stale entries — the list round 9 promised would
    # lead round 10. dedup/text families first (training/dedup.py is
    # touched again in r10 by the band-index compaction work):
    "t01_exact_dedup",
    "t02_ngram_jaccard_pairs",
    "t03_minhash_lsh_pairs",
    "t17_neardup_components",
    "t39_duplicate_spans",
    "t46_url_dedup",
    "t47_bloom_decontaminate",
    "t48_ccnet_buckets",
    "t49_paragraph_dedup",
    "t50_source_overlap_matrix",
    "t51_keep_best_dedup",
    "t52_temperature_mixture",
    # similarity / loader / graph r7-stale remainder
    "t16_embedding_ivf_topk",
    "t19_kmeans_ivf",
    "t20_training_pipeline",
    "t38_importance_weights",
    "t40_gopher_rules",
    "t41_source_lang_mix",
    "t42_bigram_backoff",
    "t43_bpe_vocab",
    "t44_pagerank",
    # streaming r7-stale block (s14's module is edited in r10)
    "s01_stream_tumbling",
    "s02_stream_dedup",
    "s03_stream_sessionize",
    "s04_stateful_running_counts",
    "s05_stream_stream_join",
    "s06_stream_upsert_sink",
    "s07_stream_static_enrich",
    # relational r7-stale block
    "q28_rollup",
    "q29_percentiles",
    "q45_explode_outer",
    "q48_fuzzy_blocked_join",
    "q49_gapfill_ffill",
    "q50_funnel",
    "q52_asof_tolerance",
    "q53_asof_forward",
    # (b) backing code changes in r10: streaming incremental-dedup gets
    # exactly-once appends + index compaction; merge.py's bootstrap
    # TOCTOU fix backs q17/q51; the snapshot plane is the concurrency
    # storm probe's target
    "s14_stream_incremental_dedup",
    "q17_apply_changes",
    "q51_incremental_mart",
    "q55_snapshot_pushdown",
    "q56_scd2_from_cdf",
    "q57_table_profile",
    "q58_column_mapping",
    "q59_deletion_vectors",
    "s10_cdf_net_changes",
    "s11_stream_snapshot_sink",
    "s12_stream_cdf_to_scd2",
    "s13_snapshot_stream_roundtrip",
    # --- window boundary (~48-50) ---
    # r8/r9-fresh remainder rides in back (dict-merge below appends)
]
_seen = set()
_FRONT = [n for n in _FRONT if not (n in _seen or _seen.add(n))]
QUERIES = {
    **{n: QUERIES[n] for n in _FRONT},
    **{n: s for n, s in QUERIES.items() if n not in set(_FRONT)},
}
