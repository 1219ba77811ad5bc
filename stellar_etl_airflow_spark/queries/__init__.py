"""Oracle-checked query corpus: relational operators + training-data ops.

``QUERIES`` maps query name -> :class:`QuerySpec`. The driver contract
(``__spark_entry__.py``) derives ``queries()`` and ``oracle_sql()`` from it.
"""

from __future__ import annotations

from .base import QuerySpec

QUERIES: dict[str, QuerySpec] = {}

# All three corpora import unconditionally: a broken import must fail the
# gate loudly, never silently shrink the checked query set.
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

# Deliberate iteration order for the external correctness driver, which
# walks queries() in dict order and checks the first ~50 entries per
# round (the corpus is now larger than the window). Front-load the
# entries whose verdicts carry NEW information this round. Round 6:
# everything is green; signal = staleness. Front the 10 entries whose
# latest driver row is round 3 (VERDICT r5 ask #1), then the 35 whose
# latest row is round 4 (so nothing ends the round more than one round
# stale) — that set also contains every entry touched by this round's
# changes (t04/t05 simhash fold fix, t13/t15 real PNG pixel decode,
# q07/q27/q42 as-of skew auto-fallback). New round-6 entries ride just
# behind, then the r5-fresh remainder. If the driver checks everything,
# order is irrelevant; if it truncates, the truncation costs the least
# signal.
_FRONT = [
    # r3-stale rows: latest green driver check was round 3 (VERDICT r5 #1)
    "q15_multiway_join",
    "q16_distinct_groupall",
    "q18_sequence_explode",
    "q20_export_slice",
    "q21_scalar_functions2",
    "q22_provider_accounting",
    "q23_docs_embeddings_join",
    "q24_enriched_rows",
    "q25_top_parts_per_brand",
    "q46_higher_order",
    # r4-stale rows, changed-this-round members first (simhash fold
    # rewrite, PNG pixel decode, as-of auto-fallback touch these paths)
    "t04_simhash",
    "t05_simhash_neardup",
    "t13_multimodal_meta",
    "t15_frame_sample",
    "q07_asof_price_join",
    "q27_asof_union",
    "q42_bucketed_range_join",
    # remaining r4-stale rows
    "q01_pricing_summary",
    "q02_latest_state_dedup",
    "q03_shipping_priority",
    "q04_oldest_wins_dedup",
    "q05_anti_join",
    "q06_semi_join_union",
    "q08_cross_join_latest",
    "q09_scalar_functions",
    "q10_json_extract",
    "q11_validity_windows",
    "q12_ohlc",
    "q13_array_agg_ordered",
    "q14_union_branches",
    "t06_embedding_topk",
    "t07_embedding_lsh_topk",
    "t08_embedding_neardup",
    "t09_lang_id",
    "t10_quality_score",
    "t11_token_stats",
    "t12_fingerprint",
    "t14_jaccard_dfcapped",
    "t18_embedding_multiprobe_topk",
    "t21_vocab_stats",
    "t22_tfidf_top_terms",
    "t23_audio_features",
    "t24_deterministic_sampling",
    "t25_chunking",
    "t26_sequence_packing",
    # new round-6 entries: need their first driver row
    *[n for n in QUERIES if n.startswith(("s08", "s09", "t36", "t37", "t38", "t39", "q54"))],
    # r5-fresh remainder rides in back (dict-merge below appends them)
]
_seen = set()
_FRONT = [n for n in _FRONT if not (n in _seen or _seen.add(n))]
QUERIES = {
    **{n: QUERIES[n] for n in _FRONT},
    **{n: s for n, s in QUERIES.items() if n not in set(_FRONT)},
}
