"""Byte-Pair-Encoding tokenizer: distributed merge LEARNING + Arrow-batched
ENCODE — the canonical subword-vocabulary step of a training-data pipeline
(Sennrich, Haddow & Birch, "Neural Machine Translation of Rare Words with
Subword Units", ACL 2016, Algorithm 1).

Scale shape. The published algorithm's key property is that it operates on
WORD TYPES with frequencies, not on the corpus: one corpus-wide
token-count shuffle (map-side combined, the same fold t11/t21 run) reduces
100 TB of text to a vocab-sized (word, freq) table, and every learning
iteration after that touches only that table. Each round is

  pair-count aggregate (zip_with over symbol arrays -> explode ->
  groupBy sum(freq), map-side combined)  ->  1-row argmax to the driver
  ->  merge applied to the symbol arrays by a pure expression fold

so the per-round cost is proportional to |word types|, independent of
corpus size, and the only driver traffic is one (pair, count) row per
merge. ``localCheckpoint`` per round cuts the lineage the loop would
otherwise double (the same discipline as k-means/label propagation).

Ties in the argmax break on (count DESC, left ASC, right ASC) so the
learned merge sequence is deterministic across partitionings and engines
— reference BPE implementations leave tie order unspecified; pinning it
is what makes the pytest oracle (a pure-Python reimplementation) exact.

ENCODE applies the learned ranks with the classic greedy lowest-rank-
first loop per word — a dict lookup per candidate pair, memoized per
word type — inside ``mapInPandas`` (Arrow batches, zero row-UDFs); the
merge table is tiny (k rows) and ships in the closure like a broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import words_col
from ..session import local_df

#: end-of-word sentinel, kept out of the corpus alphabet by construction
EOW = "▁"


def _merge_expr(col: str, a: str, b: str) -> str:
    """SQL fold applying one merge (a, b) -> ab left-to-right over a
    symbol array — the greedy adjacency rule of Algorithm 1."""
    def q(x: str) -> str:  # SQL string-literal escape: backslash first
        return x.replace("\\", "\\\\").replace("'", "\\'")

    qa, qb = q(a), q(b)
    return (
        f"aggregate({col}, cast(array() as array<string>), (acc, x) -> "
        f"CASE WHEN size(acc) > 0 AND element_at(acc, -1) = '{qa}' AND x = '{qb}' "
        f"THEN concat(slice(acc, 1, size(acc) - 1), array('{qa}{qb}')) "
        f"ELSE concat(acc, array(x)) END)"
    )


def _select_batch_approx(
    rows, min_pair_count: int, max_batch: int, room: int
) -> list[tuple[str, str, int]]:
    """Standard batched-BPE selection (``exact=False``): up to
    ``max_batch`` mutually symbol-disjoint pairs, skipping (not
    stopping at) overlaps. Each selected pair's recorded count is its
    EXACT pre-batch count (disjoint merges don't change each other's
    counts), and no selected symbol is another batch member's concat,
    so every batch member is a well-defined merge of the round's state.

    Divergence bound vs sequential greedy: every batch member was one
    of the round's top-T pairs by count, and the batch's k-th member
    has count >= every pair it skipped below it — so the batch is a
    reordering-with-gaps of a PREFIX of the sequential merge sequence
    restricted to this round's counts; sequential interleaves chained
    merges (x, concat) between them, which batching defers to the next
    round. The learned VOCAB differs only in merge order and in
    chain-tail merges deferred by one round; tests measure the realized
    set overlap on the fixture."""
    sel: list[tuple[str, str, int]] = []
    used: set[str] = set()
    concats: set[str] = set()
    for r in rows:
        a, b, n = r["a"], r["b"], int(r["n"])
        if n < min_pair_count:
            break
        if len(sel) >= min(max_batch, room):
            break
        if a in used or b in used or a in concats or b in concats:
            continue
        sel.append((a, b, n))
        used.update((a, b))
        concats.add(a + b)
    return sel


def _select_batch(
    rows,
    alphabet: set[str],
    min_pair_count: int,
    max_batch: int,
    room: int,
    top_t_hint: int = 0,
) -> list[tuple[str, str, int]]:
    """Greedy EXACT batch selection from the sorted (n DESC, a, b) top-T
    pair rows: the largest prefix-consistent set of merges whose batched
    application provably replays the sequential argmax sequence.

    Three guards make batched == sequential (proof sketch in
    :func:`bpe_learn`'s docstring):

    - **disjointness**: a selected pair shares no symbol with an earlier
      selected pair (applying one merge never changes a disjoint pair's
      count), and none of its symbols is an earlier selected CONCAT
      (created symbols never participate in the same batch);
    - **strict count cut**: every selected pair except the first must
      beat (strictly) the count of the first rejected/unseen pair —
      newly created pairs inherit counts from overlapping donors, all of
      which sort at or below the cut, so no new pair can tie into the
      selected range;
    - **fresh concats**: if a selected pair's concat already exists in
      the alphabet, existing pairs around that symbol could be BOOSTED
      past the cut, so the batch ends right after that pair (it is
      itself still exact — boosts only affect later picks).
    """
    if not rows or rows[0]["n"] < min_pair_count:
        return []
    sel: list[tuple[str, str, int]] = []
    used: set[str] = set()
    concats: set[str] = set()
    cut = None  # count bound for everything NOT selected
    for i, r in enumerate(rows):
        a, b, n = r["a"], r["b"], int(r["n"])
        if (
            n < min_pair_count
            or len(sel) >= min(max_batch, room)
            or a in used or b in used or a in concats or b in concats
        ):
            cut = n
            break
        sel.append((a, b, n))
        used.update((a, b))
        concats.add(a + b)
        if (a + b) in alphabet:  # boosted-pair hazard: end the batch here
            cut = int(rows[i + 1]["n"]) if i + 1 < len(rows) else 0
            break
    if cut is None:
        if len(rows) >= top_t_hint > 0:
            # exhausted a FULL top-T window: unseen pairs below row T are
            # bounded by row T's count
            cut = int(rows[-1]["n"])
        else:
            # the window held EVERY live pair and all were selected:
            # nothing unseen exists to tie in — no trim needed
            cut = min_pair_count - 1
    # strict-cut trim (first pair is always the exact argmax — exempt)
    while len(sel) > 1 and sel[-1][2] <= cut:
        sel.pop()
    return sel


def bpe_learn(
    df: DataFrame,
    num_merges: int,
    text_col: str = "text",
    min_pair_count: int = 2,
    max_batch: int = 32,
    stats: dict | None = None,
    exact: bool = True,
) -> list[tuple[str, str, int]]:
    """Learn ``num_merges`` BPE merges from the corpus; returns the
    ordered merge table [(left, right, pair_freq), ...]. Stops early when
    no pair reaches ``min_pair_count``.

    BATCHED ROUNDS (r8, VERDICT r7 ask #4): instead of one Spark job per
    merge (32k sequential jobs for a production vocab), each round
    collects the top-T pair counts (T = 4*max_batch rows — the only
    driver traffic) and selects up to ``max_batch`` merges that are
    provably exact w.r.t. the sequential greedy argmax:

    - mutually SYMBOL-DISJOINT pairs keep their exact counts while the
      earlier batch members are applied (a merge (a,b) only changes
      counts of pairs touching a or b), so the recorded pair_freq equals
      what sequential would have seen;
    - every pair that OVERLAPS a selected pair sorts strictly after the
      whole selection (else it would have been selected first), so its
      count — and the count of any pair a merge CREATES, which inherits
      from overlapping donors — is bounded by the count at the cut;
      requiring selected counts to STRICTLY beat the cut means no
      created pair can tie into the selected range under the
      (n DESC, a ASC, b ASC) order;
    - a selected concat that already exists as a live symbol could boost
      an existing pair past the cut, so the batch ends there; the
      alphabet is maintained driver-side (initial distinct symbols +
      one concat per applied merge, a superset — false positives only
      shrink batches, never break exactness).

    The batch applies as ONE nested expression fold (one job +
    localCheckpoint), so a 32k-merge vocab costs ~num_merges/avg_batch
    jobs, not num_merges. ``max_batch=1`` reproduces the r7 sequential
    loop exactly; the batched/sequential equivalence is pinned by
    ``tests/test_bpe.py`` and the t43 DuckDB oracle (which replays the
    sequential algorithm round by round).

    ``exact=True`` guarantees sequence identity but a corpus whose
    greedy chain is dependent (suffix buildup: (e,r) then (er,EOW))
    yields small batches. ``exact=False`` switches to the standard
    batched selection (:func:`_select_batch_approx`): up to max_batch
    disjoint pairs per round by SKIPPING overlaps — chain merges defer
    one round, the learned vocab is order-perturbed but count-faithful
    (each recorded pair_freq is that pair's exact count in its round's
    state); use it for production-size vocabs where job count, not
    sequence identity, is the constraint."""
    # one corpus shuffle: word types with frequencies
    words = (
        df.select(F.explode(words_col(text_col)).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    # initial symbols: characters + end-of-word marker
    types = words.select(
        F.concat(F.split(F.col("w"), ""), F.array(F.lit(EOW))).alias("sym"),
        "freq",
    ).localCheckpoint(eager=True)
    # driver-side alphabet superset: initial distinct symbols (tiny —
    # the character set) + every applied concat
    alphabet = {
        r["s"] for r in types.select(F.explode("sym").alias("s")).distinct().collect()
    }

    merges: list[tuple[str, str, int]] = []
    pair_col = F.expr(
        "zip_with(slice(sym, 1, size(sym) - 1), slice(sym, 2, size(sym) - 1),"
        " (x, y) -> struct(x as a, y as b))"
    )
    top_t = max(4 * max_batch, 8)
    rounds = 0
    batch_sizes: list[int] = []
    while len(merges) < num_merges:
        rows = (
            types.select(F.explode(pair_col).alias("p"), "freq")
            .groupBy("p.a", "p.b")
            .agg(F.sum("freq").alias("n"))
            .orderBy(F.col("n").desc(), F.col("a").asc(), F.col("b").asc())
            .limit(top_t)
            .collect()
        )
        room = num_merges - len(merges)
        if exact:
            batch = _select_batch(
                rows, alphabet, min_pair_count, max_batch, room, top_t_hint=top_t
            )
        else:
            batch = _select_batch_approx(rows, min_pair_count, max_batch, room)
        if not batch:
            break
        rounds += 1
        batch_sizes.append(len(batch))
        merges.extend(batch)
        expr = "sym"
        for a, b, _n in batch:  # rank order: inner-first == sequential
            expr = _merge_expr(expr, a, b)
            alphabet.add(a + b)
        types = types.select(F.expr(expr).alias("sym"), "freq").localCheckpoint(
            eager=True
        )
    if stats is not None:
        stats["rounds"] = rounds
        stats["batches"] = batch_sizes
    return merges


def bpe_merges_df(df: DataFrame, num_merges: int, text_col: str = "text") -> DataFrame:
    """The learned merge table as a DataFrame (rank, left, right,
    pair_freq) — the model artifact a pipeline persists."""
    spark = df.sparkSession
    merges = bpe_learn(df, num_merges, text_col)
    rows = [(i, a, b, n) for i, (a, b, n) in enumerate(merges)]
    return local_df(
        spark, rows, "rank int, left string, right string, pair_freq long"
    )


def _encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Greedy lowest-rank-first BPE encode of one word (the standard
    inference loop, e.g. the GPT-2 public encoder's shape)."""
    sym = list(word) + [EOW]
    while len(sym) > 1:
        best, best_rank = None, None
        for i in range(len(sym) - 1):
            r = ranks.get((sym[i], sym[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best, best_rank = i, r
        if best is None:
            break
        sym[best : best + 2] = [sym[best] + sym[best + 1]]
    return sym


def bpe_encode(
    df: DataFrame,
    merges: list[tuple[str, str, int]] | list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
    out_col: str = "bpe_tokens",
) -> DataFrame:
    """Tokenize the corpus with a learned merge table: (id, tokens array).

    The rank dict is k entries — it rides the task closure (a broadcast
    equivalent); per-word memoization makes the Arrow batch loop cost
    proportional to DISTINCT words per batch, the Zipf-friendly case.
    Zero shuffle: one ``mapInPandas`` over the scan."""
    ranks = {(m[0], m[1]): i for i, m in enumerate(merges)}
    fields = df.select(id_col, text_col).schema

    def run(batches):
        import re

        import pandas as pd

        # ASCII \s matches words_col's Java regex split (Java \s is
        # ASCII-only without UNICODE_CHARACTER_CLASS); plain str.split()
        # would split on Unicode whitespace (NBSP etc.) that the LEARN
        # fold kept inside one word type, desynchronizing the two.
        ws = re.compile(r"\s+", re.ASCII)
        cache: dict[str, list[str]] = {}
        for pdf in batches:
            toks = []
            for text in pdf[text_col].astype(str):
                out: list[str] = []
                for w in ws.split(text.lower()):
                    if not w:
                        continue
                    got = cache.get(w)
                    if got is None:
                        got = cache[w] = _encode_word(w, ranks)
                    out.extend(got)
                toks.append(out)
            yield pd.DataFrame({id_col: pdf[id_col], out_col: toks})

    schema = f"{fields[0].name} {fields[0].dataType.simpleString()}, {out_col} array<string>"
    return df.select(id_col, text_col).mapInPandas(run, schema)
