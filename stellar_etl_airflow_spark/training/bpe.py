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


def bpe_learn(
    df: DataFrame,
    num_merges: int,
    text_col: str = "text",
    min_pair_count: int = 2,
) -> list[tuple[str, str, int]]:
    """Learn ``num_merges`` BPE merges from the corpus; returns the
    ordered merge table [(left, right, pair_freq), ...]. Stops early when
    no pair reaches ``min_pair_count``."""
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

    merges: list[tuple[str, str, int]] = []
    pair_col = F.expr(
        "zip_with(slice(sym, 1, size(sym) - 1), slice(sym, 2, size(sym) - 1),"
        " (x, y) -> struct(x as a, y as b))"
    )
    for _ in range(num_merges):
        top = (
            types.select(F.explode(pair_col).alias("p"), "freq")
            .groupBy("p.a", "p.b")
            .agg(F.sum("freq").alias("n"))
            .orderBy(F.col("n").desc(), F.col("a").asc(), F.col("b").asc())
            .limit(1)
            .collect()
        )
        if not top or top[0]["n"] < min_pair_count:
            break
        a, b, n = top[0]["a"], top[0]["b"], int(top[0]["n"])
        merges.append((a, b, n))
        types = types.select(
            F.expr(_merge_expr("sym", a, b)).alias("sym"), "freq"
        ).localCheckpoint(eager=True)
    return merges


def bpe_merges_df(df: DataFrame, num_merges: int, text_col: str = "text") -> DataFrame:
    """The learned merge table as a DataFrame (rank, left, right,
    pair_freq) — the model artifact a pipeline persists."""
    spark = df.sparkSession
    merges = bpe_learn(df, num_merges, text_col)
    rows = [(i, a, b, n) for i, (a, b, n) in enumerate(merges)]
    return spark.createDataFrame(
        rows, "rank int, left string, right string, pair_freq long"
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
