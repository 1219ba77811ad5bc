"""Text-analysis operators: tokenization, language ID, quality scoring,
fingerprinting.

All column expressions are built from ``pyspark.sql.functions`` /
higher-order array functions — zero Python UDFs, so at 100 TB every
operator runs inside whole-stage codegen and scales linearly with
executors. Each operator has an exact SQL twin used as its DuckDB oracle
(see queries/training.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from ..session import local_df

# Portable 60-bit hash shared with the oracle side (queries/base.py).
PH = "cast(conv(substr(md5({x}), 1, 15), 16, 10) as bigint)"

# Per-language stopword lists for the n-gram/stopword language-ID heuristic.
# Order matters: earlier languages win argmax ties.
STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "to", "and", "in", "is"),
    "es": ("el", "la", "de", "los", "y", "que"),
    "de": ("der", "die", "das", "und", "ist"),
    "fr": ("le", "les", "des", "et", "est"),
}


def words_col(text: Column | str) -> Column:
    """Lower-cased whitespace tokens with empties removed."""
    c = F.col(text) if isinstance(text, str) else text
    return F.filter(F.split(F.lower(c), r"\s+"), lambda w: w != "")


def lang_id(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Heuristic language ID: argmax of per-language stopword-hit ratios,
    ties broken by the STOPWORDS declaration order, 'und' when no hits."""
    ws = words_col(text_col)
    df = df.withColumn("_ws", ws)
    scores = {lang: F.col(f"score_{lang}") for lang in STOPWORDS}
    for lang, stops in STOPWORDS.items():
        inset = ", ".join(f"'{s}'" for s in stops)
        hits = F.expr(f"size(filter(_ws, w -> w in ({inset})))")
        df = df.withColumn(f"score_{lang}", hits / F.greatest(F.size("_ws"), F.lit(1)))
    best = F.greatest(*scores.values())
    pred = F.lit("und")
    for lang in reversed(list(STOPWORDS)):  # earlier langs overwrite later on ties
        pred = F.when((best > 0) & (scores[lang] == best), lang).otherwise(pred)
    return df.select(
        id_col,
        pred.alias("predicted_lang"),
        *[F.round(scores[lang], 6).alias(f"score_{lang}") for lang in STOPWORDS],
    )


def quality_score(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    passthrough: tuple[str, ...] = (),
) -> DataFrame:
    """Deterministic quality heuristics: length, word stats, punctuation /
    digit density, stopword ratio — composite score + keep flag.

    Mirrors the length/punct/stopword family of classic pretraining-data
    quality filters; every term is a scalar per-row expression so the
    score is bit-identical across engines. ``passthrough`` carries extra
    columns (e.g. ``lang``) into the output without a re-join.
    """
    t = F.col(text_col)
    ws = words_col(text_col)
    n_chars = F.length(t).cast("double")
    n_words = F.size(ws).cast("double")
    sum_word_len = F.aggregate(ws, F.lit(0), lambda acc, w: acc + F.length(w)).cast("double")
    avg_word_len = sum_word_len / F.greatest(n_words, F.lit(1.0))
    n_punct = F.length(F.regexp_replace(t, r"[a-zA-Z0-9\s]", "")).cast("double")
    n_digits = F.length(F.regexp_replace(t, r"[^0-9]", "")).cast("double")
    stops = STOPWORDS["en"]
    stop_ratio = F.size(F.filter(ws, lambda w: w.isin(*stops))).cast("double") / F.greatest(n_words, F.lit(1.0))
    score = (
        F.least(n_words / 100.0, F.lit(1.0)) * 0.4
        + F.least(stop_ratio * 5.0, F.lit(1.0)) * 0.3
        + (1.0 - F.least(n_punct / F.greatest(n_chars, F.lit(1.0)) * 10.0, F.lit(1.0))) * 0.2
        + (1.0 - F.least(n_digits / F.greatest(n_chars, F.lit(1.0)) * 10.0, F.lit(1.0))) * 0.1
    )
    return df.select(
        id_col,
        *passthrough,
        n_chars.cast("long").alias("n_chars"),
        n_words.cast("long").alias("n_words"),
        avg_word_len.alias("avg_word_len"),
        stop_ratio.alias("stopword_ratio"),
        (n_punct / F.greatest(n_chars, F.lit(1.0))).alias("punct_ratio"),
        (n_digits / F.greatest(n_chars, F.lit(1.0))).alias("digit_ratio"),
        score.alias("quality_score"),
        (score >= 0.5).alias("keep"),
    )


# BPE-ish pre-tokenizer: letter runs, single digits, single punctuation.
BPE_REGEX = r"[a-z]+|[0-9]|[^a-z0-9\s]"


def token_stats(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Whitespace and BPE-ish regex token counts + chars-per-token."""
    t = F.lower(F.col(text_col))
    ws_tokens = F.size(words_col(text_col)).cast("long")
    bpe_tokens = F.size(F.regexp_extract_all(t, F.lit(BPE_REGEX), F.lit(0))).cast("long")
    n_chars = F.length(t).cast("long")
    return df.select(
        id_col,
        ws_tokens.alias("ws_tokens"),
        bpe_tokens.alias("bpe_tokens"),
        n_chars.alias("n_chars"),
        (n_chars.cast("double") / F.greatest(bpe_tokens, F.lit(1)).cast("double")).alias("chars_per_token"),
    )


def vocab_stats(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Corpus vocabulary: per-term total frequency, document frequency, and
    frequency rank (ties broken lexically). The shuffle carries one row per
    (doc, distinct term) — the inverted-index shape; at 100 TB this is the
    standard first pass of vocabulary building / BPE training."""
    from pyspark.sql.window import Window

    postings = (
        df.select(F.col(id_col).alias("doc"), F.explode(words_col(text_col)).alias("term"))
    )
    stats = postings.groupBy("term").agg(
        F.count(F.lit(1)).alias("tf_total"),
        F.countDistinct("doc").alias("df_docs"),
    )
    w = Window.orderBy(F.col("tf_total").desc(), F.col("term").asc())
    return stats.withColumn("rank", F.row_number().over(w))


def tfidf_top_terms(
    df: DataFrame, k: int = 3, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Top-k characteristic terms per document by smoothed TF-IDF
    (idf = ln((N+1)/(df+1)) + 1, the scikit-learn smoothing). Scores are
    rounded to 6 decimals so cross-engine libm ln() ulp differences cannot
    flip equality; ties break lexically. Two shuffles: term-level df agg
    (broadcast back) and the per-doc top-k window."""
    from pyspark.sql.window import Window

    tf = (
        df.select(F.col(id_col).alias("doc"), F.explode(words_col(text_col)).alias("term"))
        .groupBy("doc", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    n_docs = df.select(F.countDistinct(id_col).alias("n")).first()["n"]
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df_docs"))
    scored = tf.join(F.broadcast(dfreq), "term").withColumn(
        "tfidf",
        F.round(
            F.col("tf") * (F.log((F.lit(n_docs) + 1.0) / (F.col("df_docs") + 1.0)) + 1.0), 6
        ),
    )
    w = Window.partitionBy("doc").orderBy(F.col("tfidf").desc(), F.col("term").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(F.col("doc").alias(id_col), "rank", "term", "tf", "df_docs", "tfidf")
    )


def chunk_documents(
    df: DataFrame,
    chunk_tokens: int = 50,
    stride: int = 40,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Split each document into overlapping word-token chunks (window
    ``chunk_tokens``, step ``stride`` — overlap = chunk - stride), the
    standard pre-training / RAG chunking step. Pure per-row array work
    (sequence of start offsets -> slice per offset): zero shuffle, scales
    with executors. Short docs yield one (possibly short) chunk; each
    chunk carries its offset and token count."""
    if not (0 < stride <= chunk_tokens):
        raise ValueError(f"chunk_documents: need 0 < stride <= chunk_tokens, got {stride}/{chunk_tokens}")
    df = df.withColumn("_ws", words_col(text_col)).filter(F.size("_ws") > 0)
    # start offsets: 0, stride, 2*stride, ... while start < n (last chunk
    # may be short); greatest(...) guards the single-chunk case
    starts = f"sequence(0, greatest(cast(ceil(size(_ws) / {stride}.0) as int) - 1, 0))"
    chunks = (
        f"transform({starts}, i -> named_struct("
        f"'chunk_index', i, "
        f"'chunk_text', concat_ws(' ', slice(_ws, i * {stride} + 1, {chunk_tokens})), "
        f"'n_tokens', size(slice(_ws, i * {stride} + 1, {chunk_tokens}))))"
    )
    return (
        df.select(F.col(id_col).alias("doc_id"), F.explode(F.expr(chunks)).alias("c"))
        .filter(F.col("c.n_tokens") > 0)
        .select(
            "doc_id",
            F.col("c.chunk_index").alias("chunk_index"),
            F.col("c.chunk_text").alias("chunk_text"),
            F.col("c.n_tokens").alias("n_tokens"),
        )
    )


def pack_sequences(
    df: DataFrame,
    budget_tokens: int = 512,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Greedy sequence packing: assign documents (in ``id_col`` order) to
    consecutive bins of ~``budget_tokens`` whitespace tokens — the standard
    packing step that keeps training batches dense. Deterministic: bin =
    floor((cumsum - n_tokens) / budget) over the id ordering, i.e. a doc
    starts a new bin when the running total crosses the budget. One global
    sort (single exchange); at scale, pack per shard/partition instead of
    globally — same expression inside a partitionBy."""
    from pyspark.sql.window import Window

    toks = df.select(
        F.col(id_col).alias("doc_id"), F.size(words_col(text_col)).cast("long").alias("n_tokens")
    )
    w = Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        toks.withColumn("cum", F.sum("n_tokens").over(w))
        .withColumn("bin", ((F.col("cum") - F.col("n_tokens")) / budget_tokens).cast("long"))
        .select("doc_id", "n_tokens", "bin")
    )


def shard_manifest(
    df: DataFrame,
    shard_tokens: int = 4096,
    n_buckets: int = 256,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Training-data loader shards (the WebDataset/ArrayRecord manifest
    shape): documents are DETERMINISTICALLY SHUFFLED by a portable
    60-bit hash of their id (reproducible decorrelated training order
    — no RNG state, any engine derives the same order), assigned to
    consecutive shards of ~``shard_tokens`` whitespace tokens by a
    running total over that order, and summarized one row per shard
    (doc/token counts, first/last doc in order, an order-independent
    ``bit_xor`` id checksum a loader can verify against).

    Scale shape — the global cumulative sum is a DISTRIBUTED PREFIX
    SUM, not a single-partition window: the hash key's high bits define
    ``n_buckets`` ordered segments; the within-segment cumsum is a
    window PARTITIONED by segment (parallel, shuffles only the narrow
    (id, hash, count) table), and the cross-segment offsets come from a
    ``n_buckets``-row aggregate folded by one tiny single-partition
    window and BROADCAST back — no driver collect, no corpus-sized
    single-partition operator (contrast :func:`pack_sequences`, whose
    documented global-window form is the per-shard recipe). Exact:
    prefix sums decompose over ordered segments, so the result is
    bit-identical to the single-window formulation the oracle uses."""
    from pyspark.sql.window import Window

    key = F.expr(PH.format(x=f"cast({id_col} as string)"))
    toks = df.select(
        F.col(id_col).alias("doc_id"),
        key.alias("k"),
        F.size(words_col(text_col)).cast("long").alias("n_tokens"),
    )
    # high bits of the 60-bit hash: segment boundaries respect key order
    seg_div = (1 << 60) // n_buckets
    toks = toks.withColumn("seg", (F.col("k") / F.lit(seg_div)).cast("int"))
    w_in = (
        Window.partitionBy("seg")
        .orderBy("k", "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # exclusive cross-segment offsets: n_buckets rows, folded by a tiny
    # window and broadcast — the distributed-prefix-sum glue
    w_seg = Window.orderBy("seg").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    offsets = (
        toks.groupBy("seg")
        .agg(F.sum("n_tokens").alias("_segtot"))
        .withColumn("offset", F.sum("_segtot").over(w_seg) - F.col("_segtot"))
        .select("seg", "offset")
    )
    cum = (
        toks.withColumn("cum_in", F.sum("n_tokens").over(w_in))
        .join(F.broadcast(offsets), "seg")
        .withColumn("cum", F.col("cum_in") + F.col("offset"))
    )
    shard = ((F.col("cum") - F.col("n_tokens")) / shard_tokens).cast("long")
    return (
        cum.withColumn("shard", shard)
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("n_tokens"),
            F.min_by("doc_id", F.struct("k", "doc_id")).alias("first_doc"),
            F.max_by("doc_id", F.struct("k", "doc_id")).alias("last_doc"),
            F.expr("bit_xor(k)").alias("checksum"),
        )
    )


def fingerprint(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Deterministic document fingerprint over whitespace-normalized text:
    full md5 hex + the portable 60-bit integer fingerprint."""
    norm = F.trim(F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " "))
    df = df.withColumn("_norm", norm)
    return df.select(
        id_col,
        F.md5(F.col("_norm")).alias("fp_md5"),
        F.expr(PH.format(x="_norm")).alias("fp64"),
    )


def repetition_stats(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Gopher-style repetition filters: fraction of tokens taken by the most
    frequent word / adjacent bigram, plus the distinct-token ratio, with a
    composite keep flag.

    The repetition-fraction family comes from the Gopher data pipeline
    (Rae et al., "Scaling Language Models: Methods, Analysis & Insights
    from Training Gopher", 2021, table A1: duplicate-n-gram fraction
    filters); thresholds here are the word/bigram analogs. Implemented
    relationally (explode -> count -> min_by argmax) rather than per-row
    higher-order folds: the counts stay inside whole-stage codegen, the
    (doc, token) count shuffle partial-aggregates map-side, and the
    argmax exchange carries ~one row per doc — linear at 100 TB. Ties on
    the top token break lexicographically so results are exactly
    reproducible cross-engine. Documents with no second word report
    bigram fraction 0.
    """
    base = df.select(F.col(id_col).alias("doc_id"), words_col(text_col).alias("_ws")).filter(
        F.size("_ws") > 0
    )
    bigrams = F.expr(
        "zip_with(_ws, slice(_ws, 2, greatest(size(_ws) - 1, 0)), (a, b) -> concat(a, ' ', b))"
    )
    # zip_with pads the shorter side with nulls -> trailing null pair dropped
    base = base.withColumn("_bg0", bigrams).withColumn(
        "_bg", F.expr("filter(_bg0, x -> x IS NOT NULL)")
    )
    # cast("long"): the oracle declares BIGINT and the external driver's
    # pandas canonicalizer is dtype-sensitive (int32 vs int64 hash-mismatch)
    sizes = base.select(
        "doc_id",
        F.size("_ws").cast("long").alias("n_words"),
        F.size("_bg").cast("long").alias("n_bigrams"),
    )

    def top_frac(tokens_col: str, out_prefix: str):
        counts = (
            base.select("doc_id", F.explode(tokens_col).alias("tok"))
            .groupBy("doc_id", "tok")
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
        # argmax as min_by aggregate, not a row_number window: the window
        # re-shuffles every (doc, token) count row to sort it; min_by
        # partial-aggregates map-side so the exchange carries ~one row per
        # doc. min of (-cnt, tok) == max cnt, ties to the min token —
        # identical to the oracle's ORDER BY cnt DESC, tok ASC.
        return (
            counts.groupBy("doc_id")
            .agg(
                F.min_by(
                    F.struct("tok", "cnt"),
                    F.struct((-F.col("cnt")).alias("_nc"), F.col("tok")),
                ).alias("_top")
            )
            .select(
                "doc_id",
                F.col("_top.tok").alias(f"top_{out_prefix}"),
                F.col("_top.cnt").alias(f"top_{out_prefix}_count"),
            )
        )

    tw = top_frac("_ws", "word")
    tb = top_frac("_bg", "bigram")
    out = (
        sizes.join(tw, "doc_id")
        .join(tb, "doc_id", "left")
        .select(
            "doc_id",
            "n_words",
            "top_word",
            F.round(F.col("top_word_count") / F.col("n_words"), 6).alias("top_word_frac"),
            F.coalesce(F.col("top_bigram"), F.lit("")).alias("top_bigram"),
            F.round(
                F.coalesce(F.col("top_bigram_count"), F.lit(0)) / F.greatest("n_bigrams", F.lit(1)), 6
            ).alias("top_bigram_frac"),
        )
    )
    distinct_ratio = F.round(
        F.size(F.array_distinct(F.col("_ws"))) / F.size(F.col("_ws")), 6
    )
    dr = base.select("doc_id", distinct_ratio.alias("distinct_ratio"))
    return out.join(dr, "doc_id").select(
        "doc_id",
        "n_words",
        "distinct_ratio",
        "top_word",
        "top_word_frac",
        "top_bigram",
        "top_bigram_frac",
        (
            (F.col("top_word_frac") <= 0.2)
            & (F.col("top_bigram_frac") <= 0.18)
            & (F.col("distinct_ratio") >= 0.2)
        ).alias("keep_repetition"),
    )


def per_lang_quality_filter(
    df: DataFrame,
    keep_frac: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
    lang_col: str = "lang",
) -> DataFrame:
    """Per-language quality gate: keep the top ``keep_frac`` of documents
    WITHIN each language by the composite quality score.

    A single global threshold systematically starves low-resource
    languages (their score distributions differ), so production mixtures
    gate per-language — the CCNet/ROOTS-style per-language percentile
    filter. One window shuffle on ``lang``; ties broken by doc_id so the
    percent_rank is exactly reproducible cross-engine. The score rides
    along from :func:`quality_score` via ``passthrough`` (no re-join).
    """
    from pyspark.sql.window import Window

    q = quality_score(df, text_col, id_col, passthrough=(lang_col,)).select(
        id_col, lang_col, "quality_score"
    )
    w = Window.partitionBy(lang_col).orderBy(
        F.col("quality_score").desc(), F.col(id_col).asc()
    )
    return (
        q.withColumn("lang_pct_rank", F.percent_rank().over(w))
        .filter(F.col("lang_pct_rank") <= keep_frac)
        .select(id_col, lang_col, "quality_score", "lang_pct_rank")
    )


def source_vocab_overlap(
    df: DataFrame, text_col: str = "text", source_col: str = "source"
) -> DataFrame:
    """Vocabulary Jaccard between every source pair — the corpus-mixture
    provenance matrix (which sources say the same things?).

    Shape at 100 TB: the distinct (source, word) table is bounded by
    |vocab| x |sources|, tiny next to the corpus; the word self-join fans
    out at most |sources|² per word. One explode + distinct shuffle, one
    equi-join — no doc-level pair blowup."""
    vocab = (
        df.select(F.col(source_col).alias("source"), F.explode(words_col(text_col)).alias("word"))
        .distinct()
    )
    sizes = vocab.groupBy("source").agg(F.count(F.lit(1)).alias("n_words"))
    a, b = vocab.alias("a"), vocab.alias("b")
    shared = (
        a.join(b, (F.col("a.word") == F.col("b.word")) & (F.col("a.source") < F.col("b.source")))
        .groupBy(F.col("a.source").alias("source_a"), F.col("b.source").alias("source_b"))
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    sa = sizes.select(F.col("source").alias("source_a"), F.col("n_words").alias("na"))
    sb = sizes.select(F.col("source").alias("source_b"), F.col("n_words").alias("nb"))
    return (
        shared.join(sa, "source_a")
        .join(sb, "source_b")
        .withColumn("jaccard", F.col("shared") / (F.col("na") + F.col("nb") - F.col("shared")))
        .select("source_a", "source_b", "shared", "na", "nb", "jaccard")
    )


def per_lang_quality_filter_threshold(
    df: DataFrame,
    quantile: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
    lang_col: str = "lang",
    approx: bool = False,
) -> DataFrame:
    """Per-language quality gate via an aggregated THRESHOLD + broadcast
    join — the 100 TB shape of :func:`per_lang_quality_filter`.

    The window formulation shuffles the whole corpus on ``lang`` (hot-key
    skew: en is most of the data). This one aggregates a per-language
    score quantile (partial-aggregated, tiny result), broadcasts it, and
    gates map-side — the corpus is never shuffled. ``approx=True`` swaps
    the exact percentile for ``approx_percentile`` (t-digest-style sketch,
    mergeable, fixed memory) — the production default at scale; the exact
    variant is the oracle-checkable twin. Thresholds are rounded to 6
    decimals on both engines so interpolation ulp noise cannot flip the
    boundary comparison.
    """
    q = quality_score(df, text_col, id_col, passthrough=(lang_col,)).select(
        id_col, lang_col, "quality_score"
    )
    fn = "approx_percentile" if approx else "percentile"
    thresholds = q.groupBy(lang_col).agg(
        F.round(F.expr(f"{fn}(quality_score, {quantile})"), 6).alias("lang_threshold")
    )
    return (
        q.join(F.broadcast(thresholds), lang_col)
        .filter(F.col("quality_score") >= F.col("lang_threshold"))
        .select(id_col, lang_col, "quality_score", "lang_threshold")
    )


def unigram_logprob(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-document average token negative log-probability under the
    corpus's own unigram model — the shape of the CCNet/Wikipedia-LM
    perplexity quality filter with a unigram model standing in for the
    KenLM n-gram model (the pipeline shape is identical; swap the
    probability table to upgrade the model).

    Two shuffles: token-count agg for the model (vocab-sized result,
    broadcast back) and the per-doc average. The token explode is
    materialized ONCE (single-fold discipline — vocab, total, and the
    scoring join all consume the same fold, and Catalyst's projection
    collapse would otherwise re-run it per consumer); the corpus token
    total is derived from the vocab counts IN-PLAN (1-row broadcast
    cross join), not via a driver-side count action. Log/exp are rounded
    to 6 decimals so cross-engine libm ulp differences cannot flip
    equality (same discipline as TF-IDF, t22).

    Fault-tolerance caveat (ADVICE r5): localCheckpoint stores the fold's
    blocks on executor-local storage WITHOUT lineage — losing an executor
    mid-job fails the query instead of recomputing. At bench scale that
    trade is free; on a 1000-executor run where the exploded fold is the
    pipeline's largest intermediate, prefer
    ``persist(StorageLevel.DISK_ONLY)`` (keeps lineage, spills off-heap)
    or a reliable ``checkpoint()`` to shared storage, at the cost of one
    extra write pass. The single-fold goal — explode the corpus's tokens
    exactly once for all three consumers — is the invariant; the storage
    tier is deployment policy."""
    tokens = df.select(
        F.col(id_col).alias("doc"), F.explode(words_col(text_col)).alias("term")
    ).localCheckpoint(eager=True)
    # vocab is consumed twice (the corpus total and the scoring join);
    # materialize it once so the term-level shuffle runs once, not per
    # consumer (vocab-sized — far smaller than the fold)
    vocab = tokens.groupBy("term").agg(F.count(F.lit(1)).alias("tf")).localCheckpoint(eager=True)
    total = vocab.agg(F.sum("tf").cast("double").alias("_n"))
    scored = (
        tokens.join(F.broadcast(vocab), "term")
        .crossJoin(F.broadcast(total))
        .withColumn("_nlp", -F.log(F.col("tf") / F.col("_n")))
    )
    return (
        scored.groupBy("doc")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.round(F.avg("_nlp"), 6).alias("avg_neg_logprob"),
        )
        .withColumn("pseudo_ppl", F.round(F.exp(F.col("avg_neg_logprob")), 6))
        .select(F.col("doc").alias(id_col), "n_tokens", "avg_neg_logprob", "pseudo_ppl")
    )


def bigram_stupid_backoff(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_count: int = 2,
    alpha: float = 0.4,
) -> DataFrame:
    """Per-document bigram-LM score with Stupid Backoff — the published
    distributed n-gram recipe (Brants et al., "Large Language Models in
    Machine Translation", EMNLP 2007): the bigram model keeps only
    n-grams with count >= ``min_count`` (pruning IS the scale mechanism
    — model size is bounded by type frequency, not corpus size), and a
    scored bigram missing from the pruned model backs off to
    ``alpha * C(b) / N`` on the unigram. No normalization pass over the
    model (that is the "stupid" part, and why it distributes: scores are
    pure count ratios, composable from map-side-combined aggregates).

    One bigram fold (zip_with over the token array — no shuffle to form
    pairs), materialized once for both the model aggregate and the
    scoring join; the unigram table and corpus total are vocab-sized and
    broadcast. The model join is a plain equi-join on (a, b) that AQE
    sizes (broadcast when pruned small, shuffle otherwise) — at 100 TB
    the pruned bigram table is the only non-broadcast side and shuffles
    model-typed rows, never the corpus. Upgrade path: the same plan with
    trigram structs is the full Brants pipeline.

    Docs with fewer than two tokens have no bigrams and are excluded
    (explode of an empty array yields no rows). ln/avg rounded to 6
    decimals for cross-engine ulp stability (t22/t32 discipline).
    """
    bigrams = (
        df.select(F.col(id_col).alias("doc"), words_col(text_col).alias("_ws"))
        .filter(F.size("_ws") >= 2)
        .select(
            "doc",
            F.explode(
                F.expr(
                    "zip_with(slice(_ws, 1, size(_ws) - 1),"
                    " slice(_ws, 2, size(_ws) - 1), (x, y) -> struct(x as a, y as b))"
                )
            ).alias("_p"),
        )
        .select("doc", "_p.a", "_p.b")
        .localCheckpoint(eager=True)
    )
    uni = (
        df.select(F.explode(words_col(text_col)).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("uc"))
        .localCheckpoint(eager=True)
    )
    total = uni.agg(F.sum("uc").cast("double").alias("_n"))
    model = (
        bigrams.groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("bc"))
        .filter(F.col("bc") >= min_count)
    )
    ua = uni.select(F.col("term").alias("a"), F.col("uc").alias("_ca"))
    ub = uni.select(F.col("term").alias("b"), F.col("uc").alias("_cb"))
    scored = (
        bigrams.join(model, ["a", "b"], "left")
        .join(F.broadcast(ua), "a")
        .join(F.broadcast(ub), "b")
        .crossJoin(F.broadcast(total))
        .withColumn(
            "_s",
            F.when(
                F.col("bc").isNotNull(), F.col("bc") / F.col("_ca")
            ).otherwise(F.lit(alpha) * F.col("_cb") / F.col("_n")),
        )
    )
    return (
        scored.groupBy("doc")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.round(F.avg(-F.log("_s")), 6).alias("avg_neg_logscore"),
        )
        .withColumn("pseudo_ppl", F.round(F.exp(F.col("avg_neg_logscore")), 6))
        .select(F.col("doc").alias(id_col), "n_bigrams", "avg_neg_logscore", "pseudo_ppl")
    )


def rebalance_sources(
    df,
    targets: dict[str, float],
    id_col: str = "doc_id",
    source_col: str = "source",
) -> DataFrame:
    """Deterministic mixture rebalancing: subsample each source so the
    OUTPUT matches the target source proportions (Pile/Dolma-style data
    mixing), without replacement and without rand().

    The largest feasible output under proportions ``p_s`` keeps
    ``M = min_s(count_s / p_s)`` total rows, ``p_s·M`` from source ``s``.
    Selection is a portable-hash gate (keep the lowest-hash fraction),
    so membership is reproducible across engines, partitionings, and
    re-runs — the same discipline as t24. Sources not in ``targets`` are
    dropped. Keep-rates ride a broadcast join; the corpus is gated
    map-side (one scan, zero corpus shuffle)."""
    sess = df.sparkSession
    counts = {r["s"]: r["c"] for r in df.groupBy(F.col(source_col).alias("s")).agg(F.count(F.lit(1)).alias("c")).collect()}
    m = min(counts.get(s, 0) / p for s, p in targets.items() if p > 0)
    rates = [(s, min(1.0, (p * m) / counts[s])) for s, p in targets.items() if counts.get(s)]
    rates_df = local_df(sess, rates, f"{source_col} string, keep_rate double")
    gate = F.expr(PH.format(x=f"cast({id_col} as string)")) % 1_000_000
    return (
        df.join(F.broadcast(rates_df), source_col)
        .filter(gate < F.round(F.col("keep_rate") * 1_000_000, 0))
        .select(id_col, source_col, "keep_rate")
    )


def boilerplate_coverage(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 2,
    df_pct: int = 7,
    keep_max_pct: int = 50,
) -> DataFrame:
    """Corpus-level boilerplate detection (C4/RefinedWeb-style cleanup):
    a word ``n``-gram is boilerplate when it appears in at least
    ``df_pct``% of documents; each document reports what fraction of its
    distinct grams are boilerplate and a keep flag (``bp_frac`` at most
    ``keep_max_pct``%).

    Thresholds are integer percentages compared with integer arithmetic
    (``gram_df * 100 >= df_pct * n_docs``) so the cut is exact and
    portable — no float rounding at the boundary.

    Scale shape: the exploded postings are materialized ONCE (same
    discipline as ngram_jaccard_pairs — three consumers would each rerun
    the shingling fold); gram document-frequency is a map-side-combinable
    groupBy; the boilerplate gram set is tiny by construction (grams in
    >= df_pct% of docs follow a Zipf head) and rides a broadcast join, so
    the corpus itself is shuffled only for the two per-doc groupBys.
    Documents with fewer than ``n`` words have no grams and are excluded,
    matching the oracle's ``len(ws) >= n`` gate."""
    from .dedup import with_word_ngrams

    grams = with_word_ngrams(df, text_col, n).select(id_col, "grams")
    postings = (
        grams.select(id_col, F.explode("grams").alias("gram"))
        .repartition("gram")
        .localCheckpoint(eager=True)
    )
    # 1-row corpus size, broadcast-cross-joined so the threshold stays in-plan
    n_docs = postings.agg(F.count_distinct(F.col(id_col)).alias("n_docs"))
    bp = (
        postings.groupBy("gram")
        .agg(F.count(F.lit(1)).alias("gram_df"))
        .crossJoin(F.broadcast(n_docs))
        .filter(F.col("gram_df") * 100 >= F.lit(df_pct) * F.col("n_docs"))
        .select("gram")
    )
    sizes = postings.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_grams"))
    hits = (
        postings.join(F.broadcast(bp), "gram")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_bp"))
    )
    return (
        sizes.join(hits, id_col, "left")
        .withColumn("n_bp", F.coalesce(F.col("n_bp"), F.lit(0)).cast("long"))
        .withColumn("bp_frac", F.col("n_bp") / F.col("n_grams"))
        .withColumn("keep", F.col("n_bp") * 100 <= F.lit(keep_max_pct) * F.col("n_grams"))
        .select(id_col, F.col("n_grams").cast("long").alias("n_grams"), "n_bp", "bp_frac", "keep")
    )


# PII patterns: conservative, layered most-specific-first so an email is
# redacted as [EMAIL] before the phone pattern can eat its digit runs.
# Java and RE2/DuckDB regex syntax agree on this subset (no lookaround,
# no backreferences) — the same pattern strings work in both engines.
PII_PATTERNS: tuple[tuple[str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"),
    ("ipv4", r"\b(?:\d{1,3}\.){3}\d{1,3}\b"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b"),
    ("phone", r"(?:\+?\d{1,2}[ .-]?)?\(?\d{3}\)?[ .-]?\d{3}[ .-]?\d{4}\b"),
)


def redact_pii(
    df: DataFrame,
    text_col: str = "text",
    kinds: tuple[str, ...] = ("email", "ipv4", "ssn", "phone"),
    out_col: str | None = None,
) -> DataFrame:
    """Replace PII spans with ``[KIND]`` placeholders and count the
    redactions per kind — the scrubbing pass a training-data pipeline
    runs before anything leaves the raw zone.

    Pure ``regexp_replace``/``regexp_count`` column expressions: the whole
    pass is one narrow map stage inside whole-stage codegen — zero
    shuffles, zero Python, linear at 100 TB. Patterns apply in
    PII_PATTERNS order (most specific first) so overlapping matches
    resolve deterministically."""
    out = out_col or text_col
    order = [k for k, _ in PII_PATTERNS if k in kinds]
    unknown = set(kinds) - {k for k, _ in PII_PATTERNS}
    if unknown:
        raise ValueError(f"redact_pii: unknown kinds {sorted(unknown)}")
    pats = dict(PII_PATTERNS)
    col = F.col(text_col)
    for k in order:
        df = df.withColumn(f"n_{k}", F.regexp_count(col, F.lit(pats[k])).cast("long"))
        col = F.regexp_replace(col, pats[k], f"[{k.upper()}]")
    return df.withColumn(out, col)


def stratified_quality_sample(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 10,
    keep_per_bucket_pct: int = 20,
) -> DataFrame:
    """Quality-stratified sampling: bucket documents by their unigram-LM
    score (ntile over avg_neg_logprob) and keep a deterministic
    hash-gated fraction of EACH bucket — uniform coverage across the
    quality spectrum instead of truncating at a single threshold (the
    sampling side of the CCNet head/middle/tail split).

    The hash gate is the t24/t33 discipline: membership depends only on
    the id, never rand() or partitioning, so the sample is reproducible
    across engines and re-runs. ntile's global sort is over doc-level
    scores (corpus-count rows, not token-count); at extreme scale swap it
    for approx_percentile boundaries + a broadcast bucket map — the t31
    aggregate+broadcast form of the same gate."""
    from pyspark.sql.window import Window

    scored = unigram_logprob(df, text_col, id_col)
    w = Window.orderBy(F.col("avg_neg_logprob").asc(), F.col(id_col).asc())
    bucketed = scored.withColumn("bucket", F.ntile(n_buckets).over(w))
    gate = F.expr(PH.format(x=f"cast({id_col} as string)")) % 100
    return (
        bucketed.filter(gate < keep_per_bucket_pct)
        .select(id_col, "bucket", "avg_neg_logprob", "pseudo_ppl")
    )


def importance_logratio(
    df: DataFrame,
    is_target,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """DSIR-shaped data-selection importance weights (Xie et al. 2023,
    arXiv:2302.03169): score every document by
    ``avg_w [ log p_target(w) - log p_raw(w) ]`` under add-one-smoothed
    bag-of-words unigram models — the target model fit on the rows where
    ``is_target`` holds (DSIR's hashed-ngram features reduce to exactly
    this at n=1), the raw model on the whole corpus. Documents whose
    language looks like the target domain score positive; sampling
    ∝ exp(weight) (or a deterministic hash gate on the rounded weight)
    yields the DSIR-selected subset.

    Plan shape (the t32 discipline): the token explode is materialized
    ONCE and feeds both model fits and the scoring join; vocab and the
    totals are broadcast back, so the corpus shuffles exactly twice
    (model agg + per-doc agg). Smoothing is over the JOINT vocabulary, so
    both models are proper distributions on the same support. Log output
    rounded to 6 decimals (libm-ulp-proof, as everywhere).

    See :func:`unigram_logprob` for the single-model perplexity filter
    and the 100 TB storage-tier note on the token fold.
    """
    toks = df.select(
        F.col(id_col).alias("doc"),
        is_target.cast("boolean").alias("_tgt"),
        F.explode(words_col(text_col)).alias("term"),
    ).localCheckpoint(eager=True)
    # vocab feeds both the totals and the scoring join: materialize once
    # (vocab-sized) so the term shuffle runs exactly once
    vocab = toks.groupBy("term").agg(
        F.sum(F.when(F.col("_tgt"), 1).otherwise(0)).alias("tf_t"),
        F.count(F.lit(1)).alias("tf_all"),
    ).localCheckpoint(eager=True)
    totals = vocab.agg(
        F.sum("tf_t").cast("double").alias("_Tt"),
        F.sum("tf_all").cast("double").alias("_Ta"),
        F.count(F.lit(1)).cast("double").alias("_V"),
    )
    scored = (
        toks.join(F.broadcast(vocab), "term")
        .crossJoin(F.broadcast(totals))
        .withColumn(
            "_lr",
            F.log((F.col("tf_t") + 1) / (F.col("_Tt") + F.col("_V")))
            - F.log((F.col("tf_all") + 1) / (F.col("_Ta") + F.col("_V"))),
        )
    )
    return (
        scored.groupBy("doc")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.round(F.avg("_lr"), 6).alias("avg_logratio"),
        )
        .select(F.col("doc").alias(id_col), "n_tokens", "avg_logratio")
    )


GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_rules(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_words: int = 50,
    max_words: int = 100_000,
    min_avg_word_len: float = 3.0,
    max_avg_word_len: float = 10.0,
    max_symbol_word_ratio: float = 0.1,
    max_bullet_frac: float = 0.9,
    max_ellipsis_frac: float = 0.3,
    min_alpha_word_frac: float = 0.8,
    min_stopword_hits: int = 2,
) -> DataFrame:
    """Gopher quality-rule gates (Rae et al. 2021, "Scaling Language
    Models", Table A1 repetition/quality filters — the canonical
    rule-based pretraining filter set; also the basis of RefinedWeb /
    Dolma rule stages):

    word count bounds, mean-word-length bounds, symbol-to-word ratio
    ('#' and ellipsis), bullet-line / ellipsis-line fractions, fraction
    of words containing an alphabetic character, and the >=N-distinct-
    stopwords rule. Emits the measured metrics, one boolean per rule,
    and an overall ``pass_gopher``.

    Every term is a per-row scalar expression (zero shuffle, whole-stage
    codegen) — the same 100 TB shape as quality_score/t10. Ratios are
    rounded to 6 decimals so engine oracles hash identically.
    """
    t = F.col(text_col)
    ws = words_col(text_col)
    n_words = F.size(ws).cast("long")
    nw = F.greatest(n_words, F.lit(1)).cast("double")
    sum_word_len = F.aggregate(ws, F.lit(0), lambda acc, w: acc + F.length(w))
    avg_word_len = F.round(sum_word_len.cast("double") / nw, 6)
    n_hash = F.length(t) - F.length(F.expr(f"replace({text_col}, '#', '')"))
    n_ellipsis = (
        (F.length(t) - F.length(F.expr(f"replace({text_col}, '...', '')"))) / F.lit(3)
        + F.length(t)
        - F.length(F.expr(f"replace({text_col}, '…', '')"))
    ).cast("long")
    symbol_ratio = F.round((n_hash + n_ellipsis).cast("double") / nw, 6)
    lines = F.split(t, "\n")
    nl = F.greatest(F.size(lines), F.lit(1)).cast("double")
    bullet_frac = F.round(
        F.size(F.filter(lines, lambda l: l.substr(1, 1).isin("-", "*", "•"))).cast("double") / nl, 6
    )
    ellipsis_frac = F.round(
        F.size(F.filter(lines, lambda l: l.endswith("...") | l.endswith("…"))).cast("double") / nl, 6
    )
    alpha_frac = F.round(
        F.size(F.filter(ws, lambda w: w.rlike("[a-z]"))).cast("double") / nw, 6
    )
    stop_hits = F.size(
        F.filter(F.array(*[F.lit(s) for s in GOPHER_STOPWORDS]), lambda s: F.array_contains(ws, s))
    ).cast("long")
    rules = {
        "rule_word_count": (n_words >= min_words) & (n_words <= max_words),
        "rule_avg_word_len": (avg_word_len >= min_avg_word_len) & (avg_word_len <= max_avg_word_len),
        "rule_symbol_ratio": symbol_ratio < max_symbol_word_ratio,
        "rule_bullets": bullet_frac <= max_bullet_frac,
        "rule_ellipsis": ellipsis_frac <= max_ellipsis_frac,
        "rule_alpha_words": alpha_frac >= min_alpha_word_frac,
        "rule_stopwords": stop_hits >= min_stopword_hits,
    }
    pass_all = None
    for expr in rules.values():
        pass_all = expr if pass_all is None else (pass_all & expr)
    return df.select(
        id_col,
        n_words.alias("n_words"),
        avg_word_len.alias("avg_word_len"),
        symbol_ratio.alias("symbol_word_ratio"),
        bullet_frac.alias("bullet_line_frac"),
        ellipsis_frac.alias("ellipsis_line_frac"),
        alpha_frac.alias("alpha_word_frac"),
        stop_hits.alias("stopword_hits"),
        *[expr.alias(name) for name, expr in rules.items()],
        pass_all.alias("pass_gopher"),
    )


def source_lang_mix(
    df: DataFrame, source_col: str = "source", lang_col: str = "lang", id_col: str = "doc_id"
) -> DataFrame:
    """Per-source language-composition report: document counts, language
    share, Shannon entropy of the language distribution (bits), and the
    majority language + share — the standard corpus-composition audit
    before fixing a training mixture (what CCNet/mC4 report per dump).

    Two map-side-combined aggregations on (source, lang) then (source) —
    shuffle volume ∝ distinct pairs, independent of corpus size; the
    entropy fold is an exact left-to-right sum over the sorted language
    list so both engines hash identically (rounded to 6 decimals)."""
    by_pair = df.groupBy(source_col, lang_col).agg(F.count(F.lit(1)).alias("n"))
    per_source = by_pair.groupBy(source_col).agg(
        F.sum("n").alias("n_docs"),
        F.max_by(F.col(lang_col), F.struct(F.col("n"), F.col(lang_col))).alias("majority_lang"),
        F.max(F.struct(F.col("n"), F.col(lang_col))).getField("n").alias("_mn"),
        F.sort_array(F.collect_list(F.struct(F.col(lang_col).alias("l"), F.col("n").alias("c")))).alias("_dist"),
    )
    total = F.col("n_docs").cast("double")
    entropy = F.aggregate(
        F.col("_dist"),
        F.lit(0.0),
        lambda acc, e: acc - (e["c"] / total) * F.log2(e["c"] / total),
    )
    return per_source.select(
        source_col,
        "n_docs",
        F.size("_dist").alias("n_langs"),
        "majority_lang",
        F.round(F.col("_mn") / total, 6).alias("majority_share"),
        F.round(entropy, 6).alias("lang_entropy_bits"),
    )

def ccnet_perplexity_buckets(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    lang_col: str = "lang",
) -> DataFrame:
    """CCNet-style per-language perplexity bucketing: score every
    document under the corpus's own unigram LM (`unigram_logprob` — the
    KenLM stand-in with the identical pipeline shape) and split each
    language into equal head / middle / tail terciles by perplexity
    (CCNet §4.3: the head third is kept for training, the middle
    retained for filtering experiments, the tail dropped).

    Bucketing uses ``percent_rank`` over (lang) ordered by
    (avg_neg_logprob, doc_id) — the id tiebreak makes ranks, and hence
    buckets, deterministic. One window exchange on ``lang``; the LM
    scoring underneath is the two bounded shuffles of
    `unigram_logprob`. 100 TB note: lang is a skewed key (en dominates)
    — the threshold form of this gate (compute per-lang tercile cut
    points as a lang-sized aggregate, broadcast, gate map-side — the
    t31 pattern) replaces the window exchange when one language is a
    double-digit fraction of the corpus; the window form here keeps the
    oracle exact for ties at the cut point.

    Docs with zero tokens have no perplexity and are excluded (same as
    CCNet, which drops empty pages upstream).
    """
    from pyspark.sql import Window

    scored = unigram_logprob(df, text_col, id_col).join(
        df.select(id_col, lang_col), id_col
    )
    pr = F.percent_rank().over(
        Window.partitionBy(lang_col).orderBy(
            F.col("avg_neg_logprob").asc(), F.col(id_col).asc()
        )
    )
    bucket = (
        F.when(pr * 3 < 1, F.lit("head"))
        .when(pr * 3 < 2, F.lit("middle"))
        .otherwise(F.lit("tail"))
    )
    return scored.select(
        F.col(id_col),
        F.col(lang_col),
        "n_tokens",
        "avg_neg_logprob",
        "pseudo_ppl",
        bucket.alias("ppl_bucket"),
    )

def temperature_mixture(
    df: DataFrame,
    alpha: float = 0.5,
    id_col: str = "doc_id",
    source_col: str = "source",
) -> DataFrame:
    """Temperature-based mixture sampling (GPT-3 appendix A / PaLM /
    multilingual-T5 alpha-mixing): target source proportions are the
    ALPHA-POWERED size shares ``p_s = c_s^alpha / sum(c^alpha)`` —
    alpha=1 keeps natural proportions, alpha->0 flattens toward uniform,
    0.5 is the customary compromise that up-weights small sources
    without drowning large ones. The actual subsampling is
    :func:`rebalance_sources` (deterministic hash gate, zero corpus
    shuffle; the per-source math is a |sources|-sized driver fold).

    Cross-engine determinism: alpha=0.5 uses ``math.sqrt`` (IEEE
    correctly-rounded, matching SQL ``sqrt``) and the weight total is a
    SOURCE-ORDERED left-to-right fold, so the oracle reproduces every
    double bit-exactly; other alphas use ``pow``, whose last-ulp
    behavior libms do not pin — fine for production, not for the hash
    gate.
    """
    import math

    counts = sorted(
        (r["s"], r["c"])
        for r in df.groupBy(F.col(source_col).alias("s"))
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    )
    wfun = math.sqrt if alpha == 0.5 else (lambda c: c**alpha)
    weights = [(s, wfun(float(c))) for s, c in counts]
    total = 0.0
    for _s, w in weights:  # fixed order: source-sorted left-to-right
        total += w
    targets = {s: w / total for s, w in weights}
    return rebalance_sources(df, targets, id_col, source_col)


def hashed_features(
    df: DataFrame,
    dim: int = 64,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Signed feature hashing (the hashing trick, Weinberger et al. 2009):
    each token hashes to one of ``dim`` buckets via the portable 60-bit
    md5 hash and contributes ±1 (sign from the next hash bit), giving a
    fixed-width sparse bag-of-words without any vocabulary pass — the
    standard featurizer in front of linear quality/topic classifiers at
    corpus scale (Vowpal Wabbit's input layer; the same role fastText's
    hashed n-gram bins play).

    Returns the sparse form ``(doc_id, dim_idx, weight)`` with zero
    entries absent. One explode + one map-side-combined groupBy on
    (doc, dim): shuffle volume ≤ |docs| × dim rows regardless of corpus
    text size, and the hash is an in-codegen expression — no Python, no
    vocabulary state, linear at 100 TB. Integer weights make the result
    exactly portable across engines (no float addition order)."""
    h = F.expr(PH.format(x="term"))
    # independent salted hash for the sign bit (Weinberger's ξ): reusing
    # bits of the bucket hash would correlate sign with bucket
    hs = F.expr(PH.format(x="concat('sgn|', term)"))
    tok = df.select(F.col(id_col), F.explode(words_col(text_col)).alias("term"))
    return (
        tok.select(
            id_col,
            F.pmod(h, F.lit(dim)).cast("int").alias("dim_idx"),
            (F.lit(1) - F.lit(2) * F.pmod(hs, F.lit(2)).cast("int")).alias("_sign"),
        )
        .groupBy(id_col, "dim_idx")
        .agg(F.sum("_sign").cast("long").alias("weight"))
    )


def pmi_cooccurrence(
    df: DataFrame,
    window: int = 3,
    min_count: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Directional windowed co-occurrence PMI (church & Hanks 1990):
    pairs (a, b) where b follows a within ``window`` tokens, kept when
    the pair count reaches ``min_count``; PMI uses pair-table
    probabilities (left/right marginals over the pair multiset) so every
    input to the log is an exact integer count.

    Pair generation is a pure nested-``transform`` expression over the
    token array — the k·|tokens| expansion happens INSIDE the row, no
    self-join, no shuffle until the count aggregates (all map-side
    combined). Marginals and the total are broadcast back onto the
    surviving pairs (vocabulary-sized tables vs a corpus-sized pair
    stream). At 100 TB: three linear aggregates + two broadcast joins."""
    ws = words_col(text_col)
    # project the token array into a NAMED COLUMN before the nested
    # expansion: every element_at/size reference inside the lambdas
    # otherwise re-inlines the full lower+split of the text (Catalyst
    # projection collapse) — measured 21 s -> <1 s on sf0.1 (review r9;
    # same trap as training/dedup.py's signature folds)
    wdf = df.where(F.size(ws) >= 2).select(ws.alias("_ws"))
    w = F.col("_ws")
    pairs_expr = F.flatten(
        F.transform(
            F.sequence(F.lit(0), F.size(w) - 2),
            lambda i: F.transform(
                F.sequence(i + 1, F.least(i + F.lit(window), F.size(w) - 1)),
                lambda j: F.struct(
                    F.element_at(w, i + 1).alias("a"),
                    F.element_at(w, j + 1).alias("b"),
                ),
            ),
        )
    )
    pairs = wdf.select(F.explode(pairs_expr).alias("p")).select("p.a", "p.b")
    # ONE corpus scan: the full pair-count table is the reduction every
    # marginal derives from (pair-TYPE cardinality, vocab²-bounded — vs
    # re-scanning the corpus per marginal, which the naive 4-aggregate
    # formulation does). localCheckpoint, not persist: blocks release
    # when the frame is unreachable, while a CacheManager entry would
    # outlive the query for the whole session (review r9)
    pc = (
        pairs.groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("pair_count"))
        .localCheckpoint(eager=True)
    )
    left = pc.groupBy("a").agg(F.sum("pair_count").alias("ca"))
    right = pc.groupBy("b").agg(F.sum("pair_count").alias("cb"))
    total = pc.agg(F.sum("pair_count").alias("np"))
    return (
        pc.where(F.col("pair_count") >= min_count)
        .join(F.broadcast(left), "a")
        .join(F.broadcast(right), "b")
        .crossJoin(F.broadcast(total))
        .select(
            "a",
            "b",
            "pair_count",
            F.round(
                F.log(
                    (F.col("pair_count").cast("double") * F.col("np").cast("double"))
                    / (F.col("ca").cast("double") * F.col("cb").cast("double"))
                ),
                6,
            ).alias("pmi"),
        )
    )


def select_token_budget(
    df: DataFrame,
    budget_num: int = 1,
    budget_den: int = 2,
    n_buckets: int = 256,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Quality-ranked data selection under a token budget — the "build
    the training mix" step: rank documents by the :func:`quality_score`
    composite (ties broken by id), take them in order until the corpus
    token budget (``budget_num/budget_den`` of total tokens) is spent.
    Selection is integer-exact (``cum*den <= total*num`` — no float
    boundary), so the kept set is bit-identical across engines.

    The global running total is a DISTRIBUTED PREFIX SUM, not a
    single-partition window (same shape as :func:`shard_manifest`):
    the rounded score's value range defines ``n_buckets`` ordered
    segments, within-segment cumsums are windows PARTITIONED by
    segment, and the cross-segment offsets are an ``n_buckets``-row
    broadcast — no corpus-sized single-partition operator at 100 TB.
    Returns (doc_id, n_tokens, cum_tokens, selected) for EVERY doc.
    The output is deliberately UNORDERED: a global ``orderBy`` here
    makes the range-partitioner's sampling pass re-evaluate the whole
    window pipeline (the repartitionByRange trap, SCALE.md r9 — bench
    r10 measured it 0.6 s -> 2.3 s at sf0.1); consumers that need a
    pinned order sort AFTER a barrier on this narrow verdict table
    (the t60 entry does exactly that)."""
    from pyspark.sql.window import Window

    qs = quality_score(df, text_col, id_col).select(
        id_col,
        F.col("n_words").alias("n_tokens"),
        F.round("quality_score", 6).alias("_s"),
    )
    # descending score -> ascending segment; score is bounded [0, 1]
    seg = F.least(
        F.lit(n_buckets - 1),
        F.greatest(F.lit(0), F.floor((F.lit(1.0) - F.col("_s")) * n_buckets)),
    ).cast("int")
    # pin the NARROW (id, tokens, score, segment) projection: the main
    # window, the segment offsets, and the total are three consumers,
    # and without the barrier each re-scans the corpus TEXT column and
    # recomputes the score (review r9 — the t57 lesson; this table is
    # ~25 bytes/doc vs the full text)
    toks = qs.withColumn("_seg", seg).localCheckpoint(eager=True)
    w_in = (
        Window.partitionBy("_seg")
        .orderBy(F.col("_s").desc(), F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_seg = Window.orderBy("_seg").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    offsets = (
        toks.groupBy("_seg")
        .agg(F.sum("n_tokens").alias("_segtot"))
        .withColumn("_off", F.sum("_segtot").over(w_seg) - F.col("_segtot"))
        .select("_seg", "_off")
    )
    total = toks.agg(F.sum("n_tokens").alias("_tot"))
    return (
        toks.withColumn("_cum_in", F.sum("n_tokens").over(w_in))
        .join(F.broadcast(offsets), "_seg")
        .crossJoin(F.broadcast(total))
        .select(
            id_col,
            "n_tokens",
            (F.col("_cum_in") + F.col("_off")).alias("cum_tokens"),
            (
                (F.col("_cum_in") + F.col("_off")) * budget_den
                <= F.col("_tot") * budget_num
            ).alias("selected"),
        )
    )


def c4_rules(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_words_per_line: int = 5,
    min_sentences: int = 3,
) -> DataFrame:
    """C4 heuristic cleaning (Raffel et al. 2020 §2.2 — the T5 corpus
    rules; also the "C4 stage" of RedPajama/Dolma/FineWeb pipelines):

    - keep only LINES that end in terminal punctuation, carry at least
      ``min_words_per_line`` words, and don't mention javascript;
    - drop DOCS with fewer than ``min_sentences`` sentences after line
      cleaning, or containing "lorem ipsum" or a curly brace.

    Emits per-doc line/sentence counts, the page-level flags, the
    overall ``keep_c4``, and the cleaned text (``clean`` column) for
    downstream stages. Every term is a per-row scalar expression over
    one line-split — zero shuffle, whole-stage codegen, linear at
    100 TB (t61's shape). Word counts are space-counts + 1, a
    formulation both Spark and an oracle engine state identically."""
    t = F.col(text_col)
    lines = F.split(t, "\n")
    kept = F.filter(
        lines,
        lambda l: l.rlike('[.!?"]$')
        & (
            (F.length(l) - F.length(F.replace(l, F.lit(" "), F.lit(""))) + 1)
            >= min_words_per_line
        )
        & ~F.lower(l).contains("javascript"),
    )
    clean = F.array_join(kept, "\n")
    n_sentences = F.regexp_count(clean, F.lit(r"[.!?]")).cast("long")
    has_lorem = F.lower(t).contains("lorem ipsum")
    has_brace = t.contains("{")
    return df.select(
        id_col,
        F.size(lines).cast("long").alias("n_lines"),
        F.size(kept).cast("long").alias("n_kept_lines"),
        n_sentences.alias("n_sentences"),
        has_lorem.alias("has_lorem"),
        has_brace.alias("has_brace"),
        (
            (n_sentences >= min_sentences) & ~has_lorem & ~has_brace
        ).alias("keep_c4"),
        clean.alias("clean"),
    )


# HTML -> text extraction steps, applied in order. Java and RE2 agree on
# this subset (character classes, non-greedy [\s\S]*?, alternation — no
# lookaround, no backreferences, no inline flags), so the SAME pattern
# literals run in Spark and in a DuckDB oracle. Block-level tags become
# newlines BEFORE the generic tag strip so paragraph structure survives;
# &amp; decodes LAST so entities never double-decode.
HTML_STRIP_STEPS: tuple[tuple[str, str], ...] = (
    (r"<script[^>]*>[\s\S]*?</script>", " "),
    (r"<style[^>]*>[\s\S]*?</style>", " "),
    (r"<!--[\s\S]*?-->", " "),
    (r"</?(?:br|p|div|h[1-6]|li|tr|table|ul|ol)[^>]*>", "\n"),
    (r"<[^>]+>", " "),
)
HTML_ENTITIES: tuple[tuple[str, str], ...] = (
    ("&nbsp;", " "),
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&amp;", "&"),
)
HTML_WS_STEPS: tuple[tuple[str, str], ...] = (
    (r"[ \t]+", " "),
    (r" ?\n ?", "\n"),
    (r"\n+", "\n"),
)


def html_to_text(
    df: DataFrame, html_col: str = "html", out_col: str = "text"
) -> DataFrame:
    """Boilerplate-stripping HTML -> text extraction — the web-crawl
    ingestion step ahead of every filter in a C4/FineWeb-style pipeline:
    script/style/comment blocks dropped, block-level tags mapped to
    newlines (paragraph structure survives for line-level rules like
    :func:`c4_rules`), remaining tags stripped, the six ubiquitous
    entities decoded, whitespace normalized.

    Deliberately a LAYERED REGEX pass, not a DOM parse: the whole
    extraction is one whole-stage-codegen projection (zero shuffles,
    zero Python — t61's plan shape, linear at 100 TB), the layering is
    deterministic, and every pattern is in the Java/RE2 common subset
    so an external engine can replay it byte-for-byte. For HTML in the
    wild, :func:`html_to_text_dom` (r11) is the quality upgrade: a real
    tokenizer behind the same contract, byte-identical on well-formed
    input and robust where the regexes provably leak (attribute values
    containing ``>``, exotic entities)."""
    c = F.col(html_col)
    for pat, repl in HTML_STRIP_STEPS:
        c = F.regexp_replace(c, pat, repl)
    for ent, ch in HTML_ENTITIES:
        c = F.replace(c, F.lit(ent), F.lit(ch))
    for pat, repl in HTML_WS_STEPS:
        c = F.regexp_replace(c, pat, repl)
    return df.withColumn(out_col, F.trim(c))


#: tag sets mirroring HTML_STRIP_STEPS so the DOM path below reproduces
#: the regex path byte-for-byte on well-formed input
_HTML_BLOCK_TAGS = frozenset(
    {"br", "p", "div", "h1", "h2", "h3", "h4", "h5", "h6", "li", "tr", "table", "ul", "ol"}
)
_HTML_SKIP_TAGS = frozenset({"script", "style"})


def html_to_text_dom(
    df: DataFrame, html_col: str = "html", out_col: str = "text"
) -> DataFrame:
    """DOM-parse upgrade path for :func:`html_to_text` (VERDICT r10 ask
    #7): a stdlib ``html.parser`` walk instead of layered regexes,
    running as an Arrow-batched ``mapInPandas`` stage exactly like the
    codec decoders (one Python stage, no shuffle — still linear at
    100 TB, at Python-worker cost instead of codegen). The regex form
    stays the oracle-replayable gate (t63); this path exists for HTML
    in the wild, where a tokenizer beats pattern layering:

    - a ``>`` inside an attribute value (``<a title="a>b">``) truncates
      the regex's generic tag strip mid-tag and leaks ``b">`` into the
      text; the parser tokenizes the attribute correctly;
    - EVERY character/entity reference decodes (the regex path decodes
      the six ubiquitous ones);
    - malformed nesting degrades locally instead of globally.

    Same contract as the regex path: script/style/comment content
    dropped, block tags -> newline, other tags -> space, whitespace
    normalized, space-trimmed. On well-formed input whose entities are
    the common six, output is byte-identical to :func:`html_to_text`
    (cross-checked in tests/test_text_ops.py)."""
    from pyspark.sql import types as T

    out_fields = [f for f in df.schema.fields if f.name != out_col]
    schema = T.StructType(out_fields + [T.StructField(out_col, T.StringType())])
    cols = [f.name for f in out_fields]

    def gen(batches):
        import re
        from html.parser import HTMLParser

        class _Extract(HTMLParser):
            def __init__(self):
                super().__init__(convert_charrefs=True)
                self.parts: list[str] = []
                self.skip = 0

            def handle_starttag(self, tag, attrs):
                if tag in _HTML_SKIP_TAGS:
                    self.skip += 1
                    self.parts.append(" ")
                else:
                    self.parts.append("\n" if tag in _HTML_BLOCK_TAGS else " ")

            def handle_endtag(self, tag):
                if tag in _HTML_SKIP_TAGS:
                    self.skip = max(0, self.skip - 1)
                    # the regex replaces the WHOLE block with one space,
                    # already emitted at the start tag
                else:
                    self.parts.append("\n" if tag in _HTML_BLOCK_TAGS else " ")

            def handle_data(self, data):
                if not self.skip:
                    self.parts.append(data)

            def handle_comment(self, data):
                self.parts.append(" ")

            def handle_decl(self, decl):
                self.parts.append(" ")

            def handle_pi(self, data):
                self.parts.append(" ")

        ws = [(re.compile(p), r) for p, r in HTML_WS_STEPS]

        def extract(h):
            if h is None:
                return None
            p = _Extract()
            p.feed(h)
            p.close()
            s = "".join(p.parts).replace("\xa0", " ")  # &nbsp; -> plain space
            for pat, repl in ws:
                s = pat.sub(repl, s)
            return s.strip(" ")

        for pdf in batches:
            pdf = pdf.copy()
            pdf[out_col] = [extract(h) for h in pdf[html_col]]
            yield pdf[cols + [out_col]]

    return df.mapInPandas(gen, schema)
