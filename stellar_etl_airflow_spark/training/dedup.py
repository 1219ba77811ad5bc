"""Deduplication operators for training-data pipelines.

Five families, all shuffle-conscious:

- exact           — md5-keyed groupBy (one shuffle on a 128-bit key).
- n-gram Jaccard  — inverted-index self-join on shared shingles; exact
                    similarity, quadratic only within shingle buckets.
- MinHash + LSH   — signatures computed per-row with higher-order array
                    functions (NO shuffle), then a band-bucket self-join
                    produces candidate pairs; the classic web-scale near-dup
                    design (shingle -> minhash -> band -> bucket-join).
- SimHash         — 60-bit per-doc sketch + hamming-distance candidate
                    filter (bit_count(xor)).
- embedding cosine— near-dup pairs over an embedding column; see
                    similarity.py for the LSH-bucketed scale path.

Hash functions derive from the portable md5-based PH primitive so results
are reproducible across engines (and oracle-checkable in DuckDB). At 100 TB
the per-row signature computation is embarrassingly parallel; the only
shuffles are the band-bucket exchange (small: B rows per doc) and the final
pair dedup.

References (public literature): Broder, "On the resemblance and
containment of documents" (1997) — MinHash/shingling; Charikar,
"Similarity estimation techniques from rounding algorithms" (STOC 2002) —
SimHash; Kirsch & Mitzenmacher, "Less hashing, same performance" (2006) —
the double-hashing family h_k = g1 + k*g2; Leskovec/Rajaraman/Ullman,
"Mining of Massive Datasets" ch.3 — the (bands, rows) LSH S-curve.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..session import spread

PH = "cast(conv(substr(md5({x}), 1, 15), 16, 10) as bigint)"


def words_sql(text_col: str) -> str:
    """THE tokenizer, as a SQL fragment: lower-cased whitespace-split
    words, empties dropped. Shared by the shingling fold
    (:func:`with_word_ngrams`) and the pushdown-safe word-count gate
    (:func:`_minhash_sig_frame`) — the gate is only equivalent to
    ``size(grams) > 0`` while both tokenize identically, so there must
    be exactly one definition (ADVICE r13)."""
    return f"filter(split(lower({text_col}), '\\\\s+'), x -> x != '')"


def with_word_ngrams(df: DataFrame, text_col: str = "text", n: int = 3, out_col: str = "grams") -> DataFrame:
    """Distinct lower-cased word n-gram shingles as an array column.

    Built as ONE aggregate fold over the word array: the accumulator keeps
    the trailing (n-1)-word window and the gram list. The word array
    appears exactly once in the expression tree — an indexed-transform
    formulation (element_at(ws, i+j)) would re-inline the full text split
    per index after Catalyst's projection collapse (measured ~20x slower).
    Stays entirely in the JVM; documents with < n words yield an empty
    array. ``n=1`` short-circuits to the distinct word array (the fold's
    window slice assumes n >= 2).
    """
    if n < 1:
        raise ValueError(f"with_word_ngrams: n must be >= 1, got {n}")
    df = spread(df)  # the fold is CPU-bound; never leave it on one scan split
    if n == 1:
        words = f"array_distinct({words_sql(text_col)})"
        return df.withColumn(out_col, F.expr(words))
    empty = "cast(array() as array<string>)"
    fold = (
        f"array_distinct(aggregate("
        f"{words_sql(text_col)}, "
        f"named_struct('win', {empty}, 'gs', {empty}), "
        f"(acc, w) -> named_struct("
        f"'win', CASE WHEN size(acc.win) = {n - 1} THEN concat(slice(acc.win, 2, {n - 2}), array(w)) "
        f"ELSE array_append(acc.win, w) END, "
        f"'gs', CASE WHEN size(acc.win) = {n - 1} THEN array_append(acc.gs, concat_ws(' ', array_append(acc.win, w))) "
        f"ELSE acc.gs END), "
        f"acc -> acc.gs))"
    )
    return df.withColumn(out_col, F.expr(fold))


def exact_duplicates(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact dedup via content hash: one row per distinct text, with the
    representative (min id) and the duplicate count."""
    return (
        df.groupBy(F.md5(F.col(text_col)).alias("content_hash"))
        .agg(F.min(id_col).alias("representative_id"), F.count(F.lit(1)).alias("dup_count"))
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs via an inverted-index self-join.

    shared(a,b) counted by joining the exploded (doc, gram) postings on
    gram; |a|,|b| are distinct-gram counts. Quadratic work happens only
    inside postings of a shared gram — at scale, extremely frequent
    shingles should be dropped first (df-capping), which is a single
    groupBy-count filter on the postings."""
    grams = with_word_ngrams(df, text_col, n).select(F.col(id_col).alias("doc"), F.col("grams"))
    # materialize the exploded postings ONCE: three consumers (sizes + both
    # self-join sides) would otherwise each rerun the shingling fold —
    # ReuseExchange does not fire because the join plans one side broadcast
    # (verified in the physical plan: the fold appeared on every branch).
    # The checkpoint stores what the repartition exchange holds anyway.
    postings = (
        grams.select("doc", F.explode("grams").alias("gram"))
        .repartition("gram")
        .localCheckpoint(eager=True)
    )
    # sizes derive from the SAME materialized postings (grams are already
    # distinct per doc), not a second run of the shingling fold
    sizes = postings.groupBy("doc").agg(F.count(F.lit(1)).alias("n_grams"))
    a = postings.alias("a")
    b = postings.alias("b")
    shared = (
        a.join(b, (F.col("a.gram") == F.col("b.gram")) & (F.col("a.doc") < F.col("b.doc")))
        .groupBy(F.col("a.doc").alias("doc_a"), F.col("b.doc").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    sa = sizes.select(F.col("doc").alias("doc_a"), F.col("n_grams").alias("na"))
    sb = sizes.select(F.col("doc").alias("doc_b"), F.col("n_grams").alias("nb"))
    return (
        shared.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn("jaccard", F.col("shared") / (F.col("na") + F.col("nb") - F.col("shared")))
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "shared", "na", "nb", "jaccard")
    )


MAXLONG = (1 << 63) - 1
# second hash reduced mod 2^55 so g1 + 31 * g2' stays < 2^63 (ANSI-safe)
MOD55 = 1 << 55


def ngram_jaccard_pairs_dfcapped(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.5,
    max_doc_freq: int = 100,
) -> DataFrame:
    """df-capped variant of :func:`ngram_jaccard_pairs` — the 100 TB
    mitigation: shingles appearing in more than ``max_doc_freq`` documents
    are dropped from the inverted index BEFORE the self-join, bounding the
    per-gram join fan-out at max_doc_freq^2. Jaccard is then computed over
    the capped gram space (sizes count only surviving grams), a standard
    approximation for web-scale dedup."""
    grams = with_word_ngrams(df, text_col, n).select(F.col(id_col).alias("doc"), F.col("grams"))
    # postings feed the df-count AND the capped index; capped feeds sizes
    # and both self-join sides. Materialize each once — without the
    # checkpoints the shingling fold reruns on every branch (broadcast
    # sides defeat ReuseExchange; verified in the physical plan).
    postings = (
        grams.select("doc", F.explode("grams").alias("gram"))
        .repartition("gram")
        .localCheckpoint(eager=True)
    )
    rare = postings.groupBy("gram").count().filter(F.col("count") <= max_doc_freq).select("gram")
    capped = postings.join(rare, "gram").repartition("gram").localCheckpoint(eager=True)
    sizes = capped.groupBy("doc").agg(F.count(F.lit(1)).alias("n_grams"))
    a = capped.alias("a")
    b = capped.alias("b")
    shared = (
        a.join(b, (F.col("a.gram") == F.col("b.gram")) & (F.col("a.doc") < F.col("b.doc")))
        .groupBy(F.col("a.doc").alias("doc_a"), F.col("b.doc").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    sa = sizes.select(F.col("doc").alias("doc_a"), F.col("n_grams").alias("na"))
    sb = sizes.select(F.col("doc").alias("doc_b"), F.col("n_grams").alias("nb"))
    return (
        shared.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn("jaccard", F.col("shared") / (F.col("na") + F.col("nb") - F.col("shared")))
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "shared", "na", "nb", "jaccard")
    )


def minhash_signature_expr(grams_col: str, num_hashes: int) -> str:
    """SQL expression: MinHash signature (array of num_hashes mins) over a
    gram array, computed per-row with zero shuffle.

    Hash family via double hashing (Kirsch-Mitzenmacher): h_k(g) =
    PH(g) + k * (PH(g||'#') mod 2^55) — two md5 evaluations per gram
    instead of K, with the K views derived arithmetically. The whole
    signature is ONE fold: each gram's hash pair enters the expression
    tree exactly once (projection collapse would otherwise multiply the
    md5 work by K)."""
    g1 = PH.format(x="g")
    g2 = PH.format(x="concat(g, '#')")
    pairs = f"transform({grams_col}, g -> array({g1}, {g2}))"
    return (
        f"aggregate({pairs}, array_repeat({MAXLONG}L, {num_hashes}), "
        f"(acc, pr) -> zip_with(acc, sequence(0, {num_hashes - 1}), "
        f"(m, k) -> least(m, element_at(pr, 1) + k * (element_at(pr, 2) % {MOD55}))))"
    )


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
) -> DataFrame:
    """MinHash-LSH candidate pairs: signature -> band digests -> bucket
    self-join -> distinct pairs.

    rows-per-band = num_hashes // bands; two docs collide in a band iff
    that slice of their signatures is identical, so the expected candidate
    set approximates pairs with Jaccard above the (bands, rows) S-curve
    threshold. Only the B band rows per doc are shuffled."""
    # Materialization barrier inside _minhash_bands: band digests
    # reference `sig` once per band, and Catalyst's projection collapse
    # would otherwise inline (and recompute) the full K-hash signature
    # per band — 8x the md5 work; additionally both bucket-join sides
    # read the banded table, and a broadcast side would rerun the
    # signatures (ReuseExchange does not fire across broadcast/shuffle
    # asymmetry). The checkpoint pins (doc, K longs) — tiny relative to
    # the hash computation it saves.
    _, bands_df = _minhash_bands(df, text_col, id_col, n, num_hashes, bands)
    a = bands_df.alias("a")
    b = bands_df.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.digest") == F.col("b.digest"))
            & (F.col("a.doc") < F.col("b.doc")),
        )
        .select(F.col("a.doc").alias("doc_a"), F.col("b.doc").alias("doc_b"))
        .distinct()
    )


def _minhash_sig_frame(
    df: DataFrame, text_col: str, id_col: str, n: int, num_hashes: int
) -> DataFrame:
    """(doc, sig) BEFORE the checkpoint — split out so the plan contract
    can assert where the shingle fold executes.

    Gates empty-gram docs on the CHEAP word count, not size(grams):
    filter(size(grams) > 0) inlines the whole shingling fold and Catalyst
    pushes it below spread()'s round-robin exchange into the scan's
    DataFilters — the fold then runs over every document on the ONE scan
    split's core (guide §4.4's duplicated-evaluation problem,
    JVM-expression flavored; measured 2.35 s single-task stage at sf0.1,
    the dominant term of t03/t50/s14 walls), and AGAIN post-exchange for
    the projection. size(grams) > 0 is exactly "at least n words" (the
    fold appends its first gram at word n; n=1 short-circuits to distinct
    words), so the equivalent word-count gate is pushdown-SAFE: splitting
    is cheap scan-side, the fold evaluates once, after the exchange, on
    every core (optimization r13)."""
    min_words = n if n >= 2 else 1
    word_gate = f"size({words_sql(text_col)}) >= {min_words}"
    grams = with_word_ngrams(df.filter(F.expr(word_gate)), text_col, n)
    return grams.select(
        F.col(id_col).alias("doc"),
        F.expr(minhash_signature_expr("grams", num_hashes)).alias("sig"),
    )


def _minhash_bands(
    df: DataFrame, text_col: str, id_col: str, n: int, num_hashes: int, bands: int
) -> tuple[DataFrame, DataFrame]:
    """(signatures, band digests) for one side — the shared prep of
    :func:`minhash_lsh_pairs` and :func:`incremental_minhash_dedup`.
    Signatures are checkpoint-pinned (see minhash_lsh_pairs: projection
    collapse would recompute the K-hash fold per band reference)."""
    rows = num_hashes // bands
    sig = _minhash_sig_frame(df, text_col, id_col, n, num_hashes).localCheckpoint(
        eager=True
    )
    band_digest = (
        f"transform(sequence(0, {bands - 1}), "
        f"b -> md5(concat_ws(',', transform(slice(sig, b * {rows} + 1, {rows}), x -> cast(x as string)))))"
    )
    bands_df = sig.select("doc", F.posexplode(F.expr(band_digest)).alias("band", "digest"))
    return sig, bands_df


def incremental_minhash_dedup(
    corpus: DataFrame,
    batch: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
    min_agree: float = 0.5,
) -> DataFrame:
    """Ingest-time dedup of a NEW batch against an EXISTING corpus — the
    production shape of near-dup removal: the corpus's band table is the
    persistable index (write it once as a snapshot table keyed on
    (band, digest); each 10-minute batch probes it), and only batch-side
    rows ever join against it. Per batch doc: LSH band collisions
    nominate corpus candidates, signature agreement (the MinHash Jaccard
    estimate, k/num_hashes — exact binary fractions, engine-portable)
    scores them, and ``is_dup`` fires at ``min_agree``.

    Returns (doc_id, n_candidates, max_agree, is_dup) for EVERY batch
    doc — zero-candidate docs (including sub-n-gram shorties) report
    (0, 0.0, false). At 100 TB the only corpus-sized work is building
    the index once; per-batch cost is |batch|·bands probe rows joined
    against the bucket table plus one candidate-pair agreement join."""
    csig, cbands = _minhash_bands(corpus, text_col, id_col, n, num_hashes, bands)
    bsig, bbands = _minhash_bands(batch, text_col, id_col, n, num_hashes, bands)
    cand = (
        bbands.alias("nb")
        .join(
            cbands.alias("cb"),
            (F.col("nb.band") == F.col("cb.band"))
            & (F.col("nb.digest") == F.col("cb.digest")),
        )
        .select(F.col("nb.doc").alias("bdoc"), F.col("cb.doc").alias("cdoc"))
        .distinct()
    )
    agree_expr = (
        f"aggregate(zip_with(bsig, csig, (x, y) -> CASE WHEN x = y THEN 1 ELSE 0 END), "
        f"0, (acc, v) -> acc + v) / cast({num_hashes} as double)"
    )
    agree = (
        cand.join(bsig.select(F.col("doc").alias("bdoc"), F.col("sig").alias("bsig")), "bdoc")
        .join(csig.select(F.col("doc").alias("cdoc"), F.col("sig").alias("csig")), "cdoc")
        .select("bdoc", F.expr(agree_expr).alias("agree"))
    )
    per = agree.groupBy("bdoc").agg(
        F.count(F.lit(1)).alias("n_candidates"), F.max("agree").alias("max_agree")
    )
    return (
        batch.select(F.col(id_col))
        .join(per.withColumnRenamed("bdoc", id_col), id_col, "left")
        .select(
            id_col,
            F.coalesce("n_candidates", F.lit(0)).cast("long").alias("n_candidates"),
            F.round(F.coalesce("max_agree", F.lit(0.0)), 6).alias("max_agree"),
            (F.coalesce("max_agree", F.lit(0.0)) >= min_agree).alias("is_dup"),
        )
    )


def simhash_neardup_pairs_banded(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 8,
    sketches: DataFrame | None = None,
    bits: int = 60,
) -> DataFrame:
    """Exact-recall banded blocking for SimHash near-dup pairs — the scale
    path with the SAME result set as :func:`simhash_neardup_pairs`.

    Pigeonhole: split the sketch into ``max_hamming + 1`` bands; two
    sketches within ``max_hamming`` differ in at most ``max_hamming``
    bands, so they MUST agree on at least one band. Candidates are pairs
    sharing any (band, band-bits) key — an equi-join on a 2^width-ary key
    per band instead of the O(n^2) cross product — then the exact
    bit_count(xor) filter keeps true pairs only (MMDS ch.3 banding, applied
    to Hamming space). Shuffled payload: bands+1 longs per doc.
    """
    bands = max_hamming + 1
    width = -(-bits // bands)  # ceil: last band may be narrower
    # bits MUST be forwarded to simhash(): banding a sketch of a different
    # width than the band arithmetic assumes breaks the exact-recall
    # pigeonhole guarantee silently.
    s = sketches if sketches is not None else simhash(df, text_col, id_col, bits=bits)
    slices = (
        f"transform(sequence(0, {bands - 1}), "
        f"b -> shiftright(simhash, b * {width}) % {1 << width})"
    )
    banded = s.select(
        F.col("doc_id"), F.col("simhash"), F.posexplode(F.expr(slices)).alias("band", "band_bits")
    )
    a = banded.select(
        "band", "band_bits", F.col("doc_id").alias("doc_a"), F.col("simhash").alias("sim_a")
    )
    b = banded.select(
        "band", "band_bits", F.col("doc_id").alias("doc_b"), F.col("simhash").alias("sim_b")
    )
    return (
        a.join(b, ["band", "band_bits"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", "sim_a", "sim_b")
        .distinct()
        .withColumn("hamming", F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b"))))
        .filter(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
    )


def simhash_neardup_pairs_auto(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 8,
    sketches: DataFrame | None = None,
    allpairs_max_docs: int = 20_000,
    bits: int = 60,
) -> DataFrame:
    """Cost-based choice between the two set-equal pair generators: the
    O(n^2) cross join has a tiny per-pair constant (xor + bit_count on
    longs) and wins below ~tens of thousands of docs per join; the banded
    equi-join wins beyond, where n^2 is unpayable. The sketch table is
    materialized once (localCheckpoint) and shared by the size probe and
    the chosen join — the decision costs one count over (id, long) rows."""
    s = (sketches if sketches is not None else simhash(df, text_col, id_col, bits=bits)).localCheckpoint(
        eager=True
    )
    if s.count() <= allpairs_max_docs:
        return simhash_neardup_pairs(df, text_col, id_col, max_hamming, sketches=s)
    return simhash_neardup_pairs_banded(df, text_col, id_col, max_hamming, sketches=s, bits=bits)


def simhash(df: DataFrame, text_col: str = "text", id_col: str = "doc_id", bits: int = 60) -> DataFrame:
    """``bits``-bit SimHash over word hashes, computed per-row (no shuffle).

    bit b of the sketch is the sign of sum_w count(w) * (2*((PH(w)>>b)&1)-1).

    Scored in a vectorized Arrow ``mapInPandas`` batch: per document, one
    C-level md5 per word (the exact PH primitive — first 15 hex digits as
    a 60-bit int, so sketches stay oracle-checkable in DuckDB) and one
    numpy broadcast for the bits x words balance reduction. The earlier
    pure-expression fold (nested aggregate/zip_with) is interpreted, not
    codegen'd — one boxed lambda call per (word, bit) and a fresh 60-long
    accumulator array per word made it ~5x slower and GC-heavy. Still
    embarrassingly parallel: the scan feeds the scorer unshuffled.
    """
    import hashlib
    import re as _re

    import numpy as np
    import pandas as pd

    ws_re = _re.compile(r"\s+")
    shifts = np.arange(bits, dtype=np.uint64)

    def score(batches):
        for pdf in batches:
            ids, outs = [], []
            for did, text in zip(pdf["doc_id"], pdf["text"]):
                if text is None:
                    continue
                words = [w for w in ws_re.split(text.lower()) if w]
                if not words:
                    continue
                hs = np.array(
                    [int(hashlib.md5(w.encode()).hexdigest()[:15], 16) for w in words],
                    dtype=np.uint64,
                )
                balance = (2 * ((hs[:, None] >> shifts) & 1).astype(np.int64) - 1).sum(axis=0)
                ids.append(did)
                outs.append(int(((balance > 0).astype(np.uint64) << shifts).sum()))
            yield pd.DataFrame({"doc_id": ids, "simhash": pd.array(outs, dtype="int64")})

    return spread(
        df.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("text"))
    ).mapInPandas(score, "doc_id long, simhash long")


def simhash_neardup_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 8,
    sketches: DataFrame | None = None,
) -> DataFrame:
    """Near-dup pairs by SimHash hamming distance (bit_count of xor).

    All-pairs here for oracle-checkability; the scale path blocks on
    simhash bytes (4 x 16-bit bands catch all pairs with hamming <= 3 by
    pigeonhole) before the exact filter. Pass ``sketches`` (a
    :func:`simhash` result) to reuse an already-computed sketch table.
    """
    # exchange barrier: both self-join sides hang off ONE materialized
    # simhash computation (ReuseExchange), instead of hashing every doc
    # twice
    s = (sketches if sketches is not None else simhash(df, text_col, id_col)).repartition("doc_id")
    a = s.select(F.col("doc_id").alias("doc_a"), F.col("simhash").alias("sim_a"))
    b = s.select(F.col("doc_id").alias("doc_b"), F.col("simhash").alias("sim_b"))
    return (
        a.join(b, F.col("doc_a") < F.col("doc_b"))
        .withColumn("hamming", F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b"))))
        .filter(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
    )


def duplicate_spans(
    df: DataFrame,
    gram_len: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact duplicated-substring spans at token resolution — the
    Lee et al. 2021 ("Deduplicating Training Data Makes Language Models
    Better", arXiv:2107.06499) ExactSubstr shape, at word-gram instead of
    byte-suffix granularity: a position is DUPLICATED when the
    ``gram_len``-gram starting there also occurs in at least one OTHER
    document; overlapping duplicated grams merge into maximal spans
    (the units C4-style cleanup deletes).

    Fully relational — no suffix array needed at this granularity:

    1. postings: (doc, pos, gram-hash) — one row per L-gram occurrence;
    2. cross-doc duplicated grams: groupBy hash HAVING
       countDistinct(doc) > 1 (within-doc repetition is t27's business);
    3. mark occurrences of duplicated grams: each covers [pos, pos+L);
    4. gaps-and-islands interval merge per doc: a new span starts where
       ``pos > running max(end)`` of everything before it — one window
       over (doc, pos), then groupBy island.

    Scale shape: the postings shuffle (∝ total grams) dominates, with
    map-side partial aggregation on the gram hash; the window in step 4
    runs on the MARKED subset only (duplicated positions, typically a
    small fraction of the corpus). Returns
    (doc_id, span_start, span_end, span_tokens) with token-index spans,
    end exclusive.
    """
    from pyspark.sql.window import Window

    from .text import PH, words_col

    L = int(gram_len)
    ws = words_col(text_col)
    grams = F.expr(
        f"transform(sequence(0, size(_ws) - {L}), i -> concat_ws(' ', slice(_ws, i + 1, {L})))"
    )
    postings = (
        df.withColumn("_ws", ws)
        .filter(F.size("_ws") >= L)
        .select(F.col(id_col).alias("doc"), F.posexplode(grams).alias("pos", "gram"))
        .select("doc", "pos", F.expr(PH.format(x="gram")).alias("gh"))
    )
    # cross-doc test as min!=max instead of countDistinct: same predicate,
    # but min/max partially aggregate map-side without the distinct expand
    dup = (
        postings.groupBy("gh")
        .agg(F.min("doc").alias("_d0"), F.max("doc").alias("_d1"))
        .filter(F.col("_d0") != F.col("_d1"))
    )
    marked = postings.join(dup.select("gh"), "gh").select(
        "doc", F.col("pos").alias("s"), (F.col("pos") + L).alias("e")
    )
    w = Window.partitionBy("doc").orderBy("s")
    prev_max_e = F.max("e").over(w.rowsBetween(Window.unboundedPreceding, -1))
    islands = marked.withColumn(
        "_new", F.when(F.col("s") > F.coalesce(prev_max_e, F.lit(-1)), 1).otherwise(0)
    ).withColumn("_island", F.sum("_new").over(w.rowsBetween(Window.unboundedPreceding, 0)))
    return (
        islands.groupBy("doc", "_island")
        .agg(F.min("s").alias("span_start"), F.max("e").alias("span_end"))
        .select(
            F.col("doc").alias(id_col),
            "span_start",
            "span_end",
            (F.col("span_end") - F.col("span_start")).alias("span_tokens"),
        )
    )

def paragraph_dedup_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    para_tokens: int = 12,
) -> DataFrame:
    """Paragraph-level exact dedup report — the Dolma/RefinedWeb
    within-corpus dedup granularity (finer than doc-level t01, coarser
    than span-level t39): hash every paragraph, count corpus-wide
    multiplicity, and report per document how much of it is duplicated
    text. Pipelines drop docs whose duplicate fraction is high and mask
    the duplicated paragraphs otherwise.

    Paragraphs here are the chunker's (`chunk_documents`)
    NON-overlapping word windows (stride == chunk = ``para_tokens``) —
    the corpus has no newline structure, and a deterministic window is
    what both engines can reproduce exactly; on real crawl text pass
    the newline-split paragraphs instead (same downstream plan).

    Scale shape: three map-side-combined hash shuffles — paragraph-hash
    counts, the count join back onto postings (AQE picks the strategy;
    both sides are corpus-sized, co-partitioned on ph), and the per-doc
    rollup. The production approximation for 100 TB (Dolma uses exactly
    this) replaces the count join with a Bloom filter of
    already-seen paragraph hashes (`operators/bloomjoin.py`) at the
    cost of false-positive marks; the exact form here is the oracle.

    Output per document (docs with zero tokens drop out):
    ``doc_id, n_paragraphs, n_dup_paragraphs, dup_token_frac``.
    """
    from .text import chunk_documents

    paras = chunk_documents(df, para_tokens, para_tokens, text_col, id_col)
    h = paras.select(
        "doc_id", F.md5("chunk_text").alias("ph"), F.col("n_tokens").cast("long").alias("ptok")
    )
    counts = h.groupBy("ph").agg(F.count(F.lit(1)).alias("cnt"))
    j = h.join(counts, "ph")
    dup = F.col("cnt") >= 2
    return j.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_paragraphs"),
        F.sum(F.when(dup, 1).otherwise(0)).cast("long").alias("n_dup_paragraphs"),
        F.round(
            F.sum(F.when(dup, F.col("ptok")).otherwise(0))
            / F.sum("ptok").cast("double"),
            6,
        ).alias("dup_token_frac"),
    )

def near_dup_source_matrix(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    source_col: str = "source",
    n: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
) -> DataFrame:
    """Cross-source duplication matrix: which sources share near-dup
    content with which — the curation audit that catches mirror sites,
    scraped re-posts, and aggregator feeds before mixture weighting
    (a source whose content is largely duplicated FROM another should
    not count twice in the mixture).

    Composes MinHash-LSH candidate pairs (`minhash_lsh_pairs` — banded,
    never all-pairs) with two broadcast attaches of the doc->source dim,
    then one matrix-sized rollup on the canonically ordered source pair
    (least/greatest, so A~B and B~A accumulate together). Shuffle cost:
    the LSH band join (bounded) + one |sources|^2-sized aggregate.
    Self-pairs (both docs in one source) land on the diagonal."""
    pairs = minhash_lsh_pairs(df, text_col, id_col, n, num_hashes, bands)
    dim = df.select(F.col(id_col), F.col(source_col))
    j = (
        pairs.join(
            F.broadcast(dim.select(F.col(id_col).alias("doc_a"), F.col(source_col).alias("_sa"))),
            "doc_a",
        ).join(
            F.broadcast(dim.select(F.col(id_col).alias("doc_b"), F.col(source_col).alias("_sb"))),
            "doc_b",
        )
    )
    return (
        j.select(
            F.least("_sa", "_sb").alias("source_a"),
            F.greatest("_sa", "_sb").alias("source_b"),
        )
        .groupBy("source_a", "source_b")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )
