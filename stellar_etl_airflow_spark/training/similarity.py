"""Approximate-nearest-neighbor search over an embedding column.

Two paths:

- ``cosine_topk``    — exact brute-force baseline: queries x corpus join,
                       dot products via zip_with/aggregate (JVM-side),
                       row_number top-k. Broadcast the query side — at
                       100 TB the corpus never shuffles.
- ``lsh_cosine_topk``— random-hyperplane LSH: each vector gets a b-bit
                       bucket (sign pattern against b fixed Rademacher
                       hyperplanes); candidates are corpus vectors in the
                       SAME bucket only. One equi-join on the bucket key —
                       this is the scale path (IVF-style alternative:
                       k-means coarse quantizer, same join shape).

Hyperplanes are data-independent and derived from md5 parity, so results
are deterministic and oracle-checkable (no RNG state).

References (public literature): Charikar (STOC 2002) — random-hyperplane
LSH for cosine; Indyk & Motwani (STOC 1998) — LSH framework; Jégou,
Douze & Schmid, "Product Quantization for Nearest Neighbor Search"
(TPAMI 2011) — the IVF coarse-quantizer/inverted-list design ``ivf_topk``
mirrors (codebook + cell-restricted probe).
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..session import spread


def _ph(s: str) -> int:
    """Python twin of the portable 60-bit md5 hash (queries/base.py)."""
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def rademacher_planes(n_planes: int, dim: int) -> list[list[int]]:
    """Deterministic +-1 hyperplanes: sign(i,j) from md5 parity."""
    return [[1 - 2 * (_ph(f"{i},{j}") % 2) for j in range(dim)] for i in range(n_planes)]


def planes_sql_literal(planes: list[list[int]]) -> str:
    rows = ", ".join("array(" + ", ".join(f"{w}D" for w in row) + ")" for row in planes)
    return f"array({rows})"


DOT = "aggregate(zip_with({a}, {b}, (x, y) -> x * y), 0D, (acc, v) -> acc + v)"
NORM = "sqrt(aggregate({a}, 0D, (acc, v) -> acc + v * v))"


def _prep(df: DataFrame, id_col: str, vec_col: str, prefix: str) -> DataFrame:
    """Cast the embedding to double and attach its L2 norm."""
    return df.select(
        F.col(id_col).alias(f"{prefix}_id"),
        F.expr(f"transform({vec_col}, x -> cast(x as double))").alias(f"{prefix}_vec"),
    ).withColumn(f"{prefix}_norm", F.expr(NORM.format(a=f"{prefix}_vec")))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors for every query vector (self excluded).

    Scoring is a vectorized Arrow ``mapInPandas`` over the CORPUS: the
    (small) query matrix is materialized on the driver and shipped in the
    task closure — the same thing a broadcast join does with its build
    side — and each corpus batch computes one numpy matmul, then emits only
    its per-batch top-k per query. The corpus never shuffles; the only
    exchange is the final exact window over ``#batches * |Q| * k``
    candidate rows (per-batch top-k is a superset of the global top-k).
    The previous pure-expression formulation (``aggregate(zip_with(...))``
    per pair) is interpreted, not codegen'd — boxed-double lambda calls and
    an allocation per pair made it ~10x slower at 2000x200x64.
    """
    import numpy as np
    import pandas as pd

    qpd = (
        queries.select(F.col(id_col).cast("long").alias("q_id"), F.col(vec_col).alias("v"))
        .toPandas()
    )
    if not len(qpd):
        return corpus.select(
            F.lit(0).cast("long").alias("q_id"),
            F.lit(0).alias("rank"),
            F.lit(0).cast("long").alias("n_id"),
            F.lit(0.0).alias("cosine"),
        ).limit(0)
    q_ids = qpd["q_id"].to_numpy()
    Q = np.stack(qpd["v"].to_numpy()).astype(np.float64)  # |Q| x d
    q_norm = np.sqrt((Q * Q).sum(axis=1))

    def score(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            n_ids = pdf["n_id"].to_numpy()
            N = np.stack(pdf["v"].to_numpy()).astype(np.float64)  # B x d
            n_norm = np.sqrt((N * N).sum(axis=1))
            S = (N @ Q.T) / (n_norm[:, None] * q_norm[None, :])  # B x |Q|
            S[n_ids[:, None] == q_ids[None, :]] = -np.inf  # self-exclusion
            kk = min(k, len(n_ids))
            # exact per-batch top-k per query with the (cosine desc, n_id
            # asc) tie order the final window uses
            order = np.lexsort((n_ids[:, None].repeat(len(q_ids), 1), -S), axis=0)[:kk]
            rows = {
                "q_id": np.tile(q_ids, kk),
                "n_id": n_ids[order].ravel(),
                "cosine": np.take_along_axis(S, order, axis=0).ravel(),
            }
            out = pd.DataFrame(rows)
            yield out[np.isfinite(out["cosine"])]

    cand = spread(
        corpus.select(F.col(id_col).cast("long").alias("n_id"), F.col(vec_col).alias("v"))
    ).mapInPandas(score, "q_id long, n_id long, cosine double")
    w = Window.partitionBy("q_id").orderBy(F.col("cosine").desc(), F.col("n_id").asc())
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "rank", "n_id", F.round("cosine", 6).alias("cosine"))
    )


def bucket_expr(vec: str, planes_lit: str, n_planes: int) -> str:
    """b-bit LSH bucket: bit i = 1 iff vec . plane_i >= 0."""
    dot_i = DOT.format(a=vec, b=f"element_at({planes_lit}, i + 1)")
    return (
        f"aggregate(transform(sequence(0, {n_planes - 1}), "
        f"i -> CASE WHEN {dot_i} >= 0D THEN shiftleft(1L, i) ELSE 0L END), 0L, (acc, x) -> acc + x)"
    )


def lsh_cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_planes: int = 6,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: only corpus vectors sharing the query's LSH
    bucket are scored. Recall improves with multi-probe or more tables;
    this single-table variant is the oracle-checked core."""
    planes = planes_sql_literal(rademacher_planes(n_planes, dim))
    c = _prep(corpus, id_col, vec_col, "n").withColumn(
        "bucket", F.expr(bucket_expr("n_vec", planes, n_planes))
    )
    q = _prep(queries, id_col, vec_col, "q").withColumn(
        "bucket", F.expr(bucket_expr("q_vec", planes, n_planes))
    )
    cos = F.expr(DOT.format(a="q_vec", b="n_vec")) / (F.col("q_norm") * F.col("n_norm"))
    w = Window.partitionBy("q_id").orderBy(F.col("cosine").desc(), F.col("n_id").asc())
    return (
        F.broadcast(q)
        .join(c, "bucket")
        .filter(F.col("q_id") != F.col("n_id"))
        .withColumn("cosine", cos)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "bucket", "rank", "n_id", F.round("cosine", 6).alias("cosine"))
    )


def lsh_cosine_topk_multiprobe(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_planes: int = 6,
    dim: int = 64,
    n_probes: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Multi-probe LSH ANN: each query searches its own bucket PLUS the
    ``n_probes`` Hamming-1 buckets (one sign bit flipped). Boosts recall
    like running 1+n_probes hash tables but with ONE corpus index — the
    standard trade (Lv et al., "Multi-Probe LSH", VLDB 2007). Only the
    small query side explodes (1+n_probes rows per query); the corpus is
    still hit by a single equi-join on the bucket key, so the scale shape
    is unchanged. A corpus vector lives in exactly one bucket and probe
    buckets are distinct, so no candidate dedup is needed."""
    n_probes = n_planes if n_probes is None else n_probes
    planes = planes_sql_literal(rademacher_planes(n_planes, dim))
    c = _prep(corpus, id_col, vec_col, "n").withColumn(
        "bucket", F.expr(bucket_expr("n_vec", planes, n_planes))
    )
    q = _prep(queries, id_col, vec_col, "q").withColumn(
        "bucket", F.expr(bucket_expr("q_vec", planes, n_planes))
    )
    probe_list = (
        f"concat(array(bucket), transform(sequence(0, {n_probes - 1}), "
        f"p -> bucket ^ shiftleft(1L, p)))"
    )
    qp = q.select("q_id", "q_vec", "q_norm", F.explode(F.expr(probe_list)).alias("bucket"))
    cos = F.expr(DOT.format(a="q_vec", b="n_vec")) / (F.col("q_norm") * F.col("n_norm"))
    w = Window.partitionBy("q_id").orderBy(F.col("cosine").desc(), F.col("n_id").asc())
    return (
        F.broadcast(qp)
        .join(c, "bucket")
        .filter(F.col("q_id") != F.col("n_id"))
        .withColumn("cosine", cos)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "rank", "n_id", F.round("cosine", 6).alias("cosine"))
    )


def ivf_assign(vectors: DataFrame, centroids: DataFrame) -> DataFrame:
    """IVF coarse quantization: assign each vector to its nearest centroid
    by cosine (argmax over the broadcast centroid set). ``vectors`` /
    ``centroids`` are `_prep`-shaped ('n_'/'c_' prefixes).

    The argmax is a ``max_by`` aggregate, NOT a row_number window: the
    window formulation shuffles the full |corpus| x k scored cross
    product to sort it, while ``max_by`` partial-aggregates map-side so
    the exchange carries at most one row per (vector, input partition) —
    the k-factor never reaches the shuffle. Tie-break matches the window
    convention: max cosine, then min centroid id (via -c_id in the
    ordering struct)."""
    cos = F.expr(DOT.format(a="n_vec", b="c_vec")) / (F.col("n_norm") * F.col("c_norm"))
    return (
        vectors.crossJoin(F.broadcast(centroids))
        .withColumn("_cos", cos)
        .groupBy("n_id")
        .agg(
            F.max_by(
                F.struct("n_vec", "n_norm", "c_id"),
                F.struct(F.col("_cos"), (-F.col("c_id")).alias("_nc")),
            ).alias("_best")
        )
        .select(
            "n_id",
            F.col("_best.n_vec").alias("n_vec"),
            F.col("_best.n_norm").alias("n_norm"),
            F.col("_best.c_id").alias("cell"),
        )
    )


def ivf_topk(
    corpus: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroid_pred=None,
    query_pred=None,
) -> DataFrame:
    """IVF single-probe ANN: a deterministic subset of the corpus acts as
    the coarse-quantizer codebook (a fixed-seed k-means would refine it;
    the assignment/probe join shape — the part that matters at scale — is
    identical). Queries search only their own cell: one equi-join on the
    cell id instead of a cross join."""
    c = _prep(corpus, id_col, vec_col, "n")
    cents = (
        _prep(corpus.filter(centroid_pred if centroid_pred is not None else (F.col(id_col) % 37 == 3)), id_col, vec_col, "c")
        .select(F.col("c_id"), F.col("c_vec"), F.col("c_norm"))
    )
    assigned = ivf_assign(c, cents)
    q = assigned.filter(query_pred(F.col("n_id")) if query_pred is not None else (F.col("n_id") % 10 == 0)).select(
        F.col("n_id").alias("q_id"), F.col("n_vec").alias("q_vec"), F.col("n_norm").alias("q_norm"), "cell"
    )
    cos = F.expr(DOT.format(a="q_vec", b="n_vec")) / (F.col("q_norm") * F.col("n_norm"))
    w = Window.partitionBy("q_id").orderBy(F.col("cosine").desc(), F.col("n_id").asc())
    return (
        F.broadcast(q)
        .join(assigned, "cell")
        .filter(F.col("q_id") != F.col("n_id"))
        .withColumn("cosine", cos)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "cell", "rank", "n_id", F.round("cosine", 6).alias("cosine"))
    )


def kmeans_refine(vectors: DataFrame, centroids: DataFrame, iters: int = 1) -> DataFrame:
    """Lloyd refinement of an IVF codebook: ``iters`` rounds of
    assign-to-nearest (cosine) then recompute-centroid-as-mean.

    Determinism across engines: the per-dimension mean is an EXACT
    DECIMAL(38,18) sum cast to double, then one double division by the
    cell count — no order-dependent double accumulation — so the refined
    codebook (and every downstream cosine) is bit-identical in Spark and
    the DuckDB oracle. Cells keep their seed centroid's id as a stable
    label; cells that lose all members disappear (standard Lloyd on a
    fixed k). Each round is one assignment (broadcast argmax, no shuffle
    of the corpus) plus one posexplode-groupBy((cell, dim)) shuffle whose
    width is k*dim rows — trivial at any corpus size.

    ``vectors`` is `_prep`-shaped ('n_' prefix), ``centroids`` ('c_').
    Returns the refined centroid table ('c_' prefix).
    """
    for _ in range(iters):
        assigned = ivf_assign(vectors, centroids)
        dim_means = (
            assigned.select("cell", F.posexplode("n_vec").alias("i", "x"))
            .groupBy("cell", "i")
            .agg(
                (F.sum(F.col("x").cast("decimal(38,18)")).cast("double") / F.count(F.lit(1))).alias("m")
            )
        )
        centroids = (
            dim_means.groupBy("cell")
            .agg(F.array_sort(F.collect_list(F.struct("i", "m"))).alias("im"))
            .select(
                F.col("cell").alias("c_id"),
                F.expr("transform(im, s -> s.m)").alias("c_vec"),
            )
            .withColumn("c_norm", F.expr(NORM.format(a="c_vec")))
        )
    return centroids


def kmeans_ivf_assign(
    corpus: DataFrame,
    iters: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroid_pred=None,
    train_pred=None,
) -> DataFrame:
    """IVF coarse quantization with a k-means-refined codebook: seed the
    codebook deterministically (same rule as :func:`ivf_topk`), run
    ``iters`` Lloyd rounds, then emit the final assignment with the
    point-to-centroid cosine. This is the index-build stage of an
    IVF-based ANN system (Jégou et al., TPAMI 2011); ``ivf_topk``'s probe
    join runs unchanged on the refined cells.

    100 TB knobs — the corpus-entry defaults are the oracle-checkable
    exact twin, NOT the production config:

    - ``centroid_pred`` must BOUND k at scale: the default ``id % 37``
      rule grows the codebook (and every assignment's broadcast argmax)
      linearly with the corpus — quadratic total work. Pass e.g.
      ``pmod(xxhash64(id), n_rows // k) == 0`` so k is fixed by design
      (k ~ sqrt(corpus) is the usual IVF sizing).
    - ``train_pred``: Lloyd rounds train on this deterministic sample
      instead of the full corpus (FAISS practice: ~256 x k training
      points saturate codebook quality). Assignment still covers every
      vector; only the centroid refinement reads the sample.
    """
    c = _prep(corpus, id_col, vec_col, "n")
    seeds = _prep(
        corpus.filter(centroid_pred if centroid_pred is not None else (F.col(id_col) % 37 == 3)),
        id_col, vec_col, "c",
    ).select("c_id", "c_vec", "c_norm")
    train = _prep(corpus.filter(train_pred), id_col, vec_col, "n") if train_pred is not None else c
    refined = kmeans_refine(train, seeds, iters=iters)
    cos = F.expr(DOT.format(a="n_vec", b="c_vec")) / (F.col("n_norm") * F.col("c_norm"))
    # max_by argmax, same shuffle discipline (and tie-break) as ivf_assign
    return (
        c.crossJoin(F.broadcast(refined))
        .withColumn("_cos", cos)
        .groupBy("n_id")
        .agg(
            F.max_by(
                F.struct("c_id", "_cos"),
                F.struct(F.col("_cos"), (-F.col("c_id")).alias("_nc")),
            ).alias("_best")
        )
        .select(
            "n_id",
            F.col("_best.c_id").alias("cell"),
            F.round("_best._cos", 6).alias("cosine"),
        )
    )


def embedding_neardup_pairs(
    df: DataFrame,
    threshold: float = 0.98,
    n_planes: int = 6,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs, LSH-blocked: candidate pairs
    share an LSH bucket (near-identical vectors almost surely do), then the
    exact cosine filter runs only within buckets."""
    planes = planes_sql_literal(rademacher_planes(n_planes, dim))
    v = _prep(df, id_col, vec_col, "n").withColumn("bucket", F.expr(bucket_expr("n_vec", planes, n_planes)))
    a = v.select(
        F.col("bucket"),
        F.col("n_id").alias("id_a"),
        F.col("n_vec").alias("vec_a"),
        F.col("n_norm").alias("norm_a"),
    )
    b = v.select(
        F.col("bucket"),
        F.col("n_id").alias("id_b"),
        F.col("n_vec").alias("vec_b"),
        F.col("n_norm").alias("norm_b"),
    )
    cos = F.expr(DOT.format(a="vec_a", b="vec_b")) / (F.col("norm_a") * F.col("norm_b"))
    return (
        a.join(b, "bucket")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("cosine", cos)
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", F.round("cosine", 6).alias("cosine"))
    )


def semantic_dedup(
    df: DataFrame,
    threshold: float = 0.9,
    n_planes: int = 6,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SemDeDup-shaped semantic deduplication (Abbas et al. 2023,
    arXiv:2303.09540): bucket the embedding space, call documents
    duplicates when their within-bucket cosine clears ``threshold``,
    transitively close the duplicate relation, and keep ONE representative
    per group (the minimum id — SemDeDup keeps the point farthest from the
    centroid; min-id is the deterministic, oracle-checkable stand-in; swap
    the ordering column to change policy). Buckets here are the LSH
    hyperplane cells of :func:`embedding_neardup_pairs` standing in for
    the paper's k-means cells — same blocking role, pluggable via
    :func:`kmeans_ivf_assign` when cluster-based cells are wanted.

    Scale shape: pairs are LSH-blocked (never all-pairs), components run
    the pointer-jumping propagation of ``training/components.py``; the
    whole pipeline is shuffle-bounded by bucket width and edge count.
    Returns (vec_id, component, is_representative): filter
    ``is_representative`` to materialize the deduplicated corpus.
    """
    from .components import dedup_decisions

    pairs = embedding_neardup_pairs(
        df, threshold=threshold, n_planes=n_planes, dim=dim, id_col=id_col, vec_col=vec_col
    ).select(F.col("id_a").alias("doc_a"), F.col("id_b").alias("doc_b"))
    vertices = df.select(F.col(id_col).alias("doc_id"))
    out = dedup_decisions(vertices, pairs)
    return out.select(
        F.col("doc_id").alias(id_col), "component", "is_representative"
    )
