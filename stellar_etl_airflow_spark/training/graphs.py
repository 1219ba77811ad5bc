"""Graph ranking for training-data pipelines: PageRank over a link/
interaction graph — the CommonCrawl-lineage quality signal (domain
ranking drives crawl priority and corpus filtering; harmonic/PageRank
centralities are the published basis of e.g. the CC domain ranks).

Spark-first shape: each iteration is ONE edge-keyed join + ONE
dst-keyed map-side-combined aggregate; the node count, dangling mass,
and teleport term ride 1-row broadcasts. No driver-side loop state
beyond the iteration counter; ``localCheckpoint`` per round cuts the
lineage growth exactly like k-means/label propagation.

Cross-engine determinism: contributions are rounded to 12 decimals and
summed as DECIMAL(38,12) (associative, partitioning-independent), and
each iteration's rank is rounded to 12 decimals — so a fixed iteration
count unrolls to EXACT SQL (the DuckDB oracle in queries/training.py
generates the same rounds as CTEs), the corpus's first iterative
algorithm with a value-hash (not rows-only) gate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    n_iter: int = 3,
    damping: float = 0.85,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Ranks over the distinct node set of ``edges`` after ``n_iter``
    synchronous iterations. Returns (node, rank) with rank rounded to 6
    decimals. Dangling nodes (no out-edges) redistribute their mass
    uniformly — the standard formulation."""
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).distinct()
    e = e.localCheckpoint(eager=True)
    nodes = (
        e.select(F.col("src").alias("n"))
        .unionByName(e.select(F.col("dst").alias("n")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n_total = nodes.agg(F.count(F.lit(1)).cast("double").alias("_n"))
    deg = e.groupBy("src").agg(F.count(F.lit(1)).cast("double").alias("_d"))

    r = nodes.crossJoin(F.broadcast(n_total)).select(
        "n", F.round(F.lit(1.0) / F.col("_n"), 12).alias("r")
    ).localCheckpoint(eager=True)
    for _ in range(n_iter):
        # per-edge contribution, decimal-summed for order-independence
        contrib = (
            e.join(r, e["src"] == r["n"])
            .join(deg, "src")
            .select(
                "dst",
                F.round(F.col("r") / F.col("_d"), 12).cast("decimal(38,12)").alias("_c"),
            )
            .groupBy("dst")
            .agg(F.sum("_c").cast("double").alias("_c"))
        )
        # dangling mass: rank held by nodes with no out-edges (1 row)
        dang = (
            r.join(deg, r["n"] == deg["src"], "left_anti")
            .agg(F.coalesce(F.sum(F.col("r").cast("decimal(38,12)")), F.lit(0)).cast("double").alias("_g"))
        )
        r = (
            nodes.join(contrib, nodes["n"] == contrib["dst"], "left")
            .crossJoin(F.broadcast(n_total))
            .crossJoin(F.broadcast(dang))
            .select(
                "n",
                F.round(
                    (1.0 - damping) / F.col("_n")
                    + damping * (F.coalesce(F.col("_c"), F.lit(0.0)) + F.col("_g") / F.col("_n")),
                    12,
                ).alias("r"),
            )
            .localCheckpoint(eager=True)
        )
    return r.select(F.col("n").alias("node"), F.round("r", 6).alias("rank"))
