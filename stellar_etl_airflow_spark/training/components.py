"""Connected components over near-duplicate pair graphs.

Pair generators (SimHash / MinHash / embedding near-dup, training/dedup.py)
emit EDGES; turning them into dedup decisions needs the transitive closure:
every document in one duplicate cluster maps to one component id, and one
representative per component survives. This is the standard last stage of a
web-scale dedup pipeline (e.g. the CCNet / RefinedWeb recipes).

Implementation: iterative min-label propagation — each round every vertex
adopts the minimum label in its closed neighborhood; fixpoint in O(diameter)
rounds. Each round is one shuffle (groupBy vertex). Lineage is cut with
``localCheckpoint`` per round, the standard Spark iterative-algorithm
pattern (otherwise the plan doubles every round and Catalyst re-optimizes
an exponentially growing tree). For graphs with huge diameter the
literature alternative is large-star/small-star (Kiveris et al.,
"Connected Components in MapReduce and Beyond", SoCC 2014) which converges
in O(log^2 n) rounds; near-dup graphs are dense clusters with tiny
diameter, so plain propagation converges in 2-4 rounds and does strictly
less work per round.

Determinism: labels are vertex ids, min() is order-insensitive — the
result is exactly reproducible and oracle-checkable against a recursive-CTE
closure in DuckDB (corpus t17).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def connected_components(
    vertices: DataFrame,
    edges: DataFrame,
    vertex_col: str = "doc_id",
    src_col: str = "doc_a",
    dst_col: str = "doc_b",
    max_iter: int = 25,
    driver_max_edges: int = 4_000_000,
) -> DataFrame:
    """Label each vertex with the minimum vertex id reachable from it.

    ``vertices``: one column ``vertex_col`` (isolated docs allowed — they
    become their own singleton component). ``edges``: undirected pairs;
    every endpoint must appear in ``vertices``. Returns
    ``(vertex_col, component)``. Raises if not converged within
    ``max_iter`` rounds (near-dup graphs converge in a handful).

    Cost-based solver choice (the "filtering" technique — Lattanzi et al.,
    "Filtering: a method for solving graph problems in MapReduce", SPAA
    2011: shrink the problem until it fits one machine, then solve it
    there): dedup edge sets at or below ``driver_max_edges`` (a few
    hundred MB) are solved with a single driver-side union-find pass —
    exact same min-label result, none of the per-round job latency that
    dominates the distributed loop on small graphs. Above the threshold,
    iterative min-label propagation with pointer jumping, one shuffle per
    round. The distributed loop is the 100 TB path; the probe costs one
    count over the (already materialized) edge list.
    """
    sym = (
        edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
        .unionByName(edges.select(F.col(dst_col).alias("src"), F.col(src_col).alias("dst")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    if sym.count() <= 2 * driver_max_edges:  # sym holds both directions
        return _union_find_local(vertices, sym, vertex_col)
    # Only edge endpoints can ever change label — iterate over them alone.
    # In a near-dup graph the overwhelming majority of documents are
    # singletons (no edges): they are fixed points and rejoin at the end.
    all_v = vertices.select(F.col(vertex_col).alias("v"))
    active_v = sym.select(F.col("src").alias("v")).distinct().localCheckpoint(eager=True)
    labels = active_v.select("v", F.col("v").alias("component")).localCheckpoint(eager=True)

    for _ in range(max_iter):
        # min neighbor label per vertex; closed neighborhood via coalesce
        nbr_min = (
            sym.join(labels, sym.dst == labels.v)
            .groupBy("src")
            .agg(F.min("component").alias("nbr_component"))
        )
        hop1 = labels.join(nbr_min, labels.v == nbr_min.src, "left").select(
            "v",
            F.least(F.col("component"), F.coalesce(F.col("nbr_component"), F.col("component"))).alias(
                "component"
            ),
            F.col("component").alias("_prev"),
        )
        # pointer jumping (path halving): adopt the label OF my label —
        # turns O(diameter) propagation into O(log diameter) rounds on
        # chains, one extra self-join per round
        parent = hop1.select(F.col("v").alias("_pv"), F.col("component").alias("_pc"))
        updated = (
            hop1.join(parent, hop1.component == parent._pv, "left")
            .select(
                "v",
                F.least(F.col("component"), F.coalesce(F.col("_pc"), F.col("component"))).alias(
                    "component"
                ),
                (F.least(F.col("component"), F.coalesce(F.col("_pc"), F.col("component"))) < F.col("_prev")).alias(
                    "_changed"
                ),
            )
        )
        updated = updated.localCheckpoint(eager=True)
        n_changed = updated.filter(F.coalesce(F.col("_changed"), F.lit(False))).count()
        labels = updated.drop("_changed")
        if n_changed == 0:
            # singletons (no incident edges) are their own component
            singles = all_v.join(active_v, "v", "left_anti").select(
                "v", F.col("v").alias("component")
            )
            return labels.unionByName(singles).select(F.col("v").alias(vertex_col), "component")
    raise RuntimeError(f"connected_components: no fixpoint within {max_iter} rounds")


def _union_find_local(vertices: DataFrame, sym: DataFrame, vertex_col: str) -> DataFrame:
    """Exact min-label components for an edge list small enough to collect:
    vectorized numpy min-label propagation with pointer jumping on the
    driver (Arrow transfer, C-speed rounds, O(log n) of them), result
    parallelized back. Vertices with no incident edge are their own
    singleton component."""
    import numpy as np
    import pandas as pd

    pdf = sym.select("src", "dst").toPandas()
    # np.unique sorts ascending, so index order == id order and min-index
    # propagation IS min-id propagation
    nodes, inv = np.unique(
        np.concatenate([pdf["src"].to_numpy(), pdf["dst"].to_numpy()]), return_inverse=True
    )
    si, di = inv[: len(pdf)], inv[len(pdf) :]
    lab = np.arange(len(nodes))
    while True:
        prev = lab.copy()
        np.minimum.at(lab, si, lab[di])  # adopt min neighbor label
        while True:  # pointer jumping to the current fixpoint
            nl = lab[lab]
            if np.array_equal(nl, lab):
                break
            lab = nl
        if np.array_equal(lab, prev):
            break

    spark = vertices.sparkSession
    vtype = vertices.schema[vertex_col].dataType
    schema = T.StructType(
        [T.StructField("v", vtype, False), T.StructField("component", vtype, False)]
    )
    labeled = spark.createDataFrame(
        pd.DataFrame({"v": nodes, "component": nodes[lab]}), schema
    )
    singles = (
        vertices.select(F.col(vertex_col).alias("v"))
        .join(labeled.select("v"), "v", "left_anti")
        .select("v", F.col("v").alias("component"))
    )
    return labeled.unionByName(singles).select(F.col("v").alias(vertex_col), "component")


def dedup_decisions(
    vertices: DataFrame,
    edges: DataFrame,
    vertex_col: str = "doc_id",
    src_col: str = "doc_a",
    dst_col: str = "doc_b",
) -> DataFrame:
    """Components + the keep/drop verdict: the minimum id in each component
    is the representative (kept); everything else in the component is a
    duplicate of it. Returns ``(vertex_col, component, is_representative)``."""
    cc = connected_components(vertices, edges, vertex_col, src_col, dst_col)
    return cc.select(
        vertex_col,
        "component",
        (F.col(vertex_col) == F.col("component")).alias("is_representative"),
    )
