"""Plan-shape contracts for the scale-critical operators.

Correctness is proven by the oracle gate; these tests pin the PHYSICAL
plan properties the 100 TB design depends on (SCALE.md), so a future
refactor that silently reintroduces a nested-loop join or an extra
shuffle fails here rather than in production."""

from __future__ import annotations

import os
import re

import pytest
from pyspark.sql import functions as F

from .conftest import SF_SMOKE


def _plan(df) -> str:
    return df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("extended")
    )


def _physical(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_asof_union_is_single_exchange(spark):
    from stellar_etl_airflow_spark.queries import QUERIES

    plan = _physical(QUERIES["q27_asof_union"].fn(spark, SF_SMOKE))
    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan


def test_no_nested_loop_in_scale_queries(spark):
    from stellar_etl_airflow_spark.queries import QUERIES

    for name in ("q37_lateral_topk", "q39_full_outer", "t17_neardup_components"):
        plan = _physical(QUERIES[name].fn(spark, SF_SMOKE))
        assert "CartesianProduct" not in plan, name
        assert "BroadcastNestedLoopJoin" not in plan, name
    # q42's only nested-loop operator is the intentional 1-row horizon
    # broadcast (the open-interval clamp); the interval join itself must
    # be a hash join on (key, bucket)
    plan = _physical(QUERIES["q42_bucketed_range_join"].fn(spark, SF_SMOKE))
    assert "CartesianProduct" not in plan
    # every nested-loop occurrence must be the 1-row Cross clamp, never
    # the interval join itself
    for line in plan.splitlines():
        if "BroadcastNestedLoopJoin" in line:
            assert "Cross" in line, line
    assert re.search(r"(SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin).*user_id", plan)


def test_dimension_join_broadcasts(spark):
    from stellar_etl_airflow_spark.queries import QUERIES

    # q15 multiway join: nation/region dims must broadcast, never shuffle
    plan = _physical(QUERIES["q15_multiway_join"].fn(spark, SF_SMOKE))
    assert "BroadcastHashJoin" in plan


def test_scan_prunes_columns(spark):
    # projection pushdown: a 2-column query must not read the whole schema
    li = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet")
    plan = _physical(li.select("l_orderkey", "l_quantity").filter(F.col("l_quantity") > 10))
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    assert m and set(c.split(":")[0] for c in m.group(1).split(",")) == {"l_orderkey", "l_quantity"}
    assert "PushedFilters: [" in plan and "GreaterThan(l_quantity" in plan


def test_brute_force_ann_never_shuffles_corpus(spark):
    from stellar_etl_airflow_spark.training.similarity import cosine_topk

    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    plan = _physical(cosine_topk(emb, emb.filter(F.col("vec_id") % 10 == 0), k=3))
    # queries ship in the task closure (driver-materialized build side, the
    # broadcast-join pattern); the corpus is scored in place by an Arrow
    # mapInPandas and only per-batch top-k candidates reach the single
    # exchange feeding the final exact window
    assert "MapInPandas" in plan
    below_map = plan.split("MapInPandas")[-1]  # plan prints leaves last
    # a round-robin spread of a tiny single-split scan is allowed (local
    # parallelism fix, no-op at scale); a hash exchange of the corpus for a
    # join is not
    assert "Exchange hashpartitioning" not in below_map, "corpus must not hash-shuffle"
    assert plan.count("Exchange hashpartitioning") == 1  # only the window


def test_inverted_index_fold_materialized_once(spark):
    # t02/t14: the shingling fold must never appear in the final join plan —
    # the postings checkpoint (Scan ExistingRDD) already holds its output.
    # A broadcast self-join side would otherwise rerun the fold per branch
    # (ReuseExchange does not fire across broadcast/shuffle asymmetry).
    from stellar_etl_airflow_spark.queries import QUERIES

    for name in ("t02_ngram_jaccard_pairs", "t14_jaccard_dfcapped"):
        plan = _physical(QUERIES[name].fn(spark, SF_SMOKE))
        assert "Scan ExistingRDD" in plan, name
        assert "lambdafunction" not in plan, f"{name}: shingle fold leaked into the join plan"


def test_sketch_agg_not_rekeyed_by_distinct(spark):
    # q40: countDistinct must live in its own aggregation — the mixed
    # distinct rewrite keys partial sketch buffers by (group, orderkey)
    # (measured 385 s at sf0.1). The sketch aggregate's partial phase must
    # be keyed by l_returnflag alone.
    from stellar_etl_airflow_spark.queries import QUERIES

    plan = _physical(QUERIES["q40_sketch_aggregates"].fn(spark, SF_SMOKE))
    for line in plan.split("\n"):
        if "partial_approx_percentile" in line:
            assert "l_orderkey" not in line.split("functions=")[0], (
                "sketch partials re-keyed by the distinct column"
            )


def test_percentile_one_buffer_per_column(spark):
    # q29/q40 (optimization r13): percentile aggregates use the ARRAY
    # form — one buffer per column queried at N percentage points, not
    # one buffer per point (three scalar percentile() calls on the same
    # column each built their own counts hashmap per partition; measured
    # q29 2.91 s -> 1.06 s at sf0.1). Exactly one partial buffer over
    # l_extendedprice may appear per aggregate kind.
    from stellar_etl_airflow_spark.queries import QUERIES

    for name in ("q29_percentiles", "q40_sketch_aggregates"):
        plan = _physical(QUERIES[name].fn(spark, SF_SMOKE))
        assert plan.count("partial_percentile(l_extendedprice") == 1, name
        if name == "q40_sketch_aggregates":
            # the approx pair lives only in q40; assert it on q40's own
            # plan rather than the loop-leaked variable (ADVICE r13)
            assert plan.count("partial_approx_percentile(l_extendedprice") == 1


def test_minhash_fold_stays_above_the_spread_exchange(spark):
    # optimization r13: filter(size(grams) > 0) inlined the shingle fold
    # and Catalyst pushed it below spread()'s round-robin exchange into
    # the scan's DataFilters — the whole fold then ran on the ONE scan
    # split's core (2.35 s single-task stage at sf0.1 inside t03/t50/s14)
    # and again post-exchange. The word-count gate keeps the scan-side
    # filter cheap; the fold (an `aggregate(` lambda) must not appear in
    # the scan's pushed filters.
    from stellar_etl_airflow_spark.training.dedup import _minhash_sig_frame

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    plan = _physical(_minhash_sig_frame(docs, "text", "doc_id", 3, 32))
    scan_section = plan.split("FileScan")[1]
    pushed = scan_section.split("ReadSchema")[0]
    assert "aggregate(" not in pushed, "shingle fold pushed into the scan"


def test_simhash_scorer_input_not_hash_shuffled(spark):
    # the simhash mapInPandas scorer reads its input in place (round-robin
    # spread of a tiny local scan allowed; no hash exchange below it)
    from stellar_etl_airflow_spark.training.dedup import simhash

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    plan = _physical(simhash(docs))
    below = plan.split("MapInPandas")[-1]
    assert "Exchange hashpartitioning" not in below


def test_contamination_broadcasts_eval_side(spark):
    """t28: the benchmark/eval side must broadcast — the corpus postings
    are never shuffled for the join (the whole point of the asymmetric
    inverted-index design at 100 TB)."""
    from stellar_etl_airflow_spark.queries import QUERIES

    plan = _physical(QUERIES["t28_contamination_report"].fn(spark, SF_SMOKE))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


@pytest.mark.parametrize(
    "export_name,pruned_expect",
    [("history_operations", {"claimants"}), ("history_effects", {"predicate"})],
)
def test_export_projection_prunes_nested_details(spark, tmp_path, export_name, pruned_expect):
    """The Avro export projections (sinks/avro_defs.py) name individual
    ``details.*`` subfields (history_operations.sql:8-148 names 121 of the
    pinned schema's 122); the parquet scan must read ONLY those subfields —
    nested-schema pruning reaching the reader is the difference between
    scanning the exported columns and scanning the full 100 TB struct."""
    import datetime

    from stellar_etl_airflow_spark.sinks.avro_defs import EXPORT_DEFS, build_export_df

    from .test_avro_exports import source_schema, synth_rows

    sch = source_schema(export_name)
    path = str(tmp_path / export_name)
    spark.createDataFrame(synth_rows(sch, 8), sch).write.parquet(path)
    out = build_export_df(
        spark.read.parquet(path),
        export_name,
        datetime.datetime(2024, 1, 1),
        datetime.datetime(2024, 1, 2),
    )

    scan = out._jdf.queryExecution().executedPlan().collectLeaves().apply(0)
    req = scan.requiredSchema()
    # top level: only projected + filter columns, not the full table
    top = {f.name() for f in req.fields()}
    assert len(top) < len(sch.fields)
    # nested: the details struct carries exactly the referenced subfields
    (det,) = [f for f in req.fields() if f.name() == "details"]
    read_sub = {f.name() for f in det.dataType().fields()}
    referenced = {
        m
        for expr, _ in EXPORT_DEFS[export_name].columns
        for m in re.findall(r"details\.`?(\w+)`?", expr)
    }
    assert read_sub == referenced
    full_sub = {f.name for f in sch["details"].dataType.fields}
    assert full_sub - read_sub == pruned_expect
    # the batch-window filter must reach the scan as pushed predicates
    meta = scan.metadata()
    pushed = meta.get("PushedFilters").get()
    assert "closed_at" in pushed or "batch_run_date" in pushed


def test_funnel_is_single_exchange(spark):
    """q50: one groupBy shuffle on user_id; the funnel-step cascade is
    pure expression work — no joins, no re-shuffle per step."""
    from stellar_etl_airflow_spark.queries import QUERIES

    plan = _physical(QUERIES["q50_funnel"].fn(spark, SF_SMOKE))
    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1
    for bad in ("SortMergeJoin", "BroadcastHashJoin", "BroadcastNestedLoopJoin", "CartesianProduct"):
        assert bad not in plan, bad


def test_round5_entries_never_nested_loop(spark):
    """q48's levenshtein confirm must ride the block-key hash join (a
    planner regression to a nested-loop theta join would be quadratic in
    the table, not the block); q49's calendar join must stay a hash join."""
    from stellar_etl_airflow_spark.queries import QUERIES

    for name in ("q48_fuzzy_blocked_join", "q49_gapfill_ffill"):
        plan = _physical(QUERIES[name].fn(spark, SF_SMOKE))
        assert "BroadcastNestedLoopJoin" not in plan, name
        assert "CartesianProduct" not in plan, name


def test_model_runner_current_state_chain_broadcasts_dim(spark, tmp_path):
    """The dbt-equivalent hot path (VERDICT r5 #6): a model-runner chain
    materializing v_accounts_current (distinct -> ledgers join ->
    dense_rank) must (a) BROADCAST the ledgers side — the reference's
    closed_at lookup joins a per-batch ledger slice that is tiny next to
    the accounts change log (v_accounts_current.sql:34-36), so a shuffle
    join here would exchange the big side for nothing — and (b) prune the
    ledgers parquet scan to exactly (sequence, closed_at), never the full
    ledger row."""
    from stellar_etl_airflow_spark.models.runner import ModelRegistry
    from stellar_etl_airflow_spark.views import currentstate as CS

    from . import fixtures as FX

    acc_path, led_path = str(tmp_path / "accounts"), str(tmp_path / "ledgers")
    spark.createDataFrame(FX.account_change_rows(), FX.ACCOUNTS_SCHEMA).write.parquet(acc_path)
    from datetime import datetime as _dt

    led_rows = [
        {**r, "closed_at": _dt.fromisoformat(r["closed_at"])} for r in FX.ledger_rows()
    ]
    spark.createDataFrame(led_rows, FX.LEDGERS_SCHEMA).write.parquet(led_path)

    reg = ModelRegistry()

    @reg.model("accounts_current", tags=("current_state",))
    def accounts_current(ctx):
        return CS.v_accounts_current(
            ctx.spark.read.parquet(acc_path), ctx.spark.read.parquet(led_path)
        )

    @reg.model("balance_mart", tags=("marts",), deps=("accounts_current",))
    def balance_mart(ctx):
        return ctx.ref("accounts_current").select("account_id", "balance", "closed_at")

    out = reg.run(spark, "+tag:marts")
    df = out["balance_mart"]
    plan = _physical(df)
    assert "BroadcastHashJoin" in plan, plan
    # the ledgers side must never be exchanged for the join: the only
    # hash exchange in the chain is the window/dedup repartition
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan, plan
    # column pruning: the ledgers scan reads exactly the two columns the
    # view consumes (12-column table) — ReadSchema proves pushdown
    # (the Location path is elided in the plan string, so identify the
    # ledgers scan by its projected column list)
    led_scans = [
        ln for ln in plan.splitlines()
        if re.search(r"FileScan parquet \[sequence#\d+L?,\s*closed_at#\d+\]", ln)
    ]
    assert led_scans, plan
    for ln in led_scans:
        assert "ReadSchema: struct<sequence:bigint,closed_at:timestamp>" in ln, ln
    # and the chain is still correct
    got = {r["account_id"]: r["balance"] for r in df.collect()}
    assert got == {"A": 25.0, "B": 0.0, "C": 7.5}


def test_round6_entries_plan_shapes(spark):
    """t39's gram-postings join must stay a hash join (a nested-loop
    regression would be corpus x dup-set quadratic); t37's pair stage is
    LSH-bucket-blocked, never a cross product; t38's only nested-loop
    operator is the intentional 1-row totals broadcast (the same Cross
    clamp convention as q42) — its vocab scoring join must hash."""
    from stellar_etl_airflow_spark.queries import QUERIES

    for name in ("t39_duplicate_spans", "t37_semantic_dedup"):
        plan = _physical(QUERIES[name].fn(spark, SF_SMOKE))
        assert "CartesianProduct" not in plan, name
        assert "BroadcastNestedLoopJoin" not in plan, name
    plan = _physical(QUERIES["t38_importance_weights"].fn(spark, SF_SMOKE))
    assert "CartesianProduct" not in plan
    for line in plan.splitlines():
        if "BroadcastNestedLoopJoin" in line:
            assert "Cross" in line, line  # the 1-row totals attach only
    assert "BroadcastHashJoin" in plan, plan  # the vocab scoring join


def test_round7_entries_plan_shapes(spark):
    """t40 (Gopher rules) is a pure per-row expression map: no exchange,
    no join, whole-stage codegen over a single scan. t41 (source lang
    mix) is two map-side-combined aggregates: its exchanges hash on
    (source, lang) and (source) only — no join, no window over the base
    table, shuffle volume ∝ distinct pairs."""
    from stellar_etl_airflow_spark.queries import QUERIES

    plan = _physical(QUERIES["t40_gopher_rules"].fn(spark, SF_SMOKE))
    assert "Exchange" not in plan, plan
    assert "Join" not in plan and "CartesianProduct" not in plan, plan
    assert "FileScan" in plan and "Project" in plan, plan  # pure scan+map

    plan = _physical(QUERIES["t41_source_lang_mix"].fn(spark, SF_SMOKE))
    assert "Join" not in plan and "CartesianProduct" not in plan, plan
    assert plan.count("Exchange") <= 2, plan
    assert "partial" in plan.lower() or "HashAggregate" in plan, plan


def test_bloom_build_prunes_scan_and_broadcasts_m_map(spark, tmp_path):
    """compute_blooms' per-column pass (r7): the parquet scan must be
    pruned to ONLY the bloom column (building filters for one key never
    reads the whole row — at 100 TB that is the difference between a
    1-column and an N-column scan), and the (file, m) sizing map must be
    BROADCAST (it is n_files rows; shuffling the corpus to join it would
    dwarf the build). The dedup must partial-aggregate before the
    exchange (map-side combine bounds shuffle volume by m per file)."""
    from pyspark.sql import functions as F

    from stellar_etl_airflow_spark.sinks import snapshots as S

    p = str(tmp_path / "t")
    spark.range(1000).select(
        F.md5(F.col("id").cast("string")).alias("h"),
        F.col("id").alias("v"),
        (F.col("id") % 7).alias("w"),
    ).repartition(4, "h").write.parquet(p)
    files = [
        os.path.join(p, f) for f in sorted(os.listdir(p)) if f.endswith(".parquet")
    ]
    mdf = spark.createDataFrame(
        [(os.path.abspath(f), 8192) for f in files], "_fp string, _m long"
    )
    plan = _physical(S._bloom_position_sets(spark, files, ["h"], mdf, 4))
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    assert m and [c.split(":")[0] for c in m.group(1).split(",")] == ["h"], plan
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan, plan
    assert "SortMergeJoin" not in plan and "CartesianProduct" not in plan, plan
    # distinct renders as HashAggregate / Exchange / HashAggregate —
    # the lower aggregate IS the map-side combine
    assert plan.count("HashAggregate") >= 2 and "Exchange hashpartitioning" in plan, plan
    # r13: ALL bloom columns ride ONE scan (stack) — the read schema is
    # pruned to exactly the bloom columns, still no wide-row read, and
    # the whole build stays a single query (one job per publish, not one
    # per column)
    plan2 = _physical(S._bloom_position_sets(spark, files, ["h", "w"], mdf, 4))
    m2 = re.search(r"ReadSchema: struct<([^>]*)>", plan2)
    assert m2 and sorted(
        c.split(":")[0] for c in m2.group(1).split(",")
    ) == ["h", "w"], plan2
    assert "SortMergeJoin" not in plan2 and "CartesianProduct" not in plan2, plan2


def test_t42_bigram_backoff_plan_shape(spark):
    """t42 (bigram Stupid Backoff): the only CROSS operator is the 1-row
    corpus-total attach; unigram joins broadcast; the final per-doc
    aggregate partial-combines before its single doc-keyed exchange. No
    cartesian pair blow-up anywhere (the bigram fold is zip_with over the
    token array, shuffle-free)."""
    from stellar_etl_airflow_spark.queries import QUERIES

    plan = _physical(QUERIES["t42_bigram_backoff"].fn(spark, SF_SMOKE))
    assert "CartesianProduct" not in plan, plan
    for line in plan.splitlines():
        if "BroadcastNestedLoopJoin" in line:
            assert "Cross" in line, line  # 1-row totals only
    assert "BroadcastHashJoin" in plan, plan  # unigram attach
    assert "partial_count" in plan or "partial" in plan.lower(), plan


def test_t43_bpe_round_cost_is_vocab_sized(spark):
    """BPE learning (t43): after the one corpus token fold, each round's
    pair-count aggregate runs on the word-type table with map-side
    partials, and the merge apply is a pure expression map (no join, no
    Python). Contract: the pair aggregate's plan has exactly one
    exchange, hashing on the pair key — never a corpus-sized operator."""
    from pyspark.sql import functions as F

    from stellar_etl_airflow_spark.training import bpe as B

    docs = spark.createDataFrame(
        [(0, "low lower lowest"), (1, "new newer newest")], "doc_id long, text string"
    )
    words = (
        docs.select(F.explode(F.split(F.lower("text"), r"\s+")).alias("w"))
        .groupBy("w").agg(F.count(F.lit(1)).alias("freq"))
    )
    types = words.select(
        F.concat(F.split(F.col("w"), ""), F.array(F.lit(B.EOW))).alias("sym"), "freq"
    ).localCheckpoint(eager=True)
    pair_col = F.expr(
        "zip_with(slice(sym, 1, size(sym) - 1), slice(sym, 2, size(sym) - 1),"
        " (x, y) -> struct(x as a, y as b))"
    )
    agg = (
        types.select(F.explode(pair_col).alias("p"), "freq")
        .groupBy("p.a", "p.b").agg(F.sum("freq").alias("n"))
    )
    plan = _physical(agg)
    assert plan.count("Exchange") == 1, plan
    assert "partial_sum" in plan, plan
    assert "Join" not in plan and "CartesianProduct" not in plan, plan
    # the merge-apply expression is joinless and exchange-free
    applied = types.select(F.expr(B._merge_expr("sym", "a", "b")).alias("sym"), "freq")
    aplan = _physical(applied)
    assert "Exchange" not in aplan and "Join" not in aplan, aplan


def test_profile_split_expand_and_approx_single_pass(spark):
    """profile_table: the exact variant isolates its countDistinct
    Expand in a SEPARATE aggregate joined back as a 1-row broadcast
    cross (mixing it into the plain aggregate replicates every row
    (k+1)x through all 5k aggregates — measured 4.7x slower at sf0.1);
    the approx=True twin (HLL++) is ONE pass with NO Expand and NO join
    — that is the 100 TB shape."""
    from pyspark.sql import functions as F

    from stellar_etl_airflow_spark.operators.quality import profile_table

    df = spark.range(500).select(
        F.col("id"), (F.col("id") % 9).alias("g"),
        F.md5(F.col("id").cast("string")).alias("h"),
    )
    exact = _physical(profile_table(df, ("id", "g", "h")))
    assert "Expand" in exact, exact
    assert "CartesianProduct" not in exact, exact
    joins = [ln for ln in exact.splitlines() if "NestedLoopJoin" in ln]
    assert joins and all("Cross" in ln for ln in joins), exact  # 1-row attach only

    approx = _physical(profile_table(df, ("id", "g", "h"), approx=True))
    assert "Expand" not in approx and "Join" not in approx, approx
    assert "partial" in approx.lower(), approx


def test_pq_topk_candidate_exchange_is_bounded(spark, tmp_path):
    """pq_topk (r8, VERDICT r7 ask #2): the persisted codes table never
    shuffles — ADC scoring + per-batch top-k run inside one
    mapInPandas over the scan, so the only exchange in the whole plan
    is the final fold over #batches * |Q| * k candidate rows. The old
    plan's unbounded groupBy(q_id).collect_list over the scored corpus
    (one buffer entry per corpus row per query) must never come back."""
    import numpy as np

    from stellar_etl_airflow_spark.training import similarity as SIM

    rng = np.random.default_rng(7)
    corpus = spark.createDataFrame(
        [(i, [float(x) for x in rng.normal(size=8)]) for i in range(64)],
        "vec_id long, embedding array<double>",
    )
    queries = spark.createDataFrame(
        [(100 + i, [float(x) for x in rng.normal(size=8)]) for i in range(3)],
        "vec_id long, embedding array<double>",
    )
    cb = SIM.pq_train(corpus, m=2, n_iter=1)
    # persist codes like a deployment would: topk plans over a bare scan
    codes_path = str(tmp_path / "codes")
    SIM.pq_encode(corpus, cb, m=2).write.parquet(codes_path)
    codes = spark.read.parquet(codes_path)
    out = SIM.pq_topk(codes, queries, cb, m=2, k=3)
    plan = _physical(out)
    assert "MapInPandas" in plan, plan
    # exactly one exchange: the candidate fold; nothing below the Python
    # scorer (i.e. the corpus scan side) ever shuffles
    assert plan.count("Exchange") == 1, plan
    below = plan.split("MapInPandas", 1)[1]
    assert "Exchange" not in below, plan
    assert "CartesianProduct" not in plan and "NestedLoop" not in plan, plan
    # the collect_list fold sits ABOVE the scorer: it only ever sees
    # bounded candidate rows, never the scored corpus
    above = plan.split("MapInPandas", 1)[0]
    assert "collect_list" in above and "collect_list" not in below, plan
    # and it is still the exact top-k
    rows = {(r["query_id"], r["rank"]): r["vec_id"] for r in out.collect()}
    assert len(rows) == 9


def test_shard_manifest_prefix_sum_is_segmented(spark):
    """t53 (r8): the global cumsum must be the DISTRIBUTED prefix sum —
    the corpus-side window partitions by the hash segment (parallel),
    and the only single-partition operators act on the n_buckets-row
    offsets branch, never on the per-document table. A plain global
    window (Window.orderBy with no partition) over the corpus would
    funnel every row through one task at 100 TB."""
    from stellar_etl_airflow_spark.queries import QUERIES

    plan = _physical(QUERIES["t53_shard_manifest"].fn(spark, SF_SMOKE))
    # corpus-side window keyed by segment
    assert "hashpartitioning(seg" in plan, plan
    # offsets fold + broadcast join present; the broadcast marks the
    # n_buckets-row branch, so corpus rows never cross a SinglePartition
    # exchange (the one SinglePartition allowed feeds that tiny branch)
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan, plan
    # at most one SinglePartition exchange, and it must sit inside the
    # broadcast (offsets) branch — i.e. after the broadcast node in the
    # top-down plan print — never on the corpus window chain
    assert plan.count("Exchange SinglePartition") <= 1, plan
    if "Exchange SinglePartition" in plan:
        bcast = plan.index("BroadcastExchange") if "BroadcastExchange" in plan else plan.index("BroadcastHashJoin")
        assert plan.index("Exchange SinglePartition") > bcast, plan


def test_hashed_features_single_exchange(spark):
    """t56: explode -> in-codegen hash -> ONE map-side-combined groupBy.
    A second exchange would mean the hash left codegen or the aggregate
    lost its partial stage."""
    from stellar_etl_airflow_spark.queries import QUERIES

    plan = _physical(QUERIES["t56_hashed_features"].fn(spark, SF_SMOKE))
    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_pmi_marginals_broadcast_onto_pairs(spark):
    """t57: the pair-TYPE table is the only shuffled reduction; every
    marginal join must be broadcast (vocab-sized vs pair-stream-sized),
    and pair expansion must stay an in-row expression (no self-join of
    the corpus)."""
    from stellar_etl_airflow_spark.queries import QUERIES

    plan = _physical(QUERIES["t57_pmi_cooccurrence"].fn(spark, SF_SMOKE))
    assert len(re.findall(r"BroadcastHashJoin", plan)) == 2
    # exactly one nested-loop occurrence, and it is the 1-row total clamp
    assert len(re.findall(r"BroadcastNestedLoopJoin.*Cross", plan)) == 1
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_incremental_dedup_corpus_side_shape(spark):
    """t59: candidate generation is an equi-join on (band, digest) and
    the agreement scoring equi-joins on doc ids — never a nested loop;
    the batch side's whole-corpus work is bounded to the index probe."""
    from stellar_etl_airflow_spark.queries import QUERIES

    plan = _physical(QUERIES["t59_incremental_dedup"].fn(spark, SF_SMOKE))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_r11_entries_plan_shapes(spark):
    """t64: the DOM extraction is ONE Python stage over the scan — no
    exchange (the codec-decoder shape; a refactor that makes the
    tokenizer shuffle-dependent breaks linearity at 100 TB). The MoR
    counter read (q64's read path) is one hash-aggregate exchange over
    the delta pile — no join, no second shuffle."""
    import shutil
    import tempfile

    from stellar_etl_airflow_spark.operators import additive_mor as AM
    from stellar_etl_airflow_spark.queries import QUERIES

    plan = _physical(QUERIES["t64_html_extract_dom"].fn(spark, SF_SMOKE))
    assert "Exchange" not in plan
    assert len(re.findall(r"MapInPandas", plan)) == 1
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan

    tbl = os.path.join(tempfile.mkdtemp(), "mor")
    try:
        AM.write_delta(
            spark,
            spark.createDataFrame([(1, 2)], "k long, n long").repartition(1),
            tbl,
            ("k",),
            ("n",),
        )
        rplan = _physical(AM.read_additive(spark, tbl))
        assert len(re.findall(r"Exchange hashpartitioning", rplan)) == 1
        assert "Join" not in rplan
    finally:
        shutil.rmtree(os.path.dirname(tbl), ignore_errors=True)


def test_q65_recursion_never_cartesian(spark):
    """The recursive CTE's per-iteration join must be a hash/broadcast
    join on the parent key — a planner change that degrades it to a
    nested loop would turn log10(N) cheap iterations into N^2 work."""
    from stellar_etl_airflow_spark.queries import QUERIES

    plan = _physical(QUERIES["q65_recursive_hierarchy"].fn(spark, SF_SMOKE))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_variant_pipeline_stays_jvm_side(spark):
    """q66/q68 (r12): the VARIANT pipeline must be one scan -> codegen
    filter/project -> partial agg -> ONE exchange — no Python stage, no
    join, no JSON string surviving to a second shuffle. q66
    additionally must push the type filter below the variant
    projections (rows failing it never pay the other variant_gets)."""
    from stellar_etl_airflow_spark.queries import QUERIES

    plan = _physical(QUERIES["q66_variant_json"].fn(spark, SF_SMOKE))
    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1
    for bad in ("Python", "CartesianProduct", "Join"):
        assert bad not in plan, bad
    assert "variant_get" in plan
    # the filter runs against the scan output, before the flat projection
    scan_filter = re.search(r"Filter .*purchase", plan)
    assert scan_filter is not None


def test_sql_udf_inlines_to_codegen(spark):
    """q69 (r12): SQL UDFs must be macro-expanded by Catalyst — the
    plan may contain no UDF/Python node and exactly one exchange, i.e.
    the same plan as writing the arithmetic inline."""
    from stellar_etl_airflow_spark.queries import QUERIES

    plan = _physical(QUERIES["q69_sql_udf"].fn(spark, SF_SMOKE))
    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1
    for bad in ("Python", "BatchEval", "SQLFunction", "Invoke"):
        assert bad not in plan, bad


def test_mart_entries_fact_side_broadcast_only(spark):
    """q71/q74 (r13): the mart pipelines must stream the trade fact side
    through BROADCAST joins only — no sort-merge join (which would
    shuffle 100 TB of trades by join key), no cartesian product, and
    exactly ONE nested-loop operator: the keyless XLM-window broadcast
    (the intentional q07/q08 pattern — tiny build side, range-only
    condition). q73 additionally must compile its rank()=1 latest-price
    window to WindowGroupLimit (top-1 below the shuffle), not a full
    window sort."""
    from stellar_etl_airflow_spark.queries import QUERIES

    for name, min_bhj in (("q71_trade_volume_mart", 2), ("q74_relevant_asset_trades", 5)):
        plan = _physical(QUERIES[name].fn(spark, SF_SMOKE))
        assert "SortMergeJoin" not in plan, name
        assert "CartesianProduct" not in plan, name
        assert len(re.findall(r"BroadcastHashJoin", plan)) >= min_bhj, name
        assert len(re.findall(r"BroadcastNestedLoopJoin", plan)) == 1, name

    plan = _physical(QUERIES["q73_liquidity_pool_value"].fn(spark, SF_SMOKE))
    assert "SortMergeJoin" not in plan
    assert "WindowGroupLimit" in plan  # rank()=1 pruned below the exchange
