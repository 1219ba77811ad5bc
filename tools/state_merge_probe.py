"""Volume probe for the DEFAULT bucketed-MVCC state merge
(``operators.merge.apply_changes`` — the e2e pipeline's biggest stage),
r9, VERDICT r8 ask #7. Two questions, each answered with measured wall
ratios:

1. **grow-all**: seed rows AND change-batch rows both scale Kx with the
   bucket count held at the default 64 — every bucket is touched, so
   the merge is a full-table rewrite and wall should grow ~linearly in
   K (the work does). Super-linear growth would indict the plan.
2. **sparse-scaled**: the 100 TB deployment story. Seed rows scale Kx
   and ``n_buckets`` scales Kx with them (pinned at table creation, the
   documented sizing rule: bucket SIZE stays constant), while the
   change batch is a fixed 64 keys — it touches at most 64 buckets
   regardless of K, so the merge wall should stay ~FLAT in K: scoped
   cost is touched-buckets x bucket-size, independent of table size.
   (A DENSE batch against Kx buckets is deliberately not the headline:
   with batch-keys >> n_buckets every bucket is touched and the merge
   is a full rewrite whose cost is the table — mode 1 already measures
   that regime, and at probe scale Kx buckets of tiny files would just
   measure per-partition job overhead.)

Each (mode, K) seeds a fresh table via one apply_changes bootstrap and
times a second apply_changes carrying 50% updates / 25% deletes / 25%
inserts (min of 2 fresh-table reps). Keys are uniform longs so bucket
occupancy is even; order columns advance so every change wins.

Usage: python tools/state_merge_probe.py [K ...]   (default: 1 10)
Prints one JSON line per (mode, K) and a summary with ratios.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from stellar_etl_airflow_spark.operators.merge import apply_changes
from stellar_etl_airflow_spark.session import get_spark

SEED_ROWS = 20_000
BATCH_ROWS = 5_000


def _rows(spark, n: int, start_key: int, ledger: int, deleted_every: int = 0):
    df = spark.range(n).select(
        (F.col("id") + start_key).alias("account_id"),
        (F.col("id") % 997).cast("long").alias("balance"),
        (
            (F.col("id") % deleted_every == deleted_every - 1)
            if deleted_every
            else F.lit(False)
        ).alias("deleted"),
        F.lit(ledger).cast("long").alias("last_modified_ledger"),
        F.lit(0).cast("int").alias("ledger_entry_change"),
    )
    return df


def run_mode(spark, mode: str, k: int, reps: int = 2) -> dict:
    seed_n = SEED_ROWS * k
    batch_n = BATCH_ROWS * k if mode == "grow-all" else 64
    n_buckets = 64 * (k if mode == "sparse-scaled" else 1)
    walls = []
    for _ in range(reps):
        d = tempfile.mkdtemp(prefix=f"smp-{mode}-{k}-")
        tbl = os.path.join(d, "state")
        try:
            apply_changes(
                spark, _rows(spark, seed_n, 0, ledger=1), tbl,
                keys=("account_id",), n_buckets=n_buckets,
            )
            # change batch: half updates existing keys, quarter deletes,
            # quarter inserts brand-new keys
            upd = _rows(spark, batch_n // 2, 0, ledger=2)
            dele = _rows(spark, batch_n // 4, batch_n, ledger=2, deleted_every=1)
            ins = _rows(spark, batch_n - batch_n // 2 - batch_n // 4, seed_n, ledger=2)
            batch = upd.unionByName(dele).unionByName(ins)
            t0 = time.perf_counter()
            _, touched = apply_changes(
                spark, batch, tbl, keys=("account_id",), n_buckets=n_buckets
            )
            walls.append(time.perf_counter() - t0)
        finally:
            shutil.rmtree(d, ignore_errors=True)
    row = {
        "probe": "state_merge",
        "mode": mode,
        "k": k,
        "seed_rows": seed_n,
        "batch_rows": batch_n,
        "n_buckets": n_buckets,
        "touched_buckets": len(touched),
        "wall_sec": round(min(walls), 3),
        "reps": reps,
    }
    print(json.dumps(row), flush=True)
    return row


def main() -> None:
    ks = [int(a) for a in sys.argv[1:]] or [1, 10]
    spark = get_spark("state-merge-probe")
    spark.sparkContext.setLogLevel("ERROR")
    results: dict[tuple[str, int], dict] = {}
    for mode in ("grow-all", "sparse-scaled"):
        for k in ks:
            results[(mode, k)] = run_mode(spark, mode, k)
    base = {m: results[(m, ks[0])]["wall_sec"] for m in ("grow-all", "sparse-scaled")}
    print(
        json.dumps(
            {
                "probe": "state_merge_summary",
                "ratios": {
                    f"{m}@{k}x": round(results[(m, k)]["wall_sec"] / base[m], 2)
                    for (m, k) in results
                },
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
