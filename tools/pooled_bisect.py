"""Bisect the pooled-pass interference: run a subset of corpus entries
through the same ThreadPoolExecutor(par) protocol as bench.py's pooled
pass, stamping wall, tree CPU, and system fork count.

Usage::

    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python tools/pooled_bisect.py GROUP [par]

GROUP: comma-separated entry names, or one of the presets below.
"""

from __future__ import annotations

import os
import sys
import time
from concurrent.futures import ThreadPoolExecutor

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PRESETS = {
    # pure relational, no protocol layer, no streaming
    "light": [f"q{i:02d}" for i in range(1, 51)],
    # the snapshot/manifest protocol plane
    "proto": ["q51", "q54", "q55", "q56", "q57", "q58", "q59", "q60", "q61", "q62", "q63", "q64", "q66", "q67", "q68"],
    # streaming drains
    "stream": [f"s{i:02d}" for i in range(1, 17)],
    # training plane
    "train": [f"t{i:02d}" for i in range(1, 65)],
    "mart": ["q71", "q72", "q73", "q74", "q65", "q69", "q70"],
}


def forks() -> int:
    with open("/proc/stat") as f:
        for line in f:
            if line.startswith("processes"):
                return int(line.split()[1])
    return 0


def tree_cpu() -> float:
    # self + children of this process tree, coarse: sum utime+stime of all
    # pids whose ancestry includes us. Cheap approximation: use os.times for
    # self+reaped children plus /proc walk for live descendants.
    import glob

    me = os.getpid()
    parents = {}
    stats = {}
    for st in glob.glob("/proc/[0-9]*/stat"):
        try:
            parts = open(st).read().rsplit(")", 1)[1].split()
            pid = int(st.split("/")[2])
            parents[pid] = int(parts[1])
            stats[pid] = (int(parts[11]) + int(parts[12])) / os.sysconf("SC_CLK_TCK")
        except Exception:
            continue
    total = 0.0
    for pid, cpu in stats.items():
        p = pid
        for _ in range(20):
            if p == me:
                total += cpu
                break
            p = parents.get(p, 0)
            if p <= 1:
                break
    t = os.times()
    return total + t.children_user + t.children_system


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    group = sys.argv[1] if len(sys.argv) > 1 else "light"
    par = int(sys.argv[2]) if len(sys.argv) > 2 else 8

    from stellar_etl_airflow_spark.queries import QUERIES
    from stellar_etl_airflow_spark.session import get_spark, warm_python_data_source

    prefixes = PRESETS.get(group, group.split(","))
    names = [n for n in sorted(QUERIES) if any(n == p or n.startswith(p + "_") or n.startswith(p) and n[len(p):len(p)+1] == "_" for p in prefixes)]
    print(f"group={group} entries={len(names)} par={par}", flush=True)

    extra = {}
    for kv in os.environ.get("BISECT_CONF", "").split(";"):
        if "=" in kv:
            k, v = kv.split("=", 1)
            extra[k.strip()] = v.strip()
    evdir = os.environ.get("BISECT_EVENTLOG")
    if evdir:
        os.makedirs(evdir, exist_ok=True)
        extra = {"spark.eventLog.enabled": "true", "spark.eventLog.dir": evdir}
    spark = get_spark("pooled-bisect", extra_conf=extra)
    spark.sparkContext.setLogLevel("ERROR")
    QUERIES["q01_pricing_summary"].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    warm_python_data_source(spark)

    def run(name: str):
        t0 = time.perf_counter()
        QUERIES[name].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        return name, round(time.perf_counter() - t0, 2)

    f0, c0, t0 = forks(), tree_cpu(), time.perf_counter()
    if par == 1:
        res = list(map(run, names))
    else:
        with ThreadPoolExecutor(max_workers=par) as pool:
            res = list(pool.map(run, names))
    wall = time.perf_counter() - t0
    df, dc = forks() - f0, tree_cpu() - c0
    print(f"wall={wall:.1f}s cpu={dc:.0f}s forks={df} forks/s={df/wall:.1f}")
    for n, w in sorted(res, key=lambda x: -x[1])[:12]:
        print(f"  {w:8.2f} {n}")
    spark.stop()


if __name__ == "__main__":
    main()
