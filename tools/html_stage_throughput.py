"""Operator-choice number for t63 vs t64 (VERDICT r11 ask #4): the
bytes-per-second of the codegen-regex HTML extraction
(``html_to_text``) vs the Arrow-batched stdlib-DOM stage
(``html_to_text_dom``) over the SAME input, with scan overhead removed
(input is localCheckpoint-pinned before timing). This is the number a
100 TB pipeline weighs when picking the robust-but-Python DOM path
over the codegen regex path.

Input: the t63 corpus entry's HTML scaffold over the replicated
documents at /tmp/scale-stress/sfK (built by tools/scale_stress.py;
K via argv, default 10 — ~18.5 MB of text at sf0.1 base). Each path is
consumed identically (length + md5 fold to one row) so neither gets a
lazy-evaluation discount.

Usage: python tools/html_stage_throughput.py [K]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from stellar_etl_airflow_spark.session import get_spark
from stellar_etl_airflow_spark.training.text import html_to_text, html_to_text_dom

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from scale_stress import build  # noqa: E402


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    reps = max(1, int(os.environ.get("SPARK_GRAFT_SCALE_REPS", "3")))
    spark = get_spark("html-stage-throughput")
    spark.sparkContext.setLogLevel("ERROR")
    sf_dir = build(spark, k)
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    aug = docs.select(
        "doc_id",
        F.concat(
            F.lit("<html><head><style>p {color: red}</style>"
                  "<script type='text/javascript'>var x = 1 < 2;</script></head><body>"),
            F.lit("<h1>Title "),
            F.col("doc_id").cast("string"),
            F.lit("</h1><!-- hidden comment --><p>"),
            F.col("text"),
            F.lit("</p>"),
            F.when(
                F.col("doc_id") % 4 == 0,
                F.lit("<ul><li>alpha &amp; beta</li><li>&quot;quoted&quot;</li></ul>"),
            ).otherwise(F.lit("<div>plain &lt;tail&gt; block</div>")),
            F.lit("<br/>footer&nbsp;line</body></html>"),
        ).alias("html"),
    ).localCheckpoint()  # pin input: timings exclude the parquet scan
    n_bytes = aug.agg(F.sum(F.length("html"))).collect()[0][0]

    def consume(df) -> float:
        t0 = time.perf_counter()
        df.agg(
            F.sum(F.length("text")), F.count(F.md5("text"))
        ).collect()
        return time.perf_counter() - t0

    out = {"k": k, "html_mb": round(n_bytes / 1e6, 1), "reps": reps}
    for name, fn in (("regex_codegen", html_to_text), ("dom_mapinpandas", html_to_text_dom)):
        walls = [consume(fn(aug)) for _ in range(reps)]
        best = min(walls)
        out[name] = {
            "sec": round(best, 2),
            "mb_per_sec": round(n_bytes / 1e6 / best, 1),
        }
    out["dom_over_regex"] = round(
        out["dom_mapinpandas"]["sec"] / out["regex_codegen"]["sec"], 2
    )
    print(json.dumps({"metric": "html_stage_throughput", **out}))
    spark.stop()


if __name__ == "__main__":
    main()
