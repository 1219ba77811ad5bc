"""stellar_etl_airflow_spark — a PySpark-native analytics engine with the
query and data-processing capabilities of stellar/stellar-etl-airflow.

The reference (snapshot 2026-03-06) is an Airflow orchestration layer that
delegates all data work to stellar-etl (extract), BigQuery (load/DML/SQL),
and dbt (mart builds). This package re-expresses those capabilities as a
single Spark-first engine:

- ``schemas``   — BigQuery-schema-JSON -> StructType loader + table registry
                  (partitioning / clustering metadata).
- ``sources``   — schema-enforced NDJSON / CSV / state-file-fan-out readers
                  with zero-bad-record gates.
- ``sinks``     — partitioned parquet writer (idempotent replaceWhere-style
                  overwrite), Avro exporter, NDJSON extract, copy/clone.
- ``operators`` — batch planner, idempotent del/ins ingest, MERGE upsert and
                  insert-unique, latest-state dedup, as-of join, SCD-2
                  snapshots, quality gates.
- ``functions`` — BigQuery-dialect compatibility helpers (SAFE_DIVIDE,
                  TIMESTAMP_DIFF, JSON_EXTRACT_*, DAYOFWEEK convention).
- ``views``     — ports of the reference's ddls/queries views (current-state
                  dedups, price as-of joins, TVL, liquidity providers).
- ``models``    — tag-closure model runner (the dbt equivalent).
- ``training``  — large-scale training-data pipeline operators: dedup
                  (exact / MinHash-LSH / SimHash / n-gram Jaccard /
                  embedding cosine), similarity search, text analysis,
                  multimodal column plumbing.
- ``streaming`` — Structured Streaming micro-batch ingest path.

Everything is DataFrame/SQL-first: plans stay declarative so Catalyst gets
predicate pushdown, column pruning, AQE join planning and whole-stage
codegen for free. No row-at-a-time Python UDFs in any hot path.
"""

__version__ = "0.1.0"
