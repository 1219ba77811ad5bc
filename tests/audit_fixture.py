"""Synthetic BigQuery audit-log fixture for the audit_log.sql port.

Shapes follow the two cloudaudit sink tables the reference's
dags/queries/audit_log.sql reads (`cloudaudit_googleapis_com_data_access`
and `..._activity`): a `protopayload_auditlog` struct wrapping the
AuditLog proto fields plus the BigQueryAuditMetadata JSON payload, and a
`resource.labels.project_id`. metadataJson is built minified so both
engines' JSON extractors return byte-identical raw text.

Timestamps are generated at import time relative to ``now`` (the query
filters on ``current_timestamp - interval 30 day``) but land on whole
minutes, away from day boundaries, so TIMESTAMP_DIFF full-unit vs
boundary-count semantics agree and the 30-day window verdict is stable
for the duration of a test run.
"""

from __future__ import annotations

import json
from datetime import datetime, timedelta

from pyspark.sql import types as T

AUDIT_SCHEMA = T.StructType(
    [
        T.StructField("timestamp", T.TimestampType()),
        T.StructField(
            "resource",
            T.StructType([T.StructField("labels", T.StructType([T.StructField("project_id", T.StringType())]))]),
        ),
        T.StructField(
            "protopayload_auditlog",
            T.StructType(
                [
                    T.StructField(
                        "authenticationInfo",
                        T.StructType([T.StructField("principalEmail", T.StringType())]),
                    ),
                    T.StructField(
                        "requestMetadata",
                        T.StructType(
                            [
                                T.StructField("callerIp", T.StringType()),
                                T.StructField("callerSuppliedUserAgent", T.StringType()),
                            ]
                        ),
                    ),
                    T.StructField("serviceName", T.StringType()),
                    T.StructField("methodName", T.StringType()),
                    T.StructField("resourceName", T.StringType()),
                    T.StructField("metadataJson", T.StringType()),
                ]
            ),
        ),
    ]
)

_TYPE_URL = "type.googleapis.com/google.cloud.audit.BigQueryAuditMetadata"
N_JOBS = 12


def _job_name(i: int) -> str:
    return f"projects/proj{i % 3}/jobs/job_{i:03d}"


def _meta(event_key: str, payload: dict) -> str:
    return json.dumps({"@type": _TYPE_URL, event_key: payload}, separators=(",", ":"))


def _row(ts: datetime, service: str, method: str, resource_name, meta: str, project="proj0") -> dict:
    return {
        "timestamp": ts,
        "resource": {"labels": {"project_id": project}},
        "protopayload_auditlog": {
            "authenticationInfo": {"principalEmail": f"svc-{project}@example.iam"},
            "requestMetadata": {"callerIp": "10.0.0.9", "callerSuppliedUserAgent": "etl-agent/1.0"},
            "serviceName": service,
            "methodName": method,
            "resourceName": resource_name,
            "metadataJson": meta,
        },
    }


def _fmt(dt: datetime) -> str:
    return dt.strftime("%Y-%m-%d %H:%M:%S")


def build_rows(now: datetime | None = None) -> tuple[list[dict], list[dict]]:
    """Return (data_access_rows, activity_rows)."""
    now = now or datetime.utcnow()
    base = now.replace(minute=0, second=0, microsecond=0) - timedelta(hours=13)
    data_access: list[dict] = []
    activity: list[dict] = []

    cfg_types = ["QUERY", "LOAD", "COPY", "EXTRACT", "QUERY", "IMPORT"]  # IMPORT filtered by final IN
    runtimes = [0, 59, 61, 600, 3599, 125]

    for i in range(N_JOBS):
        job_name = _job_name(i)
        ts = base - timedelta(days=i % 20, minutes=7 * i)
        start = ts + timedelta(seconds=30)
        runtime = runtimes[i % len(runtimes)]
        end = start + timedelta(seconds=runtime)
        cfg_type = cfg_types[i % len(cfg_types)]

        job: dict = {"jobName": job_name}
        job["jobConfig"] = {"type": cfg_type, "labels": {"team": f"t{i % 2}", "env": "prod"}}
        if cfg_type == "QUERY":
            job["jobConfig"]["queryConfig"] = {
                "query": ("SELECT 1 FROM cloudaudit_googleapis_com_data_access_x" if i % 4 == 0 else f"SELECT {i} FROM src"),
                "queryTruncated": False,
                "destinationTable": f"projects/proj{i % 3}/datasets/ds{i % 2}/tables/out_{i}",
                "createDisposition": "CREATE_IF_NEEDED",
                "writeDisposition": "WRITE_TRUNCATE",
                "defaultDataset": f"projects/proj{i % 3}/datasets/ds{i % 2}",
                "priority": "QUERY_INTERACTIVE",
                "statementType": "SELECT",
            }
        elif cfg_type == "LOAD":
            job["jobConfig"]["loadConfig"] = {
                "sourceUris": [f"gs://bucket/{i}/a.ndjson", f"gs://bucket/{i}/b.ndjson"],
                "sourceUrisTruncated": False,
                "schemaJson": '{"fields":[]}',
                "destinationTable": f"projects/proj{i % 3}/datasets/ds0/tables/load_{i}",
                "createDisposition": "CREATE_NEVER",
                "writeDisposition": "WRITE_APPEND",
            }
        elif cfg_type == "EXTRACT":
            job["jobConfig"]["extractConfig"] = {
                "destinationUris": [f"gs://bucket/out/{i}/*.avro"],
                "destinationUrisTruncated": False,
                "sourceTable": f"projects/proj{i % 3}/datasets/ds1/tables/src_{i}",
            }
        elif cfg_type == "COPY":
            job["jobConfig"]["tableCopyConfig"] = {
                "sourceTables": [f"projects/proj{i % 3}/datasets/ds0/tables/a_{i}"],
                "sourceTablesTruncated": False,
                "destinationTable": f"projects/proj{i % 3}/datasets/ds0/tables/b_{i}",
            }

        status: dict = {"jobState": "DONE"}
        if i % 5 == 3:
            status["errorResult"] = {"code": 7, "message": "quota timeout exceeded" if i % 2 else "backend error"}
        job["jobStatus"] = status

        stats: dict = {
            "createTime": _fmt(start - timedelta(seconds=5)),
            "startTime": _fmt(start),
            "endTime": _fmt(end),
            "totalSlotMs": 1000 + 137 * i,
        }
        if i % 3 == 1:
            stats["parentJobName"] = _job_name((i + 6) % N_JOBS)
        if i % 4 == 1:
            stats["reservationUsage"] = [{"name": f"res/{i}", "slotMs": 40 + i}]
        elif i % 4 == 2:
            stats["reservationUsage"] = [{"name": "r1", "slotMs": 5}, {"name": "r2", "slotMs": 6}]
        if cfg_type == "QUERY":
            stats["queryStats"] = {
                "totalProcessedBytes": str(1_000_000 + i),
                "totalBilledBytes": str((1 << 30) * (i % 3 + 1)),
                "billingTier": "1",
                "referencedTables": [f"projects/p/datasets/d/tables/t{k}" for k in range(i % 3 + 1)],
                "referencedViews": [f"projects/p/datasets/d/views/v{i}"] if i % 2 == 0 else [],
                "outputRowCount": str(10 * i),
                "cacheHit": i % 4 == 0,
            }
        elif cfg_type == "LOAD":
            stats["loadStats"] = {"totalOutputBytes": str(500_000 + i)}
        job["jobStats"] = stats

        payload = {"job": job, "before": "PENDING", "after": "DONE"}
        service = "other.googleapis.com" if i == 9 else "bigquery.googleapis.com"
        data_access.append(_row(ts, service, "google.cloud.bigquery.v2.JobService.InsertJob", None, _meta("jobChange", payload), f"proj{i % 3}"))

        # tableDataRead events: several per job, distinct resourceNames
        if i % 3 == 0:
            for k in range(3):
                read_meta = {
                    "jobName": job_name,
                    "fields": [f"col_{k}", f"col_{k + 1}"],
                    "fieldsTruncated": False,
                    "categories": [f"cat{k}"],
                    "categoriesTruncated": k == 1,
                    "reason": "JOB",
                    "sessionName": f"sessions/s{i}-{k}" if k == 0 else None,
                }
                read_meta = {k2: v for k2, v in read_meta.items() if v is not None}
                data_access.append(
                    _row(
                        ts + timedelta(seconds=k),
                        "bigquery.googleapis.com",
                        "google.cloud.bigquery.v2.JobService.InsertJob",
                        f"projects/p/datasets/d/tables/t{2 - k}",
                        _meta("tableDataRead", read_meta),
                    )
                )

        if i % 4 == 0:
            data_access.append(
                _row(
                    ts + timedelta(seconds=9),
                    "bigquery.googleapis.com",
                    "google.cloud.bigquery.v2.JobService.InsertJob",
                    f"projects/p/datasets/d/tables/chg_{i}",
                    _meta(
                        "tableDataChange",
                        {"jobName": job_name, "deletedRowsCount": str(3 * i), "insertedRowsCount": str(7 * i), "truncated": False, "reason": "QUERY"},
                    ),
                )
            )

        table = {
            "tableName": f"projects/proj{i % 3}/datasets/ds0/tables/out_{i}",
            "tableInfo": {"friendlyName": f"Out {i}", "description": "etl output", "labels": {"owner": "data"}},
            "schemaJson": '{"fields":[{"name":"id","type":"INTEGER"}]}',
            "schemaJsonTruncated": False,
            "expireTime": _fmt(end + timedelta(days=30)),
            "createTime": _fmt(start),
            "updateTime": _fmt(end),
            "truncateTime": _fmt(end) if i % 2 == 0 else None,
            "encryption": {"kmsKeyName": f"kms/{i}"} if i % 3 == 2 else None,
        }
        table = {k2: v for k2, v in table.items() if v is not None}
        if i % 3 == 1:
            activity.append(
                _row(ts, "bigquery.googleapis.com", "google.cloud.bigquery.v2.TableService.InsertTable", None,
                     _meta("tableCreation", {"jobName": job_name, "table": table, "reason": "JOB"}))
            )
        if i % 3 == 2:
            activity.append(
                _row(ts, "bigquery.googleapis.com", "google.cloud.bigquery.v2.TableService.PatchTable", None,
                     _meta("tableChange", {"jobName": job_name, "table": table, "reason": "TABLE_REPLACE", "truncated": False}))
            )
        if i % 5 == 0:
            activity.append(
                _row(ts, "bigquery.googleapis.com", "google.cloud.bigquery.v2.TableService.DeleteTable", None,
                     _meta("tableDeletion", {"jobName": job_name, "reason": "TABLE_EXPIRED"}))
            )

    # one jobChange far outside the 30-day window: must be filtered
    stale = dict(data_access[0])
    stale["timestamp"] = base - timedelta(days=45)
    data_access.append(stale)
    return data_access, activity
