"""Reference-shaped synthetic fixtures (FIXTURES.md): accounts change-log
with multiple versions per key (some deleted), matching ledgers, and
NDJSON batch files."""

from __future__ import annotations

import json
import os
from datetime import datetime, timedelta

from pyspark.sql import types as T

ACCOUNTS_SCHEMA = T.StructType(
    [
        T.StructField("account_id", T.StringType()),
        T.StructField("balance", T.DoubleType()),
        T.StructField("sequence_number", T.LongType()),
        T.StructField("last_modified_ledger", T.LongType()),
        T.StructField("ledger_entry_change", T.LongType()),
        T.StructField("deleted", T.BooleanType()),
    ]
)

LEDGERS_SCHEMA = T.StructType(
    [
        T.StructField("sequence", T.LongType()),
        T.StructField("ledger_hash", T.StringType()),
        T.StructField("closed_at", T.TimestampType()),
        T.StructField("transaction_count", T.LongType()),
    ]
)

T0 = datetime(2024, 1, 1)


def ledger_rows(n: int = 12) -> list[dict]:
    return [
        {
            "sequence": 100 + i,
            "ledger_hash": f"hash{100 + i}",
            "closed_at": (T0 + timedelta(minutes=5 * i)).isoformat(),
            "transaction_count": i,
        }
        for i in range(n)
    ]


def account_change_rows() -> list[dict]:
    """3 accounts: A has 3 versions, B has 2 (ends deleted), C has 1.
    Includes two changes in the same ledger distinguished by
    ledger_entry_change (the second ORDER BY column)."""
    return [
        {"account_id": "A", "balance": 10.0, "sequence_number": 1, "last_modified_ledger": 100, "ledger_entry_change": 0, "deleted": False},
        {"account_id": "A", "balance": 20.0, "sequence_number": 2, "last_modified_ledger": 103, "ledger_entry_change": 0, "deleted": False},
        {"account_id": "A", "balance": 25.0, "sequence_number": 3, "last_modified_ledger": 103, "ledger_entry_change": 1, "deleted": False},
        {"account_id": "B", "balance": 5.0, "sequence_number": 1, "last_modified_ledger": 101, "ledger_entry_change": 0, "deleted": False},
        {"account_id": "B", "balance": 0.0, "sequence_number": 2, "last_modified_ledger": 105, "ledger_entry_change": 2, "deleted": True},
        {"account_id": "C", "balance": 7.5, "sequence_number": 1, "last_modified_ledger": 102, "ledger_entry_change": 0, "deleted": False},
    ]


def write_ndjson(path: str, rows: list[dict], corrupt_line: bool = False) -> str:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as fh:
        for r in rows:
            fh.write(json.dumps(r) + "\n")
        if corrupt_line:
            fh.write('{"account_id": "broken", unquoted garbage}\n')
    return path


# --- observable pixel-decoder spec for seam worker-propagation tests ---

SEAM_MARKER_DIR = "/tmp/seam-probe-markers"


def marking_decoder_factory():
    """Decoder factory (used via codecs.use_pixel_decoder_spec) that
    leaves a marker file per invocation and declines every payload — an
    OBSERVABLE probe for whether worker processes actually invoke the
    registered seam."""
    import os
    import uuid

    os.makedirs(SEAM_MARKER_DIR, exist_ok=True)

    def probe(payload: bytes):
        with open(os.path.join(SEAM_MARKER_DIR, uuid.uuid4().hex), "w"):
            pass
        return None  # decline: pure-Python path keeps producing results

    return probe
