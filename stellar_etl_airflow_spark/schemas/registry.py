"""Table registry: physical-layout + ingest-routing metadata per table.

Mirrors the reference's per-table configuration:

- partition field + granularity: airflow_variables_prod.json:185-280
  (MONTH on batch_run_date for most history/state tables, MONTH/DAY on
  closed_at for soroban-era tables, DAY for token_transfers_raw).
- cluster fields: airflow_variables_prod.json:7-119.
- ingest mode: del/ins composite for history + state loads
  (build_del_ins_from_gcs_to_bq_task.py:55-203); MERGE upsert vs
  insert-unique routing and per-entity key map from
  build_apply_gcs_changes_to_bq_task.py:78-113,231-248.
- history_assets detours through a staging table + window-dedup insert
  (build_del_ins_from_gcs_to_bq_task.py:71-72, dags/queries/history_assets.sql).
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class TableSpec:
    name: str
    partition_field: str = "batch_run_date"
    partition_granularity: str = "month"  # month | day
    cluster_fields: tuple[str, ...] = ()
    ingest_mode: str = "del_ins"  # del_ins | merge | insert_unique
    merge_keys: tuple[str, ...] = ()
    staging: bool = False
    kind: str = "history"  # history | state | external


def _t(name, **kw) -> tuple[str, "TableSpec"]:
    return name, TableSpec(name=name, **kw)


TABLES: dict[str, TableSpec] = dict(
    [
        # 8 history streams (dags/history_tables_dag.py:205-214)
        _t("history_ledgers", cluster_fields=("sequence",)),
        _t("history_transactions", cluster_fields=("account", "ledger_sequence", "successful")),
        _t("history_operations", cluster_fields=("transaction_id", "source_account", "type")),
        _t("history_trades", cluster_fields=("selling_asset_id", "buying_asset_id", "trade_type")),
        _t("history_effects", cluster_fields=("address", "operation_id", "type")),
        _t(
            "history_assets",
            cluster_fields=("asset_type", "asset_code", "asset_issuer"),
            staging=True,
            ingest_mode="insert_unique",
            merge_keys=("asset_type", "asset_code", "asset_issuer"),
        ),
        _t("history_contract_events", partition_field="closed_at", cluster_fields=("contract_id", "type")),
        _t(
            "token_transfers_raw",
            partition_field="closed_at",
            partition_granularity="day",
            cluster_fields=("transaction_id", "contract_id", "asset"),
        ),
        # 11 state streams (dags/state_table_dag.py:74-87); MERGE keys from
        # build_apply_gcs_changes_to_bq_task.py:78-113
        _t("accounts", kind="state", ingest_mode="merge", merge_keys=("account_id",)),
        _t("account_signers", kind="state", ingest_mode="merge", merge_keys=("account_id", "signer")),
        _t("offers", kind="state", ingest_mode="merge", merge_keys=("offer_id",)),
        _t("claimable_balances", kind="state", ingest_mode="merge", merge_keys=("balance_id",)),
        _t("liquidity_pools", kind="state", ingest_mode="merge", merge_keys=("liquidity_pool_id",)),
        _t(
            "trust_lines",
            kind="state",
            ingest_mode="merge",
            merge_keys=("account_id", "asset_type", "asset_issuer", "asset_code", "liquidity_pool_id"),
        ),
        _t("contract_data", kind="state", partition_field="closed_at", ingest_mode="merge", merge_keys=("contract_id", "ledger_key_hash")),
        _t("contract_code", kind="state", partition_field="closed_at", ingest_mode="merge", merge_keys=("contract_code_hash",)),
        _t("config_settings", kind="state", partition_field="closed_at", ingest_mode="merge", merge_keys=("config_setting_id",)),
        _t("ttl", kind="state", partition_field="closed_at", ingest_mode="merge", merge_keys=("key_hash",)),
        _t("restored_key", kind="state", partition_field="closed_at", ingest_mode="del_ins"),
    ]
)

# State-table export fan-out: one bounded-core run writes per-type files
# distinguished by filename suffix (dags/state_table_dag.py:139-151).
STATE_FILE_SUFFIXES: dict[str, str] = {
    "accounts": "accounts.txt",
    "account_signers": "signers.txt",
    "offers": "offers.txt",
    "claimable_balances": "claimable_balances.txt",
    "liquidity_pools": "pools.txt",
    "trust_lines": "trustlines.txt",
    "contract_data": "contract_data.txt",
    "contract_code": "contract_code.txt",
    "config_settings": "config_settings.txt",
    "ttl": "ttl.txt",
    "restored_key": "restored_key.txt",
}
