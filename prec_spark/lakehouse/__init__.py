from .table import IceLiteTable, CommitConflict
from .zorder import zorder_key, zorder_key_sql
from .queries import (
    lakehouse_delete,
    lakehouse_delete_oracle_sql,
    lakehouse_evolution,
    lakehouse_evolution_oracle_sql,
    lakehouse_hidden,
    lakehouse_hidden_oracle_sql,
    lakehouse_incremental,
    lakehouse_incremental_oracle_sql,
    lakehouse_merge,
    lakehouse_merge_oracle_sql,
    lakehouse_zorder,
    lakehouse_zorder_oracle_sql,
    lakehouse_scan,
    lakehouse_scan_oracle_sql,
    lakehouse_time_travel,
    lakehouse_time_travel_oracle_sql,
)

__all__ = [
    "IceLiteTable",
    "CommitConflict",
    "lakehouse_evolution",
    "lakehouse_evolution_oracle_sql",
    "lakehouse_incremental",
    "lakehouse_incremental_oracle_sql",
    "lakehouse_merge",
    "lakehouse_merge_oracle_sql",
    "lakehouse_zorder",
    "lakehouse_zorder_oracle_sql",
    "zorder_key",
    "zorder_key_sql",
    "lakehouse_scan",
    "lakehouse_scan_oracle_sql",
    "lakehouse_time_travel",
    "lakehouse_time_travel_oracle_sql",
]
