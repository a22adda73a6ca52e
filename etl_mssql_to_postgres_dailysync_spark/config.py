"""Pipeline configuration — the reference's env/.env config surface
(dags/mssql_to_postgresql_orders_daily.py:61-119; csv_to_mssqldb.py:50-107)
as a validated dataclass. Connection fields are optional because this
environment has no live databases; required-key validation mirrors
csv_to_mssqldb.py:92-103.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field


@dataclass
class SyncConfig:
    unique_key_columns: list[str] = field(default_factory=lambda: ["order_id"])
    extract_fetchsize: int = 5000     # MSSQL_EXTRACT_CHUNKSIZE analog
    write_batchsize: int = 5000       # STAGING_LOAD_CHUNKSIZE analog
    upsert_page_size: int = 100       # PG_PAGE_SIZE analog
    source_url: str | None = None     # JDBC url (gated; no DB in container)
    target_url: str | None = None
    retries: int = 2                  # default_args retries
    retry_delay_seconds: int = 120

    @classmethod
    def from_env(cls, env: dict[str, str] | None = None) -> "SyncConfig":
        e = env if env is not None else os.environ
        keys = [
            k.strip().lower()
            for k in e.get("UNIQUE_KEY_COLUMNS", "order_id").split(",")
            if k.strip()
        ]
        cfg = cls(
            unique_key_columns=keys,
            extract_fetchsize=int(e.get("MSSQL_EXTRACT_CHUNKSIZE", "5000")),
            write_batchsize=int(e.get("STAGING_LOAD_CHUNKSIZE", "5000")),
            upsert_page_size=int(e.get("PG_PAGE_SIZE", "100")),
            source_url=e.get("SOURCE_JDBC_URL"),
            target_url=e.get("TARGET_JDBC_URL"),
        )
        cfg.validate()
        return cfg

    def validate(self) -> None:
        if not self.unique_key_columns:
            raise ValueError("UNIQUE_KEY_COLUMNS must name at least one column")
        for n in ("extract_fetchsize", "write_batchsize", "upsert_page_size"):
            if getattr(self, n) <= 0:
                raise ValueError(f"{n} must be positive")
