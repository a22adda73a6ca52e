"""JDBC target dialects — upsert/DDL SQL generation per engine.

The reference hand-writes two dialects: Postgres ``INSERT … ON CONFLICT``
(dags/mssql_to_postgresql_orders_daily.py:296-343, conditional variant in the
sync pyc) and MSSQL ``MERGE`` from a staging table (csv_to_mssqldb.py:409-443,
with the ``OrderCreatedAt`` first-write-wins exclusion at :421, executed after
a staging TRUNCATE+append inside one transaction :447-466).  This module
factors that per-engine SQL into Dialect objects so ``jdbc_upsert_write`` (and
any foreachBatch streaming sink) is target-agnostic: same engine semantics —
key conflict target, update mask, optional matched-condition guard — rendered
into each engine's native atomic-upsert form.

Pure string builders: unit-testable with no database; the SQLite dialect is
exercised end-to-end in tests/test_jdbc_upsert.py against a real file DB.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Sequence


@dataclass(frozen=True)
class Dialect:
    """Base: ANSI-ish, double-quoted identifiers, qmark params."""

    name: str = "ansi"
    placeholder: str = "?"
    quote_char: tuple[str, str] = ('"', '"')
    supports_truncate: bool = True

    def quote(self, ident: str) -> str:
        lo, hi = self.quote_char
        return f"{lo}{ident}{hi}"

    def _update_cols(self, columns, keys, exclude_update_cols):
        return [c for c in columns if c not in keys and c not in exclude_update_cols]

    def upsert_sql(
        self,
        table: str,
        columns: Sequence[str],
        keys: Sequence[str],
        *,
        exclude_update_cols: Sequence[str] = (),
        matched_condition_sql: str | None = None,
    ) -> str:
        raise NotImplementedError

    def truncate_sql(self, table: str, restart_identity: bool = False) -> str:
        if not self.supports_truncate:
            return f"DELETE FROM {table}"
        sql = f"TRUNCATE TABLE {table}"
        if restart_identity:
            sql += " RESTART IDENTITY"
        return sql


@dataclass(frozen=True)
class PostgresDialect(Dialect):
    """S6/S7 — ``INSERT … ON CONFLICT (keys) DO UPDATE SET c = EXCLUDED.c
    [WHERE guard]`` (dags/…_orders_daily.py:296-308)."""

    name: str = "postgres"
    placeholder: str = "%s"

    def upsert_sql(self, table, columns, keys, *, exclude_update_cols=(),
                   matched_condition_sql=None):
        q = self.quote
        collist = ", ".join(q(c) for c in columns)
        values = ", ".join([self.placeholder] * len(columns))
        sets = ", ".join(
            f"{q(c)} = EXCLUDED.{q(c)}"
            for c in self._update_cols(columns, keys, exclude_update_cols)
        )
        sql = (
            f"INSERT INTO {table} ({collist}) VALUES ({values}) "
            f"ON CONFLICT ({', '.join(q(k) for k in keys)}) DO UPDATE SET {sets}"
        )
        if matched_condition_sql:
            sql += f" WHERE {matched_condition_sql}"
        return sql


@dataclass(frozen=True)
class SQLiteDialect(PostgresDialect):
    """SQLite shares the ON CONFLICT form but uses qmark params and has no
    TRUNCATE. The container's only real DB — used for e2e upsert tests."""

    name: str = "sqlite"
    placeholder: str = "?"
    supports_truncate: bool = False


@dataclass(frozen=True)
class MSSQLDialect(Dialect):
    """S8 — ``MERGE … USING (VALUES …)`` with bracketed identifiers
    (csv_to_mssqldb.py:409-443). The reference merges from a bulk-loaded
    staging table; merging from a VALUES row-constructor keeps the same
    statement shape per batch without the staging hop. The
    ``exclude_update_cols`` mask reproduces the deliberate
    ``OrderCreatedAt`` first-write-wins exclusion (csv_to_mssqldb.py:421)."""

    name: str = "mssql"
    placeholder: str = "?"
    quote_char: tuple[str, str] = ("[", "]")

    def upsert_sql(self, table, columns, keys, *, exclude_update_cols=(),
                   matched_condition_sql=None):
        q = self.quote
        collist = ", ".join(q(c) for c in columns)
        values = ", ".join([self.placeholder] * len(columns))
        on = " AND ".join(f"t.{q(k)} = s.{q(k)}" for k in keys)
        sets = ", ".join(
            f"t.{q(c)} = s.{q(c)}"
            for c in self._update_cols(columns, keys, exclude_update_cols)
        )
        matched = "WHEN MATCHED"
        if matched_condition_sql:
            matched += f" AND {matched_condition_sql}"
        return (
            f"MERGE {table} AS t "
            f"USING (VALUES ({values})) AS s ({collist}) ON {on} "
            f"{matched} THEN UPDATE SET {sets} "
            f"WHEN NOT MATCHED BY TARGET THEN INSERT ({collist}) "
            f"VALUES ({', '.join('s.' + q(c) for c in columns)});"
        )

    def staging_merge_sql(self, target: str, staging: str, columns, keys,
                          *, exclude_update_cols=()) -> str:
        """The reference's exact two-table form: staging table as MERGE
        source (csv_to_mssqldb.py:409-443) — for bulk loads where the batch
        was appended to staging first (S5)."""
        q = self.quote
        on = " AND ".join(f"t.{q(k)} = s.{q(k)}" for k in keys)
        sets = ", ".join(
            f"t.{q(c)} = s.{q(c)}"
            for c in self._update_cols(columns, keys, exclude_update_cols)
        )
        collist = ", ".join(q(c) for c in columns)
        return (
            f"MERGE {target} AS t USING {staging} AS s ON {on} "
            f"WHEN MATCHED THEN UPDATE SET {sets} "
            f"WHEN NOT MATCHED BY TARGET THEN INSERT ({collist}) "
            f"VALUES ({', '.join('s.' + q(c) for c in columns)});"
        )


@dataclass(frozen=True)
class MySQLDialect(Dialect):
    """``INSERT … ON DUPLICATE KEY UPDATE`` with backtick quoting. The
    conflict target is implicit (the table's unique key), so ``keys`` only
    drives the update mask. No per-statement matched-condition guard exists;
    emulate with ``IF(guard, new, old)`` per column."""

    name: str = "mysql"
    placeholder: str = "%s"
    quote_char: tuple[str, str] = ("`", "`")

    def upsert_sql(self, table, columns, keys, *, exclude_update_cols=(),
                   matched_condition_sql=None):
        q = self.quote
        collist = ", ".join(q(c) for c in columns)
        values = ", ".join([self.placeholder] * len(columns))
        update_cols = self._update_cols(columns, keys, exclude_update_cols)
        if matched_condition_sql:
            sets = ", ".join(
                f"{q(c)} = IF({matched_condition_sql}, VALUES({q(c)}), {q(c)})"
                for c in update_cols
            )
        else:
            sets = ", ".join(f"{q(c)} = VALUES({q(c)})" for c in update_cols)
        return (
            f"INSERT INTO {table} ({collist}) VALUES ({values}) "
            f"ON DUPLICATE KEY UPDATE {sets}"
        )


DIALECTS: dict[str, Dialect] = {
    d.name: d
    for d in (PostgresDialect(), SQLiteDialect(), MSSQLDialect(), MySQLDialect())
}


def get_dialect(name: str) -> Dialect:
    try:
        return DIALECTS[name.lower()]
    except KeyError:
        raise ValueError(f"unknown dialect {name!r}; have {sorted(DIALECTS)}") from None
