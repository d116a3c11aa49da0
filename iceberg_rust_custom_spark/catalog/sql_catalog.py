"""SQL (sqlite) catalog with UPDATE-WHERE CAS.

Mirrors the reference's SQL catalog commit (iceberg-sql-catalog/src/
lib.rs:424-472): the metadata pointer lives in a row; the swap is
``UPDATE ... SET metadata_location = new WHERE metadata_location = expected``
and a zero rowcount means a concurrent committer won.
"""

from __future__ import annotations

import sqlite3

from iceberg_rust_custom_spark.catalog.base import Catalog, CommitFailed, Identifier


class SqlCatalog(Catalog):
    def __init__(self, db_path: str):
        self.db_path = db_path
        with self._conn() as c:
            c.execute(
                """CREATE TABLE IF NOT EXISTS iceberg_tables (
                       namespace TEXT NOT NULL,
                       name TEXT NOT NULL,
                       kind TEXT NOT NULL DEFAULT 'table',
                       metadata_location TEXT NOT NULL,
                       PRIMARY KEY (namespace, name)
                   )"""
            )
            c.execute("CREATE TABLE IF NOT EXISTS namespaces (namespace TEXT PRIMARY KEY)")

    def _conn(self):
        conn = sqlite3.connect(self.db_path, timeout=30)
        conn.isolation_level = None  # autocommit; explicit transactions below
        return conn

    def create_namespace(self, namespace: tuple) -> None:
        with self._conn() as c:
            c.execute("INSERT OR IGNORE INTO namespaces VALUES (?)", (".".join(namespace),))

    def list_namespaces(self) -> list[tuple]:
        with self._conn() as c:
            rows = c.execute("SELECT namespace FROM namespaces ORDER BY 1").fetchall()
        return [tuple(r[0].split(".")) for r in rows]

    def list_tabulars(self, namespace: tuple) -> list[Identifier]:
        with self._conn() as c:
            rows = c.execute(
                "SELECT name FROM iceberg_tables WHERE namespace = ? ORDER BY 1", (".".join(namespace),)
            ).fetchall()
        return [Identifier(namespace, r[0]) for r in rows]

    def tabular_exists(self, identifier: Identifier) -> bool:
        with self._conn() as c:
            row = c.execute(
                "SELECT 1 FROM iceberg_tables WHERE namespace = ? AND name = ?",
                (".".join(identifier.namespace), identifier.name),
            ).fetchone()
        return row is not None

    def register(self, identifier: Identifier, metadata_location: str, kind: str = "table") -> None:
        try:
            with self._conn() as c:
                c.execute(
                    "INSERT INTO iceberg_tables VALUES (?, ?, ?, ?)",
                    (".".join(identifier.namespace), identifier.name, kind, metadata_location),
                )
        except sqlite3.IntegrityError:
            raise CommitFailed(f"{identifier} already exists") from None

    def load(self, identifier: Identifier) -> tuple[str, str]:
        with self._conn() as c:
            row = c.execute(
                "SELECT metadata_location, kind FROM iceberg_tables WHERE namespace = ? AND name = ?",
                (".".join(identifier.namespace), identifier.name),
            ).fetchone()
        if row is None:
            raise FileNotFoundError(f"no such tabular: {identifier}")
        return row[0], row[1]

    def swap(self, identifier: Identifier, expected_location: str, new_location: str) -> None:
        with self._conn() as c:
            cur = c.execute(
                "UPDATE iceberg_tables SET metadata_location = ? "
                "WHERE namespace = ? AND name = ? AND metadata_location = ?",
                (new_location, ".".join(identifier.namespace), identifier.name, expected_location),
            )
            if cur.rowcount != 1:
                raise CommitFailed(f"{identifier}: concurrent commit (CAS matched 0 rows)")

    def drop(self, identifier: Identifier) -> None:
        with self._conn() as c:
            c.execute(
                "DELETE FROM iceberg_tables WHERE namespace = ? AND name = ?",
                (".".join(identifier.namespace), identifier.name),
            )
