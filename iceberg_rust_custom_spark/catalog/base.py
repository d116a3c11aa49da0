"""Catalog abstraction (reference: iceberg-rust/src/catalog/mod.rs:30-121).

A catalog maps ``Identifier(namespace, name)`` → current metadata location,
and performs the **atomic compare-and-swap** that gives commits ACID
semantics. Tabulars are tables, views, or materialized views — discriminated
by a ``kind`` tag in the registry row, mirroring the reference's ``Tabular``
enum (iceberg-rust/src/catalog/tabular.rs).
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class Identifier:
    namespace: tuple
    name: str

    @classmethod
    def parse(cls, s: str) -> "Identifier":
        parts = s.split(".")
        return cls(tuple(parts[:-1]), parts[-1])

    def __str__(self) -> str:
        return ".".join([*self.namespace, self.name])


class CommitFailed(Exception):
    """The CAS failed: someone else committed first. Retryable."""


class NamespaceNotEmpty(Exception):
    """drop_namespace refused: tabulars or child namespaces remain
    (reference: iceberg-rust/src/catalog/mod.rs drop_namespace contract)."""


class Catalog:
    """Interface: all methods operate on metadata-location strings."""

    def create_namespace(self, namespace: tuple, properties: dict | None = None) -> None:
        raise NotImplementedError

    def list_namespaces(self) -> list[tuple]:
        raise NotImplementedError

    # -- namespace properties / lifecycle (reference catalog trait:
    #    load_namespace / update_namespace / drop_namespace,
    #    iceberg-rust/src/catalog/mod.rs:34-52) --------------------------
    def namespace_exists(self, namespace: tuple) -> bool:
        return namespace in self.list_namespaces()

    def load_namespace(self, namespace: tuple) -> dict:
        """Namespace properties ({} when none set). Raises
        FileNotFoundError for an unknown namespace."""
        raise NotImplementedError

    def update_namespace(
        self, namespace: tuple, updates: dict | None = None, removals: list | None = None
    ) -> dict:
        """Set/remove namespace properties; returns the resulting map.
        Removals are applied before updates (the REST spec's order)."""
        raise NotImplementedError

    def drop_namespace(self, namespace: tuple) -> None:
        """Remove an EMPTY namespace; raises NamespaceNotEmpty when any
        tabular or child namespace remains (never cascades — dropping
        data is the caller's explicit job, table by table)."""
        raise NotImplementedError

    def _ensure_namespace_empty(self, namespace: tuple) -> None:
        if self.list_tabulars(namespace):
            raise NamespaceNotEmpty(f"namespace {'.'.join(namespace)} has tables")
        for ns in self.list_namespaces():
            if len(ns) > len(namespace) and ns[: len(namespace)] == namespace:
                raise NamespaceNotEmpty(
                    f"namespace {'.'.join(namespace)} has child namespace {'.'.join(ns)}"
                )

    def list_tabulars(self, namespace: tuple) -> list[Identifier]:
        raise NotImplementedError

    def tabular_exists(self, identifier: Identifier) -> bool:
        raise NotImplementedError

    def register(self, identifier: Identifier, metadata_location: str, kind: str = "table") -> None:
        """Create a new registry entry; fails if it already exists."""
        raise NotImplementedError

    def load(self, identifier: Identifier) -> tuple[str, str]:
        """Return (metadata_location, kind)."""
        raise NotImplementedError

    def swap(self, identifier: Identifier, expected_location: str, new_location: str) -> None:
        """Atomic CAS of the metadata pointer; raises CommitFailed on
        mismatch (the optimistic-concurrency core)."""
        raise NotImplementedError

    def commit_updates(self, identifier: Identifier, requirements: list, updates: list):
        """Server-side commit (the Iceberg REST protocol shape:
        CommitTableRequest {requirements, updates} applied by the catalog
        service). Returns the committed TableMetadata, or None when this
        catalog only supports client-side pointer-swap commits (the
        default) — Transaction.commit falls back to write-file + swap."""
        return None

    def drop(self, identifier: Identifier) -> None:
        raise NotImplementedError

    def rename(self, src: Identifier, dst: Identifier) -> None:
        """Rename a tabular; the metadata location is unchanged (a rename
        moves the registry entry, not the data). Default implementation is
        register-then-drop — not atomic across the two steps, but
        dst-register fails first if the target exists, so no entry is ever
        lost; catalogs with a native atomic rename (REST) override."""
        location, kind = self.load(src)
        self.register(dst, location, kind=kind)
        self.drop(src)
