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


class Catalog:
    """Interface: all methods operate on metadata-location strings."""

    def create_namespace(self, namespace: tuple) -> None:
        raise NotImplementedError

    def list_namespaces(self) -> list[tuple]:
        raise NotImplementedError

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
