"""HTTP/REST catalog client + reference server.

Plays the role of the reference's ``iceberg-rest-catalog`` crate (~3.2k LoC,
a generated OpenAPI client for the Iceberg REST spec): the catalog lives
behind an HTTP service shared by many engines, and the commit CAS happens
server-side. Protocol here is a minimal JSON mapping of our Catalog
interface (register/load/swap/drop/list); the server half
(``CatalogServer``) is an in-process reference implementation backed by any
local Catalog — tests run client↔server over a real socket.

Endpoints (all JSON):
  GET    /namespaces                         → {"namespaces": [[...], ...]}
  POST   /namespaces                         {"namespace": [...], "properties": {...}}
  GET    /namespaces/{ns}/properties         → {"properties": {...}}  (404 unknown ns)
  POST   /namespaces/{ns}/properties         {"updates": {...}, "removals": [...]} → {"properties"}
  DELETE /namespaces/{ns}                    (409 when tabulars/children remain)
  GET    /namespaces/{ns}/tabulars           → {"identifiers": [...]}
  GET    /tabulars/{ns}/{name}               → {"metadata-location", "kind"}
  POST   /tabulars/{ns}/{name}               {"metadata-location", "kind"}  (register; 409 if exists)
  POST   /tabulars/{ns}/{name}/swap          {"expected-location", "new-location"}  (CAS; 409 on conflict)
  DELETE /tabulars/{ns}/{name}

stdlib only (urllib/http.server) — no extra dependencies.
"""

from __future__ import annotations

import json
import threading
import urllib.error
import urllib.request
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from iceberg_rust_custom_spark.catalog.base import (
    Catalog,
    CommitFailed,
    Identifier,
    NamespaceNotEmpty,
)


class RestCatalog(Catalog):
    """Client: every operation is one HTTP round trip; the server owns
    atomicity, so any number of engines can commit against it safely."""

    def __init__(self, uri: str, timeout: float = 10.0):
        self.uri = uri.rstrip("/")
        self.timeout = timeout
        self.warehouse = None  # locations are absolute, server-assigned or client-chosen

    # ------------------------------------------------------------- transport
    def _call(self, method: str, path: str, body: dict | None = None) -> dict:
        req = urllib.request.Request(
            f"{self.uri}{path}",
            method=method,
            data=json.dumps(body).encode() if body is not None else None,
            headers={"Content-Type": "application/json"},
        )
        try:
            with urllib.request.urlopen(req, timeout=self.timeout) as resp:
                payload = resp.read()
                return json.loads(payload) if payload else {}
        except urllib.error.HTTPError as e:
            detail = e.read().decode(errors="replace")
            if e.code == 409:
                raise CommitFailed(detail)
            if e.code == 404:
                raise FileNotFoundError(detail)
            raise RuntimeError(f"catalog server error {e.code}: {detail}")

    # -------------------------------------------------------------- catalog
    def create_namespace(self, namespace: tuple, properties: dict | None = None) -> None:
        self._call(
            "POST", "/namespaces", {"namespace": list(namespace), "properties": properties or {}}
        )

    def list_namespaces(self) -> list[tuple]:
        return [tuple(ns) for ns in self._call("GET", "/namespaces")["namespaces"]]

    def load_namespace(self, namespace: tuple) -> dict:
        ns = ".".join(namespace)
        return self._call("GET", f"/namespaces/{ns}/properties")["properties"]

    def update_namespace(
        self, namespace: tuple, updates: dict | None = None, removals: list | None = None
    ) -> dict:
        ns = ".".join(namespace)
        out = self._call(
            "POST",
            f"/namespaces/{ns}/properties",
            {"updates": updates or {}, "removals": list(removals or [])},
        )
        return out["properties"]

    def namespace_exists(self, namespace: tuple) -> bool:
        try:
            self.load_namespace(namespace)
            return True
        except FileNotFoundError:
            return False

    def drop_namespace(self, namespace: tuple) -> None:
        ns = ".".join(namespace)
        try:
            self._call("DELETE", f"/namespaces/{ns}")
        except CommitFailed as e:  # the server's 409 means "not empty" here
            raise NamespaceNotEmpty(str(e)) from None

    def list_tabulars(self, namespace: tuple) -> list[Identifier]:
        ns = ".".join(namespace)
        out = self._call("GET", f"/namespaces/{ns}/tabulars")
        return [Identifier.parse(s) for s in out["identifiers"]]

    def tabular_exists(self, identifier: Identifier) -> bool:
        try:
            self.load(identifier)
            return True
        except FileNotFoundError:
            return False

    def register(self, identifier: Identifier, metadata_location: str, kind: str = "table") -> None:
        ns = ".".join(identifier.namespace)
        self._call(
            "POST",
            f"/tabulars/{ns}/{identifier.name}",
            {"metadata-location": metadata_location, "kind": kind},
        )

    def load(self, identifier: Identifier) -> tuple[str, str]:
        ns = ".".join(identifier.namespace)
        out = self._call("GET", f"/tabulars/{ns}/{identifier.name}")
        return out["metadata-location"], out["kind"]

    def swap(self, identifier: Identifier, expected_location: str, new_location: str) -> None:
        ns = ".".join(identifier.namespace)
        self._call(
            "POST",
            f"/tabulars/{ns}/{identifier.name}/swap",
            {"expected-location": expected_location, "new-location": new_location},
        )

    def drop(self, identifier: Identifier) -> None:
        ns = ".".join(identifier.namespace)
        self._call("DELETE", f"/tabulars/{ns}/{identifier.name}")


class CatalogServer:
    """Reference server: exposes any local Catalog over the protocol above.
    The backing catalog's swap provides the CAS; a process-wide lock makes
    register/swap serializable even for backends without their own locking."""

    def __init__(self, backing: Catalog, host: str = "127.0.0.1", port: int = 0):
        self.backing = backing
        self._lock = threading.Lock()
        server = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *args):  # quiet
                pass

            def _send(self, code: int, payload: dict | None = None):
                body = json.dumps(payload or {}).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def _body(self) -> dict:
                n = int(self.headers.get("Content-Length") or 0)
                return json.loads(self.rfile.read(n)) if n else {}

            def _route(self):
                parts = [p for p in self.path.split("/") if p]
                try:
                    return server._handle(self.command, parts, self._body())
                except FileNotFoundError as e:
                    return 404, {"error": str(e)}
                except CommitFailed as e:
                    return 409, {"error": str(e)}
                except FileExistsError as e:
                    return 409, {"error": str(e)}

            def do_GET(self):
                self._send(*self._route())

            do_POST = do_DELETE = do_GET

        self._httpd = ThreadingHTTPServer((host, port), Handler)
        self._thread = threading.Thread(target=self._httpd.serve_forever, daemon=True)

    @property
    def uri(self) -> str:
        host, port = self._httpd.server_address[:2]
        return f"http://{host}:{port}"

    def start(self) -> "CatalogServer":
        self._thread.start()
        return self

    def stop(self) -> None:
        self._httpd.shutdown()

    # ------------------------------------------------------------- dispatch
    def _handle(self, method: str, parts: list[str], body: dict):
        b = self.backing
        if parts == ["namespaces"]:
            if method == "GET":
                return 200, {"namespaces": [list(ns) for ns in b.list_namespaces()]}
            if method == "POST":
                with self._lock:
                    b.create_namespace(tuple(body["namespace"]), body.get("properties") or None)
                return 200, {}
        if len(parts) == 2 and parts[0] == "namespaces" and method == "DELETE":
            ns = tuple(parts[1].split("."))
            with self._lock:
                try:
                    b.drop_namespace(ns)
                except NamespaceNotEmpty as e:
                    raise CommitFailed(str(e)) from None  # → 409
            return 200, {}
        if len(parts) == 3 and parts[0] == "namespaces" and parts[2] == "properties":
            ns = tuple(parts[1].split("."))
            if method == "GET":
                return 200, {"properties": b.load_namespace(ns)}
            if method == "POST":
                with self._lock:
                    props = b.update_namespace(
                        ns, updates=body.get("updates"), removals=body.get("removals")
                    )
                return 200, {"properties": props}
        if len(parts) == 3 and parts[0] == "namespaces" and parts[2] == "tabulars":
            ns = tuple(parts[1].split("."))
            return 200, {"identifiers": [str(i) for i in b.list_tabulars(ns)]}
        if len(parts) >= 3 and parts[0] == "tabulars":
            ident = Identifier(tuple(parts[1].split(".")), parts[2])
            if len(parts) == 3:
                if method == "GET":
                    loc, kind = b.load(ident)
                    return 200, {"metadata-location": loc, "kind": kind}
                if method == "POST":
                    with self._lock:
                        if b.tabular_exists(ident):
                            raise FileExistsError(f"{ident} already exists")
                        b.register(ident, body["metadata-location"], body.get("kind", "table"))
                    return 200, {}
                if method == "DELETE":
                    with self._lock:
                        b.drop(ident)
                    return 200, {}
            if len(parts) == 4 and parts[3] == "swap" and method == "POST":
                with self._lock:
                    b.swap(ident, body["expected-location"], body["new-location"])
                return 200, {}
        raise FileNotFoundError(f"no route: {method} /{'/'.join(parts)}")
