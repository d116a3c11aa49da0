"""REST catalog client↔server over a real socket, including the end-to-end
engine path and concurrent-commit conflict behavior (the role of the
reference's iceberg-rest-catalog crate + its Trino interop test shape,
datafusion_iceberg/tests/integration_trino.rs)."""

import pytest

from iceberg_rust_custom_spark.catalog.base import CommitFailed, Identifier
from iceberg_rust_custom_spark.catalog.file_catalog import FileCatalog
from iceberg_rust_custom_spark.catalog.rest_catalog import CatalogServer, RestCatalog
from iceberg_rust_custom_spark.engine import Engine


@pytest.fixture()
def rest(tmp_path):
    server = CatalogServer(FileCatalog(str(tmp_path / "wh"))).start()
    yield RestCatalog(server.uri)
    server.stop()


def test_register_load_list_drop(rest):
    ident = Identifier(("ns",), "t1")
    rest.create_namespace(("ns",))
    assert ("ns",) in rest.list_namespaces()
    rest.register(ident, "/tmp/v1.metadata.json")
    assert rest.tabular_exists(ident)
    loc, kind = rest.load(ident)
    assert (loc, kind) == ("/tmp/v1.metadata.json", "table")
    assert ident in rest.list_tabulars(("ns",))
    rest.drop(ident)
    assert not rest.tabular_exists(ident)


def test_swap_cas_semantics(rest):
    ident = Identifier(("ns",), "t2")
    rest.register(ident, "/v1.json")
    rest.swap(ident, "/v1.json", "/v2.json")
    assert rest.load(ident)[0] == "/v2.json"
    with pytest.raises(CommitFailed):
        rest.swap(ident, "/v1.json", "/v3.json")  # stale expected
    assert rest.load(ident)[0] == "/v2.json"


def test_double_register_conflicts(rest):
    ident = Identifier(("ns",), "t3")
    rest.register(ident, "/v1.json")
    with pytest.raises(CommitFailed):
        rest.register(ident, "/v1b.json")


def test_engine_through_rest_catalog(rest, spark, tmp_path):
    """Full table lifecycle with the catalog behind HTTP: create, append
    twice (commit retry path exercises server-side CAS), scan, time travel."""
    eng = Engine(spark, catalog=rest, warehouse=str(tmp_path / "wh"))
    eng.sql("CREATE TABLE ns.r (id BIGINT, v DOUBLE) STORED AS ICEBERG")
    t = eng.load_table("ns.r")
    t.append(spark.createDataFrame([(i, float(i)) for i in range(20)], "id long, v double"))
    t.append(spark.createDataFrame([(i, float(i)) for i in range(20, 30)], "id long, v double"))
    assert eng.load_table("ns.r").scan().count() == 30
    snaps = sorted(t.metadata.snapshots.values(), key=lambda s: s.sequence_number)
    assert len(snaps) == 2
    assert t.scan(snapshot_id=snaps[0].snapshot_id).count() == 20
