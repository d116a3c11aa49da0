"""AWS integration tests against moto's in-process S3 and Glue backends —
the real boto3/botocore stack end to end (request serialization, error
shapes, pagination), no network.

Covers what the Stubber tests can't: actual multi-call protocols — the
two-writer conditional-PUT race, the full ObjectStoreCatalog pointer
protocol over S3, metadata-plane FileIO on s3://, and GlueCatalog's
register/load/list/swap/drop against a live Glue API double."""

import json

import pytest

boto3 = pytest.importorskip("boto3")
moto = pytest.importorskip("moto")

from iceberg_rust_custom_spark.catalog.base import CommitFailed, Identifier  # noqa: E402
from iceberg_rust_custom_spark.catalog.object_store import (  # noqa: E402
    AlreadyExists,
    S3ObjectStore,
)


@pytest.fixture()
def s3():
    with moto.mock_aws():
        client = boto3.client("s3", region_name="us-east-1")
        client.create_bucket(Bucket="warehouse")
        yield client


@pytest.fixture()
def glue():
    with moto.mock_aws():
        yield boto3.client("glue", region_name="us-east-1")


def test_s3_store_roundtrip_and_race(s3):
    store = S3ObjectStore(s3, "warehouse", "meta")
    store.put_if_absent("ptr/v1.json", b'{"v": 1}')
    assert store.get("ptr/v1.json") == b'{"v": 1}'
    assert store.list("ptr") == ["ptr/v1.json"]
    # second writer loses the conditional PUT
    try:
        store.put_if_absent("ptr/v1.json", b'{"v": "loser"}')
        conditional_supported = False
    except AlreadyExists:
        conditional_supported = True
    if conditional_supported:  # moto >= 5.0.10 implements If-None-Match
        assert store.get("ptr/v1.json") == b'{"v": 1}'  # winner's bytes intact
    store.delete_prefix("ptr")
    assert store.list("ptr") == []


def test_object_store_catalog_protocol_over_s3(s3):
    from iceberg_rust_custom_spark.catalog.object_store import ObjectStoreCatalog

    cat = ObjectStoreCatalog(S3ObjectStore(s3, "warehouse", "catalog"))
    ident = Identifier.parse("ns.t")
    cat.register(ident, "s3://warehouse/meta/v0.json")
    assert cat.load(ident) == ("s3://warehouse/meta/v0.json", "table")
    cat.swap(ident, "s3://warehouse/meta/v0.json", "s3://warehouse/meta/v1.json")
    assert cat.load(ident)[0] == "s3://warehouse/meta/v1.json"
    if _conditional_put_supported(s3):
        with pytest.raises(CommitFailed):
            cat.swap(ident, "s3://warehouse/meta/v0.json", "s3://warehouse/meta/v2.json")
    assert cat.tabular_exists(ident)
    cat.drop(ident)
    assert not cat.tabular_exists(ident)


def _conditional_put_supported(client) -> bool:
    client.put_object(Bucket="warehouse", Key="__probe", Body=b"a")
    try:
        client.put_object(Bucket="warehouse", Key="__probe", Body=b"b", IfNoneMatch="*")
        return False
    except Exception:  # noqa: BLE001 - 412 from moto when supported
        return True


def test_metadata_fileio_on_s3(s3):
    """The engine's metadata plane on s3://: text and parquet round-trips
    through the registered scheme, exactly how metadata.json and manifest
    parquets travel."""
    import pyarrow as pa

    from iceberg_rust_custom_spark.io.fileio import FileIO, register_s3

    register_s3(client=s3)
    try:
        FileIO.write_text("s3://warehouse/meta/v1.metadata.json", json.dumps({"fv": 2}))
        assert json.loads(FileIO.read_text("s3://warehouse/meta/v1.metadata.json")) == {"fv": 2}
        assert FileIO.exists("s3://warehouse/meta/v1.metadata.json")
        assert not FileIO.exists("s3://warehouse/meta/nope.json")
        tbl = pa.table({"a": [1, 2, 3]})
        FileIO.pq_write_table(tbl, "s3://warehouse/meta/manifest-0.parquet", compression="zstd")
        back = FileIO.pq_read_table("s3://warehouse/meta/manifest-0.parquet")
        assert back.to_pydict() == {"a": [1, 2, 3]}
        FileIO.delete("s3://warehouse/meta/manifest-0.parquet")
        assert not FileIO.exists("s3://warehouse/meta/manifest-0.parquet")
    finally:
        FileIO._schemes.pop("s3", None)


def test_glue_catalog_against_moto(glue):
    from iceberg_rust_custom_spark.catalog.glue_catalog import GlueCatalog

    cat = GlueCatalog(glue)
    ident = Identifier.parse("ns.orders")
    cat.register(ident, "/wh/v0.json")
    assert cat.load(ident) == ("/wh/v0.json", "table")
    assert ident in cat.list_tabulars(("ns",))
    cat.swap(ident, "/wh/v0.json", "/wh/v1.json")
    assert cat.load(ident)[0] == "/wh/v1.json"
    with pytest.raises(CommitFailed):
        # stale expected pointer: precondition check fails before the call
        cat.swap(ident, "/wh/v0.json", "/wh/v2.json")
    cat.drop(ident)
    assert not cat.tabular_exists(ident)


def test_engine_with_metadata_on_s3(spark, s3, tmp_path):
    """Full engine flow with the METADATA PLANE on (moto) S3 and data files
    local: write.metadata.path=s3://…, write.data.path=file local — the
    Iceberg path-property split. Appends commit metadata.json + manifests
    to S3 through FileIO; scans plan from S3 and Spark reads the local
    parquet; pruning still works."""
    from iceberg_rust_custom_spark.engine import Engine
    from iceberg_rust_custom_spark.io.fileio import FileIO, register_s3
    from iceberg_rust_custom_spark.metadata.schema import NestedField, Schema

    register_s3(client=s3)
    try:
        sch = Schema(
            0,
            (NestedField(1, "id", "long", True), NestedField(2, "k", "int", True)),
        )
        eng = Engine(spark, warehouse=str(tmp_path / "wh"))
        t = eng.create_table(
            "s3ns.t",
            sch,
            partition_by=[("k", "identity")],
            properties={
                "write.metadata.path": "s3://warehouse/s3ns/t/metadata",
                "write.data.path": str(tmp_path / "data"),
            },
        )
        t.append(spark.createDataFrame([(i, i % 3) for i in range(30)], sch.spark_schema()))
        t.append(spark.createDataFrame([(100, 7)], sch.spark_schema()))

        # metadata objects really live on S3…
        keys = [
            o["Key"]
            for o in s3.list_objects_v2(Bucket="warehouse", Prefix="s3ns/t/metadata")[
                "Contents"
            ]
        ]
        assert any(k.endswith(".metadata.json") for k in keys)
        assert any("manifest" in k for k in keys)
        # …data files really live locally
        import glob

        assert glob.glob(str(tmp_path / "data" / "**" / "*.parquet"), recursive=True)

        # reload through the catalog (pointer → s3 metadata.json) and query
        t2 = eng.load_table("s3ns.t")
        assert t2.scan().count() == 31
        assert sorted(r.id for r in t2.scan("k = 7").collect()) == [100]
        assert t2.count_planned_files("k = 7") < t2.count_planned_files()
    finally:
        FileIO._schemes.pop("s3", None)


def test_full_cloud_shape_catalog_and_metadata_on_s3(spark, s3, tmp_path):
    """The complete cloud-lakehouse wiring on moto: catalog pointers commit
    through S3 conditional PUT (ObjectStoreCatalog over S3ObjectStore),
    table location + metadata on s3://, data files local (stand-in for
    s3a:// on a real cluster). Append, reload, prune, CAS conflict."""
    from iceberg_rust_custom_spark.catalog.object_store import ObjectStoreCatalog
    from iceberg_rust_custom_spark.engine import Engine
    from iceberg_rust_custom_spark.io.fileio import FileIO, register_s3
    from iceberg_rust_custom_spark.metadata.schema import NestedField, Schema

    register_s3(client=s3)
    try:
        cat = ObjectStoreCatalog(S3ObjectStore(s3, "warehouse", "catalog"))
        eng = Engine(spark, catalog=cat, warehouse="s3://warehouse/tables")
        sch = Schema(
            0, (NestedField(1, "id", "long", True), NestedField(2, "k", "int", True))
        )
        t = eng.create_table(
            "cloud.t",
            sch,
            partition_by=[("k", "identity")],
            properties={"write.data.path": str(tmp_path / "data")},
        )
        t.append(spark.createDataFrame([(i, i % 2) for i in range(10)], sch.spark_schema()))
        t2 = eng.load_table("cloud.t")
        assert t2.scan().count() == 10
        assert t2.scan("k = 1").count() == 5
        assert t2.metadata.location.startswith("s3://warehouse/")
        # a second writer with a stale pointer retries its CAS and lands
        stale = eng.load_table("cloud.t")
        t2.append(spark.createDataFrame([(100, 0)], sch.spark_schema()))
        stale.append(spark.createDataFrame([(101, 1)], sch.spark_schema()))
        assert eng.load_table("cloud.t").scan().count() == 12
    finally:
        FileIO._schemes.pop("s3", None)


def test_dv_delete_with_metadata_on_s3(spark, s3, tmp_path, monkeypatch):
    """Regression (r6): deletion-vector Puffin files follow
    write.metadata.path onto S3, so blob reads must be FileIO ranged GETs —
    r5 read them with plain open() and the first post-delete scan crashed
    with FileNotFoundError. Covers BOTH decode routes: the driver path and
    the large-tombstone executor path (forced via the budget knob)."""
    from iceberg_rust_custom_spark import table as _table_pkg
    from iceberg_rust_custom_spark.engine import Engine
    from iceberg_rust_custom_spark.io.fileio import FileIO, register_s3
    from iceberg_rust_custom_spark.metadata.schema import NestedField, Schema
    from iceberg_rust_custom_spark.table.maintenance import delete_where
    from iceberg_rust_custom_spark.table.scan import plan_delete_files

    register_s3(client=s3)
    try:
        sch = Schema(0, (NestedField(1, "id", "long", True), NestedField(2, "v", "double", True)))
        eng = Engine(spark, warehouse=str(tmp_path / "wh"))
        t = eng.create_table(
            "s3dv.t",
            sch,
            properties={
                "write.metadata.path": "s3://warehouse/s3dv/t/metadata",
                "write.data.path": str(tmp_path / "data"),
                "write.delete.format": "dv",
            },
        )
        t.append(spark.createDataFrame([(i, float(i)) for i in range(100)], sch.spark_schema()))
        delete_where(t, "id % 4 = 0", mode="merge-on-read")

        dels = plan_delete_files(t.metadata, t.metadata.snapshot_for_ref())
        assert dels and all(d.data_file.file_path.startswith("s3://") for d in dels)

        expect = {i for i in range(100) if i % 4 != 0}
        assert {r.id for r in t.scan().collect()} == expect  # driver decode route

        from iceberg_rust_custom_spark.table import deletion_vectors as dv_mod

        monkeypatch.setattr(dv_mod, "DRIVER_DECODE_MAX_POSITIONS", 0)
        t2 = eng.load_table("s3dv.t")
        assert {r.id for r in t2.scan().collect()} == expect  # executor decode route
    finally:
        FileIO._schemes.pop("s3", None)


def test_dv_executor_side_self_registering_s3(spark, tmp_path, monkeypatch):
    """Executor-side DV decode (r7, ADVICE r6): when the s3 backend is
    registered from reconstructible kwargs, large-tombstone decode ships
    only (puffin_path, offset, size) rows plus the registration recipe —
    each Spark worker self-registers boto3 against the endpoint and does
    its OWN ranged GETs. The driver never touches a blob (the driver-side
    fetch helper is poisoned to prove it)."""
    from moto.server import ThreadedMotoServer

    from iceberg_rust_custom_spark.engine import Engine
    from iceberg_rust_custom_spark.io.fileio import FileIO, register_s3
    from iceberg_rust_custom_spark.metadata.schema import NestedField, Schema
    from iceberg_rust_custom_spark.table import deletion_vectors as dv_mod
    from iceberg_rust_custom_spark.table.maintenance import delete_where
    from iceberg_rust_custom_spark.table.scan import plan_delete_files

    server = ThreadedMotoServer(port=0)
    server.start()
    host, port = server._server.server_address[:2]
    endpoint = f"http://{host}:{port}"
    kwargs = dict(
        endpoint_url=endpoint,
        region_name="us-east-1",
        aws_access_key_id="test",
        aws_secret_access_key="test",
    )
    try:
        import boto3

        boto3.client("s3", **kwargs).create_bucket(Bucket="warehouse")
        register_s3(**kwargs)  # records the executor factory too
        assert "s3" in FileIO.executor_spec()

        sch = Schema(0, (NestedField(1, "id", "long", True), NestedField(2, "v", "double", True)))
        eng = Engine(spark, warehouse=str(tmp_path / "wh"))
        t = eng.create_table(
            "xs3dv.t",
            sch,
            properties={
                "write.metadata.path": "s3://warehouse/xs3dv/t/metadata",
                "write.data.path": str(tmp_path / "data"),
                "write.delete.format": "dv",
            },
        )
        t.append(spark.createDataFrame([(i, float(i)) for i in range(200)], sch.spark_schema()))
        delete_where(t, "id % 4 = 0", mode="merge-on-read")
        dels = plan_delete_files(t.metadata, t.metadata.snapshot_for_ref())
        assert dels and all(d.data_file.file_path.startswith("s3://") for d in dels)

        # force the large-tombstone route and poison every driver-side blob
        # read: only executors may fetch
        monkeypatch.setattr(dv_mod, "DRIVER_DECODE_MAX_POSITIONS", 0)
        monkeypatch.setattr(
            dv_mod,
            "read_dv_blob",
            lambda f: (_ for _ in ()).throw(AssertionError("driver fetched a DV blob")),
        )
        expect = {i for i in range(200) if i % 4 != 0}
        assert {r.id for r in t.scan().collect()} == expect
    finally:
        FileIO._schemes.pop("s3", None)
        FileIO._factories.pop("s3", None)
        server.stop()
