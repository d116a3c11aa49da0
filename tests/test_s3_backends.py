"""Real-AWS plumbing tests via botocore's Stubber — the actual boto3 client
request/response path exercised with no network: S3 conditional-PUT CAS
(If-None-Match: *) for catalog commits, and the s3:// FileIO scheme for
the metadata plane."""

import io

import pytest

boto3 = pytest.importorskip("boto3")
from botocore.stub import ANY, Stubber  # noqa: E402

from iceberg_rust_custom_spark.catalog.object_store import AlreadyExists, S3ObjectStore  # noqa: E402
from iceberg_rust_custom_spark.io.fileio import FileIO, _S3Scheme  # noqa: E402


def _client():
    return boto3.client("s3", region_name="us-east-1", aws_access_key_id="x", aws_secret_access_key="y")


def test_put_if_absent_sends_conditional_header_and_wins():
    c = _client()
    with Stubber(c) as stub:
        stub.add_response(
            "put_object",
            {"ETag": '"abc"'},
            {"Bucket": "b", "Key": "wh/ptr/v1.json", "Body": ANY, "IfNoneMatch": "*"},
        )
        S3ObjectStore(c, "b", "wh").put_if_absent("ptr/v1.json", b"{}")
        stub.assert_no_pending_responses()


def test_put_if_absent_412_raises_already_exists():
    c = _client()
    with Stubber(c) as stub:
        stub.add_client_error(
            "put_object",
            service_error_code="PreconditionFailed",
            http_status_code=412,
            expected_params={"Bucket": "b", "Key": "ptr/v1.json", "Body": ANY, "IfNoneMatch": "*"},
        )
        with pytest.raises(AlreadyExists):
            S3ObjectStore(c, "b").put_if_absent("ptr/v1.json", b"{}")


def test_get_and_missing_key():
    c = _client()
    with Stubber(c) as stub:
        stub.add_response(
            "get_object",
            {"Body": io.BytesIO(b"data")},
            {"Bucket": "b", "Key": "k"},
        )
        assert S3ObjectStore(c, "b").get("k") == b"data"
        stub.add_client_error("get_object", service_error_code="NoSuchKey", http_status_code=404)
        with pytest.raises(KeyError):
            S3ObjectStore(c, "b").get("missing")


def test_list_strips_prefix_and_paginates():
    c = _client()
    with Stubber(c) as stub:
        stub.add_response(
            "list_objects_v2",
            {
                "Contents": [{"Key": "wh/a/1.json"}, {"Key": "wh/a/2.json"}],
                "IsTruncated": False,
            },
            {"Bucket": "b", "Prefix": "wh/a"},
        )
        assert S3ObjectStore(c, "b", "wh").list("a") == ["a/1.json", "a/2.json"]


def test_s3_fileio_scheme_roundtrip():
    c = _client()
    with Stubber(c) as stub:
        stub.add_response(
            "put_object", {}, {"Bucket": "bkt", "Key": "meta/v1.json", "Body": ANY}
        )
        stub.add_response(
            "get_object",
            {"Body": io.BytesIO(b'{"v": 1}')},
            {"Bucket": "bkt", "Key": "meta/v1.json"},
        )
        stub.add_response(
            "head_object", {"ContentLength": 8}, {"Bucket": "bkt", "Key": "meta/v1.json"}
        )
        stub.add_client_error(
            "head_object", service_error_code="404", http_status_code=404
        )
        s3 = _S3Scheme(c)
        s3.write_bytes("s3://bkt/meta/v1.json", b'{"v": 1}')
        assert s3.read_bytes("s3://bkt/meta/v1.json") == b'{"v": 1}'
        assert s3.exists("s3://bkt/meta/v1.json")
        assert not s3.exists("s3://bkt/meta/missing.json")


def test_register_s3_routes_scheme():
    from iceberg_rust_custom_spark.io.fileio import register_s3

    c = _client()
    register_s3(client=c)
    try:
        assert isinstance(FileIO._impl("s3://bkt/k"), _S3Scheme)
    finally:
        FileIO._schemes.pop("s3", None)


def test_glue_catalog_real_client_version_cas():
    """GlueCatalog over a REAL (stubbed) boto3 Glue client: swap reads the
    table, then issues UpdateTable conditioned on the read VersionId; a
    ConcurrentModificationException surfaces as CommitFailed."""
    from iceberg_rust_custom_spark.catalog.base import CommitFailed, Identifier
    from iceberg_rust_custom_spark.catalog.glue_catalog import GlueCatalog

    c = boto3.client(
        "glue", region_name="us-east-1", aws_access_key_id="x", aws_secret_access_key="y"
    )
    table = {
        "Name": "t",
        "VersionId": "7",
        "Parameters": {"metadata_location": "/wh/v0.json", "iceberg_kind": "table"},
    }
    with Stubber(c) as stub:
        stub.add_response("get_table", {"Table": table}, {"DatabaseName": "ns", "Name": "t"})
        stub.add_response(
            "update_table",
            {},
            {
                "DatabaseName": "ns",
                "TableInput": {
                    "Name": "t",
                    "Parameters": {
                        "metadata_location": "/wh/v1.json",
                        "previous_metadata_location": "/wh/v0.json",
                        "iceberg_kind": "table",
                    },
                },
                "VersionId": "7",
            },
        )
        GlueCatalog(c).swap(Identifier.parse("ns.t"), "/wh/v0.json", "/wh/v1.json")
        stub.assert_no_pending_responses()
        # concurrent committer: conditioned update rejected
        stub.add_response("get_table", {"Table": table}, {"DatabaseName": "ns", "Name": "t"})
        stub.add_client_error(
            "update_table", service_error_code="ConcurrentModificationException"
        )
        with pytest.raises(CommitFailed):
            GlueCatalog(c).swap(Identifier.parse("ns.t"), "/wh/v0.json", "/wh/v2.json")
