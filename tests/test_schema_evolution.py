"""Schema evolution with field-id column resolution: files written under an
old schema must stay readable (and correct) after rename/widen/add/drop.
The reference stores evolved schemas (commit.rs:65-75) but never resolves
old files against them; this is the part Spark has to get right."""

import pytest

from iceberg_rust_custom_spark.engine import Engine


@pytest.fixture()
def eng(spark, tmp_path):
    return Engine(spark, warehouse=str(tmp_path / "wh"))


def _mk(eng, spark, name="ns.ev"):
    eng.sql(f"CREATE TABLE {name} (id BIGINT, qty INT, label STRING) STORED AS ICEBERG")
    t = eng.load_table(name)
    t.append(spark.createDataFrame([(1, 10, "a"), (2, 20, "b")], "id long, qty int, label string"))
    return t


def test_rename_keeps_old_files_readable(eng, spark):
    t = _mk(eng, spark)
    t.update_schema().rename_column("label", "tag").commit()
    # new-schema append + old-schema file coexist
    t.append(spark.createDataFrame([(3, 30, "c")], "id long, qty int, tag string"))
    rows = {(r.id, r.tag) for r in t.scan().collect()}
    assert rows == {(1, "a"), (2, "b"), (3, "c")}


def test_widen_int_to_long(eng, spark):
    t = _mk(eng, spark, "ns.w")
    t.update_schema().widen_column("qty", "long").commit()
    t.append(spark.createDataFrame([(3, 2**40, "c")], "id long, qty long, label string"))
    got = {(r.id, r.qty) for r in t.scan().collect()}
    assert got == {(1, 10), (2, 20), (3, 2**40)}
    assert dict(t.scan().dtypes)["qty"] == "bigint"


def test_add_and_drop_column(eng, spark):
    t = _mk(eng, spark, "ns.ad")
    t.update_schema().add_column("score", "double").commit()
    t.append(spark.createDataFrame([(3, 30, "c", 0.5)], "id long, qty int, label string, score double"))
    rows = {(r.id, r.score) for r in t.scan().collect()}
    assert rows == {(1, None), (2, None), (3, 0.5)}
    t.update_schema().drop_column("qty").commit()
    assert "qty" not in t.scan().columns
    assert t.scan().count() == 3


def test_reused_name_is_not_misread(eng, spark):
    """rename a→b then add a NEW column a: old files' physical 'a' belongs
    to field b; the new field a must read as null for them, never as the
    old values."""
    t = _mk(eng, spark, "ns.ru")
    t.update_schema().rename_column("label", "tag").commit()
    t.update_schema().add_column("label", "string").commit()  # new field, new id
    t.append(
        spark.createDataFrame([(3, 30, "c-tag", "c-label")], "id long, qty int, tag string, label string")
    )
    by_id = {r.id: (r.tag, r.label) for r in t.scan().collect()}
    assert by_id[1] == ("a", None)  # old physical 'label' surfaces as tag, not as new label
    assert by_id[3] == ("c-tag", "c-label")


def test_invalid_evolutions_rejected(eng, spark):
    t = _mk(eng, spark, "ns.inv")
    with pytest.raises(ValueError):
        t.update_schema().widen_column("qty", "string").commit()
    with pytest.raises(ValueError):
        t.update_schema().add_column("id", "long").commit()
    with pytest.raises(KeyError):
        t.update_schema().rename_column("nope", "x").commit()
