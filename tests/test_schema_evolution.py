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


# ----------------------------------------------------- nested (r7)


def _mk_nested(eng, spark, name="ns.nested"):
    eng.sql(
        f"CREATE TABLE {name} (id BIGINT, s STRUCT<a: BIGINT, b: STRING>) STORED AS ICEBERG"
    )
    t = eng.load_table(name)
    t.append(
        spark.createDataFrame(
            [(1, (10, "x")), (2, (20, "y"))], "id long, s struct<a: long, b: string>"
        )
    )
    return t


def test_nested_add_column_null_fills_old_files(eng, spark):
    """add_column("s.c") gives the member a fresh unique field id; files
    written before the evolution surface it as NULL, files after carry
    values — one full-table read sees both epochs correctly."""
    t = _mk_nested(eng, spark)
    t.update_schema().add_column("s.c", "double").commit()
    t.append(
        spark.createDataFrame(
            [(3, (30, "z", 0.5))], "id long, s struct<a: long, b: string, c: double>"
        )
    )
    rows = {(r.id, r.s.a, r.s.b, r.s.c) for r in t.scan().collect()}
    assert rows == {(1, 10, "x", None), (2, 20, "y", None), (3, 30, "z", 0.5)}
    # the new member's id is table-unique (never reuses an existing id)
    schema = t.metadata.current_schema()
    s_field = schema.field_by_name("s")
    ids = [f["id"] for f in s_field.field_type["fields"]]
    assert len(ids) == len(set(ids))


def test_nested_rename_keeps_old_files_readable(eng, spark):
    """rename s.b → tag: the member keeps its field id, so pre-rename
    files resolve their values under the new name."""
    t = _mk_nested(eng, spark, "ns.nren")
    t.update_schema().rename_column("s.b", "tag").commit()
    t.append(
        spark.createDataFrame(
            [(3, (30, "z"))], "id long, s struct<a: long, tag: string>"
        )
    )
    rows = {(r.id, r.s.tag) for r in t.scan().collect()}
    assert rows == {(1, "x"), (2, "y"), (3, "z")}


def test_nested_drop_and_widen(eng, spark):
    t = _mk_nested(eng, spark, "ns.ndw")
    t.update_schema().drop_column("s.b").commit()
    assert [f["name"] for f in t.metadata.current_schema().field_by_name("s").field_type["fields"]] == ["a"]
    rows = {(r.id, r.s.a) for r in t.scan().collect()}
    assert rows == {(1, 10), (2, 20)}


def test_nested_widen_int_to_long(eng, spark):
    eng.sql("CREATE TABLE ns.nw (id BIGINT, s STRUCT<n: INT>) STORED AS ICEBERG")
    t = eng.load_table("ns.nw")
    t.append(spark.createDataFrame([(1, (7,))], "id long, s struct<n: int>"))
    t.update_schema().widen_column("s.n", "long").commit()
    t.append(spark.createDataFrame([(2, (2**40,))], "id long, s struct<n: long>"))
    rows = {(r.id, r.s.n) for r in t.scan().collect()}
    assert rows == {(1, 7), (2, 2**40)}


def test_nested_null_struct_rows_stay_null(eng, spark):
    """Projection must not turn a NULL struct into a struct of NULLs."""
    t = _mk_nested(eng, spark, "ns.nnull")
    t.append(
        spark.createDataFrame([(9, None)], "id long, s struct<a: long, b: string>")
    )
    t.update_schema().add_column("s.c", "double").commit()
    by_id = {r.id: r.s for r in t.scan().collect()}
    assert by_id[9] is None
    assert by_id[1].a == 10 and by_id[1].c is None


def test_deeply_nested_add(eng, spark):
    eng.sql(
        "CREATE TABLE ns.deep (id BIGINT, o STRUCT<inner: STRUCT<x: BIGINT>>) STORED AS ICEBERG"
    )
    t = eng.load_table("ns.deep")
    t.append(
        spark.createDataFrame([(1, ((5,),))], "id long, o struct<inner: struct<x: long>>")
    )
    t.update_schema().add_column("o.inner.y", "string").commit()
    t.append(
        spark.createDataFrame(
            [(2, ((6, "hey"),))], "id long, o struct<inner: struct<x: long, y: string>>"
        )
    )
    rows = {(r.id, r.o.inner.x, r.o.inner.y) for r in t.scan().collect()}
    assert rows == {(1, 5, None), (2, 6, "hey")}


def test_struct_in_list_projection(eng, spark):
    """Structs inside arrays project element-wise (transform)."""
    eng.sql(
        "CREATE TABLE ns.lst (id BIGINT, xs ARRAY<STRUCT<a: BIGINT>>) STORED AS ICEBERG"
    )
    t = eng.load_table("ns.lst")
    t.append(
        spark.createDataFrame([(1, [(10,), (11,)])], "id long, xs array<struct<a: long>>")
    )
    # element structs have no per-member ids to evolve in this model; verify
    # mixed-epoch reads of the array column survive an unrelated evolution
    t.update_schema().add_column("flag", "boolean").commit()
    t.append(
        spark.createDataFrame(
            [(2, [(20,)], True)], "id long, xs array<struct<a: long>>, flag boolean"
        )
    )
    rows = {(r.id, tuple(x.a for x in r.xs), r.flag) for r in t.scan().collect()}
    assert rows == {(1, (10, 11), None), (2, (20,), True)}


def test_nested_ddl_paths(eng, spark):
    """ALTER TABLE … ADD/RENAME/DROP COLUMN with dotted paths."""
    t = _mk_nested(eng, spark, "ns.nddl")
    eng.sql("ALTER TABLE ns.nddl ADD COLUMN s.c BIGINT")
    eng.sql("ALTER TABLE ns.nddl RENAME COLUMN s.b TO tag")
    t = eng.load_table("ns.nddl")
    names = [f["name"] for f in t.metadata.current_schema().field_by_name("s").field_type["fields"]]
    assert names == ["a", "tag", "c"]
    eng.sql("ALTER TABLE ns.nddl DROP COLUMN s.c")
    t = eng.load_table("ns.nddl")
    names = [f["name"] for f in t.metadata.current_schema().field_by_name("s").field_type["fields"]]
    assert names == ["a", "tag"]
    rows = {(r.id, r.s.tag) for r in t.scan().collect()}
    assert rows == {(1, "x"), (2, "y")}


def test_stale_handle_append_after_engine_ddl(eng, spark):
    """A handle loaded BEFORE an Engine-level ALTER TABLE must append the
    evolved shape: writes refresh against the catalog's latest metadata
    (the Iceberg client convention) instead of failing the cast to the
    stale schema."""
    eng.sql("CREATE TABLE ns.stale (id BIGINT, s STRUCT<a: BIGINT, b: STRING>) STORED AS ICEBERG")
    t = eng.load_table("ns.stale")  # stale after the DDL below
    t.append(spark.createDataFrame([(1, (10, "x"))], "id long, s struct<a: long, b: string>"))
    eng.sql("ALTER TABLE ns.stale RENAME COLUMN s.b TO tag")
    eng.sql("ALTER TABLE ns.stale ADD COLUMN s.c DOUBLE")
    t.append(
        spark.createDataFrame(
            [(2, (20, "y", 0.5))], "id long, s struct<a: long, tag: string, c: double>"
        )
    )
    rows = {(r.id, r.s.a, r.s.tag, r.s.c) for r in t.scan().collect()}
    assert rows == {(1, 10, "x", None), (2, 20, "y", 0.5)}


# ----------------------------------------------------- v3 default values


def test_add_column_with_default_both_epochs(eng, spark):
    """Iceberg v3 defaults: rows written BEFORE the field existed read back
    the initial-default; a writer omitting the column after the add gets
    the write-default; explicit values win."""
    t = _mk(eng, spark, "ns.dv1")
    t.update_schema().add_column("priority", "string", default="standard").commit()
    # writer omits the new column entirely → write-default fill
    t.append(spark.createDataFrame([(3, 30, "c")], "id long, qty int, label string"))
    # writer provides it explicitly
    t.append(
        spark.createDataFrame(
            [(4, 40, "d", "rush")], "id long, qty int, label string, priority string"
        )
    )
    by_id = {r.id: r.priority for r in t.scan().collect()}
    assert by_id == {1: "standard", 2: "standard", 3: "standard", 4: "rush"}


def test_default_survives_catalog_roundtrip_and_rename(eng, spark):
    t = _mk(eng, spark, "ns.dv2")
    t.update_schema().add_column("score", "long", default=7).commit()
    t.update_schema().rename_column("score", "rating").commit()
    t2 = eng.load_table("ns.dv2")  # fresh metadata from catalog JSON
    f = t2.metadata.current_schema().field_by_name("rating")
    assert f.initial_default == 7 and f.write_default == 7
    assert {r.rating for r in t2.scan().collect()} == {7}


def test_nested_add_with_default(eng, spark):
    t = _mk_nested(eng, spark, "ns.dv3")
    t.update_schema().add_column("s.lang", "string", default="en").commit()
    t.append(
        spark.createDataFrame(
            [(3, (30, "z", "fr"))], "id long, s struct<a: long, b: string, lang: string>"
        )
    )
    rows = {(r.id, r.s.lang) for r in t.scan().collect()}
    assert rows == {(1, "en"), (2, "en"), (3, "fr")}


def test_add_column_default_ddl(eng, spark):
    t = _mk(eng, spark, "ns.dv4")
    eng.sql("ALTER TABLE ns.dv4 ADD COLUMN priority STRING DEFAULT 'standard'")
    eng.sql("ALTER TABLE ns.dv4 ADD COLUMN weight DOUBLE DEFAULT 1.5")
    t = eng.load_table("ns.dv4")
    rows = {(r.id, r.priority, r.weight) for r in t.scan().collect()}
    assert rows == {(1, "standard", 1.5), (2, "standard", 1.5)}


def test_no_default_still_errors_on_missing_column(eng, spark):
    t = _mk(eng, spark, "ns.dv5")
    t.update_schema().add_column("extra", "string").commit()  # no default
    with pytest.raises(ValueError, match="missing columns"):
        t.append(spark.createDataFrame([(3, 30, "c")], "id long, qty int, label string"))


# ------------------------------------------------- v3 type promotions


def test_decimal_precision_widening(eng, spark):
    eng.sql("CREATE TABLE ns.w1 (id BIGINT, amt DECIMAL(10,2)) STORED AS ICEBERG")
    t = eng.load_table("ns.w1")
    from decimal import Decimal

    t.append(spark.createDataFrame([(1, Decimal("12.34"))], "id long, amt decimal(10,2)"))
    t.update_schema().widen_column("amt", "decimal(20,2)").commit()
    t.append(
        spark.createDataFrame(
            [(2, Decimal("99999999999999999.99"))], "id long, amt decimal(20,2)"
        )
    )
    rows = {(r.id, str(r.amt)) for r in t.scan().collect()}
    assert rows == {(1, "12.34"), (2, "99999999999999999.99")}
    # scale change / narrowing are NOT promotions
    with pytest.raises(ValueError, match="promotion"):
        t.update_schema().widen_column("amt", "decimal(20,4)").commit()
    with pytest.raises(ValueError, match="promotion"):
        t.update_schema().widen_column("amt", "decimal(10,2)").commit()


def test_date_to_timestamp_promotion(eng, spark):
    import datetime

    eng.sql("CREATE TABLE ns.w2 (id BIGINT, d DATE) STORED AS ICEBERG")
    t = eng.load_table("ns.w2")
    t.append(spark.createDataFrame([(1, datetime.date(2024, 3, 5))], "id long, d date"))
    t.update_schema().widen_column("d", "timestamp").commit()
    t.append(
        spark.createDataFrame(
            [(2, datetime.datetime(2024, 3, 6, 12, 30))], "id long, d timestamp_ntz"
        )
    )
    rows = {(r.id, r.d) for r in t.scan().collect()}
    assert rows == {
        (1, datetime.datetime(2024, 3, 5, 0, 0)),  # old dates read as midnight
        (2, datetime.datetime(2024, 3, 6, 12, 30)),
    }


# ----------------------------------------------------- v3 unknown type


def test_unknown_column_lifecycle(eng, spark):
    eng.sql("CREATE TABLE ns.u1 (id BIGINT, v STRING) STORED AS ICEBERG")
    t = eng.load_table("ns.u1")
    t.append(spark.createDataFrame([(1, "a")], "id long, v string"))
    t.update_schema().add_column("u", "unknown").commit()
    # writers may omit it or include it — never stored either way
    t.append(spark.createDataFrame([(2, "b")], "id long, v string"))
    rows = {(r.id, r.u) for r in t.scan().collect()}
    assert rows == {(1, None), (2, None)}
    # promote unknown -> string: files from before hold no values -> NULL;
    # new writes store real values
    t.update_schema().widen_column("u", "string").commit()
    t.append(spark.createDataFrame([(3, "c", "real")], "id long, v string, u string"))
    rows = {(r.id, r.u) for r in t.scan().collect()}
    assert rows == {(1, None), (2, None), (3, "real")}


def test_ctas_null_column_becomes_unknown(eng, spark):
    eng.sql("CREATE TABLE ns.u2 (id BIGINT) STORED AS ICEBERG")
    eng.sql("INSERT INTO ns.u2 VALUES (1), (2)")
    eng.sql("CREATE TABLE ns.u3 STORED AS ICEBERG AS SELECT id, NULL AS x FROM ns.u2")
    t = eng.load_table("ns.u3")
    assert t.metadata.current_schema().field_by_name("x").field_type == "unknown"
    assert {(r.id, r.x) for r in t.scan().collect()} == {(1, None), (2, None)}


def test_struct_in_map_projection(spark):
    """ADVICE r7: a struct evolved inside a map VALUE (or key) must project
    by field id like the struct/list branches — the positional cast
    fallback fails outright when a member was added or dropped after old
    files were written (the shape external/imported tables produce)."""
    from pyspark.sql import functions as F

    from iceberg_rust_custom_spark.table.scan import _project_evolved

    wt = {
        "type": "map",
        "key": "string",
        "value": {
            "type": "struct",
            "fields": [{"id": 1, "name": "a", "type": "long", "required": False}],
        },
        "value-required": False,
    }
    ct = {
        "type": "map",
        "key": "string",
        "value": {
            "type": "struct",
            "fields": [
                {"id": 1, "name": "a_renamed", "type": "long", "required": False},
                {"id": 2, "name": "b", "type": "string", "required": False},
            ],
        },
        "value-required": False,
    }
    df = spark.createDataFrame([(1, {"k": (7,)})], "id long, m map<string, struct<a: long>>")
    out = df.select(_project_evolved(F.col("m"), wt, ct).alias("m")).first().m
    assert out["k"].a_renamed == 7 and out["k"].b is None
