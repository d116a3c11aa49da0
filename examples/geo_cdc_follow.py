"""Round-10 surface, end to end and runnable offline: a GEOMETRY-bearing
Iceberg table is maintained with MoR deletes, compacted, and FOLLOWED by
the streaming CDC source — the last column type a follower couldn't ride.

1. create a geo table (WKB-binary physical storage, logical Spark
   GeometryType with SRID) and load points;
2. MoR-delete a region, then compact (lineage-preserved: the follower
   survives it);
3. follow with ``spark.readStream.format("iceberg_custom_cdc")`` —
   geometry travels as physical WKB, ``decode_geo_columns`` restores the
   logical type at the reader boundary — and mirror the feed;
4. verify the mirror value-matches the batch changelog byte-for-byte
   (canonical st_asbinary on both sides).

Run: PYTHONPATH=.. python geo_cdc_follow.py
"""

import shutil
import struct
import tempfile

from pyspark.sql import functions as F

from iceberg_rust_custom_spark import Engine
from iceberg_rust_custom_spark.session import get_spark
from iceberg_rust_custom_spark.streaming.cdc_source import (
    decode_geo_columns,
    register_cdc_source,
)
from iceberg_rust_custom_spark.table.maintenance import compact, delete_where


def _wkb_point(x: float, y: float) -> bytearray:
    return bytearray(struct.pack("<BIdd", 1, 1, x, y))


def main():
    spark = get_spark("geo_cdc_follow")
    wh = tempfile.mkdtemp(prefix="geo_cdc_")
    ck = tempfile.mkdtemp(prefix="geo_ck_")
    try:
        eng = Engine(spark, warehouse=wh)
        eng.sql("CREATE TABLE geo.pts (k BIGINT, g GEOMETRY(4326)) STORED AS ICEBERG")
        t = eng.load_table("geo.pts")
        t.append(
            spark.createDataFrame(
                [(i, _wkb_point(float(i % 36) * 10 - 180, float(i % 18) * 10 - 90)) for i in range(500)],
                "k long, g binary",
            )
        )
        # a maintenance story a follower must survive: delete + compact
        delete_where(t, "k % 5 = 0", mode="merge-on-read")
        t = compact(t)
        t.append(spark.createDataFrame([(1000, _wkb_point(1.0, 2.0))], "k long, g binary"))

        fmt = register_cdc_source(spark)
        opts = {"warehouse": wh, "table": "geo.pts"}
        feed = spark.readStream.format(fmt).options(**opts).load()
        mirror_dir = tempfile.mkdtemp(prefix="geo_mirror_")
        q = (
            decode_geo_columns(feed, opts)
            .selectExpr("k", "hex(st_asbinary(g)) AS gw", "_change_type", "_commit_seq")
            .writeStream.format("parquet")
            .option("path", mirror_dir)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

        got = spark.read.parquet(mirror_dir)
        t = eng.load_table("geo.pts")
        want = t.changes(0).selectExpr(
            "k", "hex(st_asbinary(g)) AS gw", "_change_type"
        )
        g2, w2 = got.select("k", "gw", "_change_type"), want
        assert g2.exceptAll(w2).count() == 0 and w2.exceptAll(g2).count() == 0
        n_ins = got.where("_change_type = 'insert'").count()
        n_del = got.where("_change_type = 'delete'").count()
        print(f"mirror matches batch changelog: {n_ins} inserts, {n_del} deletes")
        assert n_ins == 501 and n_del == 100
        shutil.rmtree(mirror_dir, ignore_errors=True)
    finally:
        shutil.rmtree(wh, ignore_errors=True)
        shutil.rmtree(ck, ignore_errors=True)


if __name__ == "__main__":
    main()
