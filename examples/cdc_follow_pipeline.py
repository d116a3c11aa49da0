"""Round-8 streaming surface, end to end and runnable offline:

1. a table ingests streaming UPSERTS exactly-once (equality delete +
   append per micro-batch, ``stream_upsert_with_mv_maintenance``), while
   its GROUP BY materialized view refreshes INCREMENTALLY per batch
   (affected groups only, via the row-level changelog);
2. a second pipeline FOLLOWS the table with the streaming CDC source
   (``spark.readStream.format("iceberg_custom_cdc")``) — offsets are
   table sequence numbers in the checkpoint, equality-delete victims
   replay as delete events — and reconstructs the table's state in a
   plain parquet mirror, proving the feed is complete.

Run: PYTHONPATH=.. python cdc_follow_pipeline.py
"""

import shutil
import tempfile

from pyspark.sql import Window
from pyspark.sql import functions as F

from iceberg_rust_custom_spark import Engine
from iceberg_rust_custom_spark.session import get_spark
from iceberg_rust_custom_spark.streaming.cdc_source import register_cdc_source
from iceberg_rust_custom_spark.streaming.pipeline import (
    stream_upsert_with_mv_maintenance,
)


def main():
    spark = get_spark("example-cdc-follow")
    root = tempfile.mkdtemp(prefix="cdc_follow_")
    eng = Engine(spark, warehouse=f"{root}/wh")

    eng.sql("CREATE TABLE live.readings (sensor BIGINT, v DOUBLE) STORED AS ICEBERG")
    t = eng.load_table("live.readings")
    t.append(spark.range(100).select(F.col("id").alias("sensor"), F.lit(1.0).alias("v")))
    eng.create_materialized_view(
        "live.by_bucket",
        "SELECT sensor % 10 AS bucket, COUNT(*) AS n, SUM(v) AS total "
        "FROM live.readings GROUP BY sensor % 10",
    )

    # -- 1. streaming upserts with per-batch incremental MV maintenance
    src_dir = f"{root}/in"
    spark.range(40).select(F.col("id").alias("sensor"), F.lit(5.0).alias("v")).write.parquet(
        f"{src_dir}/b0"
    )
    spark.range(100, 120).select(
        F.col("id").alias("sensor"), F.lit(7.0).alias("v")
    ).write.parquet(f"{src_dir}/b1")
    stream = (
        spark.readStream.schema("sensor long, v double")
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir + "/*")
    )
    q = stream_upsert_with_mv_maintenance(
        eng, "live.readings", stream, ["sensor"], f"{root}/ck_up"
    )
    q.awaitTermination(300)
    mv = {
        (r.bucket, r.n, r.total)
        for r in eng.scan_materialized_view("live.by_bucket").collect()
    }
    recompute = {
        (r.bucket, r.n, r.total)
        for r in eng.sql(
            "SELECT sensor % 10 AS bucket, COUNT(*) AS n, SUM(v) AS total "
            "FROM live.readings GROUP BY sensor % 10"
        ).collect()
    }
    assert mv == recompute
    print(f"MV maintained incrementally through streaming upserts: {len(mv)} buckets OK")

    # -- 2. follow the table via the CDC source into a parquet mirror
    fmt = register_cdc_source(spark)
    feed = (
        spark.readStream.format(fmt)
        .option("warehouse", eng.catalog.warehouse)
        .option("table", "live.readings")
        .load()
    )
    q2 = (
        feed.writeStream.format("parquet")
        .option("path", f"{root}/mirror")
        .option("checkpointLocation", f"{root}/ck_cdc")
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(300)

    events = spark.read.parquet(f"{root}/mirror")
    w = Window.partitionBy("sensor").orderBy(F.col("_commit_seq").desc())
    replayed = (
        events.withColumn("_rn", F.row_number().over(w))
        .where("_rn = 1 AND _change_type = 'insert'")
        .select("sensor", "v")
    )
    got = {(r.sensor, r.v) for r in replayed.collect()}
    want = {(r.sensor, r.v) for r in t.refresh().scan().collect()}
    assert got == want
    print(f"CDC feed replay reconstructs the table exactly: {len(got)} rows OK")

    # -- 3. (r9) the follower SURVIVES a compaction: compact() has zero net
    # row change and is changelog-transparent, so the next batch emits
    # only the genuinely-new events; update pairs surface via the lineage
    # option + pair_update_events
    from iceberg_rust_custom_spark.streaming.cdc_source import pair_update_events
    from iceberg_rust_custom_spark.table.maintenance import compact, update_where

    t = compact(t.refresh())
    update_where(t, {"v": "v + 100"}, "sensor = 3", mode="merge-on-read")
    q3 = (
        spark.readStream.format(fmt)
        .option("warehouse", eng.catalog.warehouse)
        .option("table", "live.readings")
        .load()
        .writeStream.format("parquet")
        .option("path", f"{root}/mirror")
        .option("checkpointLocation", f"{root}/ck_cdc")
        .trigger(availableNow=True)
        .start()
    )
    q3.awaitTermination(300)
    post = spark.read.parquet(f"{root}/mirror")
    assert post.count() == events.count() + 2  # tombstone + new version only
    paired = pair_update_events(
        spark.read.format(fmt)
        .option("warehouse", eng.catalog.warehouse)
        .option("table", "live.readings")
        .option("with_lineage", "true")
        .load()
    )
    n_upd = paired.where("_change_type = 'update_after' AND sensor = 3").count()
    assert n_upd == 1
    print("follower survived compact(); update pair detected OK")
    shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
