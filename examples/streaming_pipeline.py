"""Streaming ingest end to end: a file stream of documents is near-dup
checked AS IT ARRIVES (stateful MinHash-LSH — history lives in the state
store, never re-read), while the raw stream commits micro-batch by
micro-batch through the ACID table write path; a second watermarked query
maintains event-time counts.

Run: PYTHONPATH=.. python streaming_pipeline.py
"""

import os
import tempfile

from pyspark.sql import functions as F

from iceberg_rust_custom_spark.engine import Engine
from iceberg_rust_custom_spark.metadata.schema import Schema
from iceberg_rust_custom_spark.session import get_spark
from iceberg_rust_custom_spark.streaming.pipeline import stream_append_to_table
from iceberg_rust_custom_spark.streaming.stateful import neardup_stream

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def main():
    spark = get_spark("example-streaming")
    tmp = tempfile.mkdtemp(prefix="stream_ex_")
    src_dir = os.path.join(tmp, "incoming")
    os.makedirs(src_dir)

    # stage the corpus as three "arriving" files → three micro-batches
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select("doc_id", "text")
    for i in range(3):
        docs.where(F.col("doc_id") % 3 == i).coalesce(1).write.parquet(f"{src_dir}/b{i}")

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir + "/*")
    )

    # 1. streaming near-dup detection (state-store bucket membership, TTL-able)
    pairs = neardup_stream(stream, "doc_id", "text", num_hashes=16, bands=8,
                           state_ttl_minutes=60)
    q1 = (
        pairs.writeStream.outputMode("append")
        .format("memory").queryName("neardups")
        .option("checkpointLocation", os.path.join(tmp, "ck1"))
        .trigger(availableNow=True).start()
    )
    q1.awaitTermination(300)

    # 2. ACID ingest: every micro-batch commits one snapshot
    eng = Engine(spark, warehouse=os.path.join(tmp, "wh"))
    table = eng.create_table("stream.docs", Schema.from_spark(docs.schema))
    q2 = stream_append_to_table(table, stream, os.path.join(tmp, "ck2"))
    q2.awaitTermination(300)

    n_pairs = spark.sql("SELECT COUNT(DISTINCT struct(id_a, id_b)) c FROM neardups").first()["c"]
    t = eng.load_table("stream.docs")
    print(f"near-dup candidate pairs found while streaming: {n_pairs}")
    print(f"table rows: {t.scan().count()} across {len(t.metadata.snapshots)} snapshots")


if __name__ == "__main__":
    main()
