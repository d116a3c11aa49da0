"""End-to-end training-data pipeline over the documents corpus:

curation (quality + repetition + language + dedup) → line-level dedup →
deterministic shard shuffle → sequence packing. Beyond the reference's
surface — the LLM-data operators this engine adds on top of the Iceberg
table format. Run: PYTHONPATH=.. python training_data_pipeline.py
"""

import os

from pyspark.sql import functions as F

from iceberg_rust_custom_spark.operators import dedup as D
from iceberg_rust_custom_spark.operators import text as TX
from iceberg_rust_custom_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def main():
    spark = get_spark("example-training-pipeline")
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")

    # 1. curation signals → keep decision
    quality = TX.quality_features(docs.select("doc_id", "text"))
    repetition = TX.repetition_signals(docs, "doc_id")
    canonical = D.exact_dedup(docs, "doc_id", "text").select("doc_id")
    kept = (
        quality.where("q_tokens >= 20")
        .join(repetition.where("gopher_repetition_pass"), "doc_id")
        .join(canonical, "doc_id", "left_semi")
        .select("doc_id", "text")
    )
    print(f"curation: {docs.count()} docs -> {kept.count()} kept")

    # 2. cross-corpus line dedup (C4-style boilerplate removal)
    deduped = D.line_dedup(kept, "doc_id", "text")
    print(f"line dedup: {deduped.count()} docs survive")

    # 3. deterministic shard shuffle + token counting
    sharded = TX.training_shards(
        deduped.withColumnRenamed("text_dedup", "text"), "doc_id", n_shards=4, salt="epoch0"
    ).withColumn("n_tokens", TX.token_count(F.col("text")))

    # 4. GPT-style concat-and-chunk packing into 512-token sequences
    packed = TX.pack_training_sequences(sharded, "shard", "pos", "n_tokens", 512)
    packed.groupBy("shard").agg(
        F.count("*").alias("docs"),
        F.sum("n_tokens").alias("tokens"),
        (F.max("seq_index") + 1).alias("sequences"),
    ).orderBy("shard").show()


if __name__ == "__main__":
    main()
