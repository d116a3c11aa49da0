"""Eval-leakage guard + PII hygiene + ACID publish: the round-5 additions
as one runnable pipeline.

1. Split the corpus into train / held-out eval.
2. EXACT n-gram decontamination (verbatim leakage) then FUZZY
   decontamination (lightly-edited leakage: LSH candidates between the two
   corpora, exact-Jaccard verified).
3. In-plan logistic quality classifier — the "model" is constants folded
   into codegen, so scoring is one narrow scan.
4. Luhn-validated card redaction (real PANs out, order ids stay).
5. Publish through an exactly-once streaming ingest into a
   month-partitioned Iceberg table, then dynamically overwrite one
   partition (the daily-backfill shape) without touching the rest.

Run: PYTHONPATH=.. python leakage_guard_pipeline.py
"""

import os
import tempfile

from pyspark.sql import functions as F

from iceberg_rust_custom_spark.engine import Engine
from iceberg_rust_custom_spark.operators import dedup as D
from iceberg_rust_custom_spark.operators import text as TX
from iceberg_rust_custom_spark.session import get_spark
from iceberg_rust_custom_spark.streaming.pipeline import stream_append_to_table

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def main():
    spark = get_spark("example-leakage-guard")
    tmp = tempfile.mkdtemp(prefix="leakage_wh_")
    eng = Engine(spark, warehouse=os.path.join(tmp, "wh"))

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    train, evalset = docs.where("doc_id % 7 <> 0"), docs.where("doc_id % 7 = 0")
    print(f"corpus: {train.count()} train / {evalset.count()} eval")

    # --- decontamination: exact n-gram guard, then fuzzy near-dup guard
    clean = TX.decontaminate(train, evalset, shingle_n=8)  # 8-gram verbatim guard
    n_after_exact = clean.count()
    clean = D.fuzzy_decontaminate(clean, evalset, "doc_id", "text", threshold=0.5)
    print(f"decontaminated: {train.count()} -> {n_after_exact} (exact) -> {clean.count()} (fuzzy)")

    # --- quality classifier + Luhn redaction, all codegen
    scored = TX.quality_classifier(clean)
    kept = scored.where("clf_keep")
    redacted = TX.redact_card_numbers(kept, "text", "text_clean")
    print(f"classifier kept {kept.count()} of {scored.count()}")

    # --- exactly-once streaming publish into an ACID table
    eng.sql(
        "CREATE TABLE corpus.train (doc_id BIGINT, text_clean STRING, lang STRING, "
        "source STRING, clf_score DOUBLE) STORED AS ICEBERG"
    )
    t = eng.load_table("corpus.train")
    stage = os.path.join(tmp, "stage")
    out = redacted.select("doc_id", "text_clean", "lang", "source", "clf_score")
    out.write.mode("overwrite").parquet(stage)
    ckpt = os.path.join(tmp, "ckpt")
    q = stream_append_to_table(
        t, spark.readStream.schema(out.schema).parquet(stage), ckpt
    )
    q.awaitTermination(300)
    # replay the whole stream from a reset checkpoint: the (sink-id,
    # batch-id) lineage in the snapshot summaries skips every batch
    import shutil

    shutil.rmtree(ckpt)
    q2 = stream_append_to_table(
        eng.load_table("corpus.train"),
        spark.readStream.schema(out.schema).parquet(stage),
        ckpt,
    )
    q2.awaitTermination(300)
    n = eng.load_table("corpus.train").scan().count()
    assert n == out.count(), (n, out.count())
    print(f"published exactly-once: {n} rows (replay added none)")

    # --- dynamic partition overwrite: re-publish one source's slice only
    eng.sql(
        "CREATE TABLE corpus.by_source (doc_id BIGINT, source STRING, clf_score DOUBLE) "
        "STORED AS ICEBERG PARTITIONED BY (source)"
    )
    ts = eng.load_table("corpus.by_source")
    ts.append(out.select("doc_id", "source", "clf_score"))
    one_source = out.select("doc_id", "source", "clf_score").limit(1).collect()[0].source
    patch = (
        out.where(F.col("source") == one_source)
        .select("doc_id", "source", (F.col("clf_score") * 0).alias("clf_score"))
    )
    ts.dynamic_overwrite(patch)
    zeroed = eng.load_table("corpus.by_source").scan(f"source = '{one_source}'")
    assert zeroed.agg(F.sum("clf_score")).first()[0] == 0.0
    print(f"dynamic overwrite: partition source={one_source!r} replaced, others untouched")
    print("leakage-guard pipeline complete")


if __name__ == "__main__":
    main()
