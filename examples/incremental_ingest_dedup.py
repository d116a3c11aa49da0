"""Daily-ingest dedup over Iceberg tables: the 100 TB production shape.

Documents and their MinHash signatures live in Iceberg tables. Each new
batch is discovered with a snapshot-range incremental scan, checked against
the STORED signature table (corpus text is never re-read or re-hashed —
signatures are computed once per document EVER), and its own signatures are
appended back for the next ingest. The new-vs-corpus check joins only the
colliding (band, signature) buckets: O(|batch|) per ingest, not O(corpus).

Run: PYTHONPATH=.. python incremental_ingest_dedup.py
"""

import os
import tempfile

from pyspark.sql import functions as F

from iceberg_rust_custom_spark.engine import Engine
from iceberg_rust_custom_spark.metadata.schema import Schema
from iceberg_rust_custom_spark.operators import dedup as D
from iceberg_rust_custom_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def main():
    spark = get_spark("example-incremental-ingest")
    eng = Engine(spark, warehouse=tempfile.mkdtemp(prefix="ingest_wh_"))

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select("doc_id", "text")
    day1 = docs.where(F.col("doc_id") % 5 != 0)
    day2 = docs.where(F.col("doc_id") % 5 == 0)

    # day 1: standing corpus + its one-time signatures
    t_docs = eng.create_table("ingest.docs", Schema.from_spark(docs.schema))
    t_docs.append(day1)
    seq0 = t_docs.metadata.last_sequence_number
    sigs = D.minhash_signature(t_docs.scan(), "doc_id", "text", num_hashes=16)
    t_sigs = eng.create_table("ingest.sigs", Schema.from_spark(sigs.schema))
    t_sigs.append(sigs)
    print(f"day 1: corpus {t_docs.scan().count()} docs, {t_sigs.scan().count()} signatures stored")

    # day 2: new batch lands (plus two planted duplicates of corpus docs)
    dupes = [(r["doc_id"] + 1_000_000, r["text"]) for r in day1.limit(2).collect()]
    t_docs.append(spark.createDataFrame(day2.collect() + dupes, docs.schema))

    # incremental scan yields ONLY the new rows; corpus files are untouched
    new_docs = t_docs.incremental_scan(seq0)
    print(f"day 2: incremental scan sees {new_docs.count()} new docs")

    # new-vs-corpus dedup against the stored signature table
    hits = D.incremental_minhash_pairs(t_sigs.scan(), new_docs, "doc_id", "text", 16, 8)
    print("near-duplicates of existing corpus docs:")
    hits.show(5, truncate=False)

    # new-vs-new inside the batch is the classic path
    intra = D.minhash_lsh_pairs(new_docs, "doc_id", "text", 16, 8)
    print(f"intra-batch candidate pairs: {intra.count()}")

    # sign the batch once; next ingest never re-reads today's text either
    t_sigs.append(D.minhash_signature(new_docs, "doc_id", "text", num_hashes=16))
    print(f"signature table now {t_sigs.scan().count()} rows")


if __name__ == "__main__":
    main()
