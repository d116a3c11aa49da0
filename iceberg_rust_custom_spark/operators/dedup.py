"""Deduplication operators: exact, n-gram Jaccard, MinHash+LSH, SimHash,
embedding-cosine near-dup.

Scale design (the 100 TB story — each op avoids the O(N²) trap):

* exact: one hash-aggregate shuffle on a 32/64-bit content hash.
* minhash-LSH: shingle→hash→min-aggregate (one shuffle keyed by doc),
  then band signatures → self-join **only within LSH buckets** (shuffle
  keyed by band value; candidate pairs ≪ N²).
* simhash: per-doc fingerprint via conditional aggregation (one shuffle),
  near-dup = fingerprints at Hamming distance ≤ k, joined on band slices.
* n-gram Jaccard: exploded shingle equi-join — only docs sharing ≥1
  shingle ever meet (plus a broadcast of per-doc sizes).
* embedding cosine: LSH/bucketed variant in similarity.py; the all-pairs
  version here is for verification at small N.

Everything is built-in expressions (md5-based hashing, see
functions/hashing.py) so the DuckDB oracle can replay results exactly.
"""

from __future__ import annotations

import logging

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_log = logging.getLogger(__name__)

from iceberg_rust_custom_spark.functions.hashing import (
    MERSENNE_31,
    affine_hash_sql,
    md5h32_spark_sql,
    minhash_params,
)
from iceberg_rust_custom_spark.operators.text import tokens
from iceberg_rust_custom_spark.functions.local_rows import local_rows_df
from iceberg_rust_custom_spark.operators.util import (
    ensure_min_parallelism,
    materialize_if_small,
)


def exact_dedup(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Keep the lowest id per identical (whitespace-normalized) text."""
    norm = f"lower(trim(regexp_replace({text_col}, '\\\\s+', ' ')))"
    return (
        ensure_min_parallelism(df).withColumn("_h", F.expr(md5h32_spark_sql(norm)))
        .groupBy("_h")
        .agg(F.min(id_col).alias(id_col), F.count("*").alias("dup_count"))
        .drop("_h")
    )


def line_dedup(
    df: DataFrame,
    id_col: str,
    text_col: str,
    out_col: str = "text_dedup",
) -> DataFrame:
    """C4-style line-level exact dedup: split every document into lines,
    keep only the globally-first occurrence of each distinct non-empty
    trimmed line (first = smallest ``(id, line position)``), and reassemble
    each document's surviving lines in their original order. Documents that
    lose every line are dropped. Returns ``(id, out_col, n_lines_kept)``.

    Scale shape: one hash-aggregate keyed by the line text — the winner is
    a struct MIN, so the partial (map-side) aggregation collapses every
    partition's occurrences of a line to ONE candidate row before the
    shuffle. This matters precisely on the data the operator targets: a
    boilerplate line repeated 10^8 times across a 100 TB corpus shuffles
    once per map partition, not once per occurrence (a row_number window
    keyed by line — the r3 shape — moved every duplicate to a single
    reducer). Then one shuffle keyed by doc id for reassembly
    (collect_list + array_sort keeps the in-doc order deterministic without
    relying on collect order). No UDFs — split/posexplode/array_join stay
    in codegen.
    """
    lines = (
        ensure_min_parallelism(df)
        .select(
            F.col(id_col),
            F.posexplode(F.split(F.col(text_col), "\n")).alias("pos", "line"),
        )
        .withColumn("line", F.trim("line"))
        .where(F.col("line") != "")
    )
    # struct min = lexicographic (id, pos): the globally-first occurrence
    kept = (
        lines.groupBy("line")
        .agg(F.min(F.struct(F.col(id_col), F.col("pos"))).alias("_w"))
        .select(F.col(f"_w.{id_col}").alias(id_col), F.col("_w.pos").alias("pos"), "line")
    )
    return (
        kept.groupBy(id_col)
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "line"))),
                    lambda s: s["line"],
                ),
                "\n",
            ).alias(out_col),
            F.count("*").alias("n_lines_kept"),
        )
    )


def shingle_array(text_col, n: int = 3):
    """Column expression: distinct word n-grams of a text column as an
    array (no explode — usable per-row, e.g. in streaming maps)."""
    toks = tokens(F.lower(text_col if not isinstance(text_col, str) else F.col(text_col)))
    # guard: Spark's sequence(1, 0) would DESCEND; docs with < n tokens get
    # an empty shingle set (same as the oracle's generate_series(1, 0) = [])
    sh = F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - n + 1),
            lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return F.filter(F.array_distinct(sh), lambda s: s != "")


def shingles(df: DataFrame, id_col: str, text_col: str, n: int = 3) -> DataFrame:
    """(id, shingle) rows: distinct word n-grams per document. Built from
    slice/concat_ws over the token array — no UDF."""
    return (
        ensure_min_parallelism(df)
        .select(F.col(id_col), F.explode(shingle_array(text_col, n)).alias("shingle"))
    )


def ngram_jaccard_pairs(
    df: DataFrame, id_col: str, text_col: str, n: int = 3, threshold: float = 0.8
) -> DataFrame:
    """All pairs with n-gram Jaccard ≥ threshold. Shuffle keys: shingle
    (join), then pair (aggregate). Only docs sharing a shingle meet."""
    sh = shingles(df, id_col, text_col, n).cache()
    sizes = sh.groupBy(id_col).agg(F.count("*").alias("sz"))
    a, b = sh.alias("a"), sh.alias("b")
    inter = (
        a.join(b, (F.col(f"a.shingle") == F.col(f"b.shingle")) & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
        .groupBy(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
        .agg(F.count("*").alias("inter"))
    )
    sa = sizes.withColumnRenamed(id_col, "id_a").withColumnRenamed("sz", "sz_a")
    sb = sizes.withColumnRenamed(id_col, "id_b").withColumnRenamed("sz", "sz_b")
    return (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn("jaccard", F.round(F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter")), 6))
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "inter", "sz_a", "sz_b", "jaccard")
    )


def _shingle_hashes_col(sh_col) -> F.Column:
    """long md5h32 hashes of a shingle-array column (single-md5 fast form,
    Column-spelled — value-identical to md5h32_spark_sql, asserted in
    tests)."""
    return F.transform(
        sh_col, lambda s: F.conv(F.substring(F.md5(s), 1, 8), 16, 10).cast("long")
    )


def _minhash_cols(hashes_col, num_hashes: int) -> list:
    """mh_i = MIN over the hash array of affine_i(h) — per-row, no explode,
    no aggregate. An empty hash array yields NULL mh_i."""

    def _affine(a: int, b: int):
        # closure factory: default-arg binding would change the lambda's
        # arity as seen by PySpark's higher-order-function introspection
        return lambda h: (F.lit(a) * h + F.lit(b)) % F.lit(MERSENNE_31)

    cols = []
    for i, (a, b) in enumerate(minhash_params(num_hashes)):
        cols.append(F.array_min(F.transform(hashes_col, _affine(a, b))).alias(f"mh_{i}"))
    return cols


def minhash_signature_columns(text_col, num_hashes: int = 16, shingle_n: int = 3) -> list:
    """Per-ROW MinHash signature expressions — ``mh_i = MIN over shingles
    of affine_i(md5h32(shingle))`` computed entirely inside one row's array
    (no explode, no groupBy). Value-identical to :func:`minhash_signature`
    (same shingle set, same hash family; asserted in tests), but usable as
    a stateless map — which is what a STREAMING near-dup pipeline needs
    (a streaming groupBy(id) aggregate would drag in watermark/output-mode
    state for what is logically a per-row computation). Docs with no
    shingles yield NULL mh_0 (the batch pipeline emits no row for them —
    filter ``mh_0 IS NOT NULL`` for parity)."""
    return _minhash_cols(_shingle_hashes_col(shingle_array(text_col, shingle_n)), num_hashes)


def duplicate_spans(
    df: DataFrame,
    id_col: str,
    text_col: str,
    min_len: int = 8,
) -> DataFrame:
    """Exact-substring duplicate spans (the Lee et al. 2022 "Deduplicating
    Training Data Makes Language Models Better" operation, relationally):
    every MAXIMAL run of ≥ ``min_len`` consecutive tokens that also appears
    in ANOTHER document, as ``(id, span_start, span_end, span_tokens)``
    (1-based inclusive token positions). Downstream either drops the spans
    (suffix-array-style cut) or filters docs by duplicated-token ratio.

    Relational shape instead of a distributed suffix array: (1) slide an
    L-token window over each doc → (id, pos, md5(gram)); (2) one
    hash-aggregate finds grams seen in ≥2 distinct docs (map-side combine
    collapses boilerplate before the shuffle — the 10^8-copy header costs
    one row per map partition); (3) join back (broadcast when small);
    (4) merge overlapping windows into maximal spans with one
    cumulative-max gaps-islands window per doc. No UDFs; every stage is
    codegen. Positions are data-determined, so results are identical on
    any partitioning."""
    L = int(min_len)
    if L < 2:
        raise ValueError("min_len must be ≥ 2 tokens")
    # tokenize ONCE into a column — inlining the split+filter into the
    # per-gram lambda would re-tokenize the document for every window
    # position (the O(len²) trap ngram_lm_scores hit)
    toks = f"filter(split({text_col}, '\\\\s+'), t -> t <> '')"
    # xxhash64 instead of md5 (r13): the gram hash is internal — only the
    # span positions are output — so any collision-free hash yields the
    # same spans, and xxhash64 is a single 64-bit codegen op versus a
    # cryptographic digest + 32-char string per window. (Collision bound:
    # two DIFFERENT grams colliding on the 64-bit hash would fabricate a
    # duplicate span — ~n²/2^65 for n distinct grams, ~3% at 10^9 grams;
    # at that scale pass a wider key or pre-partition the corpus.) The
    # shared tokenize+explode stream feeds the dup-hash aggregate and the
    # position join; it is materialized only for small inputs
    # (materialize_if_small — one row per token position is O(corpus),
    # r14 scale-safety gate; per invocation, never across runs).
    grams_expr = (
        f"CASE WHEN size(_tk) >= {L} THEN "
        f"transform(sequence(1, size(_tk) - {L - 1}), "
        f"i -> struct(i AS pos, xxhash64(concat_ws(' ', slice(_tk, i, {L}))) AS h)) "
        f"ELSE array() END"
    )
    grams = materialize_if_small(
        ensure_min_parallelism(df)
        .selectExpr(id_col, f"{toks} AS _tk")
        .select(F.col(id_col), F.explode(F.expr(grams_expr)).alias("g"))
        .select(id_col, "g.pos", "g.h"),
        df,
    )
    dup_hashes = (
        grams.groupBy("h")
        .agg(F.count_distinct(F.col(id_col)).alias("nd"))
        .where(F.col("nd") > 1)
        .select("h")
    )
    hits = grams.join(dup_hashes, "h").select(id_col, "pos")
    w = Window.partitionBy(id_col).orderBy("pos")
    prev_end = F.max(F.col("pos") + (L - 1)).over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    islands = hits.withColumn(
        "new_span", F.when(prev_end.isNull() | (F.col("pos") > prev_end + 1), 1).otherwise(0)
    ).withColumn("span", F.sum("new_span").over(w))
    return (
        islands.groupBy(id_col, "span")
        .agg(
            F.min("pos").alias("span_start"),
            (F.max("pos") + (L - 1)).alias("span_end"),
        )
        .select(
            id_col,
            F.col("span_start").cast("int").alias("span_start"),
            F.col("span_end").cast("int").alias("span_end"),
            (F.col("span_end") - F.col("span_start") + 1).cast("int").alias("span_tokens"),
        )
    )


def cut_duplicate_spans(
    df: DataFrame,
    id_col: str,
    text_col: str,
    min_len: int = 8,
    out_col: str = "text_cut",
) -> DataFrame:
    """Remove every cross-document duplicated span found by
    ``duplicate_spans`` from the text (the actual cut step of Lee et al.
    2022): ``(id, out_col, n_tokens_kept, n_tokens_cut)``. Documents whose
    every token is duplicated keep an empty string (filter on
    ``n_tokens_kept`` downstream). Whitespace is normalized to single
    spaces by reassembly.

    Scale shape: spans expand to (id, pos) rows via sequence+explode (output
    bounded by corpus token count), tokens LEFT ANTI join them on the exact
    (id, pos) key — no range join — and one groupBy(id) reassembles in
    order. All codegen."""
    spans = duplicate_spans(df, id_col, text_col, min_len)
    cut_positions = spans.select(
        F.col(id_col),
        F.explode(F.expr("sequence(span_start, span_end)")).alias("pos"),
    )
    toks_expr = f"filter(split({text_col}, '\\\\s+'), t -> t <> '')"
    toks = df.select(
        F.col(id_col),
        F.posexplode(F.expr(toks_expr)).alias("pos0", "tok"),
    ).select(id_col, (F.col("pos0") + 1).alias("pos"), "tok")
    kept = toks.join(cut_positions, [id_col, "pos"], "left_anti")
    reassembled = kept.groupBy(id_col).agg(
        F.array_join(
            F.expr("transform(array_sort(collect_list(struct(pos, tok))), s -> s.tok)"), " "
        ).alias(out_col),
        F.count("*").cast("int").alias("n_tokens_kept"),
    )
    totals = df.select(
        F.col(id_col), F.expr(f"size({toks_expr})").cast("int").alias("_total")
    )
    return (
        totals.join(reassembled, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col(out_col), F.lit("")).alias(out_col),
            F.coalesce(F.col("n_tokens_kept"), F.lit(0)).alias("n_tokens_kept"),
            (F.col("_total") - F.coalesce(F.col("n_tokens_kept"), F.lit(0)))
            .cast("int")
            .alias("n_tokens_cut"),
        )
    )


def minhash_signature(
    df: DataFrame, id_col: str, text_col: str, num_hashes: int = 16, shingle_n: int = 3
) -> DataFrame:
    """(id, mh_0..mh_{k-1}): k-permutation MinHash over word shingles.
    One explode + one aggregate (map-side combine makes the min cheap).

    r13 note: a per-row array_min-fold form (zero shuffle) was measured
    3× SLOWER at sf0.1 — Spark evaluates higher-order functions
    interpreted, while the explode + MIN aggregate stays in whole-stage
    codegen; the map-side partial aggregation already keeps the shuffle
    signature-sized. Kept the codegen form. (The per-row expressions
    remain available as minhash_signature_columns for the streaming map,
    where a groupBy would drag in state-store semantics.)"""
    return _minhash_signature_from_shingles(
        shingles(df, id_col, text_col, shingle_n), id_col, num_hashes
    )


def _minhash_signature_from_shingles(sh: DataFrame, id_col: str, num_hashes: int) -> DataFrame:
    """minhash_signature over an EXISTING (id, shingle) stream (r13: lets
    lsh_verified_pairs / fuzzy_decontaminate share one checkpointed
    shingle explode between the signature aggregate and the exact-verify
    set aggregate). Value-identical to minhash_signature."""
    h = F.expr(md5h32_spark_sql("shingle"))
    hashed = sh.select(id_col, h.alias("h0"))
    aggs = [
        F.min(F.expr(affine_hash_sql("h0", a, b))).alias(f"mh_{i}")
        for i, (a, b) in enumerate(minhash_params(num_hashes))
    ]
    return hashed.groupBy(id_col).agg(*aggs)


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 16,
    bands: int = 4,
    shingle_n: int = 3,
    max_bucket: int | None = None,
    on_overflow: str = "warn",
) -> DataFrame:
    """Candidate near-dup pairs: docs agreeing on ALL rows of ≥1 LSH band.
    The self-join is keyed by (band_idx, band_signature) — the LSH bucket —
    so work scales with bucket sizes, not N².

    Buckets larger than ``max_bucket`` (default ``MAX_LSH_BUCKET``) are
    dropped; ``on_overflow`` controls visibility — see ``_bucket_pairs``."""
    sig = minhash_signature(df, id_col, text_col, num_hashes, shingle_n)
    stacked = _banded(sig, id_col, id_col, num_hashes, bands)
    return _bucket_pairs(stacked, id_col, max_bucket, on_overflow)


def _banded(sig: DataFrame, id_col: str, out_id: str, num_hashes: int, bands: int) -> DataFrame:
    """(id, mh_*) signatures → (out_id, band_idx, band_sig) LSH band rows
    (one explode; band_sig is the '_'-joined stringified band slice)."""
    rows_per_band = num_hashes // bands
    band_structs = []
    for bi in range(bands):
        cols = [
            F.col(f"mh_{bi * rows_per_band + r}").cast("string") for r in range(rows_per_band)
        ]
        band_structs.append(
            F.struct(F.lit(bi).alias("band_idx"), F.concat_ws("_", *cols).alias("band_sig"))
        )
    return sig.select(
        F.col(id_col).alias(out_id), F.explode(F.array(*band_structs)).alias("bs")
    ).select(out_id, "bs.band_idx", "bs.band_sig")


MAX_LSH_BUCKET = 10_000  # pairs per bucket capped at ~5·10^7


def _bucket_pairs(
    stacked: DataFrame, id_col: str, max_bucket: int | None = None, on_overflow: str = "warn"
) -> DataFrame:
    """(id, band_idx, band_sig) → distinct candidate pairs, by grouping per
    LSH bucket and expanding in-bucket combinations with array expressions.

    One shuffle (the groupBy), and the signature pipeline runs ONCE — a
    self-join would execute it twice (no exchange reuse across the
    broadcast/probe sides). Bucket sizes are small by LSH design; a
    degenerate signature (e.g. empty/constant docs at corpus scale) would
    make one O(b²) group explode, so buckets over ``max_bucket`` ids are
    DROPPED (their members are near-identical boilerplate that exact dedup
    or a constant-doc filter should have removed; emitting b² pairs for
    them is never the intent).

    A dropped bucket means real candidate pairs are silently omitted, so the
    drop must be *visible* (ADVICE r2) — without costing the hot path
    anything (the r2 eager-check design ran an extra job AND leaked a
    persist() per call, which compounded across a session). ``on_overflow``:

    * ``"warn"`` (default) — a Spark ``Observation`` rides the caller's own
      action: overflow counters are computed inside the SAME job that
      expands pairs (zero extra jobs, nothing persisted). The returned
      DataFrame's action methods are wrapped so that, immediately after the
      caller's own action completes, the observation is read and a
      ``RuntimeWarning`` + log line fire ON THE CALLER'S THREAD (the r3
      daemon-thread design raised the warning on a non-main thread, where
      ``warnings.catch_warnings``/``pytest.warns`` could miss it — and
      leaked a parked thread per call when the frame was never
      materialized). Consumers that only run actions on DERIVED frames can
      invoke ``df._lsh_overflow_check()`` after their first action
      (``connected_components`` does).
    * ``"error"`` — a synchronous pre-check job (the signature pipeline
      runs once extra — use only when a hard stop is worth 2× cost);
      raises ``ValueError`` on overflow before returning.
    * ``"lazy"`` — no instrumentation beyond the companion DataFrame.

    In every mode the result carries ``_lsh_overflow``: a 1-row DataFrame
    ``(n_dropped_buckets, max_bucket_size)`` for explicit accounting."""
    if max_bucket is None:
        max_bucket = MAX_LSH_BUCKET  # module-level so deployments can tune it
    buckets = (
        stacked.groupBy("band_idx", "band_sig")
        .agg(F.sort_array(F.collect_list(F.col(id_col))).alias("ids"))
        .where(F.size("ids") > 1)
    )
    overflow_agg = [
        F.coalesce(F.sum((F.size("ids") > max_bucket).cast("long")), F.lit(0)).alias(
            "n_dropped_buckets"
        ),
        F.max(F.size("ids")).alias("max_bucket_size"),
    ]

    def _overflow_msg(n_dropped, largest):
        return (
            f"LSH bucket cap dropped {n_dropped} bucket(s) larger than "
            f"{max_bucket} ids (largest seen: {largest}); "
            "near-duplicate pairs inside them are NOT emitted. Raise "
            "max_bucket or remove degenerate (empty/boilerplate) "
            "documents upstream."
        )

    if on_overflow == "warn":
        from pyspark.sql import Observation

        obs = Observation()
        buckets = buckets.observe(obs, *overflow_agg)

        _state = {"done": False}

        def _check_overflow():
            """Read the observation and surface a drop. Call ONLY after an
            action over the observed plan has completed (``Observation.get``
            blocks otherwise). Idempotent; runs on the caller's thread.

            AQE quirk: when EVERY bucket overflows the result is empty, and
            AQE's empty-relation propagation replaces the subtree INCLUDING
            the CollectMetrics node — the observation then completes with a
            schemaless empty row and ``obs.get`` raises JVM-side. That empty
            case is precisely when the warning matters most, so on a failed
            read we fall back to one explicit aggregate job over the bucket
            stats (rare path; normal runs cost zero extra jobs)."""
            if _state["done"]:
                return
            _state["done"] = True
            try:
                m = obs.get  # non-blocking: the action just completed
            except Exception:
                row = overflow_stats.first()
                m = row.asDict() if row is not None else {}
            if m.get("n_dropped_buckets"):
                import warnings as _warnings

                msg = _overflow_msg(m["n_dropped_buckets"], m.get("max_bucket_size"))
                _warnings.warn(msg, RuntimeWarning, stacklevel=3)
                _log.warning(msg)
    elif on_overflow == "error":
        row = buckets.agg(*overflow_agg).first()
        if row["n_dropped_buckets"]:
            raise ValueError(_overflow_msg(row["n_dropped_buckets"], row["max_bucket_size"]))
    elif on_overflow != "lazy":
        raise ValueError(f"on_overflow must be 'warn', 'error' or 'lazy', got {on_overflow!r}")
    overflow_stats = buckets.agg(*overflow_agg)
    out = (
        buckets.where(F.size("ids") <= max_bucket)
        .select(
            F.explode(
                F.expr(
                    "flatten(transform(ids, (x, i) -> "
                    "transform(slice(ids, i + 2, size(ids) - i - 1), y -> struct(x AS id_a, y AS id_b))))"
                )
            ).alias("p")
        )
        .select("p.id_a", "p.id_b")
        .distinct()
    )
    out._lsh_overflow = overflow_stats
    if on_overflow == "warn":
        # Wrap the blocking action methods on THIS instance so the overflow
        # check runs synchronously after the caller's own action. Instance
        # attributes shadow class methods, so this is version-proof and adds
        # zero cost to the job itself. Derived frames (transformations return
        # plain DataFrames) still fulfil the observation on their first
        # action; such consumers call `_lsh_overflow_check()` themselves.
        def _wrap(name):
            orig = getattr(out, name)

            def wrapper(*a, **k):
                res = orig(*a, **k)
                _check_overflow()
                return res

            wrapper.__name__ = name
            setattr(out, name, wrapper)

        for _name in ("collect", "count", "toPandas", "foreach", "foreachPartition", "show"):
            _wrap(_name)
        out._lsh_overflow_check = _check_overflow
    return out


def lsh_verified_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 16,
    bands: int = 8,
    shingle_n: int = 3,
    threshold: float = 0.5,
    max_bucket: int | None = None,
    on_overflow: str = "warn",
) -> DataFrame:
    """Two-stage fuzzy dedup: MinHash-LSH candidate generation (recall
    stage — bucketed, never all-pairs) followed by EXACT n-gram Jaccard
    computed ONLY on the candidate set (precision stage), keeping pairs at
    or above ``threshold``: ``(id_a, id_b, jaccard)``.

    This is the production shape at 100 TB: ``ngram_jaccard_pairs`` joins
    every pair of documents sharing any shingle (quadratic in per-shingle
    document frequency), while here the exact computation touches only the
    LSH candidates — a set sized by true near-duplicates, not by corpus
    scale. False positives from banding are removed exactly; false
    negatives are bounded by the (num_hashes, bands) S-curve.

    Scale shape: the candidate pairs join the per-document shingle sets on
    id (two hash joins keyed by doc id); the intersection/union runs as an
    array expression inside codegen — no UDF, no re-shuffle of the corpus.

    r14 note: an r13 variant eagerly localCheckpointed the per-doc shingle
    ARRAYS and derived signatures + both verify sides from the checkpoint.
    It measured ~2× SLOWER at sf0.1 (driver bench 2.97 s → 5.69 s, both
    core counts; same box min-of-4 4.54 s → 2.6 s after this revert) —
    materializing fat array rows (every distinct shingle per doc) costs
    more than re-running the cheap codegen tokenize+shingle projection,
    exactly the trade fuzzy_decontaminate measured (2.59 s → 6.37 s) and
    reverted in r13. Kept the lazy two-subtree form; it is also the
    scale-safe one (no O(corpus) executor-storage materialization, lineage
    intact)."""
    cand = minhash_lsh_pairs(
        df, id_col, text_col, num_hashes, bands, shingle_n, max_bucket, on_overflow
    )
    sets = (
        shingles(df, id_col, text_col, shingle_n)
        .groupBy(id_col)
        .agg(F.collect_set("shingle").alias("sset"))
    )
    a = sets.select(F.col(id_col).alias("id_a"), F.col("sset").alias("set_a"))
    b = sets.select(F.col(id_col).alias("id_b"), F.col("sset").alias("set_b"))
    return (
        cand.join(a, "id_a")
        .join(b, "id_b")
        .withColumn("inter", F.size(F.array_intersect("set_a", "set_b")))
        .withColumn(
            "jaccard",
            F.round(
                F.col("inter") / (F.size("set_a") + F.size("set_b") - F.col("inter")), 6
            ),
        )
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def incremental_minhash_pairs(
    corpus_sigs: DataFrame,
    new_docs: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 16,
    bands: int = 8,
    shingle_n: int = 3,
) -> DataFrame:
    """Dedup an INCREMENT against an already-signed corpus without touching
    the corpus text: ``(new_id, corpus_id)`` candidate pairs between
    ``new_docs`` and ``corpus_sigs`` (a stored signature table as produced
    by :func:`minhash_signature` — (id, mh_0..mh_{k-1})).

    The daily-ingest shape for a 100 TB training corpus: signatures are
    computed once per document EVER (idempotent, stored in an Iceberg
    table alongside the corpus; see tests for the snapshot-range wiring),
    and each new batch costs O(|batch|) signature work plus a join keyed
    by (band, band_signature) that touches only colliding buckets — not a
    corpus re-scan. New-vs-new duplicates inside the batch are the cheap
    classic path (:func:`minhash_lsh_pairs` on the batch); this function
    covers new-vs-corpus.

    Returns distinct (new_id, corpus_id); both sides' ids must be disjoint
    (enforce upstream — e.g. corpus ids < batch ids)."""
    new_sigs = minhash_signature(new_docs, id_col, text_col, num_hashes, shingle_n)
    nb = _banded(new_sigs, id_col, "new_id", num_hashes, bands)
    cb = _banded(corpus_sigs, id_col, "corpus_id", num_hashes, bands)
    return (
        nb.join(cb, ["band_idx", "band_sig"])
        .select("new_id", "corpus_id")
        .distinct()
    )


def simhash(df: DataFrame, id_col: str, text_col: str, bits: int = 32) -> DataFrame:
    """Per-doc SimHash fingerprint: for each bit position j, sum +1/-1 over
    token hashes, take the sign. One explode + one aggregate; the bit loop
    is column expressions (stays in codegen).

    r13 note: a per-row ``aggregate``-fold form (zero shuffle) was
    measured ~40% slower at sf0.1 — higher-order-function lambdas are
    interpreted, while the explode + 32 conditional SUMs run inside
    whole-stage codegen with map-side partial aggregation keeping the
    shuffle fingerprint-sized. Kept the codegen form."""
    toks = tokens(F.lower(F.col(text_col)))
    exploded = ensure_min_parallelism(df).select(F.col(id_col), F.explode(toks).alias("tok"))
    h = F.expr(md5h32_spark_sql("tok"))
    hashed = exploded.select(id_col, h.alias("th"))
    bit_sums = [
        F.sum(
            F.when(F.shiftrightunsigned(F.col("th"), j).bitwiseAND(F.lit(1)) == 1, F.lit(1)).otherwise(
                F.lit(-1)
            )
        ).alias(f"s_{j}")
        for j in range(bits)
    ]
    summed = hashed.groupBy(id_col).agg(*bit_sums)
    fp = None
    for j in range(bits):
        bit = F.when(F.col(f"s_{j}") > 0, F.lit(1 << j).cast("long")).otherwise(F.lit(0).cast("long"))
        fp = bit if fp is None else (fp + bit)
    return summed.select(F.col(id_col), fp.alias("simhash"))


def simhash_neardup_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    bits: int = 32,
    max_hamming: int = 3,
    max_bucket: int | None = None,
    on_overflow: str = "warn",
) -> DataFrame:
    """Pairs of documents whose SimHash fingerprints are within
    ``max_hamming`` bits.

    Scale shape (pigeonhole banding): split the fingerprint into
    ``max_hamming + 1`` disjoint bit-bands — any pair at distance ≤ k agrees
    EXACTLY on at least one band — so candidates come from equality joins on
    (band_idx, band_value) buckets (one shuffle, via _bucket_pairs), and only
    candidates pay the bit_count(xor) verification. Never all-pairs."""
    fp = simhash(df, id_col, text_col, bits)
    n_bands = max_hamming + 1
    width = bits // n_bands
    band_structs = []
    for b in range(n_bands):
        lo = b * width
        w = width if b < n_bands - 1 else bits - lo  # last band absorbs remainder
        band_val = F.shiftrightunsigned(F.col("simhash"), lo).bitwiseAND(F.lit((1 << w) - 1))
        band_structs.append(F.struct(F.lit(b).alias("band_idx"), band_val.cast("string").alias("band_sig")))
    stacked = fp.select(id_col, F.explode(F.array(*band_structs)).alias("bs")).select(
        id_col, "bs.band_idx", "bs.band_sig"
    )
    cand = _bucket_pairs(stacked, id_col, max_bucket, on_overflow)
    fa = fp.select(F.col(id_col).alias("id_a"), F.col("simhash").alias("_fa"))
    fb = fp.select(F.col(id_col).alias("id_b"), F.col("simhash").alias("_fb"))
    return (
        cand.join(fa, "id_a")
        .join(fb, "id_b")
        .withColumn("hamming", F.expr("bit_count(_fa ^ _fb)"))
        .where(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iterations: int = 50,
    driver_finish_edges: int = 1_000_000,
) -> DataFrame:
    """Label every node of an undirected edge list with the minimum node id
    reachable from it: ``(node, component)``.

    This is the missing half of pair-producing dedup (minhash_lsh_pairs /
    simhash_neardup_pairs give EDGES; corpus curation needs CLUSTERS with one
    canonical doc each — A~B and B~C must collapse to one cluster even though
    A~C was never emitted).

    Algorithm: alternating large-star / small-star (Kiveris et al.,
    "Connected Components in MapReduce and Beyond", 2014) — converges in
    O(log²  n) rounds on any graph (O(log n) in practice), unlike naive
    min-label propagation whose round count is the graph DIAMETER (a 10^6-doc
    near-dup chain would need 10^6 shuffles; this needs ~20).

    Scale shape per round: one groupBy(node) shuffle + an in-group array
    expansion (stays in codegen — no UDF). Lineage is truncated every round
    with ``localCheckpoint`` so the plan doesn't grow with iterations. Max
    in-group width is the node's CURRENT degree; large-star routes high-degree
    mass to component minima, which is exactly the skew mitigation the paper
    proves. Convergence = (count, hash-sum) checksum of the edge set stable.

    Hybrid finish: once the (monotonically non-growing) edge set fits under
    ``driver_finish_edges``, the remainder is solved with an exact driver-side
    union-find (one collect, O(E α(E))) instead of paying ~3 more cluster
    round-trips — same results, and the standard head-distributed /
    tail-local split for iterative graph algorithms. Near-dup graphs are tiny
    relative to the corpus, so dedup workloads usually take this path on the
    first round; a 100 TB corpus with a pathological duplicate graph still
    converges through the star rounds.
    """
    F_u, F_v = F.col("u"), F.col("v")
    edges = (
        pairs.select(
            F.least(F.col(id_a), F.col(id_b)).alias("v"),
            F.greatest(F.col(id_a), F.col(id_b)).alias("u"),
        )
        .where(F_u != F_v)
        .distinct()
    )

    def _checksum(e: DataFrame) -> tuple:
        row = e.agg(
            F.count("*").alias("n"),
            F.coalesce(F.sum(F.hash("u", "v").cast("long")), F.lit(0)).alias("h"),
        ).collect()[0]
        return (row["n"], row["h"])

    def _large_star(e: DataFrame) -> DataFrame:
        # undirected neighborhoods; for each u connect every LARGER neighbor
        # to min(Γ(u) ∪ {u})
        sym = e.select("u", "v").union(e.select(F_v.alias("u"), F_u.alias("v")))
        return (
            sym.groupBy("u")
            .agg(F.collect_set("v").alias("ns"))
            .select(
                F.least(F.array_min("ns"), F_u).alias("m"),
                F.explode(F.expr("filter(ns, x -> x > u)")).alias("big"),
            )
            .where(F.col("big") != F.col("m"))
            .select(F.col("big").alias("u"), F.col("m").alias("v"))
            .distinct()
        )

    def _small_star(e: DataFrame) -> DataFrame:
        # edges oriented larger→smaller; connect u and all its smaller
        # neighbors to the minimum of the group
        return (
            e.select(F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v"))
            .groupBy("u")
            .agg(F.collect_set("v").alias("ns"))
            .select(
                F.array_min("ns").alias("m"),
                F.explode(F.expr("array_append(ns, u)")).alias("n"),
            )
            .where(F.col("n") != F.col("m"))
            .select(F.col("n").alias("u"), F.col("m").alias("v"))
            .distinct()
        )

    def _driver_union_find(rows, e: DataFrame) -> DataFrame:
        parent: dict = {}

        def find(x):
            r = x
            while parent.get(r, r) != r:
                r = parent[r]
            while parent.get(x, x) != x:  # path compression
                parent[x], x = r, parent[x]
            return r

        for r in rows:
            ra, rb = find(r[0]), find(r[1])
            if ra != rb:
                # union-by-min keeps every root the component minimum
                lo, hi = (ra, rb) if ra < rb else (rb, ra)
                parent[hi] = lo
        nodes = {x for r in rows for x in (r[0], r[1])}
        out = [(x, find(x)) for x in sorted(nodes)]
        spark = e.sparkSession
        schema = e.select(F_u.alias("node"), F_v.alias("component")).schema
        return local_rows_df(spark, out, schema)

    # Driver-finish probe FIRST (r14): near-dup graphs are tiny relative to
    # the corpus, so the union-find path is the common one — take it with
    # ONE bounded collect over the lazy edge plan (the pipeline's shuffle
    # stages run once; the limit only bounds the driver transfer, and a
    # graph over the cap stops collecting at cap+1 rows). The previous
    # shape paid an eager localCheckpoint job + a count() + a collect()
    # for the same information. Only a genuinely large graph materializes
    # the checkpoint and enters the star rounds.
    probe = edges.limit(driver_finish_edges + 1).collect()
    # the collect is the first action over the (possibly observed) pairs
    # plan — surface any LSH bucket-cap drop on this thread now
    _overflow_check = getattr(pairs, "_lsh_overflow_check", None)
    if _overflow_check is not None:
        _overflow_check()
    if len(probe) <= driver_finish_edges:
        return _driver_union_find(probe, edges)
    del probe
    edges = edges.localCheckpoint()
    # one action per round: the convergence checksum already carries the
    # edge count, so the next round's driver-finish size test reuses it
    # instead of running a separate count() job (VERDICT r3 plan audit)
    prev = None
    n_edges = edges.count()
    for _ in range(max_iterations):
        if n_edges <= driver_finish_edges:
            return _driver_union_find(edges.collect(), edges)
        edges = _small_star(_large_star(edges)).localCheckpoint()
        cur = _checksum(edges)
        if cur == prev:
            break
        prev = cur
        n_edges = cur[0]
    # converged: every edge is (node, component-min) — a star per component
    roots = edges.select(F_v.alias("node"), F_v.alias("component")).distinct()
    return edges.select(F_u.alias("node"), F_v.alias("component")).union(roots).distinct()


def dedup_clusters(
    df: DataFrame,
    id_col: str,
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    score_col: str | None = None,
) -> DataFrame:
    """Assign EVERY document a duplicate-cluster id (min doc id of its
    connected component; singletons are their own cluster) and flag the one
    canonical doc to keep: ``(id, cluster_id, is_canonical)``.

    Canonical selection: with no ``score_col`` the cluster minimum id (free —
    the component label IS the min id). With ``score_col`` the cluster's
    HIGHEST-scoring doc wins, ties broken by min id — the curation choice
    when near-dup clusters mix a full document with its truncated or
    boilerplate-wrapped variants and "keep the first id seen" would keep the
    worst one. Deterministic regardless of partitioning.

    ``df.where('is_canonical')`` is the deduplicated corpus. The components
    DataFrame is tiny relative to the corpus (only docs appearing in a pair),
    so the label join broadcasts; score-based selection adds one
    row_number window partitioned by cluster_id (a single sort shuffle —
    singleton clusters dominate real corpora, so partitions stay balanced)."""
    comp = connected_components(pairs, id_a, id_b).withColumnRenamed("node", id_col)
    cols = [id_col] if score_col is None else [id_col, score_col]
    labeled = (
        df.select(*cols)
        .join(F.broadcast(comp), id_col, "left")
        .withColumn("cluster_id", F.coalesce(F.col("component"), F.col(id_col)))
        .drop("component")
    )
    if score_col is None:
        return labeled.select(
            id_col, "cluster_id", (F.col(id_col) == F.col("cluster_id")).alias("is_canonical")
        )
    from pyspark.sql import Window

    w = Window.partitionBy("cluster_id").orderBy(F.col(score_col).desc(), F.col(id_col).asc())
    return labeled.select(
        id_col, "cluster_id", (F.row_number().over(w) == 1).alias("is_canonical")
    )


def embedding_neardup_pairs(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float = 0.95,
    max_broadcast_rows: int = 1_000_000,
    n_blocks: int = 16,
    max_broadcast_bytes: int = 512 * 1024 * 1024,
) -> DataFrame:
    """All pairs with cosine ≥ threshold. Two exact tiers, auto-routed by
    corpus size **in bytes** (rows × dim × 8 — a row count alone is
    dim-blind: 1M rows is ~0.5 GB at dim 64 but 12-32 GB at production
    embedding dims 1536-4096, which would OOM the driver and every
    executor):

    * corpus matrix ≤ ``max_broadcast_bytes`` (and ≤ ``max_broadcast_rows``):
      block-nested-loop — the corpus matrix is broadcast once and each Arrow
      batch is multiplied against it with one BLAS matmul inside
      ``mapInPandas`` (dense linear algebra is the one hot path where the
      vectorized-pandas route beats built-ins).
    * larger corpora: **blocked all-pairs** (_embedding_neardup_blocked) —
      no driver collect, no corpus broadcast: rows are routed to block-pair
      groups and each group does one BLAS matmul under ``applyInPandas``.
      Exactly the same output, distributed O(N²/B²) tasks.

    For sub-quadratic *approximate* matching at extreme scale use
    similarity.cosine_lsh_candidates to generate candidates instead.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    spark = df.sparkSession
    src = df.select(F.col(id_col).alias("_id"), F.col(vec_col).cast("array<double>").alias("_v"))
    # byte-budget routing: probe the vector dim from one row, convert the
    # byte budget into a row cap, then limit(cap+1).count() lets Spark stop
    # scanning once the cap is exceeded instead of counting the whole corpus
    probe = src.select(F.size("_v").alias("d")).first()
    if probe is None:  # empty corpus → empty pairs, either tier works
        dim = 1
    else:
        dim = max(1, probe["d"] or 1)
    row_cap = min(max_broadcast_rows, max(1, max_broadcast_bytes // (dim * 8)))
    if src.limit(row_cap + 1).count() > row_cap:
        return _embedding_neardup_blocked(src, df.schema[id_col].dataType, threshold, n_blocks)
    pdf = src.toPandas()
    ids_all = pdf["_id"].to_numpy()
    mat_all = np.vstack(pdf["_v"].to_numpy())
    norms_all = np.linalg.norm(mat_all, axis=1)
    bc = spark.sparkContext.broadcast((ids_all, mat_all, norms_all))

    id_type = df.schema[id_col].dataType
    out_schema = T.StructType(
        [
            T.StructField("id_a", id_type, True),
            T.StructField("id_b", id_type, True),
            T.StructField("cosine", T.DoubleType(), True),
        ]
    )

    def gen(batches):
        c_ids, c_mat, c_norms = bc.value
        for b in batches:
            if len(b) == 0:
                continue
            bids = b["_id"].to_numpy()
            bmat = np.vstack(b["_v"].to_numpy())
            bnorms = np.linalg.norm(bmat, axis=1)
            with np.errstate(divide="ignore", invalid="ignore"):
                sims = (bmat @ c_mat.T) / np.outer(bnorms, c_norms)
            # filter on the raw value (matches the oracle), round for output
            mask = (sims >= threshold) & (bids[:, None] < c_ids[None, :])
            ii, jj = np.nonzero(mask)
            yield pd.DataFrame(
                {"id_a": bids[ii], "id_b": c_ids[jj], "cosine": np.round(sims[ii, jj], 6)}
            )

    n_parts = max(2, spark.sparkContext.defaultParallelism)
    return src.repartition(n_parts).mapInPandas(gen, out_schema)


def _embedding_neardup_blocked(
    src: DataFrame, id_type, threshold: float, n_blocks: int
) -> DataFrame:
    """Exact distributed all-pairs cosine without any driver collect or
    corpus broadcast.

    Every row gets a deterministic block ``b = md5h32(id) % B``; a row is
    replicated to the B block-pair groups it participates in
    (``(min(b,k), max(b,k))`` for k in 0..B-1), so an unordered pair of rows
    meets in EXACTLY one group. One shuffle of N·B rows into B·(B+1)/2
    groups; each group multiplies its two sides with one BLAS matmul under
    ``applyInPandas``. Group memory is ~2N/B vectors — pick B so a block
    fits an executor; task count B² spreads across the cluster."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    from iceberg_rust_custom_spark.functions.hashing import md5h32_spark_sql

    out_schema = T.StructType(
        [
            T.StructField("id_a", id_type, True),
            T.StructField("id_b", id_type, True),
            T.StructField("cosine", T.DoubleType(), True),
        ]
    )
    blk = F.expr(f"{md5h32_spark_sql('cast(_id AS STRING)')} % {n_blocks}").cast("int")
    exploded = (
        src.withColumn("_blk", blk)
        .withColumn("_k", F.explode(F.sequence(F.lit(0), F.lit(n_blocks - 1))))
        .select(
            "_id",
            "_v",
            "_blk",
            F.least("_blk", "_k").alias("_bi"),
            F.greatest("_blk", "_k").alias("_bj"),
        )
    )

    def compute(key, pdf: "pd.DataFrame") -> "pd.DataFrame":
        bi, bj = key
        ids = pdf["_id"].to_numpy()
        mat = np.vstack(pdf["_v"].to_numpy())
        norms = np.linalg.norm(mat, axis=1)
        with np.errstate(divide="ignore", invalid="ignore"):
            if bi == bj:
                sims = (mat @ mat.T) / np.outer(norms, norms)
                mask = (sims >= threshold) & (ids[:, None] < ids[None, :])
                ii, jj = np.nonzero(mask)
                return pd.DataFrame(
                    {"id_a": ids[ii], "id_b": ids[jj], "cosine": np.round(sims[ii, jj], 6)}
                )
            side_i = pdf["_blk"].to_numpy() == bi
            ai, mi, ni = ids[side_i], mat[side_i], norms[side_i]
            aj, mj, nj = ids[~side_i], mat[~side_i], norms[~side_i]
            if len(ai) == 0 or len(aj) == 0:
                return pd.DataFrame({"id_a": [], "id_b": [], "cosine": []})
            sims = (mi @ mj.T) / np.outer(ni, nj)
            mask = sims >= threshold
            ii, jj = np.nonzero(mask)
            a, b = ai[ii], aj[jj]
            lo, hi = np.minimum(a, b), np.maximum(a, b)
            return pd.DataFrame({"id_a": lo, "id_b": hi, "cosine": np.round(sims[ii, jj], 6)})

    return exploded.groupBy("_bi", "_bj").applyInPandas(compute, out_schema)


def fuzzy_decontaminate(
    train: DataFrame,
    test: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 16,
    bands: int = 8,
    shingle_n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Fuzzy train/test decontamination: drop every TRAIN document that is
    a verified near-duplicate (exact n-gram Jaccard ≥ ``threshold``) of
    ANY test/benchmark document. The n-gram-overlap guard
    (``text.decontaminate``) catches verbatim leakage; this catches
    lightly-edited leakage — whitespace/punctuation tweaks, sentence
    reordering — the documented failure mode of exact-match filters
    (Lee et al. 2022 §6).

    Scale shape (the production one): candidates come from MinHash-LSH
    banding BETWEEN the two corpora (``incremental_minhash_pairs`` — the
    join touches only colliding (band, signature) buckets, O(train) +
    O(test) signature work, never train×test); exact Jaccard runs only on
    that candidate set; contaminated ids anti-join away. Test sets are
    tiny next to a 100 TB corpus, so the candidate set is bounded by true
    near-dups of the benchmark, not corpus scale.

    Returns the surviving TRAIN rows (all columns)."""
    # r13 measurement note: a shared-checkpoint shape (per-doc shingle
    # ARRAYS checkpointed once, signatures and exact-verify derived from
    # them) measured 2.5x SLOWER at sf0.1 (2.59 s -> 6.37 s min-of-4):
    # materializing fat array rows costs more than re-running the cheap
    # tokenize+shingle projection, and the codegen aggregates below absorb
    # the exploded stream map-side. Kept the two-aggregate structure.
    test_sigs = minhash_signature(test, id_col, text_col, num_hashes, shingle_n)
    cand = incremental_minhash_pairs(
        test_sigs, train, id_col, text_col, num_hashes, bands, shingle_n
    ).withColumnRenamed("new_id", "train_id").withColumnRenamed("corpus_id", "test_id")

    # r14 scale path (guide §3.2 semi-join pre-filter): the straight
    # collect_set below shuffles EVERY train shingle, but only candidate
    # ids are ever joined — candidates are bounded by true near-dups of
    # the (tiny) test set, not corpus size. Past the size cap, materialize
    # the pair-sized candidate set once and semi-join its ids into both
    # shingle aggregates so the collect_set shuffle carries candidates
    # only. Below the cap the straight aggregates win (interleaved A/B at
    # sf0.1: 2.14 s vs 2.36 s min-of-5 — the eager candidate job costs
    # more than the small shuffle saves), so the bench keeps them.
    import os as _os

    from iceberg_rust_custom_spark.operators.util import (
        DEFAULT_MATERIALIZE_CAP,
        MATERIALIZE_CAP_ENV,
    )

    cap = int(_os.environ.get(MATERIALIZE_CAP_ENV, DEFAULT_MATERIALIZE_CAP))
    try:
        big_train = cap > 0 and (
            int(train._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()) > cap
        )
    except Exception:
        big_train = False
    t_src = shingles(train, id_col, text_col, shingle_n)
    b_src = shingles(test, id_col, text_col, shingle_n)
    if big_train:
        cand = cand.localCheckpoint()  # pair-sized, never corpus-sized
        t_src = t_src.join(
            F.broadcast(cand.select(F.col("train_id").alias(id_col)).distinct()),
            id_col,
            "left_semi",
        )
        b_src = b_src.join(
            F.broadcast(cand.select(F.col("test_id").alias(id_col)).distinct()),
            id_col,
            "left_semi",
        )
    t_sets = (
        t_src.groupBy(id_col)
        .agg(F.collect_set("shingle").alias("set_a"))
        .select(F.col(id_col).alias("train_id"), "set_a")
    )
    b_sets = (
        b_src.groupBy(id_col)
        .agg(F.collect_set("shingle").alias("set_b"))
        .select(F.col(id_col).alias("test_id"), "set_b")
    )
    contaminated = (
        cand.join(t_sets, "train_id")
        .join(b_sets, "test_id")
        .withColumn("inter", F.size(F.array_intersect("set_a", "set_b")))
        .withColumn(
            "jaccard",
            F.col("inter") / (F.size("set_a") + F.size("set_b") - F.col("inter")),
        )
        .where(F.col("jaccard") >= threshold)
        .select(F.col("train_id").alias(id_col))
        .distinct()
    )
    return train.join(contaminated, id_col, "left_anti")
