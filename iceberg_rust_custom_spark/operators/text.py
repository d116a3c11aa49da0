"""Text analysis operators: tokenization, quality scoring, language ID,
document fingerprinting.

All JVM-side (built-in pyspark.sql.functions only — no Python in the hot
path), embarrassingly parallel (no shuffle: every feature is a per-row
projection), and deterministic so a SQL oracle can verify them exactly.
At 100 TB these run at full scan speed inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from iceberg_rust_custom_spark.operators.util import materialize_if_small

from iceberg_rust_custom_spark.functions.hashing import md5h32_spark_sql

TOKEN_SPLIT_RE = r"\s+"

# small deterministic stopword sets per language (public common words)
LANG_STOPWORDS = {
    "en": ["the", "and", "of", "to", "is", "a"],
    "de": ["der", "die", "und", "das", "ist", "nicht"],
    "fr": ["le", "la", "et", "les", "des", "est"],
    "es": ["el", "la", "los", "que", "es", "de"],
}
CJK_RE = r"[一-鿿]"


def tokens(col: Column) -> Column:
    """Whitespace tokens, empties removed (identical semantics to the
    DuckDB oracle's regexp_split_to_array + filter)."""
    return F.filter(F.split(col, TOKEN_SPLIT_RE), lambda t: t != F.lit(""))


def token_count(col: Column) -> Column:
    return F.size(tokens(col))


def bpe_ish_token_count(col: Column) -> Column:
    """Sub-word-ish token count: word pieces + digits + punctuation, the
    classic BPE-approximating regex (public GPT-2 style pattern, simplified
    to engine-portable form)."""
    return F.size(
        F.filter(
            F.split(col, r"([^A-Za-z0-9一-鿿]+)"),
            lambda t: t != F.lit(""),
        )
    )


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Length / punctuation / stopword-density features + a composite
    quality score. Deterministic; rounded to 6 dp for oracle comparison."""
    c = F.col(text_col)
    n_chars = F.length(c)
    n_tokens = token_count(c)
    n_punct = F.length(c) - F.length(F.regexp_replace(c, r"[\.,;:!\?]", ""))
    stop_re = r"\b(" + "|".join(LANG_STOPWORDS["en"]) + r")\b"
    n_stop = F.regexp_count(F.lower(c), F.lit(stop_re))
    mean_word_len = F.when(n_tokens > 0, (F.length(F.regexp_replace(c, r"\s+", ""))) / n_tokens).otherwise(
        F.lit(0.0)
    )
    punct_ratio = F.when(n_chars > 0, n_punct / n_chars).otherwise(F.lit(0.0))
    stop_ratio = F.when(n_tokens > 0, n_stop / n_tokens).otherwise(F.lit(0.0))
    score = (
        F.least(n_tokens / F.lit(100.0), F.lit(1.0)) * F.lit(0.4)
        + F.least(stop_ratio * F.lit(5.0), F.lit(1.0)) * F.lit(0.4)
        + (F.lit(1.0) - F.least(punct_ratio * F.lit(10.0), F.lit(1.0))) * F.lit(0.2)
    )
    return df.select(
        "*",
        n_chars.alias("q_chars"),
        n_tokens.alias("q_tokens"),
        F.round(mean_word_len, 6).alias("q_mean_word_len"),
        F.round(punct_ratio, 6).alias("q_punct_ratio"),
        F.round(stop_ratio, 6).alias("q_stop_ratio"),
        F.round(score, 6).alias("q_score"),
    )


GOPHER_TOP_NGRAM_MAX = {2: 0.20, 3: 0.18, 4: 0.16}
GOPHER_DUP_NGRAM_MAX = {5: 0.15, 6: 0.14, 7: 0.13, 8: 0.12}


def repetition_signals(df: DataFrame, id_col: str, text_col: str = "text") -> DataFrame:
    """Gopher-style repetition filters (Rae et al. 2021, table A1 — public):
    per document, the fraction of duplicate lines, the fraction of characters
    in duplicate lines, the character share of the single most frequent word
    n-gram (n=2..4), and the character share of all repeated n-grams
    (n=5..8), plus a pass/fail flag against the published thresholds.

    Variant notes (documented, engine-portable): n-gram character mass is
    ``count * length(gram)`` over ``length(text)`` — overlapping spans are
    counted per occurrence rather than de-overlapped (the common open
    reproduction), and fractions are clamped to 1.

    Scale shape: ONE explode per branch (lines; all n-gram orders are
    stacked into a single explode), shuffles keyed by (doc, token-group) then
    doc — partial aggregation absorbs the fan-out map-side. No UDFs.

    r13 note: a per-row sorted-run fold form (zero shuffle) was tried
    and REVERTED: higher-order-function lambdas evaluate interpreted
    (outside whole-stage codegen), and corpus_curation regressed 2x
    (1.96 s -> 3.95 s min-of-4 at sf0.1) with the fold form. The
    explode + (doc, n, gram) hash aggregate stays in codegen and its
    shuffle is absorbed map-side by partial aggregation.
    """
    c = F.col(text_col)
    top_ns, dup_ns = sorted(GOPHER_TOP_NGRAM_MAX), sorted(GOPHER_DUP_NGRAM_MAX)
    all_ns = top_ns + dup_ns

    base = df.select(F.col(id_col), F.length(c).alias("_chars"), c.alias("_t"))

    # ---- duplicate-line signals -----------------------------------------
    lines = F.filter(
        F.transform(F.split(F.col("_t"), "\n"), lambda x: F.trim(x)), lambda x: x != F.lit("")
    )
    line_counts = (
        base.select(id_col, F.explode(lines).alias("_line"))
        .groupBy(id_col, "_line")
        .agg(F.count("*").alias("_cnt"))
    )
    dup = F.when(F.col("_cnt") > 1, F.col("_cnt")).otherwise(F.lit(0))
    line_stats = line_counts.groupBy(id_col).agg(
        (F.sum(dup) / F.sum("_cnt")).alias("_dlf"),
        (
            F.sum(dup * F.length("_line"))
            / F.sum(F.col("_cnt") * F.length("_line"))
        ).alias("_dlcf"),
    )

    # ---- n-gram signals: one explode for every order --------------------
    toks = tokens(F.lower(F.col("_t")))

    # NB: F.transform feeds (element, index) to ANY two-parameter lambda, so
    # `lambda x, n=n:` silently receives the array index as n — single-arg
    # closures from factories are the only safe way to bind the loop var.
    def _gram(n):
        return lambda i: F.concat_ws(" ", F.slice(toks, i, n))

    def _tag(n):
        return lambda g: F.struct(F.lit(n).alias("n"), g.alias("gram"))

    gram_arrays = []
    for n in all_ns:
        grams = F.when(
            F.size(toks) >= n,
            F.transform(F.sequence(F.lit(1), F.size(toks) - n + 1), _gram(n)),
        ).otherwise(F.array().cast("array<string>"))
        gram_arrays.append(F.transform(grams, _tag(n)))
    gram_counts = (
        base.select(id_col, "_chars", F.explode(F.flatten(F.array(*gram_arrays))).alias("_g"))
        .select(id_col, "_chars", F.col("_g.n").alias("_n"), F.col("_g.gram").alias("_gram"))
        .groupBy(id_col, "_n", "_gram")
        .agg(F.count("*").alias("_cnt"), F.first("_chars").alias("_chars"))
    )
    mass = F.col("_cnt") * F.length("_gram")
    per_n = gram_counts.groupBy(id_col, "_n").agg(
        (F.max(mass) / F.first("_chars")).alias("_top"),
        (F.sum(F.when(F.col("_cnt") >= 2, mass).otherwise(F.lit(0))) / F.first("_chars")).alias(
            "_dup"
        ),
    )
    wide = per_n.groupBy(id_col).agg(
        *[F.max(F.when(F.col("_n") == n, F.col("_top"))).alias(f"_top_{n}") for n in top_ns],
        *[F.max(F.when(F.col("_n") == n, F.col("_dup"))).alias(f"_dup_{n}") for n in dup_ns],
    )

    out = (
        base.select(id_col)
        .join(line_stats, id_col, "left")
        .join(wide, id_col, "left")
    )
    frac = lambda col: F.round(F.least(F.coalesce(col, F.lit(0.0)), F.lit(1.0)), 6)
    passing = (F.coalesce(F.col("_dlf"), F.lit(0.0)) <= 0.30) & (
        F.coalesce(F.col("_dlcf"), F.lit(0.0)) <= 0.20
    )
    for n in top_ns:
        passing = passing & (
            F.least(F.coalesce(F.col(f"_top_{n}"), F.lit(0.0)), F.lit(1.0))
            <= GOPHER_TOP_NGRAM_MAX[n]
        )
    for n in dup_ns:
        passing = passing & (
            F.least(F.coalesce(F.col(f"_dup_{n}"), F.lit(0.0)), F.lit(1.0))
            <= GOPHER_DUP_NGRAM_MAX[n]
        )
    return out.select(
        F.col(id_col),
        frac(F.col("_dlf")).alias("rep_dup_line_frac"),
        frac(F.col("_dlcf")).alias("rep_dup_line_char_frac"),
        *[frac(F.col(f"_top_{n}")).alias(f"rep_top_{n}gram_frac") for n in top_ns],
        *[frac(F.col(f"_dup_{n}")).alias(f"rep_dup_{n}gram_frac") for n in dup_ns],
        passing.alias("gopher_repetition_pass"),
    )


def language_id(df: DataFrame, text_col: str = "text", out_col: str = "lang_pred") -> DataFrame:
    """n-gram/stopword-heuristic language ID over {en,de,fr,es,zh}:
    CJK characters → zh, else the language with the highest stopword hit
    count (ties broken in a fixed order). Pure expressions; the DuckDB
    oracle reproduces the identical CASE chain."""
    c = F.lower(F.col(text_col))
    counts = {
        lang: F.regexp_count(c, F.lit(r"\b(" + "|".join(words) + r")\b"))
        for lang, words in LANG_STOPWORDS.items()
    }
    pred = (
        F.when(F.regexp_count(F.col(text_col), F.lit(CJK_RE)) > 0, F.lit("zh"))
        .when(
            (counts["en"] >= counts["de"]) & (counts["en"] >= counts["fr"]) & (counts["en"] >= counts["es"]),
            F.lit("en"),
        )
        .when((counts["de"] >= counts["fr"]) & (counts["de"] >= counts["es"]), F.lit("de"))
        .when(counts["fr"] >= counts["es"], F.lit("fr"))
        .otherwise(F.lit("es"))
    )
    return df.withColumn(out_col, pred)


def chunk_documents(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", chunk_tokens: int = 64, overlap: int = 8
) -> DataFrame:
    """Split documents into overlapping token-window chunks — the standard
    pre-tokenization step of a training-data pipeline. One row per chunk:
    (id, chunk_idx, chunk_text, n_tokens). Pure array expressions (explode
    over slice windows), no UDF; embarrassingly parallel."""
    if overlap >= chunk_tokens:
        raise ValueError("overlap must be smaller than chunk_tokens")
    stride = chunk_tokens - overlap
    toks = tokens(F.col(text_col))
    n = F.size(toks)
    # chunk starts: 1, 1+stride, 1+2*stride, ... while start <= max(n,1)
    n_chunks = F.greatest(F.ceil((n - F.lit(overlap)) / F.lit(stride)), F.lit(1)).cast("int")
    starts = F.sequence(F.lit(0), n_chunks - 1)
    return (
        df.select(
            F.col(id_col),
            toks.alias("_toks"),
            F.explode(starts).alias("chunk_idx"),
        )
        .select(
            id_col,
            "chunk_idx",
            F.concat_ws(" ", F.slice(F.col("_toks"), F.col("chunk_idx") * stride + 1, chunk_tokens)).alias(
                "chunk_text"
            ),
            F.least(
                F.size(F.col("_toks")) - F.col("chunk_idx") * stride, F.lit(chunk_tokens)
            ).alias("n_tokens"),
        )
        .where(F.col("n_tokens") > 0)
    )


REDACTION_PATTERNS = {
    # public, deterministic patterns — same regex syntax in Spark and DuckDB
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "long_number": r"\b[0-9]{7,}\b",
}


def redact_text(df: DataFrame, text_col: str = "text", out_col: str = "redacted") -> DataFrame:
    """Redact email-like and long-number spans (training-data hygiene).
    Chained regexp_replace — stays in codegen, full scan speed."""
    c = F.col(text_col)
    for tag, pat in REDACTION_PATTERNS.items():
        c = F.regexp_replace(c, pat, f"<{tag}>")
    return df.withColumn(out_col, c)


def fingerprint(df: DataFrame, text_col: str = "text", out_col: str = "fingerprint") -> DataFrame:
    """Document fingerprint: 32-bit hash of whitespace-normalized lowercase
    text (rolling-hash-equivalent content id; collision-checked at 32 bits
    per ~60k docs is fine, widen to two hashes at real scale)."""
    norm = f"lower(trim(regexp_replace({text_col}, '\\\\s+', ' ')))"
    return df.withColumn(out_col, F.expr(md5h32_spark_sql(norm)))


def vocabulary(df: DataFrame, text_col: str = "text", top_k: int = 1000) -> DataFrame:
    """Corpus vocabulary: top-k lowercase whitespace tokens by document
    frequency-weighted count — the tokenizer-training / stopword-mining
    primitive. One explode + one aggregate (map-side combine) + a top-k
    (TakeOrderedAndProject, no full sort). Deterministic tie-break
    (count desc, token asc) so results are engine-exact."""
    toks = tokens(F.lower(F.col(text_col)))
    return (
        df.select(F.explode(toks).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("n"))
        .orderBy(F.col("n").desc(), F.col("token").asc())
        .limit(top_k)
    )


def tfidf_top_terms(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    top_k: int = 5,
) -> DataFrame:
    """Per-document top-k TF-IDF terms — the classic relevance/keyword
    primitive for corpus curation and quality-weighted sampling.

    Shape (scale-conscious): one explode + groupBy(doc, term) with map-side
    combine (shuffle ∝ distinct doc-term pairs), a tiny groupBy(term) for
    document frequency, and a broadcast of the scalar corpus size. The
    per-doc top-k rank orders by integer (tf DESC, term ASC) so results are
    engine-exact; tfidf itself is rounded to 4 dp to absorb libm ln ulps.
    """
    toks = tokens(F.lower(F.col(text_col)))
    # r13 note: checkpointing tf to share it between docfreq and the
    # scoring join measured slightly SLOWER (1.10 s -> 1.20 s min-of-4 at
    # sf0.1) — the materialization costs more than re-running the codegen
    # explode+aggregate. Left as two subtree executions.
    tf = (
        df.select(F.col(id_col), F.explode(toks).alias("term"))
        .groupBy(id_col, "term")
        .agg(F.count("*").alias("tf"))
    )
    docfreq = tf.groupBy("term").agg(F.count("*").alias("doc_freq"))
    n_docs = df.select(F.count("*").alias("n_docs"))
    w = Window.partitionBy(id_col).orderBy(F.col("tf").desc(), F.col("term").asc())
    return (
        tf.join(docfreq, "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn("tfidf", F.round(F.col("tf") * F.log(F.col("n_docs") / F.col("doc_freq")), 4))
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= top_k)
        .select(id_col, "term", "tf", "doc_freq", "tfidf")
    )


def bm25_scores(
    df: DataFrame,
    query_terms: list,
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
    top_k: int = 50,
) -> DataFrame:
    """BM25 document scoring for a fixed term set (Robertson/Spärck Jones,
    public formula) — retrieval-style relevance ranking over the corpus.

    idf(t) = ln(1 + (N - df + 0.5)/(df + 0.5));
    score  = Σ_t idf·tf·(k1+1)/(tf + k1·(1 - b + b·dl/avgdl)).

    Shape: the query-term tf aggregate only keeps matching tokens (filter
    before shuffle), doc lengths are a per-row projection, avgdl/N are
    broadcast scalars. Deterministic top-k: (rounded score DESC, id ASC).
    """
    terms = sorted(set(t.lower() for t in query_terms))
    toks = tokens(F.lower(F.col(text_col)))
    dl = df.select(F.col(id_col), F.size(toks).alias("dl"))
    stats = dl.agg(
        F.count("*").alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    # r13: the query-term tf table is small (docs × |terms| upper bound) but
    # its subtree tokenizes the whole corpus — materialize once; the
    # docfreq aggregate and the scoring join then reuse it. r14: size-gated
    # like the other shared-stream materializations (the tf table is still
    # O(matching docs); at production scale stay lazy, lineage intact).
    tf = materialize_if_small(
        df.select(F.col(id_col), F.explode(toks).alias("term"))
        .where(F.col("term").isin(terms))
        .groupBy(id_col, "term")
        .agg(F.count("*").alias("tf")),
        df,
    )
    docfreq = tf.groupBy("term").agg(F.count("*").alias("df_t"))
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df_t") + F.lit(0.5)) / (F.col("df_t") + F.lit(0.5))
    )
    contrib = (idf * F.col("tf") * (k1 + 1.0)) / (
        F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl"))
    )
    return (
        tf.join(F.broadcast(docfreq), "term")
        .join(dl, id_col)
        .crossJoin(F.broadcast(stats))
        .groupBy(id_col)
        .agg(F.round(F.sum(contrib), 4).alias("bm25"))
        .orderBy(F.col("bm25").desc(), F.col(id_col).asc())
        .limit(top_k)
    )


def decontaminate(
    df: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
) -> DataFrame:
    """Benchmark decontamination: drop every corpus document sharing ANY
    word n-gram with the benchmark set — the standard eval-leakage guard in
    training-data pipelines. Shape: shingle both sides, inner-join on the
    (broadcastable) benchmark shingle set to find contaminated ids, anti-
    join them away. Work scales with corpus shingles × benchmark-hit rate,
    not corpus²."""
    from iceberg_rust_custom_spark.operators.dedup import shingles

    corpus_sh = shingles(df, id_col, text_col, shingle_n)
    bench_sh = shingles(benchmark, id_col, text_col, shingle_n).select(
        F.col("shingle").alias("b_shingle")
    ).distinct()
    contaminated = (
        corpus_sh.join(F.broadcast(bench_sh), corpus_sh["shingle"] == bench_sh["b_shingle"], "inner")
        .select(id_col)
        .distinct()
    )
    return df.join(contaminated, on=id_col, how="left_anti")


def _escape_salt(salt: str) -> str:
    """Salts are interpolated into SQL string literals; escape single
    quotes so an adversarial salt can't break (or silently change) the
    hash expression."""
    return salt.replace("\\", "\\\\").replace("'", "\\'")


def hash_sample(df: DataFrame, key_col: str, rate: float, salt: str = "") -> DataFrame:
    """Deterministic sampling: keep rows whose key hashes into the lowest
    ``rate`` fraction of 32-bit space. Unlike ``df.sample()``, the result is
    reproducible across runs, engines, partitionings and cluster sizes —
    the property training-data curation actually needs (re-running the
    pipeline yields the same corpus). Optional salt decorrelates repeated
    draws. No shuffle: a codegen'd filter at scan speed."""
    from iceberg_rust_custom_spark.functions.hashing import md5h32_spark_sql

    if not (0.0 <= rate <= 1.0):
        raise ValueError("rate must be in [0, 1]")
    threshold = int(rate * 4294967296)
    salt = _escape_salt(salt)
    h = md5h32_spark_sql(f"concat(cast({key_col} AS STRING), '{salt}')")
    return df.where(F.expr(f"{h} < {threshold}"))


def training_shards(
    df: DataFrame,
    key_col: str,
    n_shards: int,
    salt: str = "",
) -> DataFrame:
    """Deterministic global shuffle into training shards: every row gets a
    ``shard`` (which output file group it belongs to) and a ``pos`` (its
    serving order within the shard). Assignment and order depend only on
    (key, salt) — identical across runs, engines, partitionings, and
    cluster sizes, so a training job is exactly reproducible and any shard
    can be re-materialized independently. Changing ``salt`` re-mixes the
    corpus for a new epoch ordering without touching the data.

    Scale shape: shard = hash % n is a scan-speed projection; pos is a
    row_number window keyed by shard — ONE shuffle whose fan-in per
    partition is corpus/n_shards, exactly the file-sized unit the export
    writer wants (partitionBy(shard) then writes each group sorted)."""
    from pyspark.sql import Window

    from iceberg_rust_custom_spark.functions.hashing import md5h32_spark_sql

    if n_shards < 1:
        raise ValueError("n_shards must be >= 1")
    salt = _escape_salt(salt)
    shard_h = md5h32_spark_sql(f"concat(cast({key_col} AS STRING), 'shard{salt}')")
    mix_h = md5h32_spark_sql(f"concat(cast({key_col} AS STRING), 'mix{salt}')")
    w = Window.partitionBy("shard").orderBy("_mix", key_col)
    return (
        df.withColumn("shard", F.expr(f"{shard_h} % {n_shards}").cast("int"))
        .withColumn("_mix", F.expr(mix_h))
        .withColumn("pos", F.row_number().over(w))
        .drop("_mix")
    )


def pack_training_sequences(
    df: DataFrame,
    shard_col: str,
    pos_col: str,
    token_col: str,
    max_tokens: int,
) -> DataFrame:
    """Concat-and-chunk sequence packing: documents are laid end-to-end in
    (shard, pos) order and cut into fixed-size training sequences of
    ``max_tokens``. Each doc gets its byte-exact placement: the token
    offset where it starts within the shard stream (``start_offset``) and
    the sequence it starts in (``seq_index`` = start_offset div max_tokens
    — docs crossing a boundary continue into the next sequence, standard
    GPT-style packing). Deterministic given the (shard, pos) order, so the
    pairing with ``training_shards`` yields a bit-reproducible token
    stream.

    Scale shape: one running-sum window per shard — a single shuffle keyed
    by shard, the same partitioning the shard writer already needs."""
    from pyspark.sql import Window

    if max_tokens < 1:
        raise ValueError("max_tokens must be >= 1")
    w = (
        Window.partitionBy(shard_col)
        .orderBy(pos_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    end = F.sum(F.col(token_col).cast("long")).over(w)
    return df.withColumn("start_offset", end - F.col(token_col)).withColumn(
        "seq_index", F.floor(F.col("start_offset") / max_tokens).cast("long")
    )


def ngram_lm_scores(
    df: DataFrame,
    id_col: str,
    text_col: str,
    ref_df: DataFrame | None = None,
    n: int = 3,
    ref_pred: str | None = None,
    materialize: bool | None = None,
) -> DataFrame:
    """CCNet-style language-model quality proxy (Wenzek et al. 2020): score
    every document by the average negative log-likelihood of its character
    ``n``-grams under an add-one-smoothed unigram-of-n-grams model trained
    on a REFERENCE corpus (``ref_df``, default: the corpus itself). Natural
    prose in the reference's language scores low; gibberish, boilerplate
    soup, and other-language text score high — threshold on ``nll`` the way
    CCNet thresholds KenLM perplexity. Returns ``(id, n_grams, nll)``.

    Scale shape: the model IS a DataFrame — reference n-gram counts from
    one map-side-combined groupBy, joined to document n-grams as a
    broadcast (char n-gram vocab is bounded by charset^n, ~10^4-10^5 rows
    regardless of corpus size), scalar normalizers (total count, vocab
    size) ride a broadcast 1-row cross join; scoring is one groupBy(id).
    Everything in codegen — no Python model object, no UDF, and the
    trained counts can be persisted and reused as a plain table."""
    # normalize ONCE into a column; inlining the regexp into the per-gram
    # lambda re-ran regexp_replace(lower(text)) for every i — O(len²)
    # regex work per document (20s vs 2s at sf0.1)
    norm = f"regexp_replace(lower({text_col}), '\\\\s+', ' ')"
    grams_expr = (
        f"CASE WHEN length(_nrm) >= {n} THEN "
        f"transform(sequence(1, length(_nrm) - {n - 1}), i -> substring(_nrm, i, {n})) "
        f"ELSE array() END"
    )
    if ref_df is None or ref_pred is not None:
        # reference = the corpus itself (or a predicate-defined subset of
        # it): normalize + explode ONCE and share the gram stream between
        # the model counts and the scoring side. The shared stream is
        # materialized ONLY for small inputs (materialize_if_small — the
        # gram stream is ~3× corpus bytes, an executor-storage and
        # fault-tolerance liability at production scale; VERDICT r13 #5);
        # lazy, Catalyst pushes the _ref predicate down into the counts
        # subtree's scan, which is the pre-r13 two-subtree shape. Values
        # are unchanged either way (the counts are the same gram
        # multiset). Call sites with a measured per-consumer trade-off
        # pass materialize=False (corpus_curation_v2: the eager
        # materialization serialized against the composite's other stages
        # and lost 0.72× on the driver, both core counts).
        flag = ref_pred if ref_pred is not None else "true"
        doc_grams = materialize_if_small(
            df.selectExpr(id_col, f"{norm} AS _nrm", f"({flag}) AS _ref")
            .select(F.col(id_col), F.col("_ref"), F.explode(F.expr(grams_expr)).alias("g")),
            df,
            materialize,
        )
        counts = doc_grams.where("_ref").groupBy("g").agg(F.count("*").alias("c"))
    else:
        ref_grams = ref_df.selectExpr(f"{norm} AS _nrm").select(
            F.explode(F.expr(grams_expr)).alias("g")
        )
        counts = ref_grams.groupBy("g").agg(F.count("*").alias("c"))
        doc_grams = df.selectExpr(id_col, f"{norm} AS _nrm").select(
            F.col(id_col), F.explode(F.expr(grams_expr)).alias("g")
        )
    stats = counts.agg(
        F.sum("c").alias("_N"), F.count("*").alias("_V")
    )  # total grams, vocab size
    scored = (
        doc_grams.join(F.broadcast(counts), "g", "left")
        .crossJoin(F.broadcast(stats))
        .select(
            id_col,
            (-F.log((F.coalesce(F.col("c"), F.lit(0)) + 1) / (F.col("_N") + F.col("_V")))).alias(
                "_nll"
            ),
        )
    )
    return scored.groupBy(id_col).agg(
        F.count("*").cast("int").alias("n_grams"),
        F.round(F.avg("_nll"), 6).alias("nll"),
    )


def quota_cap(
    df: DataFrame,
    group_col: str,
    id_col: str,
    k: int,
    score_col: str | None = None,
    salt_buckets: int = 64,
) -> DataFrame:
    """Cap each group (source domain, site, feed…) to at most ``k`` rows,
    keeping the top-``score_col`` ones (ties and no-score → smallest id) —
    the anti-domination step of a training mix: one crawl-heavy domain must
    not drown the corpus. Output = surviving input rows + ``quota_rank``.

    Skew-proof like ``similarity._grouped_topk``: a naive per-group window
    funnels a 100 TB corpus into |groups| reducer tasks, and web corpora
    have exactly the hot groups (one domain = billions of docs) that makes
    that a straggler. A salted pre-window caps each (group, salt) slice to
    k first — |groups|×S parallel reducers emitting ≤ k rows each — and the
    exact window ranks only the ≤ |groups|×S×k survivors. Deterministic
    ordering ⇒ output identical to the single-window plan."""
    order = ([F.col(score_col).desc()] if score_col else []) + [F.col(id_col).asc()]
    salt = (F.crc32(F.encode(F.col(id_col).cast("string"), "utf-8")) % salt_buckets).cast("int")
    w1 = Window.partitionBy(group_col, "_s").orderBy(*order)
    w2 = Window.partitionBy(group_col).orderBy(*order)
    return (
        df.withColumn("_s", salt)
        .withColumn("_r1", F.row_number().over(w1))
        .where(F.col("_r1") <= k)
        .withColumn("quota_rank", F.row_number().over(w2))
        .where(F.col("quota_rank") <= k)
        .drop("_s", "_r1")
    )


def training_mix(
    df: DataFrame,
    key_col: str,
    group_col: str,
    weights: dict,
    token_budget: int,
    token_col: str | None = None,
    salt: str = "",
) -> DataFrame:
    """Assemble a training mix to TARGET WEIGHTS under a token budget:
    group ``g`` gets ``token_budget · w_g / Σw`` tokens, satisfied by
    deterministically sampling its documents at rate
    ``min(1, budget_g / available_g)``. Groups without a weight drop out.
    Output = surviving rows + ``mix_rate``.

    This is the "mixture" step of every LLM data recipe (e.g. oversample
    curated sources, downweight raw crawl). Availability is measured from
    the data (``sum(token_col)`` per group; row count when None), the rate
    arithmetic runs INSIDE the plan (one broadcast-joined per-group row —
    no driver collect, rates stay consistent with the exact data the job
    read), and the keep decision is the engine-reproducible hash rule of
    ``hash_sample`` — the same corpus on any cluster size, every rerun.
    Expected sampled tokens land within sampling noise of the budget;
    a group with fewer tokens than its budget is taken whole (rate 1) —
    detect under-supplied groups by ``mix_rate = 1``."""
    from iceberg_rust_custom_spark.functions.hashing import md5h32_spark_sql

    if not weights or any(w < 0 for w in weights.values()):
        raise ValueError("weights must be non-empty and non-negative")
    total_w = float(sum(weights.values()))
    measure = F.sum(token_col) if token_col else F.count("*")
    budget_for = F.create_map(
        *[x for g, w in sorted(weights.items()) for x in (F.lit(g), F.lit(token_budget * w / total_w))]
    )
    rates = (
        df.groupBy(group_col)
        .agg(measure.cast("double").alias("_avail"))
        # raw ratio FIRST, null-filter, THEN clamp: least() skips nulls, so
        # least(1.0, null) would silently give unweighted groups rate 1.0
        .select(group_col, (budget_for[F.col(group_col)] / F.col("_avail")).alias("_raw"))
        .where(F.col("_raw").isNotNull())
        .select(group_col, F.least(F.lit(1.0), F.col("_raw")).alias("mix_rate"))
    )
    h = md5h32_spark_sql(f"concat(cast({key_col} AS STRING), '{_escape_salt(salt)}')")
    return (
        df.join(F.broadcast(rates), group_col)
        .where(F.expr(h) < F.floor(F.col("mix_rate") * F.lit(4294967296.0)).cast("long"))
    )


def stratified_hash_sample(df: DataFrame, key_col: str, strata_col: str, rates: dict, default_rate: float = 0.0) -> DataFrame:
    """Per-stratum deterministic sampling (e.g. downsample boilerplate-heavy
    languages, keep all rare ones): each stratum gets its own keep-rate,
    applied with the same engine-reproducible hash rule."""
    from iceberg_rust_custom_spark.functions.hashing import md5h32_spark_sql

    h = md5h32_spark_sql(f"cast({key_col} AS STRING)")
    expr = F.lit(int(default_rate * 4294967296))
    for value, rate in sorted(rates.items()):
        expr = F.when(F.col(strata_col) == value, F.lit(int(rate * 4294967296))).otherwise(expr)
    return df.where(F.expr(h) < expr)


def quality_classifier(
    df: DataFrame,
    weights: dict | None = None,
    bias: float = -1.0,
    text_col: str = "text",
    threshold: float = 0.5,
) -> DataFrame:
    """Model-inference-in-plan: a logistic quality classifier
    ``sigmoid(bias + Σ w_f · feature_f)`` over the engineered
    :func:`quality_features` columns, entirely as codegen expressions — no
    UDF, no model server, no Python on the hot path. ``weights`` maps
    feature column names (``q_tokens``/``q_mean_word_len``/
    ``q_punct_ratio``/``q_stop_ratio``) to coefficients; the defaults are
    illustrative hand-set values (a real deployment trains them offline
    and passes them in — the POINT is that scoring a 100 TB corpus is then
    one narrow scan, since the "model" is constants folded into the plan).
    Adds ``clf_score`` (rounded 6 dp) and ``clf_keep``."""
    w = weights or {
        "q_tokens": 0.01,
        "q_mean_word_len": 0.2,
        "q_punct_ratio": -4.0,
        "q_stop_ratio": 3.0,
    }
    feats = quality_features(df, text_col)
    z = F.lit(float(bias))
    for col, coef in sorted(w.items()):
        z = z + F.col(col) * F.lit(float(coef))
    score = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
    return feats.withColumn("clf_score", F.round(score, 6)).withColumn(
        "clf_keep", F.round(score, 6) >= F.lit(threshold)
    )


CARD_CANDIDATE_RE = "[0-9][0-9 -]{11,17}[0-9]"


def _luhn_sql(s: str) -> str:
    """SQL predicate: the digit content of ``s`` passes the Luhn checksum
    and has card-plausible length (13-19 digits). Pure expression —
    aggregate over the digit positions with alternate doubling; the inner
    per-digit work is O(len²) in string ops but len ≤ 23, so it folds into
    codegen at negligible cost."""
    d = f"regexp_replace({s}, '[^0-9]', '')"
    dig = f"(ascii(substr({d}, i, 1)) - 48)"
    doubled = f"IF({dig} * 2 > 9, {dig} * 2 - 9, {dig} * 2)"
    return (
        f"length({d}) BETWEEN 13 AND 19 AND "
        f"aggregate(sequence(1, length({d})), 0, (acc, i) -> acc + "
        f"CASE WHEN (length({d}) - i) % 2 = 1 THEN {doubled} ELSE {dig} END) % 10 = 0"
    )


def redact_card_numbers(df: DataFrame, text_col: str = "text", out_col: str = "redacted") -> DataFrame:
    """Checksum-validated PII redaction: replace card-number-shaped spans
    ONLY when they pass the Luhn check — plain regex redaction
    (:func:`redact_text`) nukes order ids and timestamps too; validating
    the checksum keeps recall on real PANs while sparing benign numbers.
    Whole pipeline is codegen: extract candidates → filter by the Luhn
    aggregate → fold ``replace`` over the valid spans. No UDF."""
    expr = (
        f"aggregate("
        f"  filter(regexp_extract_all({text_col}, '{CARD_CANDIDATE_RE}', 0),"
        f"         s -> {_luhn_sql('s')}),"
        f"  {text_col}, (acc, s) -> replace(acc, s, '<card>'))"
    )
    return df.withColumn(out_col, F.expr(expr))


def dsir_select(
    df: DataFrame,
    target_predicate: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    top_k: int = 50,
    vocab_cap: int = 50_000,
) -> DataFrame:
    """DSIR-style importance-weighted data selection (Xie et al. 2023,
    "Data Selection for Language Models via Importance Resampling" — the
    public method, simplified to word unigrams instead of hashed n-gram
    buckets so the weights stay engine-portable): rank the NON-target pool
    by how much each document's token distribution looks like the TARGET
    domain, and keep the top-k.

        w(doc) = Σ_tokens ln( p̂_target(t) / p̂_raw(t) )
        p̂(t)  = (count(t) + 1) / (total + |V|)      (add-one smoothing)

    Shape (scale-conscious): one explode → two token-count aggregations
    (map-side combine, shuffle ∝ distinct words), vocabulary bounded to
    the ``vocab_cap`` most frequent corpus words with a deterministic
    (count DESC, word ASC) tie-break — the per-word log-ratio table is
    therefore broadcast-sized no matter the corpus, and scoring is one
    broadcast join + groupBy(doc) sum. Out-of-vocabulary tokens contribute
    nothing (both distributions smooth them identically). Top-k orders by
    (score DESC, id ASC) for bit-stable output."""
    # r13: the token stream feeds THREE consumers (raw counts, target
    # counts, scoring) — materialize it once per invocation instead of
    # re-tokenizing the corpus three times. r14: size-gated (the stream is
    # O(corpus); at production scale stay lazy and recompute — VERDICT r13
    # #5 / ADVICE r13 scale-safety).
    toks = materialize_if_small(
        df.select(
            F.col(id_col), F.explode(F.split(F.lower(F.col(text_col)), r"\s+")).alias("w")
        ).where("w != ''"),
        df,
    )
    raw = toks.groupBy("w").agg(F.count("*").alias("rcnt"))
    # distributed top-V (TakeOrderedAndProject), NOT a row_number over an
    # unpartitioned window — the word table has one row per distinct token
    # and must never single-partition at corpus scale
    vocab = raw.orderBy(F.desc("rcnt"), F.asc("w")).limit(vocab_cap)
    tgt = (
        toks.join(df.where(target_predicate).select(id_col), id_col, "left_semi")
        .groupBy("w")
        .agg(F.count("*").alias("tcnt"))
    )
    table = vocab.join(tgt, "w", "left").na.fill({"tcnt": 0})
    consts = table.agg(
        F.sum("rcnt").alias("R"), F.sum("tcnt").alias("T"), F.count("*").alias("V")
    )
    table = table.crossJoin(F.broadcast(consts)).select(
        "w",
        (
            F.log((F.col("tcnt") + 1.0) / (F.col("rcnt") + 1.0))
            + F.log((F.col("R") + F.col("V")) / (F.col("T") + F.col("V")))
        ).alias("_lr"),
    )
    scored = (
        toks.join(df.where(target_predicate).select(id_col), id_col, "left_anti")
        .join(F.broadcast(table), "w")
        .groupBy(id_col)
        .agg(F.sum("_lr").alias("dsir_score"))
    )
    # rank on the ROUNDED score: near-equal doubles may order differently
    # across engines in their last ulp, but the rounded value + id is a
    # total order both sides agree on
    scored = scored.select(id_col, F.round("dsir_score", 4).alias("dsir_score"))
    return scored.orderBy(F.desc("dsir_score"), F.asc(id_col)).limit(top_k)
