

def test_dsir_select_prefers_target_like_docs(spark):
    """DSIR importance selection (Xie et al. 2023, unigram flavor): docs
    sharing the target domain's vocabulary outrank docs that don't; target
    docs themselves are excluded from the pool; output is top-k stable."""
    from iceberg_rust_custom_spark.operators.text import dsir_select

    rows = (
        [(i, "alpha beta gamma " * 5, "tgt") for i in range(5)]
        + [(10 + i, "alpha beta delta", "poolA") for i in range(3)]
        + [(20 + i, "zig zag zog quux", "poolB") for i in range(3)]
    )
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = dsir_select(df, "source = 'tgt'", top_k=4, vocab_cap=100).collect()
    ids = [r.doc_id for r in out]
    assert set(ids[:3]) == {10, 11, 12}  # target-like docs win
    assert all(i not in range(5) for i in ids)  # target pool excluded
    # identical docs tie-break by id ascending
    assert ids[:3] == [10, 11, 12]
