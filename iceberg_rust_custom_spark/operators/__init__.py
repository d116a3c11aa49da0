"""Beyond-reference operators for large-scale training-data pipelines:
dedup (exact / minhash-LSH / simhash / n-gram Jaccard / embedding cosine),
similarity search, text analysis, event-time windows, as-of join, and
multimodal column plumbing. The reference has none of these (SURVEY.md §2.4);
BASELINE.json's north star requires them. Every operator is designed
shuffle-conscious for 100 TB (see each module's docstring)."""
