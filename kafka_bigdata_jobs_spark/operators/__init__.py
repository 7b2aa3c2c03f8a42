"""Operator library: pure DataFrame -> DataFrame (or Column) functions.

Each module maps to a SURVEY.md §2 operator family:

- relational — projections, predicates, aggregation idioms, pivot,
  top-k, set ops (§2.3, §2.5, §2.7, §2.8)
- cleaning   — multi-predicate text-cleaning pipelines (§2.3 P11)
- text       — hashtag/mention extraction, word stats, spam score,
  device CASE (§2.9, reference batch jobs 4/5)
- temporal   — hour/day-name/weekend features (reference batch job3)
- sentiment  — the reference's one UDF, expression-compiled (§2.11)
- joins      — broadcast/shuffle join strategies (beyond-reference)
- dedup      — exact / MinHash-LSH / SimHash / n-gram Jaccard dedup
- similarity — embedding cosine top-k (brute force + LSH-bucketed)
- textstats  — language-ID, quality score, token counts, fingerprints
- multimodal — binary-column plumbing for image/audio payloads
"""
