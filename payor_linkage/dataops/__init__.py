"""Large-scale training-data operators (beyond the reference's own set).

Deduplication (exact / MinHash-LSH / SimHash / n-gram Jaccard /
embedding-cosine), similarity search (brute-force + LSH-bucketed ANN),
text analysis (language-ID, quality stats, token counting,
fingerprinting) and multimodal column plumbing — each as a Ray-Data-first
batch pipeline suitable for the 100 TB tier (partial aggregation,
broadcast small sides, bounded blocks).
"""
