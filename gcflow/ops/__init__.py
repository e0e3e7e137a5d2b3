"""Large-scale training-data + relational operators (first-class components
alongside the GC pipeline): dedup (exact / MinHash-LSH / SimHash / n-gram
Jaccard / embedding-cosine), similarity search, text analysis, multimodal
plumbing, and wide relational ops (groupby / join / sort / distinct)."""
