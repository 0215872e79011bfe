"""Large-scale training-data pipeline operators over the documents /
embeddings tables: dedup family (exact, MinHash-LSH, SimHash, n-gram
Jaccard, embedding near-dup), similarity search (brute + LSH ANN),
text analysis (lang-id, quality, tokens, fingerprints), and multimodal
column plumbing.

All shuffle-conscious: blocking/banding before any pairwise work, so
the candidate set — never the corpus cross-product — is what shuffles.
"""
