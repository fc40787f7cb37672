"""Training-data pipeline operators over document/embedding tables.

These are the large-scale data-curation operations a 100 TB training
pipeline needs on top of the encoding engine: deduplication (exact,
MinHash-LSH, SimHash, n-gram Jaccard), cluster assignment (connected
components over verified pairs -> one survivor per cluster), similarity
search (brute-force and LSH-bucketed cosine), text analysis (token
counting, quality scoring, language id, fingerprinting), and multimodal
column plumbing.

All operators are declarative DataFrame compositions (Catalyst-optimizable)
with vectorized pandas UDFs only where built-ins genuinely cannot express
the semantics.
"""
