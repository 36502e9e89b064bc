"""Training-data pipeline operators over document/embedding tables.

These extend the Olaf-derived index engine with the operations a
large-scale corpus-preparation pipeline needs: deduplication families
(exact, MinHash-LSH, SimHash, n-gram Jaccard, embedding cosine),
similarity search (brute-force + LSH-bucketed ANN), text analysis
(language ID, quality scoring, token counting, fingerprinting), and
multimodal binary-column plumbing.

Design rule: hash primitives are md5-based (portable across Spark and
DuckDB for oracle checking) and every operator is JVM-side DataFrame ops
unless numpy vectorization genuinely wins (then Arrow-batched pandas UDFs).
"""
