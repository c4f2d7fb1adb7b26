"""Engine function library.

- kdf:        engine-defined UDFs (kyuubi_version() etc., KDFRegistry parity)
- text:       language-ID, quality scoring, token counting, fingerprinting
- dedup:      exact / minhash-LSH / n-gram-jaccard / simhash deduplication
- similarity: embedding cosine top-k (brute force + LSH-bucketed scale path)

Everything here is built from ``pyspark.sql.functions`` expressions (JVM-side,
whole-stage-codegen friendly) — no Python row UDFs in any hot path.
"""
