"""Scalar/vectorized function surface of the engine.

- ``extraction``: html→text (the analog of the reference's eventlog
  matcher + mapper layer, §2.10 of SURVEY.md) — the ONLY sanctioned
  Python extension point, Arrow-vectorized.
- ``text``: language-ID, quality scoring, token counting, fingerprinting —
  native Column expressions (JVM-side) for the training-data pipeline ops.
- ``dedup``: exact + MinHash-LSH + SimHash + n-gram Jaccard dedup.
- ``similarity``: brute-force and LSH-bucketed cosine ANN.
- ``multimodal``: binary-payload plumbing with stubbed decoders.
"""
