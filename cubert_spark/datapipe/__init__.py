"""Large-scale training-data pipeline operators (BASELINE.json north
star; beyond the reference's surface).

- ``dedup``      — exact, MinHash+LSH, SimHash, n-gram Jaccard.
- ``similarity`` — embedding cosine top-k (exact + fast paths).
- ``textstats``  — token counts, quality scores, language ID,
  document fingerprints.
- ``multimodal`` — opaque binary columns with typed metadata; decode /
  resize / frame-sample plumbing (decode stubbed: media libs are not
  in this container; the Spark-side schema/batching is real).
- ``components`` — connected components over near-dup pair graphs
  (pairs → duplicate clusters with a representative).
- ``sampling``   — deterministic hash-keyed sampling / train-test
  splits / stratified downsampling.

Determinism doctrine: every hash used for bucketing/signatures is
md5-based (cross-engine reproducible), never engine-internal hash().
All Python-side work is Arrow-batched (mapInPandas/pandas_udf) — no
row-at-a-time UDFs.
"""

from cubert_spark.datapipe import (  # noqa: F401
    components,
    dedup,
    multimodal,
    sampling,
    similarity,
    textstats,
)
