"""Large-scale training-data pipeline operators (BASELINE.json north
star; beyond the reference's surface).

- ``dedup``      — exact, MinHash+LSH, SimHash, n-gram Jaccard.
- ``similarity`` — embedding cosine top-k (exact + fast paths).
- ``textstats``  — token counts, quality scores, language ID,
  document fingerprints.
- ``multimodal`` — opaque binary columns with typed metadata; REAL
  pure-spec decode for six image formats (BMP/JPEG/PNG/GIF/TIFF/
  Netpbm), WAV/FLAC/G.711/ADPCM audio, MJPEG-AVI + animated-GIF
  video frames; pHash near-dup, spectral audio features; codecs that
  genuinely need external libraries stay honest stubs.
- ``components`` — connected components over near-dup pair graphs
  (pairs → duplicate clusters with a representative).
- ``sampling``   — deterministic hash-keyed sampling / train-test
  splits / stratified downsampling / dataset mixing.
- ``curation``   — contamination screens, boilerplate removal,
  paragraph dedup, normalization, chunking, sequence packing.
- ``sketches``   — deterministic HyperLogLog, Count-Min, KMV set
  algebra.
- ``bpe``        — bounded-deterministic BPE train + Arrow apply.

Determinism doctrine: every hash used for bucketing/signatures is
md5-based (cross-engine reproducible), never engine-internal hash().
All Python-side work is Arrow-batched (mapInPandas/pandas_udf) — no
row-at-a-time UDFs.
"""

from cubert_spark.datapipe import (  # noqa: F401
    bpe,
    components,
    curation,
    dedup,
    multimodal,
    sampling,
    similarity,
    sketches,
    textstats,
)
