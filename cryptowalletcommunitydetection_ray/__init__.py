"""cryptowalletcommunitydetection_ray — a Ray-Data-native link-graph analytics engine.

A brand-new engine (NOT a port) with the data-processing capabilities of the
reference repo ``trixt63/CryptoWalletCommunityDetection`` re-expressed over
Common-Crawl-style web pages:

- ``sources/``   — deterministic synthetic ``pages`` corpus + parquet readers
- ``functions/`` — pure, pinned per-record/batch functions (extraction,
  normalization, text statistics, hashing/sketches)
- ``stages/``    — reusable Ray Data batch stages (relational ops, dedup,
  similarity search, multimodal plumbing)
- ``state/``     — stateful machinery: hash-partitioned CSR shard actors,
  per-superstep checkpoint manifests
- ``pipelines/`` — end-to-end pipelines: pages → edge table, PageRank,
  connected components, community detection, label propagation, triangles

Everything is built on ``ray.data.Dataset`` + ``map_batches`` over zero-copy
Arrow batches; raw Ray actors appear only where the Dataset API cannot express
the semantics (the per-partition CSR shards holding iterative rank/label
state).
"""

__version__ = "0.1.0"
