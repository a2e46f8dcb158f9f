"""texel_ray — a Ray-Data-native spatial-join + tiling engine.

Re-implements the semantics of the reference vector-tile preprocessor
(snap-to-tile-grid snapping, topology-preserving per-zoom simplification,
deterministic tile assignment — see SURVEY.md) as idiomatic Ray Data
pipelines over Arrow batches, generalized with H3/S2-style cell encoding,
point-in-polygon joins, kNN, dedup, text analysis and raster tile cutting
for large-scale training-data pipelines.

Nothing in this package calls ``ray.init()``; sessions are owned by the
caller (bench.py, CLI, pytest fixture, or the evaluation driver).
"""

__version__ = "0.1.0"
