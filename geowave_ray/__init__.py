"""geowave_ray — a Ray-Data-native spatial indexing / query engine.

A from-scratch reimplementation of the *capabilities* of
locationtech/geowave (reference at /root/reference, studied for
semantics only — no code copied):

- space-filling-curve tiered indexing (Hilbert / Z-order / geohash
  cell encoding; tier = resolution level, fit-or-descend rule as in
  ``core/index/.../sfc/tiered/TieredSFCIndexStrategy.java``)
- point-in-polygon spatial join (broadcast spatial-grid index held in
  an actor pool; tiered cell-cogroup fallback, as in
  ``analytics/spark/.../spatial/TieredSpatialJoin.java``)
- kNN queries (``analytics/mapreduce/.../nn/NNMapReduce.java``)
- raster↔vector tile assignment + tile merge
  (``extensions/adapters/raster/.../RasterDataAdapter.java``)
- aggregations, statistics sketches, binned aggregation
  (``core/store/.../query/aggregate/``, ``statistics/``)
- expression filters compiled to pyarrow.compute
  (``core/store/.../query/filter/expression/``)

plus large-scale training-data-pipeline operators (dedup, ANN,
text analysis) over the same Ray Data substrate.

Everything is expressed as ``ray.data.Dataset`` pipelines:
``map_batches`` over zero-copy Arrow batches for per-record work,
actor pools for stateful stages, ``groupby``/``sort`` for the wide
steps. No module in this package calls ``ray.init``.
"""

__version__ = "0.1.0"
