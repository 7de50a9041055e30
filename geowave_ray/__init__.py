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

# ---------------------------------------------------------------------------
# Public API (the pygw-binding role, ``/root/reference/python/`` — a
# declared, versioned surface users may depend on; everything else is
# internal and may change between versions). Submodules are imported
# lazily so `import geowave_ray` stays cheap and Ray-free.
# ---------------------------------------------------------------------------

__all__ = [
    "__version__",
    # primary user surface (core/store/api/DataStore.java role)
    "DataStore",        # geowave_ray.datastore
    "Writer",           # geowave_ray.datastore
    "serve",            # geowave_ray.service — JSON-over-HTTP wrapper
    # query languages
    "gwql",             # GWQL string API (parse/execute)
    "cql",              # (E)CQL filters + OGC filter functions
    # pipeline entry points (stable names, Dataset -> Dataset)
    "pipelines",        # ingest / spatial_join / knn / tiles / kde / ...
    # value-level codecs (published wire formats)
    "twkb",
]


def __getattr__(name):  # PEP 562 lazy re-exports
    if name == "DataStore" or name == "Writer":
        from . import datastore

        return getattr(datastore, name)
    if name == "serve":
        from .service import serve

        return serve
    if name in ("gwql", "cql", "pipelines", "twkb"):
        import importlib

        return importlib.import_module(f".{name}", __name__)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
