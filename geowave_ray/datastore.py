"""DataStore facade — the reference's primary user-facing API
(``core/store/src/main/java/org/locationtech/geowave/core/store/api/
DataStore.java:53-475``: addType / createWriter / ingest / query
(typed + GWQL string) / aggregate / statistics / indices / delete /
copyTo / deleteAll), re-expressed over the partitioned-Parquet store
layout and the existing pipelines. A reference user's session

    DataStore store = DataStoreFactory.createDataStore(...);
    store.addType(adapter, SPATIAL_IDX);
    try (Writer<SimpleFeature> w = store.createWriter("roads")) { w.write(f); }
    store.query(QueryBuilder...bbox...); store.aggregate(...count...);

maps 1:1 onto

    store = DataStore(root)
    store.add_type("roads")                  # spatial index by default
    with store.create_writer("roads") as w: w.write(table)
    store.query_bbox("roads", (x0, y0, x1, y1)); store.aggregate("roads", "count")

Everything here composes existing engine pieces — the facade adds type
metadata (one JSON per store), writer buffering, and name routing; no
new dataflow. Each type's data lives under ``<root>/<type>/`` in the
standard ``group=*/cell_bucket=*`` layout, so every pruned query path,
maintenance command, and statistic works on facade-managed stores
unchanged."""

from __future__ import annotations

import glob
import json
import os
import shutil
from typing import Any

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from .stages.cell_encode import MAX_TIER, encode_points


def _encode_xy(batch: pa.Table, tier: int, n_buckets: int,
               lon_col: str, lat_col: str) -> pa.Table:
    """Generic point encode (no geotag derivation): lon/lat columns ->
    tier/cell_id/cell_bucket, the same bucket rule as ingest_pages."""
    batch = encode_points(batch, tier=tier, lon_col=lon_col, lat_col=lat_col)
    bucket = (
        batch.column("cell_id").to_numpy().astype(np.uint64)
        >> np.uint64(2 * tier - 8)
    ).astype(np.int64) % n_buckets
    return batch.append_column("cell_bucket", pa.array(bucket, pa.int64()))


class Writer:
    """``DataStore.createWriter`` role (Writer.java / BaseIndexWriter):
    buffers Arrow tables (or row dicts) and flushes them as one new
    ingest group — encoded, bucket-partitioned, sorted by cell id,
    manifest entry written AFTER the data (resume discipline)."""

    def __init__(self, store: "DataStore", type_name: str,
                 flush_rows: int = 500_000) -> None:
        self._store = store
        self._type = type_name
        self._buf: list[pa.Table] = []
        self._rows = 0
        self._flush_rows = flush_rows

    def write(self, entry: pa.Table | dict[str, Any]) -> None:
        t = (
            entry
            if isinstance(entry, pa.Table)
            else pa.Table.from_pylist([entry])
        )
        self._buf.append(t)
        self._rows += t.num_rows
        if self._rows >= self._flush_rows:
            self.flush()

    def flush(self) -> None:
        if not self._buf:
            return
        table = pa.concat_tables(self._buf, promote_options="default")
        self._buf, self._rows = [], 0
        self._store._append_group(self._type, table)

    def close(self) -> None:
        self.flush()

    def __enter__(self) -> "Writer":
        return self

    def __exit__(self, *exc) -> None:
        self.close()


class DataStore:
    def __init__(self, root: str) -> None:
        self.root = root
        os.makedirs(root, exist_ok=True)

    # -- type registry (adapter store role: AdapterStore / metadata
    #    tables of the KV backends) ------------------------------------
    def _meta_path(self) -> str:
        return os.path.join(self.root, "_types.json")

    def _load_meta(self) -> dict[str, dict]:
        p = self._meta_path()
        if not os.path.exists(p):
            return {}
        with open(p) as f:
            return json.load(f)

    def _save_meta(self, meta: dict[str, dict]) -> None:
        tmp = self._meta_path() + ".tmp"
        with open(tmp, "w") as f:
            json.dump(meta, f, indent=1)
        os.replace(tmp, self._meta_path())

    def _type_dir(self, type_name: str) -> str:
        return os.path.join(self.root, type_name)

    def add_type(
        self,
        type_name: str,
        lon_col: str = "lon",
        lat_col: str = "lat",
        time_col: str | None = None,
        n_buckets: int = 64,
        tier: int = MAX_TIER,
    ) -> None:
        """``addType(adapter, initialIndices...)``: registers the type
        and its spatial index configuration. A ``time_col`` declares
        the temporal dimension (queries may then push time ranges)."""
        meta = self._load_meta()
        if type_name in meta:
            raise ValueError(f"type {type_name!r} already exists")
        meta[type_name] = {
            "lon_col": lon_col,
            "lat_col": lat_col,
            "time_col": time_col,
            "n_buckets": n_buckets,
            "tier": tier,
            "indices": ["spatial"],
        }
        os.makedirs(self._type_dir(type_name), exist_ok=True)
        self._save_meta(meta)

    def get_types(self) -> list[str]:
        return sorted(self._load_meta())

    def get_type(self, type_name: str) -> dict:
        meta = self._load_meta()
        if type_name not in meta:
            raise KeyError(f"unknown type {type_name!r}")
        return meta[type_name]

    def get_indices(self, type_name: str | None = None) -> list[str]:
        meta = self._load_meta()
        if type_name is not None:
            return list(meta.get(type_name, {}).get("indices", []))
        return sorted({i for t in meta.values() for i in t.get("indices", [])})

    def remove_type(self, type_name: str) -> None:
        """``removeType``: drop the type's data and registration."""
        meta = self._load_meta()
        meta.pop(type_name, None)
        shutil.rmtree(self._type_dir(type_name), ignore_errors=True)
        self._save_meta(meta)

    def delete_all(self) -> None:
        """``deleteAll``: every type's data + registrations."""
        for t in self.get_types():
            shutil.rmtree(self._type_dir(t), ignore_errors=True)
        self._save_meta({})

    # -- writes ---------------------------------------------------------
    def _next_group(self, type_name: str) -> str:
        existing = glob.glob(os.path.join(self._type_dir(type_name), "group=*"))
        nxt = (
            max(
                (int(os.path.basename(g).split("=", 1)[1]) for g in existing),
                default=-1,
            )
            + 1
        )
        return os.path.join(self._type_dir(type_name), f"group={nxt:06d}")

    def _append_group(self, type_name: str, table: pa.Table) -> str:
        """Encode + bucket-partition + cell-sorted write of one batch
        of entries as a NEW group (the incremental-append unit; the
        same layout ingest_pages produces, so pruned reads and
        maintenance see no difference)."""
        import ray.data

        from .state import manifest as mf

        cfg = self.get_type(type_name)
        dest = self._next_group(type_name)
        tmp = dest + ".tmp"
        shutil.rmtree(tmp, ignore_errors=True)
        ds = ray.data.from_arrow(table)
        ds = ds.map_batches(
            _encode_xy,
            fn_kwargs=dict(
                tier=cfg["tier"], n_buckets=cfg["n_buckets"],
                lon_col=cfg["lon_col"], lat_col=cfg["lat_col"],
            ),
            batch_format="pyarrow", batch_size=None,
        )
        ds = ds.groupby("cell_bucket").map_groups(
            lambda t: t.sort_by("cell_id"), batch_format="pyarrow"
        )
        ds.write_parquet(tmp, partition_cols=["cell_bucket"])
        os.replace(tmp, dest)
        hist: dict[str, int] = {}
        rows = 0
        for part in glob.glob(os.path.join(dest, "cell_bucket=*", "*.parquet")):
            n = pq.read_metadata(part).num_rows
            b = os.path.basename(os.path.dirname(part)).split("=", 1)[1]
            hist[b] = hist.get(b, 0) + n
            rows += n
        if rows != table.num_rows:
            raise RuntimeError(
                f"append row mismatch: wrote {rows}, buffered {table.num_rows}"
            )
        mf.write_entry(
            os.path.join(self._type_dir(type_name), "_manifest"),
            os.path.basename(dest),
            {"input_file": os.path.basename(dest), "file_rows": rows,
             "group_rows": rows, "output_dir": dest, "cell_histogram": hist},
        )
        return dest

    def create_writer(self, type_name: str, flush_rows: int = 500_000) -> Writer:
        self.get_type(type_name)  # raises on unknown type
        return Writer(self, type_name, flush_rows)

    def ingest(self, type_name: str, input_path: str,
               columns: list[str] | None = None) -> dict:
        """``ingest(inputPath, index...)``: bulk parquet ingest through
        the resumable grouped pipeline (manifest + skip-complete)."""
        from .pipelines.ingest import ingest_pages

        cfg = self.get_type(type_name)
        if cfg["lon_col"] != "lon" or cfg["lat_col"] != "lat":
            raise ValueError(
                "bulk ingest uses the shared pages pipeline (lon/lat "
                "columns); use create_writer() for custom column names"
            )
        return ingest_pages(
            input_path, self._type_dir(type_name),
            tier=cfg["tier"], n_buckets=cfg["n_buckets"], columns=columns,
        )

    # -- reads ----------------------------------------------------------
    def _scan(self, type_name: str, columns=None):
        import ray.data

        tdir = self._type_dir(type_name)
        files = sorted(
            glob.glob(os.path.join(tdir, "group=*", "cell_bucket=*", "*.parquet"))
            + glob.glob(os.path.join(tdir, "cell_bucket=*", "*.parquet"))
        )  # grouped ingest layout OR the flat copy/compact layout
        if not files:
            raise ValueError(f"type {type_name!r} has no data")
        return ray.data.read_parquet(files, columns=columns)

    def query_bbox(self, type_name: str, box, columns=None,
                   t_start=None, t_end=None, authorizations=None):
        """bbox (optionally + time range) constraint through the PRUNED
        read path (only matching cell_bucket partitions are opened).
        ``authorizations`` applies row-level visibility filtering — the
        ``query(query, authorizations...)`` second argument of the
        reference API (rows carry a ``visibility`` expression column)."""
        from .pipelines.query import bbox_query, read_pages_pruned_multi

        cfg = self.get_type(type_name)
        need = columns
        if need is not None:
            need = sorted(
                set(need)
                | {cfg["lon_col"], cfg["lat_col"]}
                | ({cfg["time_col"]} if t_start is not None and cfg["time_col"] else set())
                | ({"visibility"} if authorizations is not None else set())
            )
        ds, _info = read_pages_pruned_multi(
            self._type_dir(type_name), [tuple(box)], columns=need,
            tier=cfg["tier"], n_buckets=cfg["n_buckets"],
        )
        out = bbox_query(ds, *box, t_start=t_start, t_end=t_end)
        if authorizations is not None:
            from .pipelines.query import visibility_filter

            out = visibility_filter(out, set(authorizations))
        return out.select_columns(columns) if columns else out

    def query(self, gwql_str: str, columns=None):
        """``query(queryStr)`` — the GWQL string API: FROM names a
        registered type; spatial predicates bind to the type's
        (lon, lat) columns."""
        from . import gwql as gw

        cfg_name = gw.parse(gwql_str).table
        cfg = self.get_type(cfg_name)
        return gw.execute(
            gwql_str,
            {cfg_name: self._scan(cfg_name, columns=columns)},
            geom=(cfg["lon_col"], cfg["lat_col"]),
        )

    def query_cql(self, type_name: str, cql_text: str, columns=None):
        """CQL filter over a type (CQLQuery role)."""
        from .cql import parse_cql

        cfg = self.get_type(type_name)
        e = parse_cql(cql_text, geom=(cfg["lon_col"], cfg["lat_col"]))
        return self._scan(type_name, columns=columns).map_batches(
            e.filter_batch, batch_format="pyarrow", batch_size=None
        )

    # -- aggregations / statistics ---------------------------------------
    def aggregate(self, type_name: str, agg: str, col: str | None = None):
        """``aggregate(AggregationQuery)``: count/bbox/time_range hit
        the manifest statistics (OptimalCountAggregation role — zero
        data I/O); min/max/sum over a column scan just that column."""
        from .stats import optimal_count

        cfg = self.get_type(type_name)
        if agg == "count":
            n = optimal_count(os.path.join(self._type_dir(type_name), "_manifest"))
            if n is not None:
                return n
            return self._scan(type_name, columns=[cfg["lon_col"]]).count()
        if agg == "bbox":
            from .stats import dataset_bbox

            return dataset_bbox(
                self._scan(type_name, columns=[cfg["lon_col"], cfg["lat_col"]]),
                lon_col=cfg["lon_col"], lat_col=cfg["lat_col"],
            )
        if agg in ("min", "max", "sum"):
            if not col:
                raise ValueError(f"{agg} needs a column")
            import ray.data.aggregate as agg_mod

            fn = {"min": agg_mod.Min, "max": agg_mod.Max, "sum": agg_mod.Sum}[agg]
            res = self._scan(type_name, columns=[col]).aggregate(fn(col))
            return next(iter(res.values()))
        raise ValueError(f"unknown aggregate {agg!r}")

    def get_statistic_value(self, type_name: str, stat: str):
        """``getStatisticValue``: manifest-backed statistics (COUNT /
        per-bucket row histogram), no data reads."""
        from .state import manifest as mf
        from .stats import optimal_count

        man = os.path.join(self._type_dir(type_name), "_manifest")
        if stat == "count":
            return optimal_count(man)
        if stat == "bucket_histogram":
            return mf.merged_cell_histogram(man)
        raise ValueError(f"unknown statistic {stat!r}")

    def recalc_statistic(self, type_name: str) -> pa.Table:
        """``recalcStatistic``: rebuild per-bucket counts from footers."""
        from .pipelines.maintenance import recalc_stats

        return recalc_stats(self._type_dir(type_name))

    # -- deletes / maintenance -------------------------------------------
    def delete(self, type_name: str, where_gwql: str) -> int:
        """``delete(query)``: rewrite every group minus the matching
        rows (the tombstone-free Parquet equivalent of the reference's
        row deletes); returns rows deleted. Bucket layout, sort order
        and manifest counts are preserved."""
        from . import gwql as gw
        from .pipelines.maintenance import _swap_into_place

        cfg = self.get_type(type_name)
        pred = gw.parse(
            f"SELECT * FROM t WHERE {where_gwql}",
            geom=(cfg["lon_col"], cfg["lat_col"]),
        ).where
        keep_expr = ~pred  # same null semantics as the GWQL DELETE path
        tdir = self._type_dir(type_name)
        deleted = 0
        for group in sorted(glob.glob(os.path.join(tdir, "group=*"))):
            tmp = group + ".new"
            shutil.rmtree(tmp, ignore_errors=True)
            for part in sorted(
                glob.glob(os.path.join(group, "cell_bucket=*", "*.parquet"))
            ):
                t = pq.read_table(part)
                keep = keep_expr.filter_batch(t)
                deleted += t.num_rows - keep.num_rows
                outp = os.path.join(tmp, os.path.relpath(part, group))
                os.makedirs(os.path.dirname(outp), exist_ok=True)
                pq.write_table(keep, outp)
            _swap_into_place(tmp, group)
        # ingest-time manifest entries are keyed by INPUT file, so they
        # cannot be patched per-group — rebuild the statistics from the
        # rewritten footers (RecalculateStatsCommand discipline)
        self._rebuild_manifest(type_name)
        return deleted

    def _rebuild_manifest(self, type_name: str) -> None:
        """Replace the type's manifest with footer-derived statistics
        (one entry per group; counts + per-bucket histogram)."""
        from .state import manifest as mf

        tdir = self._type_dir(type_name)
        man = os.path.join(tdir, "_manifest")
        shutil.rmtree(man, ignore_errors=True)
        for group in sorted(glob.glob(os.path.join(tdir, "group=*"))):
            hist: dict[str, int] = {}
            rows = 0
            for part in glob.glob(
                os.path.join(group, "cell_bucket=*", "*.parquet")
            ):
                n = pq.read_metadata(part).num_rows
                b = os.path.basename(os.path.dirname(part)).split("=", 1)[1]
                hist[b] = hist.get(b, 0) + n
                rows += n
            mf.write_entry(
                man, os.path.basename(group),
                {"input_file": os.path.basename(group), "file_rows": rows,
                 "group_rows": rows, "output_dir": group,
                 "cell_histogram": hist},
            )

    def copy_to(self, other: "DataStore", type_name: str,
                n_buckets: int | None = None) -> dict:
        """``copyTo``: rewrite one type into another store (optionally
        under a new bucket count — index reconfiguration)."""
        from .pipelines.maintenance import copy_store

        cfg = self.get_type(type_name)
        res = copy_store(
            self._type_dir(type_name),
            other._type_dir(type_name),
            n_buckets=n_buckets or cfg["n_buckets"], tier=cfg["tier"],
        )
        meta = other._load_meta()
        if type_name not in meta:
            meta[type_name] = dict(cfg)
            if n_buckets:
                meta[type_name]["n_buckets"] = n_buckets
            other._save_meta(meta)
        return res

    def compact(self, type_name: str, out: "DataStore") -> dict:
        """CompactCommand role for one type."""
        from .pipelines.maintenance import compact_store

        return compact_store(
            self._type_dir(type_name), out._type_dir(type_name)
        )
