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

from .stages.cell_encode import MAX_TIER, bucket_of, encode_points


def _encode_xy(batch: pa.Table, tier: int, n_buckets: int,
               lon_col: str, lat_col: str) -> pa.Table:
    """Generic point encode (no geotag derivation): lon/lat columns ->
    tier/cell_id/cell_bucket, the shared bucket rule."""
    batch = encode_points(batch, tier=tier, lon_col=lon_col, lat_col=lat_col)
    bucket = bucket_of(batch.column("cell_id").to_numpy(), tier, n_buckets)
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

    # -- secondary indexes (createIndex / addIndex(AttributeIndex) role,
    #    ``core/store/api/DataStore.java`` + AttributeIndex.java /
    #    EnumIndexStrategy.java) -----------------------------------------
    def _idx_dir(self, type_name: str, column: str, kind: str) -> str:
        return os.path.join(self._type_dir(type_name), "_idx",
                            f"{kind}_{column}")

    def add_index(self, type_name: str, column: str, kind: str = "attribute",
                  terms: list[str] | None = None) -> None:
        """Build a secondary index over the CURRENT data and register
        it; every later append (writer flush or bulk ingest) extends it
        with a per-group subtree, so routed queries never go stale.

        ``kind='attribute'`` — column-sorted parquet, row-group pruning
        (AttributeIndex role). ``kind='enum'`` — declared-enumeration
        partition tree, one-directory lookups (EnumIndexStrategy role);
        ``terms`` defaults to the column's current distinct values.
        """
        meta = self._load_meta()
        if type_name not in meta:
            raise KeyError(f"unknown type {type_name!r}")
        if kind not in ("attribute", "enum"):
            raise ValueError(f"unknown index kind {kind!r}")
        idx = self._idx_dir(type_name, column, kind)
        if kind == "enum" and terms is None:
            terms = sorted(self._scan(type_name, columns=[column]).unique(column))
        for g in self._groups(type_name):
            self._extend_index(g, column, kind, idx, terms)
        key = "attr_indexes" if kind == "attribute" else "enum_indexes"
        entry = meta[type_name].setdefault(key, {})
        entry[column] = (
            {"dir": idx, "terms": terms} if kind == "enum" else idx
        )
        meta[type_name].setdefault("indices", []).append(f"{kind}:{column}")
        self._save_meta(meta)

    @staticmethod
    def _extend_index(group_dir: str, column: str, kind: str,
                      idx_dir: str, terms: list[str] | None) -> None:
        """One per-group index subtree (deterministic name -> a replay
        rewrites instead of duplicating), built by a streaming re-read
        of the group's already-written parquet."""
        import ray.data

        gname = os.path.basename(group_dir).split("=", 1)[1]
        sub = os.path.join(idx_dir, f"g_{gname}")
        if kind == "enum":
            from .text_index import build_enum_index

            build_enum_index(
                ray.data.read_parquet(group_dir), terms, sub, value_col=column
            )
            return
        tmp = sub + ".tmp"
        shutil.rmtree(tmp, ignore_errors=True)
        ray.data.read_parquet(group_dir).sort(column).write_parquet(
            tmp, row_group_size=10_000
        )
        shutil.rmtree(sub, ignore_errors=True)
        os.replace(tmp, sub)

    def _maintain_indexes(self, type_name: str, group_dir: str) -> None:
        cfg = self.get_type(type_name)
        for col, idx in cfg.get("attr_indexes", {}).items():
            self._extend_index(group_dir, col, "attribute", idx, None)
        for col, ent in cfg.get("enum_indexes", {}).items():
            self._extend_index(group_dir, col, "enum", ent["dir"],
                               ent["terms"])

    def _catalog(self, type_name: str):
        """The planner Catalog for one type (chooseBestIndex input)."""
        from .pipelines.planner import Catalog

        cfg = self.get_type(type_name)
        return Catalog(
            spatial_store=self._type_dir(type_name),
            attr_indexes=dict(cfg.get("attr_indexes", {})),
            enum_indexes={
                c: (e["dir"], e["terms"])
                for c, e in cfg.get("enum_indexes", {}).items()
            },
            table_dir=self._type_dir(type_name),
        )

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
    def _groups(self, type_name: str) -> list[str]:
        """Completed group dirs ONLY (``group=\\d+`` writer appends and
        ``group=ing<hash>`` deterministic bulk-ingest groups): crash
        leftovers from interrupted rewrites (``group=N.tmp/.new/.old``)
        are never read, renumbered over, or swapped back in."""
        import re

        return sorted(
            g
            for g in glob.glob(os.path.join(self._type_dir(type_name), "group=*"))
            if re.fullmatch(r"group=(?:\d+|ing[0-9a-f]{12})", os.path.basename(g))
        )

    def _next_group(self, type_name: str) -> str:
        numeric = [
            int(os.path.basename(g).split("=", 1)[1])
            for g in self._groups(type_name)
            if os.path.basename(g).split("=", 1)[1].isdigit()
        ]
        nxt = max(numeric, default=-1) + 1
        return os.path.join(self._type_dir(type_name), f"group={nxt:06d}")

    def _append_group(self, type_name: str, table, expect_rows=None,
                      group_name: str | None = None) -> str:
        """Encode + bucket-partition + cell-sorted write of one batch
        of entries as a NEW group (the incremental-append unit; the
        same layout ingest_pages produces, so pruned reads and
        maintenance see no difference). ``table`` is a pa.Table (writer
        buffers) or a streaming ray Dataset (bulk ingest — never
        materialized on the driver)."""
        import ray.data

        from .state import manifest as mf

        cfg = self.get_type(type_name)
        if group_name is not None:
            # deterministic replay name (bulk ingest): a crashed rerun
            # rmtree-then-rewrites the SAME dir instead of duplicating
            # rows into a fresh _next_group() — matching the
            # pipelines/ingest.py group={gi:06d} replay discipline.
            dest = os.path.join(self._type_dir(type_name), f"group={group_name}")
        else:
            dest = self._next_group(type_name)
        tmp = dest + ".tmp"
        shutil.rmtree(tmp, ignore_errors=True)
        shutil.rmtree(dest, ignore_errors=True)
        if isinstance(table, pa.Table):
            ds = ray.data.from_arrow(table)
            expect_rows = table.num_rows
        else:
            ds = table
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
        if expect_rows is not None and rows != expect_rows:
            raise RuntimeError(
                f"append row mismatch: wrote {rows}, expected {expect_rows}"
            )
        mf.write_entry(
            os.path.join(self._type_dir(type_name), "_manifest"),
            os.path.basename(dest),
            {"input_file": os.path.basename(dest), "file_rows": rows,
             "group_rows": rows, "output_dir": dest, "cell_histogram": hist},
        )
        self._maintain_indexes(type_name, dest)
        return dest

    def create_writer(self, type_name: str, flush_rows: int = 500_000) -> Writer:
        self.get_type(type_name)  # raises on unknown type
        return Writer(self, type_name, flush_rows)

    def ingest(self, type_name: str, input_path: str,
               columns: list[str] | None = None,
               geotag: bool = False) -> dict:
        """``ingest(inputPath, index...)``: bulk parquet ingest through
        the resumable grouped pipeline (manifest + skip-complete).

        Default (``geotag=False``): GENERIC ingest — the input must
        already carry the type's configured coordinate columns; they
        are encoded as-is (no derivation). ``geotag=True`` selects the
        web-pages pipeline instead, which DERIVES lon/lat from
        (url, lang) via the geotag stage and would destroy real
        coordinates on any other input — hence opt-in."""
        cfg = self.get_type(type_name)
        if geotag:
            from .pipelines.ingest import ingest_pages

            if cfg["lon_col"] != "lon" or cfg["lat_col"] != "lat":
                raise ValueError("geotag ingest derives lon/lat columns")
            return ingest_pages(
                input_path, self._type_dir(type_name),
                tier=cfg["tier"], n_buckets=cfg["n_buckets"], columns=columns,
            )
        import ray.data

        from .state import manifest as mf

        files = sorted(glob.glob(os.path.join(input_path, "*.parquet"))) or [
            input_path
        ]
        man = os.path.join(self._type_dir(type_name), "_manifest")
        need = columns
        if need is not None:
            need = sorted(set(need) | {cfg["lon_col"], cfg["lat_col"]})
        schema_names = pq.read_schema(files[0]).names
        if (
            cfg["lon_col"] not in schema_names
            or cfg["lat_col"] not in schema_names
        ):
            raise ValueError(
                f"input lacks coordinate columns "
                f"({cfg['lon_col']!r}, {cfg['lat_col']!r}); pass "
                f"geotag=True only for url/lang web-page inputs"
            )
        total = skipped = 0
        for gi in range(0, len(files), 16):
            group = files[gi:gi + 16]
            if all(mf.is_complete(man, f) for f in group):
                skipped += len(group)
                continue
            # streaming: file group -> Dataset -> encoded sorted group
            # dir; nothing materializes on the driver. The group dir
            # name is derived from the input file list, so a crash
            # between the group write and the per-file completeness
            # entries makes the rerun REWRITE the same dir instead of
            # silently duplicating rows into a new _next_group().
            import hashlib

            gname = "ing" + hashlib.sha256(
                "\n".join(group).encode()
            ).hexdigest()[:12]
            in_rows = sum(pq.read_metadata(f).num_rows for f in group)
            dest = self._append_group(
                type_name,
                ray.data.read_parquet(group, columns=need),
                expect_rows=in_rows,
                group_name=gname,
            )
            # file-keyed resume entries AFTER the data (file_rows=0:
            # the group-keyed entry from _append_group carries the
            # counts; these only mark completeness)
            for f in group:
                mf.write_entry(
                    man, f,
                    {"input_file": f, "file_rows": 0, "output_dir": dest,
                     "cell_histogram": {}},
                )
            total += in_rows
        return {"files": len(files), "rows": total, "skipped": skipped}

    # -- reads ----------------------------------------------------------
    def _scan(self, type_name: str, columns=None):
        import ray.data

        tdir = self._type_dir(type_name)
        files = sorted(
            f
            for g in self._groups(type_name)
            for f in glob.glob(os.path.join(g, "cell_bucket=*", "*.parquet"))
        ) + sorted(
            glob.glob(os.path.join(tdir, "cell_bucket=*", "*.parquet"))
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
        from .pipelines.query import read_pages_pruned_multi

        cfg = self.get_type(type_name)
        need = columns
        if need is not None:
            need = sorted(
                set(need)
                | {cfg["lon_col"], cfg["lat_col"]}
                | ({cfg["time_col"]}
                   if (t_start is not None or t_end is not None)
                   and cfg["time_col"] else set())
                | ({"visibility"} if authorizations is not None else set())
            )
        ds, _info = read_pages_pruned_multi(
            self._type_dir(type_name), [tuple(box)], columns=need,
            tier=cfg["tier"], n_buckets=cfg["n_buckets"],
        )
        lon_c, lat_c = cfg["lon_col"], cfg["lat_col"]
        time_c = cfg["time_col"]
        if (t_start is not None or t_end is not None) and not time_c:
            raise ValueError(
                f"type {type_name!r} has no time_col; declare one in "
                f"add_type to use time-range constraints"
            )
        x0, y0, x1, y1 = box

        def fine(b: pa.Table) -> pa.Table:
            lon = b.column(lon_c).to_numpy(zero_copy_only=False)
            lat = b.column(lat_c).to_numpy(zero_copy_only=False)
            m = (lon >= x0) & (lon <= x1) & (lat >= y0) & (lat <= y1)
            if t_start is not None or t_end is not None:
                ts = b.column(time_c).to_numpy(zero_copy_only=False)
                if t_start is not None:
                    m &= ts >= np.datetime64(t_start)
                if t_end is not None:
                    m &= ts < np.datetime64(t_end)
            return b.filter(pa.array(m))

        out = ds.map_batches(fine, batch_format="pyarrow", batch_size=None)
        if authorizations is not None:
            from .pipelines.query import visibility_filter

            out = visibility_filter(out, set(authorizations))
        return out.select_columns(columns) if columns else out

    def query(self, gwql_str: str, columns=None):
        """``query(queryStr)`` — the GWQL string API: FROM names a
        registered type; spatial predicates bind to the type's
        (lon, lat) columns. When the WHERE clause is a conjunction led
        by a BBOX predicate (and contains no top-level OR), the scan is
        routed through the PRUNED bucket read — the reference's
        index-constraint extraction; the full WHERE still runs as the
        fine filter, so pruning is a pure superset optimization."""
        import re

        from . import gwql as gw

        stmt = gw.parse(gwql_str)  # table routing; re-parsed with geom below
        cfg = self.get_type(stmt.table)
        box = self._safe_bbox_conjunct(gwql_str)
        attr = None if box is not None else self._safe_attr_conjunct(gwql_str)
        if box is not None:
            from .pipelines.query import read_pages_pruned_multi

            src, _info = read_pages_pruned_multi(
                self._type_dir(stmt.table), [box], columns=columns,
                tier=cfg["tier"], n_buckets=cfg["n_buckets"],
            )
        else:
            src = None
            if attr is not None:
                # non-spatial predicate: let the planner pick a
                # secondary index (chooseBestIndex role —
                # BaseDataStoreUtils.java:1004-1150 at the user
                # surface). Routed reads are supersets; the full WHERE
                # still runs as the fine filter below.
                from .pipelines.planner import (
                    Constraints, choose_best_index, plan_read,
                )

                c = Constraints(attr=(attr[0], [attr[1]]))
                cat = self._catalog(stmt.table)
                if choose_best_index(c, cat) in ("enum", "attribute"):
                    need = columns
                    if need is not None:
                        need = sorted(set(need) | {attr[0]})
                    src, _info = plan_read(c, cat, columns=need)
            if src is None:
                src = self._scan(stmt.table, columns=columns)
        return gw.execute_stmt(
            gw.parse(gwql_str, geom=(cfg["lon_col"], cfg["lat_col"])),
            {stmt.table: src},
        )

    @staticmethod
    def _safe_bbox_conjunct(gwql_str: str):
        """(xmin, ymin, xmax, ymax) when the WHERE clause STARTS with a
        4-numeric-arg BBOX predicate and contains no top-level OR —
        the only shape where bucket pruning to that box cannot drop
        rows another disjunct would match. Conservative by design:
        anything else returns None (full scan, still correct).

        The clause-terminator / top-level-OR scan runs over a copy
        with quoted string literals blanked out (same length, so BBOX
        arg offsets are preserved): a literal like ``'limit one'`` or
        ``'a or b'`` must not terminate the clause early or be read as
        a disjunction — either would wrongly enable pruning on a
        predicate whose other disjunct matches rows outside the box."""
        import re

        # blank out '...' literals (GWQL escapes a quote by doubling it,
        # so '' inside a literal stays inside the blanked span)
        gwql_scan = re.sub(
            r"'(?:[^']|'')*'",
            lambda m: "'" + " " * (len(m.group(0)) - 2) + "'",
            gwql_str,
        )
        m = re.search(r"\bWHERE\b(.*?)(\bORDER\b|\bLIMIT\b|\bGROUP\b|$)",
                      gwql_scan, re.IGNORECASE | re.DOTALL)
        if not m:
            return None
        where = m.group(1)
        # reject any OR outside parentheses
        depth = 0
        for tok in re.findall(r"[()]|\bOR\b", where, re.IGNORECASE):
            if tok == "(":
                depth += 1
            elif tok == ")":
                depth -= 1
            elif depth == 0:
                return None
        mb = re.match(
            r"\s*BBOX\s*\(\s*\w+\s*,\s*(-?[\d.]+)\s*,\s*(-?[\d.]+)\s*,"
            r"\s*(-?[\d.]+)\s*,\s*(-?[\d.]+)\s*\)",
            where, re.IGNORECASE,
        )
        if not mb:
            return None
        return tuple(float(mb.group(i)) for i in range(1, 5))

    @staticmethod
    def _safe_attr_conjunct(gwql_str: str):
        """(col, value) when the WHERE clause STARTS with an equality
        on a plain column (``col = <literal>``) and contains no
        top-level OR — the only shape where serving rows from a
        secondary index cannot drop rows another disjunct would match.
        Conservative: anything else returns None (full scan)."""
        import re

        gwql_scan = re.sub(
            r"'(?:[^']|'')*'",
            lambda m: "'" + " " * (len(m.group(0)) - 2) + "'",
            gwql_str,
        )
        m = re.search(r"\bWHERE\b(.*?)(\bORDER\b|\bLIMIT\b|\bGROUP\b|$)",
                      gwql_scan, re.IGNORECASE | re.DOTALL)
        if not m:
            return None
        where = m.group(1)
        depth = 0
        for tok in re.findall(r"[()]|\bOR\b", where, re.IGNORECASE):
            if tok == "(":
                depth += 1
            elif tok == ")":
                depth -= 1
            elif depth == 0:
                return None
        ma = re.match(r"\s*(\w+)\s*=\s*('|-?[\d.]+)", where)
        if not ma:
            return None
        col = ma.group(1)
        if ma.group(2) != "'":
            raw = ma.group(2)
            return col, (float(raw) if "." in raw else int(raw))
        # string literal: slice it out of the ORIGINAL text (blanking
        # preserved every offset) and undo the '' escape
        start = m.start(1) + ma.start(2)
        ml = re.match(r"'(?:[^']|'')*'", gwql_str[start:])
        if not ml:
            return None
        return col, ml.group(0)[1:-1].replace("''", "'")

    def explain(self, gwql_str: str) -> dict:
        """``geowave explain`` at the facade: the route query() WOULD
        take plus its pruning evidence, without reading data."""
        from . import gwql as gw
        from .pipelines.planner import Constraints
        from .pipelines.planner import explain as plan_explain

        stmt = gw.parse(gwql_str)
        box = self._safe_bbox_conjunct(gwql_str)
        attr = None if box is not None else self._safe_attr_conjunct(gwql_str)
        c = Constraints(
            boxes=[box] if box is not None else None,
            attr=(attr[0], [attr[1]]) if attr is not None else None,
        )
        return plan_explain(c, self._catalog(stmt.table))

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
        for group in self._groups(type_name):
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
        # rewritten groups invalidate their secondary-index subtrees
        for group in self._groups(type_name):
            self._maintain_indexes(type_name, group)
        return deleted

    def _rebuild_manifest(self, type_name: str) -> None:
        """Replace the type's manifest with footer-derived statistics
        (one entry per group; counts + per-bucket histogram)."""
        from .state import manifest as mf

        tdir = self._type_dir(type_name)
        man = os.path.join(tdir, "_manifest")
        shutil.rmtree(man, ignore_errors=True)
        for group in self._groups(type_name):
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
        # ALWAYS sync the destination's registration to the rewritten
        # layout: a stale n_buckets would make its pruned reads compute
        # bucket ids against partitions that don't exist
        meta = other._load_meta()
        meta[type_name] = dict(cfg)
        meta[type_name]["n_buckets"] = n_buckets or cfg["n_buckets"]
        other._save_meta(meta)
        return res

    def compact(self, type_name: str, out: "DataStore") -> dict:
        """CompactCommand role for one type."""
        from .pipelines.maintenance import compact_store

        return compact_store(
            self._type_dir(type_name), out._type_dir(type_name)
        )
