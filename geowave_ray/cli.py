"""CLI harness — the ``geowave <command>`` parity surface
(reference: ``core/cli/.../GeoWaveMain.java`` + operation registry).

Commands:

    python -m geowave_ray.cli ingest  <pages_dir> <out_dir> [--resume]
    python -m geowave_ray.cli join    <pages_dir> <regions.parquet> <out_dir>
    python -m geowave_ray.cli query   <pages_dir> --bbox xmin ymin xmax ymax
    python -m geowave_ray.cli knn     <pages_dir> <knn_queries.parquet> [--k 10]
    python -m geowave_ray.cli gwql    "<SELECT ...>" --table name=path ...
    python -m geowave_ray.cli stats   <manifest_dir>
    python -m geowave_ray.cli decode  <media.parquet> <out_dir> --col blob
    python -m geowave_ray.cli sample-frames <videos.parquet> <out_dir>
    python -m geowave_ray.cli ingest-warc <warcs.parquet> <store_dir>

The CLI owns its Ray session (guarded init, shutdown at exit) —
library code never does.
"""

from __future__ import annotations

import argparse
import json
import sys


def _session(num_cpus: int | None):
    import ray

    if not ray.is_initialized():
        kwargs = dict(
            address="local", include_dashboard=False,
            ignore_reinit_error=True, logging_level="ERROR",
        )
        if num_cpus:
            kwargs["num_cpus"] = num_cpus
        ray.init(**kwargs)
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="geowave_ray")
    p.add_argument("--num-cpus", type=int, default=None)
    sub = p.add_subparsers(dest="cmd", required=True)

    pi = sub.add_parser("ingest")
    pi.add_argument("pages_dir")
    pi.add_argument("out_dir")
    pi.add_argument("--no-resume", action="store_true")

    pj = sub.add_parser("join")
    pj.add_argument("pages_dir")
    pj.add_argument("regions_parquet")
    pj.add_argument("out_dir")

    pq_ = sub.add_parser("query")
    pq_.add_argument("pages_dir")
    pq_.add_argument("--bbox", nargs=4, type=float, required=True)
    pq_.add_argument("--limit", type=int, default=10)

    pk = sub.add_parser("knn")
    pk.add_argument("pages_dir")
    pk.add_argument("knn_queries")

    pg = sub.add_parser("gwql")
    pg.add_argument("sql")
    pg.add_argument("--table", action="append", default=[], help="name=parquet_path")
    pg.add_argument("--limit", type=int, default=20)

    ps = sub.add_parser("stats")
    ps.add_argument("manifest_dir")

    pd_ = sub.add_parser("dedup", help="exact dedup of a documents table")
    pd_.add_argument("docs_parquet")
    pd_.add_argument("out_dir")
    pd_.add_argument("--id-col", default="doc_id")

    pc_ = sub.add_parser(
        "curate",
        help="blocklist -> exact dedup -> quality filter -> split -> write",
    )
    pc_.add_argument("docs_parquet")
    pc_.add_argument("out_dir")
    pc_.add_argument("--id-col", default="doc_id")
    pc_.add_argument("--block", action="append", default=[],
                     help="blocked domain (repeatable; needs --url-col)")
    pc_.add_argument("--url-col", default=None)
    pc_.add_argument("--min-tokens", type=int, default=50)
    pc_.add_argument("--max-top-unigram", type=float, default=0.09)

    pe = sub.add_parser(
        "explain",
        help="show the index a query would use + pruning, without running it",
    )
    pe.add_argument("store_dir", help="cell-bucket store root")
    pe.add_argument("--bbox", nargs=4, type=float, required=True)
    pe.add_argument("--st-store", default=None)
    pe.add_argument("--time", nargs=2, type=int, default=None,
                    help="t0_us t1_us (half-open)")

    pm = sub.add_parser(
        "compact", help="merge each cell_bucket partition's files (sorted)"
    )
    pm.add_argument("store_dir")
    pm.add_argument("out_dir")
    pm.add_argument("--rows-per-file", type=int, default=4_000_000)

    # streaming spool ingest (core/ingest/kafka CLI role:
    # `geowave ingest localToKafka` / `kafkaToGW`)
    pks = sub.add_parser(
        "stage-kafka", help="stage local files into a topic spool as Avro segments"
    )
    pks.add_argument("input_dir")
    pks.add_argument("topic_dir")
    pks.add_argument("--records-per-segment", type=int, default=256)
    pkc = sub.add_parser(
        "ingest-kafka", help="consume a topic spool into a parquet store (gpx plugin)"
    )
    pkc.add_argument("topic_dir")
    pkc.add_argument("store_dir")
    pkc.add_argument("--group", default="ingest")
    pkc.add_argument("--batch-size", type=int, default=None,
                     help="max records per poll (Kafka batchSize role)")
    pkc.add_argument("--max-polls", type=int, default=None)

    pw = sub.add_parser(
        "ingest-warc", help="WARC table -> parse -> HTML text extract "
        "-> language-ID -> geotag -> spatial store (the Common-Crawl "
        "ingest chain end-to-end)"
    )
    pw.add_argument("warc_table", help="parquet with (file_id, warc) rows")
    pw.add_argument("out_dir")
    pw.add_argument("--no-resume", action="store_true")

    pdc = sub.add_parser(
        "decode", help="decode a binary media column (jpeg/png/gif/bmp/"
        "wav sniffed per payload) into 16-bin feature vectors"
    )
    pdc.add_argument("table", help="parquet file/dir with a binary column")
    pdc.add_argument("out_dir")
    pdc.add_argument("--col", default="payload")
    pdc.add_argument("--url-col", default="url",
                     help="id/url column carried through to the output")
    pdc.add_argument("--batch-size", type=int, default=256)
    pdc.add_argument("--concurrency", type=int, default=2,
                     help="decode actor pool size (leave CPUs free for "
                     "the read/write operators)")

    pfs = sub.add_parser(
        "sample-frames", help="sample + decode every Nth frame of an "
        "AVI/MJPEG video column into per-frame pixel stats"
    )
    pfs.add_argument("table")
    pfs.add_argument("out_dir")
    pfs.add_argument("--col", default="payload")
    pfs.add_argument("--id-col", default="vid_id")
    pfs.add_argument("--every-n", type=int, default=2)
    pfs.add_argument("--concurrency", type=int, default=2)

    psv = sub.add_parser(
        "serve", help="JSON-over-HTTP service over a DataStore root "
        "(services/rest role)"
    )
    psv.add_argument("store_root")
    psv.add_argument("--port", type=int, default=8080)
    psv.add_argument("--num-cpus", type=int, default=None)

    args = p.parse_args(argv)
    if args.cmd == "serve":
        import time as _time

        from .service import serve

        _session(args.num_cpus)
        srv, port = serve(args.store_root, port=args.port)
        print(json.dumps({"listening": port}), flush=True)
        try:
            while True:
                _time.sleep(3600)
        except KeyboardInterrupt:
            srv.shutdown()
        return 0
    if args.cmd == "explain":  # driver-side only: routing + footer math
        from .pipelines.planner import Catalog, Constraints, explain

        cat = Catalog(spatial_store=args.store_dir, st_store=args.st_store)
        c = Constraints(
            boxes=[tuple(args.bbox)],
            time=tuple(args.time) if args.time else None,
        )
        print(json.dumps(explain(c, cat)))
        return 0
    if args.cmd == "stats":  # driver-side only, no Ray needed
        from .state import manifest as mf
        from .stats import optimal_count

        print(
            json.dumps(
                {
                    "partitions": len(mf.load_all(args.manifest_dir)),
                    "rows": optimal_count(args.manifest_dir),
                    "hot_cells": sorted(
                        mf.merged_cell_histogram(args.manifest_dir).items(),
                        key=lambda kv: -kv[1],
                    )[:5],
                }
            )
        )
        return 0
    if args.cmd == "stage-kafka":  # driver-side only, no Ray needed
        from .sources.kafka_spool import stage_directory_to_topic

        n = stage_directory_to_topic(
            args.input_dir, args.topic_dir,
            records_per_segment=args.records_per_segment,
        )
        print(json.dumps({"files_staged": n}))
        return 0

    import ray

    _session(args.num_cpus)
    try:
        import ray.data

        from .geotag import geotag_batch

        def pages(path):
            ds = ray.data.read_parquet(path)
            return ds.map_batches(geotag_batch, batch_format="pyarrow", batch_size=None)

        if args.cmd == "ingest":
            from .pipelines.ingest import ingest_pages

            res = ingest_pages(args.pages_dir, args.out_dir, resume=not args.no_resume)
            print(json.dumps(res))
        elif args.cmd == "join":
            from .pipelines.run import run_join_job

            res = run_join_job(args.pages_dir, args.regions_parquet, args.out_dir)
            print(json.dumps(res))
        elif args.cmd == "query":
            from .pipelines.query import bbox_query

            ds = bbox_query(pages(args.pages_dir), *args.bbox)
            rows = ds.take(args.limit)
            print(json.dumps({"count": ds.count(), "sample": [r.get("url") for r in rows]}))
        elif args.cmd == "knn":
            import pyarrow.parquet as pqt

            from .pipelines.knn import knn

            out = knn(pages(args.pages_dir), pqt.read_table(args.knn_queries))
            print(json.dumps({"rows": out.count()}))
        elif args.cmd == "ingest-kafka":
            import pyarrow as pa

            from .sources.gpx import parse_gpx_batch
            from .sources.kafka_spool import consume_to_store

            def parse(b: "pa.Table") -> "pa.Table":
                return parse_gpx_batch(
                    pa.table(
                        {
                            "file_id": b.column("path"),
                            "xml": pa.array(
                                [x.as_py().decode("utf-8")
                                 for x in b.column("payload")],
                                pa.string(),
                            ),
                        }
                    )
                )

            res = consume_to_store(
                args.topic_dir, args.store_dir, parse, group=args.group,
                max_records_per_poll=args.batch_size, max_polls=args.max_polls,
            )
            print(json.dumps(res))
        elif args.cmd == "ingest-warc":
            import pyarrow as pa

            from .pipelines.ingest import ingest_pages
            from .sources.warc import parse_warc_batch
            from .text import LangId, extract_html_text

            class WithLang:
                """Append a lang column (LangId over the extracted
                text) so geotag's url+lang derivation applies."""

                def __init__(self):
                    self.lid = LangId()

                def __call__(self, b: "pa.Table") -> "pa.Table":
                    sub_t = pa.table({
                        "doc_id": pa.array(range(b.num_rows), pa.int64()),
                        "text": b.column("text"),
                    })
                    lang = self.lid(sub_t).column("lang_pred")
                    return b.append_column("lang", lang)

            ds = ray.data.read_parquet(args.warc_table)
            pages_ds = ds.map_batches(
                parse_warc_batch, batch_format="pyarrow", batch_size=16
            )
            pages_ds = extract_html_text(pages_ds, html_col="html",
                                         out_col="text")
            pages_ds = pages_ds.map_batches(
                WithLang, batch_format="pyarrow", concurrency=2
            )
            import shutil

            staged = args.out_dir.rstrip("/") + "_staged_pages"
            # fresh stage each run: appended uniquely-named files would
            # duplicate pages AND renumber the store's resume groups
            shutil.rmtree(staged, ignore_errors=True)
            pages_ds.write_parquet(staged)
            res = ingest_pages(staged, args.out_dir,
                               resume=not args.no_resume)
            res["staged_pages"] = staged
            print(json.dumps(res))
        elif args.cmd == "decode":
            from .multimodal import decode_features

            ds = ray.data.read_parquet(args.table)
            if args.url_col != "url":
                ds = ds.rename_columns({args.url_col: "url"})
            out = decode_features(
                ds, col=args.col, decoder="image",
                batch_size=args.batch_size,
                concurrency=args.concurrency,
            )
            import shutil

            shutil.rmtree(args.out_dir, ignore_errors=True)
            out.write_parquet(args.out_dir)
            print(json.dumps(
                {"rows": ray.data.read_parquet(args.out_dir).count(),
                 "out": args.out_dir}))
        elif args.cmd == "sample-frames":
            from .multimodal import sample_frames

            out = sample_frames(
                ray.data.read_parquet(args.table), col=args.col,
                id_col=args.id_col, every_n=args.every_n,
                concurrency=args.concurrency,
            )
            import shutil

            shutil.rmtree(args.out_dir, ignore_errors=True)
            out.write_parquet(args.out_dir)
            print(json.dumps(
                {"rows": ray.data.read_parquet(args.out_dir).count(),
                 "out": args.out_dir}))
        elif args.cmd == "dedup":
            from .dedup import exact_dedup

            ds = exact_dedup(
                ray.data.read_parquet(args.docs_parquet), id_col=args.id_col
            )
            ds.write_parquet(args.out_dir)
            print(json.dumps({"rows": ray.data.read_parquet(args.out_dir).count()}))
        elif args.cmd == "curate":
            import pyarrow as pa
            import pyarrow.compute as pc

            from .dedup import exact_dedup
            from .text import blocklist_filter, hash_split, repetition_stats_batch

            ds = ray.data.read_parquet(args.docs_parquet)
            if args.block:
                if not args.url_col:
                    raise SystemExit("--block requires --url-col")
                ds = blocklist_filter(ds, args.block, url_col=args.url_col)
            ds = exact_dedup(ds, id_col=args.id_col)
            min_tok, max_top = args.min_tokens, args.max_top_unigram
            id_col = args.id_col

            def keep(batch: "pa.Table") -> "pa.Table":
                m = repetition_stats_batch(batch)
                mask = pc.and_(
                    pc.less_equal(m.column("top_unigram_frac"), pa.scalar(max_top)),
                    pc.greater_equal(
                        m.column("n_tokens"), pa.scalar(min_tok, pa.int64())
                    ),
                )
                t = batch.filter(mask)
                return t.append_column(
                    "split_key", pc.cast(t.column(id_col), pa.string())
                )

            ds = ds.map_batches(keep, batch_format="pyarrow", batch_size=None)
            ds = hash_split(ds, id_col="split_key").drop_columns(["split_key"])
            ds.write_parquet(args.out_dir, partition_cols=["split"])
            out = ray.data.read_parquet(args.out_dir)
            counts = {
                r["split"]: r["count()"]
                for r in out.groupby("split").count().take_all()
            }
            print(json.dumps({"rows": sum(counts.values()), "splits": counts}))
        elif args.cmd == "compact":
            from .pipelines.maintenance import compact_store

            print(json.dumps(compact_store(
                args.store_dir, args.out_dir, rows_per_file=args.rows_per_file
            )))
        elif args.cmd == "gwql":
            from . import gwql

            tables = {}
            for spec in args.table:
                name, path = spec.split("=", 1)
                tables[name] = ray.data.read_parquet(path)
            res = gwql.execute(args.sql, tables)
            for row in res.take(args.limit):
                print(json.dumps(row, default=str))
        return 0
    finally:
        ray.shutdown()


if __name__ == "__main__":
    sys.exit(main())
