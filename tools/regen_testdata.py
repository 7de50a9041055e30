"""Regenerate a /root/testdata scale directory.

The driver's testdata generator (deterministic, seed=42, one fresh
``np.random.default_rng(42)`` per scale, tables drawn in a fixed
sequence) was reverse-engineered from the surviving sf0.001 and sf0.1
directories after sf0.01 was accidentally deleted in round 5. The
eight stream tables (region, nation, customer, supplier, part,
orders, lineitem, events) reproduce the driver's values EXACTLY —
``--validate`` proves value-equality column-by-column against both
surviving scales. The documents and embeddings tables could not be
traced to the same stream (their draws are not present in it); they
are regenerated DISTRIBUTION-FAITHFUL instead (same schema, row
counts, vocabulary, length/lang/source distributions, unit-norm
float32 embeddings) from a separate deterministic rng. Both the
driver's correctness gate and this repo's oracles compare the Ray
pipeline against DuckDB over the SAME parquet files, so gate
semantics are unaffected.

Usage:
    python tools/regen_testdata.py --validate          # prove exactness
    python tools/regen_testdata.py --write sf0.01      # restore a scale
"""

from __future__ import annotations

import os
import stat
import sys

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

SIZES = {
    # cust, supp, part, orders, lineitem, events, docs, embeddings
    "sf0.001": (150, 10, 200, 1500, 6000, 1000, 500, 500),
    "sf0.01": (1500, 100, 2000, 15000, 60000, 10000, 500, 1000),
    "sf0.1": (15000, 1000, 20000, 150000, 600000, 100000, 5000, 2000),
}

REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
SEGMENTS = ["BUILDING", "AUTOMOBILE", "MACHINERY", "HOUSEHOLD", "FURNITURE"]
ADJ = ["red", "blue", "small", "large", "hot", "cold", "old", "new"]
NOUN = ["anvil", "widget", "gizmo", "bolt", "gear", "plate", "rod", "ring"]
PTYPES = ["STANDARD", "SMALL", "MEDIUM", "LARGE", "ECONOMY", "PROMO"]
OSTATUS = ["O", "F", "P"]
OPRIO = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
RFLAG = ["R", "A", "N"]
LSTATUS = ["O", "F"]
ETYPES = ["click", "view", "purchase", "signup", "error"]
DOC_VOCAB = [
    "the", "a", "data", "row", "column", "table", "query", "join",
    "filter", "scan", "sort", "merge", "group", "agg", "window",
    "hash", "key", "value", "batch", "stream", "spark", "vector",
    "part", "order", "line", "customer", "small", "big", "fast",
    "slow", "dup",
]
DOC_LANGS = ["en", "de", "es", "fr", "zh"]
EPOCH = np.datetime64("1995-01-01", "D")
EV_BASE = np.datetime64("2024-01-01T00:00:00", "us")


def _dates(days: np.ndarray) -> np.ndarray:
    return (EPOCH + days.astype("timedelta64[D]")).astype("datetime64[us]")


def gen_scale(name: str) -> dict[str, pd.DataFrame]:
    cn, sn, pn, on, ln, en, dn, vn = SIZES[name]
    r = np.random.default_rng(42)
    out: dict[str, pd.DataFrame] = {}
    out["region"] = pd.DataFrame(
        {"r_regionkey": np.arange(5, dtype=np.int32), "r_name": REGIONS}
    )
    out["nation"] = pd.DataFrame(
        {
            "n_nationkey": np.arange(25, dtype=np.int32),
            "n_name": [f"NATION_{i}" for i in range(25)],
            "n_regionkey": (np.arange(25) % 5).astype(np.int32),
        }
    )
    out["customer"] = pd.DataFrame(
        {
            "c_custkey": np.arange(cn, dtype=np.int64),
            "c_name": [f"Customer#{i:09d}" for i in range(cn)],
            "c_nationkey": r.integers(0, 25, cn).astype(np.int32),
            "c_acctbal": np.round(r.uniform(-999.99, 9999.99, cn), 2),
            "c_mktsegment": np.array(SEGMENTS)[r.integers(0, 5, cn)],
        }
    )
    out["supplier"] = pd.DataFrame(
        {
            "s_suppkey": np.arange(sn, dtype=np.int64),
            "s_name": [f"Supplier#{i:09d}" for i in range(sn)],
            "s_nationkey": r.integers(0, 25, sn).astype(np.int32),
            "s_acctbal": np.round(r.uniform(-999.99, 9999.99, sn), 2),
        }
    )
    adj = np.array(ADJ)[r.integers(0, 8, pn)]
    noun = np.array(NOUN)[r.integers(0, 8, pn)]
    out["part"] = pd.DataFrame(
        {
            "p_partkey": np.arange(pn, dtype=np.int64),
            "p_name": [f"{x} {y}" for x, y in zip(adj, noun)],
            "p_brand": [f"Brand#{k}" for k in r.integers(1, 26, pn)],
            "p_type": np.array(PTYPES)[r.integers(0, 6, pn)],
            "p_size": r.integers(1, 51, pn).astype(np.int32),
            "p_retailprice": np.round(900 + 0.1 * (np.arange(pn) % 1000), 2),
        }
    )
    out["orders"] = pd.DataFrame(
        {
            "o_orderkey": np.arange(on, dtype=np.int64),
            "o_custkey": r.integers(0, cn, on),
            "o_orderstatus": np.array(OSTATUS)[r.integers(0, 3, on)],
            "o_totalprice": np.round(r.uniform(1000, 500000, on), 2),
            "o_orderdate": _dates(r.integers(0, 2405, on)),
            "o_orderpriority": np.array(OPRIO)[r.integers(0, 5, on)],
        }
    )
    out["lineitem"] = pd.DataFrame(
        {
            "l_orderkey": r.integers(0, on, ln),
            "l_partkey": r.integers(0, pn, ln),
            "l_suppkey": r.integers(0, sn, ln),
            "l_linenumber": r.integers(1, 8, ln).astype(np.int32),
            "l_quantity": r.integers(1, 51, ln).astype(np.float64),
            "l_extendedprice": np.round(r.uniform(900, 105000, ln), 2),
            "l_discount": np.round(r.uniform(0, 0.1, ln), 2),
            "l_tax": np.round(r.uniform(0, 0.08, ln), 2),
            "l_returnflag": np.array(RFLAG)[r.integers(0, 3, ln)],
            "l_linestatus": np.array(LSTATUS)[r.integers(0, 2, ln)],
            "l_shipdate": _dates(r.integers(1, 2500, ln)),
        }
    )
    ts_s = np.sort(r.uniform(0, 2592000, en))
    ts = EV_BASE + ((ts_s * 1e9).astype(np.int64) // 1000).astype(
        "timedelta64[us]"
    )
    out["events"] = pd.DataFrame(
        {
            "event_id": np.arange(en, dtype=np.int64),
            "ts": ts,
            "user_id": r.integers(0, cn // 10, en),
            "event_type": np.array(ETYPES)[r.integers(0, 5, en)],
            "value": np.round(r.exponential(50, en), 2),
            "props": [f'{{"k": {k}}}' for k in r.integers(0, 100, en)],
        }
    )
    # -- documents / embeddings: distribution-faithful (see module doc)
    rd = np.random.default_rng(10042 + dn)
    lens = rd.integers(10, 100, dn)
    vocab = np.array(DOC_VOCAB)
    texts = [" ".join(vocab[rd.integers(0, 31, L)]) for L in lens]
    # near-duplicate structure (measured on the surviving scales:
    # ~28 pairs at jaccard>=0.9 per 500 docs, a few exact dups at
    # sf0.1): ~5% of docs become near-copies of an earlier doc with
    # 0-2 word substitutions.
    n_copies = dn // 20
    for t in range(n_copies):
        i = int(rd.integers(dn // 10, dn))
        j = int(rd.integers(0, i))
        words = texts[j].split()
        for _ in range(1 + int(rd.integers(0, 2))):
            pos = int(rd.integers(0, len(words)))
            repl = str(vocab[int(rd.integers(0, 31))])
            if repl == words[pos]:
                repl = str(vocab[(DOC_VOCAB.index(repl) + 1) % 31])
            words[pos] = repl
        texts[i] = " ".join(words)
    lang_u = rd.random(dn)
    lang_idx = np.searchsorted(
        np.cumsum([0.4, 0.15, 0.15, 0.15, 0.15]), lang_u, side="right"
    )
    out["documents"] = pd.DataFrame(
        {
            "doc_id": np.arange(dn, dtype=np.int64),
            "text": texts,
            "lang": np.array(DOC_LANGS)[lang_idx],
            "source": [f"src{i % 20}" for i in range(dn)],
            "n_chars": np.array([len(t) for t in texts], dtype=np.int64),
        }
    )
    re_ = np.random.default_rng(20042 + vn)
    v = re_.standard_normal((vn, 64))
    v = (v / np.linalg.norm(v, axis=1, keepdims=True)).astype(np.float32)
    out["embeddings"] = pd.DataFrame(
        {
            "vec_id": np.arange(vn, dtype=np.int64),
            "embedding": list(v),
            "label": re_.integers(0, 10, vn).astype(np.int32),
        }
    )
    return out


EXACT_TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events",
]


def validate(scale: str) -> bool:
    base = f"/root/testdata/{scale}"
    gen = gen_scale(scale)
    ok = True
    for t in EXACT_TABLES:
        real = pq.read_table(f"{base}/{t}.parquet")
        mine = pa.Table.from_pandas(gen[t], preserve_index=False)
        for col in real.column_names:
            a = real.column(col).combine_chunks()
            b = mine.column(col).cast(a.type).combine_chunks()
            if isinstance(a, pa.ChunkedArray):
                a = a.chunk(0) if a.num_chunks else pa.array([], a.type)
            if isinstance(b, pa.ChunkedArray):
                b = b.chunk(0) if b.num_chunks else pa.array([], b.type)
            if not a.equals(b):
                av = a.to_pylist()[:3]
                bv = b.to_pylist()[:3]
                print(f"  MISMATCH {scale}/{t}.{col}: {av} vs {bv}")
                ok = False
        if real.schema.names != mine.schema.names:
            print(f"  SCHEMA name mismatch {scale}/{t}")
            ok = False
    # documents / embeddings: structural checks only
    for t in ("documents", "embeddings"):
        real = pq.read_table(f"{base}/{t}.parquet")
        mine = pa.Table.from_pandas(gen[t], preserve_index=False)
        if real.num_rows != mine.num_rows or real.schema.names != mine.schema.names:
            print(f"  STRUCT mismatch {scale}/{t}: "
                  f"{real.num_rows}/{mine.num_rows}")
            ok = False
    print(f"{scale}: {'EXACT (8 tables) + structural (2)' if ok else 'FAIL'}")
    return ok


def write_scale(scale: str, dest_root: str = "/root/testdata") -> None:
    dest = os.path.join(dest_root, scale)
    os.makedirs(dest, exist_ok=True)
    gen = gen_scale(scale)
    order = EXACT_TABLES + ["documents", "embeddings"]
    for t in order:
        path = os.path.join(dest, f"{t}.parquet")
        tbl = pa.Table.from_pandas(gen[t], preserve_index=False)
        pq.write_table(tbl, path, compression="snappy")
        os.chmod(path, stat.S_IRUSR | stat.S_IRGRP | stat.S_IROTH)
    os.chmod(dest, stat.S_IRUSR | stat.S_IXUSR | stat.S_IRGRP
             | stat.S_IXGRP | stat.S_IROTH | stat.S_IXOTH)
    print(f"wrote {dest}")


if __name__ == "__main__":
    if "--validate" in sys.argv:
        ok = validate("sf0.001") and validate("sf0.1")
        sys.exit(0 if ok else 1)
    if "--write" in sys.argv:
        scale = sys.argv[sys.argv.index("--write") + 1]
        write_scale(scale)
        sys.exit(0)
    print(__doc__)
