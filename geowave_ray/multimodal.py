"""Multimodal binary-column operators.

The brief's pattern: image/audio/video payloads ride as opaque
``binary`` columns with typed metadata; decode / feature-extract /
resize / frame-sample run as actor-pool ``map_batches`` stages. No
codec libraries exist in this environment, so the DECODE KERNEL is
stubbed — ``decoder="real"`` raises ``NotImplementedError`` with the
integration point documented, and ``decoder="fake"`` (default for
tests) produces a deterministic pure-function-of-bytes decode so the
Ray-side plumbing (schema, batching, actor signature, output layout)
is real and testable end-to-end.

Our ``pages.html`` column plays the binary-payload role; the same
stages apply unchanged to image/audio bytes.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data


def binary_meta_batch(batch: pa.Table, col: str = "html") -> pa.Table:
    """Typed metadata for a binary column — vectorized, no decode."""
    data = batch.column(col)
    return pa.table(
        {
            "url": batch.column("url"),
            # int64 to match SQL octet_length's BIGINT
            "n_bytes": pc.cast(pc.binary_length(data), pa.int64()),
        }
    )


class BinaryDecoder:
    """Actor-pool stage: decode a binary payload column into a
    fixed-size feature vector.

    ``decoder='real'`` is the integration point for an actual codec
    (PIL / libsndfile / pyav — NOT available in this container);
    ``decoder='fake'`` is a deterministic stand-in: a 16-bin byte
    histogram normalized by length, which exercises the identical
    plumbing (per-actor setup, batch in/out schema, feature layout).
    """

    def __init__(self, col: str = "html", decoder: str = "fake", dim: int = 16):
        self.col = col
        self.dim = dim
        if decoder == "real":
            raise NotImplementedError(
                "no external codec libs in this environment; use the "
                "pure-Python codecs — decoder='png'/'gif'/'bmp'/'wav', "
                "or 'image' (magic-byte dispatch) — or plug PIL / "
                "soundfile here: the batch plumbing is decoder-agnostic"
            )
        if decoder not in ("fake", "png", "wav", "gif", "bmp", "jpeg",
                           "image"):
            raise ValueError(f"unknown decoder {decoder!r}")
        self.decoder = decoder

    @staticmethod
    def sniff(payload: bytes) -> str:
        """Container format from magic bytes (web-crawl payloads carry
        no reliable content-type) — png/gif/bmp/wav or 'unknown'."""
        if payload[:8] == b"\x89PNG\r\n\x1a\n":
            return "png"
        if payload[:6] in (b"GIF87a", b"GIF89a"):
            return "gif"
        if payload[:3] == b"\xff\xd8\xff":
            return "jpeg"
        if payload[:2] == b"BM":
            return "bmp"
        if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
            return "wav"
        if payload[:4] == b"RIFF" and payload[8:12] == b"AVI ":
            return "avi"
        return "unknown"

    def _decode_image(self, payload: bytes, kind: str) -> np.ndarray:
        if kind == "png":
            from .sources.png import decode
        elif kind == "gif":
            from .sources.gif import decode
        elif kind == "jpeg":
            from .sources.jpeg import decode
        elif kind == "avi":
            # video payload in an image-feature column: first frame
            from .sources.avi import decode_frame, probe

            def decode(buf):  # noqa: ANN001 — local shim
                meta = probe(buf)
                return decode_frame(buf, meta, 0), meta
        elif kind == "bmp":
            from .sources.bmp import decode
        else:
            raise ValueError(f"no image decoder for container {kind!r}")
        img, _meta = decode(payload)
        flat = img.reshape(-1)
        hist = np.bincount(flat >> 4, minlength=self.dim).astype(np.float64)
        return hist / len(flat)

    def _decode_wav(self, payload: bytes) -> np.ndarray:
        # REAL decode (sources/wav.py): value-range histogram of
        # the decoded PCM samples — bits-aware integer binning so
        # the feature is exact for any sample width.
        from .sources.wav import decode as wav_decode

        s, meta = wav_decode(payload)
        flat = s.reshape(-1)
        if meta["format"] == "float":
            bins = np.clip(((flat + 1.0) * 8).astype(np.int64), 0,
                           self.dim - 1)
        else:
            half = 1 << (meta["bits"] - 1)
            bins = ((flat.astype(np.int64) + half) * self.dim) >> meta["bits"]
            bins = np.clip(bins, 0, self.dim - 1)
        hist = np.bincount(bins, minlength=self.dim).astype(np.float64)
        return hist / len(flat)

    def _decode_one(self, payload: bytes) -> np.ndarray:
        if self.decoder == "wav":
            return self._decode_wav(payload)
        if self.decoder in ("png", "gif", "bmp", "jpeg"):
            # REAL decode (sources/{png,gif,bmp}.py): per-pixel
            # intensity histogram of the decoded samples, normalized —
            # same feature layout as the fake path, real codec work.
            return self._decode_image(payload, self.decoder)
        if self.decoder == "image":
            # mixed-container column: dispatch per payload by magic
            kind = self.sniff(payload)
            if kind == "unknown":
                return np.zeros(self.dim, dtype=np.float64)
            if kind == "wav":
                return self._decode_wav(payload)
            return self._decode_image(payload, kind)
        arr = np.frombuffer(payload, dtype=np.uint8)
        if len(arr) == 0:
            return np.zeros(self.dim, dtype=np.float64)
        hist = np.bincount(arr >> 4, minlength=self.dim).astype(np.float64)
        return hist / len(arr)

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column(self.col).to_pylist()
        feats = np.stack([self._decode_one(p) for p in payloads])
        return pa.table(
            {
                "url": batch.column("url"),
                "feature": pa.array(list(feats), pa.list_(pa.float64(), self.dim)),
            }
        )


def decode_features(
    ds: ray.data.Dataset,
    col: str = "html",
    decoder: str = "fake",
    concurrency: int | tuple = 4,
    batch_size: int = 1024,
) -> ray.data.Dataset:
    """Binary column -> feature vectors via an actor pool (small batches:
    binary payloads are wide — the memory-aware batch sizing rule)."""
    return ds.map_batches(
        BinaryDecoder,
        fn_constructor_kwargs=dict(col=col, decoder=decoder),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


class FeatureResizer:
    """Actor-pool stage: resize a fixed-size feature vector column by
    integer-factor mean pooling — the image-resize plumbing role
    (``RasterTileResizeHelper.java:91-126``): fixed-size-list in,
    smaller fixed-size-list out, vectorized across the batch."""

    def __init__(self, in_dim: int = 16, out_dim: int = 4, col: str = "feature"):
        if in_dim % out_dim:
            raise ValueError("in_dim must be a multiple of out_dim")
        self.in_dim = in_dim
        self.out_dim = out_dim
        self.col = col

    def __call__(self, batch: pa.Table) -> pa.Table:
        col = batch.column(self.col)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        flat = pc.list_flatten(col).to_numpy(zero_copy_only=False)
        m = flat.reshape(-1, self.in_dim)
        pooled = m.reshape(len(m), self.out_dim, self.in_dim // self.out_dim).mean(axis=2)
        return pa.table(
            {
                "url": batch.column("url"),
                "feature": pa.FixedSizeListArray.from_arrays(
                    pa.array(pooled.ravel(), pa.float64()), self.out_dim
                ),
            }
        )


def resize_features(
    ds: ray.data.Dataset,
    in_dim: int = 16,
    out_dim: int = 4,
    concurrency: int | tuple = 4,
    batch_size: int = 2048,
) -> ray.data.Dataset:
    return ds.map_batches(
        FeatureResizer,
        fn_constructor_kwargs=dict(in_dim=in_dim, out_dim=out_dim),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


class FrameSampler:
    """Actor-pool stage: REAL video frame sampling over AVI/MJPEG
    payloads (sources/avi.py). ``probe()`` reads only the container
    index, then every ``every_n``-th frame is decoded independently
    (Motion-JPEG has no inter-frame state) -> one output row per
    sampled frame with the decoded frame's pixel stats. This is the
    frame-sample pattern a 100 TB clip corpus needs: per-payload work
    is proportional to the SAMPLED frames, not the clip length."""

    def __init__(self, col: str = "payload", every_n: int = 2,
                 id_col: str = "vid_id"):
        from .sources.avi import decode_frame, probe

        self.col = col
        self.id_col = id_col
        self.every_n = every_n
        self.probe = probe
        self.decode_frame = decode_frame

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, fidx, ws, hs, sums, mins, maxs = [], [], [], [], [], [], []
        vid_ids = batch.column(self.id_col).to_pylist()
        for vid, v in zip(vid_ids, batch.column(self.col)):
            buf = v.as_py()
            meta = self.probe(buf)
            for i in range(0, len(meta["frames"]), self.every_n):
                img = self.decode_frame(buf, meta, i)
                flat = img.reshape(-1).astype(np.int64)
                ids.append(vid)
                fidx.append(i)
                ws.append(meta["width"])
                hs.append(meta["height"])
                sums.append(int(flat.sum()))
                mins.append(int(flat.min()))
                maxs.append(int(flat.max()))
        return pa.table(
            {
                self.id_col: pa.array(ids, pa.int64()),
                "frame_idx": pa.array(fidx, pa.int64()),
                "width": pa.array(ws, pa.int64()),
                "height": pa.array(hs, pa.int64()),
                "px_sum": pa.array(sums, pa.int64()),
                "px_min": pa.array(mins, pa.int64()),
                "px_max": pa.array(maxs, pa.int64()),
            }
        )


def sample_frames(
    ds: ray.data.Dataset,
    col: str = "payload",
    every_n: int = 2,
    id_col: str = "vid_id",
    concurrency: int | tuple = 4,
    batch_size: int = 32,
) -> ray.data.Dataset:
    """Video column -> one row per sampled decoded frame (small
    batches: clip payloads are wide)."""
    return ds.map_batches(
        FrameSampler,
        fn_constructor_kwargs=dict(col=col, every_n=every_n, id_col=id_col),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def sample_chunks(
    ds: ray.data.Dataset,
    col: str = "html",
    chunk_bytes: int = 64,
    every_n: int = 4,
) -> ray.data.Dataset:
    """Frame-sampling analogue: slice every ``every_n``-th
    ``chunk_bytes`` window out of each payload -> one row per sampled
    chunk (url, chunk_idx, chunk)."""

    def fb(batch: pa.Table) -> pa.Table:
        urls = batch.column("url").to_pylist()
        payloads = batch.column(col).to_pylist()
        out_u, out_i, out_c = [], [], []
        for u, p in zip(urls, payloads):
            n_chunks = max(1, len(p) // chunk_bytes)
            for ci in range(0, n_chunks, every_n):
                out_u.append(u)
                out_i.append(ci)
                out_c.append(p[ci * chunk_bytes : (ci + 1) * chunk_bytes])
        return pa.table(
            {
                "url": pa.array(out_u, pa.string()),
                "chunk_idx": pa.array(out_i, pa.int64()),
                "chunk": pa.array(out_c, pa.binary()),
            }
        )

    return ds.map_batches(fb, batch_format="pyarrow", batch_size=1024)
