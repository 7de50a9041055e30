"""Small runtime helpers."""

from __future__ import annotations


def ncpus() -> int:
    import ray

    try:
        return int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        return 8


def pool_size() -> int:
    """Actor-pool size scaled to the cluster: half the CPUs, capped.

    Fixed pools start immediately (Ray's autoscaling pools ramp up too
    slowly for short stages); half the CPUs leaves headroom for the
    upstream read/parse tasks so the pipeline stays saturated rather
    than serializing behind a pool that reserved every core."""
    return max(2, min(16, ncpus() // 2))


_WORKER_CACHE: dict = {}


def cached_state(key, ref, builder=None):
    """Per-worker-process memo for broadcast state in STATELESS stages.

    Ray worker processes persist across tasks and stages, so a plain
    ``map_batches(fn)`` task can ``ray.get`` a broadcast object once
    per worker and reuse it — without paying an actor pool's spawn
    latency. Use this for light state (an index that unpickles in
    milliseconds); keep callable-class actor pools for heavy state
    (model weights, multi-GB indexes) where spawn cost amortizes.
    """
    import ray

    if key not in _WORKER_CACHE:
        obj = ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref
        _WORKER_CACHE[key] = builder(obj) if builder else obj
    return _WORKER_CACHE[key]


def read_blocks() -> int:
    """override_num_blocks for reads feeding CPU-bound stages: a few
    blocks per core so the work spreads even when the input has few
    files."""
    return 4 * ncpus()


def exchange_blocks() -> int:
    """Block count for bounded bucket exchanges: enough blocks to keep
    every core busy in the reduce, but never the tiny-block storm that
    makes Ray's sort shuffle scheduling-bound (NOTES r2: 64 blocks x
    1.2k rows cost 10s of scheduling on <1s of compute). One block per
    core, floor 16."""
    return max(16, ncpus())


def decode_boundary(kind: str):
    """Decorator for binary-format parse entry points: converts the
    residual low-level exceptions a truncated/corrupt buffer can
    surface (struct.error, IndexError, zlib.error, numpy reshape
    errors arriving as generic ValueError already pass through) into
    the module-family's documented ValueError contract, keeping
    semantic ValueErrors untouched. A malformed payload in a crawl
    must fail a record with a catchable, uniform error — not kill the
    batch with whatever slicing raised first."""
    import functools
    import struct as _struct
    import zlib as _zlib

    def deco(fn):
        @functools.wraps(fn)
        def wrapped(*a, **kw):
            try:
                return fn(*a, **kw)
            except (_struct.error, IndexError, _zlib.error, KeyError,
                    OverflowError, MemoryError) as e:
                raise ValueError(
                    f"{kind}: truncated or corrupt input "
                    f"({type(e).__name__}: {e})"
                ) from None

        return wrapped

    return deco
