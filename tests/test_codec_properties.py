"""Property-based roundtrip tests (hypothesis) for the round-5
codecs: arbitrary images/indices/payloads must survive
encode -> decode exactly (GIF/BMP/WARC; JPEG on flat blocks), and
malformed inputs must raise ValueError — never IndexError or silent
corruption. Example counts are capped to keep suite wall-time sane;
the deterministic golden tests carry the spec coverage."""

import numpy as np
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from geowave_ray.sources import bmp, gif, jpeg, warc

_SETTINGS = dict(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)


@st.composite
def _palette_image(draw):
    h = draw(st.integers(1, 24))
    w = draw(st.integers(1, 24))
    npal = draw(st.integers(2, 256))
    seed = draw(st.integers(0, 2**31 - 1))
    rng = np.random.default_rng(seed)
    pal = rng.integers(0, 256, (npal, 3)).astype(np.uint8)
    idx = rng.integers(0, npal, (h, w)).astype(np.uint8)
    return idx, pal


@given(img=_palette_image(), interlace=st.booleans())
@settings(**_SETTINGS)
def test_gif_roundtrip_property(img, interlace):
    idx, pal = img
    out, meta = gif.decode(gif.encode(idx, pal, interlace=interlace))
    assert np.array_equal(out, pal[idx])
    assert (meta["width"], meta["height"]) == idx.shape[::-1]


@given(img=_palette_image(), top_down=st.booleans())
@settings(**_SETTINGS)
def test_bmp8_roundtrip_property(img, top_down):
    idx, pal = img
    out, _ = bmp.decode(bmp.encode(idx, palette=pal, top_down=top_down))
    assert np.array_equal(out, pal[idx])


@given(h=st.integers(1, 16), w=st.integers(1, 16),
       ch=st.sampled_from([3, 4]), seed=st.integers(0, 2**31 - 1))
@settings(**_SETTINGS)
def test_bmp_truecolor_roundtrip_property(h, w, ch, seed):
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, (h, w, ch)).astype(np.uint8)
    out, _ = bmp.decode(bmp.encode(img))
    assert np.array_equal(out, img)


@given(bh=st.integers(1, 4), bw=st.integers(1, 4),
       seed=st.integers(0, 2**31 - 1))
@settings(**_SETTINGS)
def test_jpeg_flat_blocks_bit_exact_property(bh, bw, seed):
    """Any grid of flat 8x8 blocks survives the full JPEG pipeline
    bit-exactly (the DC-quantizer-8 invariant the oracles lean on)."""
    rng = np.random.default_rng(seed)
    blocks = rng.integers(0, 256, (bh, bw)).astype(np.uint8)
    img = blocks.repeat(8, axis=0).repeat(8, axis=1)
    out, _ = jpeg.decode(jpeg.encode(img))
    assert np.array_equal(out, img)


@given(n=st.integers(1, 8), gz=st.booleans(),
       seed=st.integers(0, 2**31 - 1))
@settings(**_SETTINGS)
def test_warc_roundtrip_property(n, gz, seed):
    rng = np.random.default_rng(seed)
    recs = []
    for i in range(n):
        body = bytes(rng.integers(0, 256, rng.integers(0, 400)).astype(
            np.uint8))
        recs.append({"type": "response", "uri": f"https://r.example/{i}",
                     "date": "2024-05-06T07:08:09Z",
                     "payload": warc.http_response(body)})
    parsed = warc.read_warc(warc.write_warc(recs, gzip_per_record=gz))
    assert len(parsed) == n
    for i, (h, p) in enumerate(parsed):
        assert h["warc-target-uri"] == f"https://r.example/{i}"
        assert p == recs[i]["payload"]


_MAGICS = [b"", b"BM", b"GIF89a", b"\xff\xd8\xff", b"\x89PNG\r\n\x1a\n",
           b"RIFF\xff\xff\xff\xffWAVE", b"RIFF\xff\xff\xff\xffAVI ",
           b"WARC/1.0\r\n", b"\x1f\x8b\x08\x00"]


@given(prefix=st.sampled_from(_MAGICS),
       data=st.binary(min_size=0, max_size=400))
@settings(max_examples=120, deadline=None)
def test_codec_garbage_never_indexerror(prefix, data):
    """Arbitrary bytes — including valid magic prefixes followed by
    garbage (the case pure-random fuzz never reaches) — fed to every
    decoder either parse or raise ValueError: the documented error
    contract (no IndexError / struct.error / zlib.error)."""
    from geowave_ray.sources import avi, png, wav

    buf = prefix + data
    for dec in (gif.decode, bmp.decode, jpeg.decode, warc.read_warc,
                png.decode, wav.decode, avi.decode):
        try:
            dec(buf)
        except ValueError:
            pass
        except Exception as e:  # noqa: BLE001 — the assertion target
            pytest.fail(f"{dec.__module__}: {type(e).__name__}: {e}")


@given(prefix=st.sampled_from([b"", b"II*\x00", b"MM\x00*",
                               b"\x00\x00\x27\x0a" + b"\x00" * 96,
                               b"\x03", b"Obj\x01"]),
       data=st.binary(min_size=0, max_size=200))
@settings(max_examples=80, deadline=None)
def test_wire_parsers_garbage_never_indexerror(prefix, data):
    """Same ValueError contract for the round-4 wire parsers
    (TIFF/SHP/DBF/Avro/TWKB): truncated or hostile buffers — including
    corrupt headers that declare absurd record counts or negative
    record lengths — must fail each record cleanly, never hang or
    leak struct/Index/Memory errors."""
    from geowave_ray import twkb
    from geowave_ray.sources.avro_io import read_container
    from geowave_ray.sources.geotiff import parse_tiff
    from geowave_ray.sources.shapefile import parse_dbf, parse_shp

    buf = prefix + data
    for dec in (parse_tiff, parse_shp, parse_dbf, read_container,
                twkb.decode):
        try:
            dec(buf)
        except ValueError:
            pass
        except Exception as e:  # noqa: BLE001 — the assertion target
            pytest.fail(f"{dec.__module__}: {type(e).__name__}: {e}")
