"""Temporal/spatial expression AST + CQL bridge tests
(reference: core/geotime/.../filter/expression/temporal/*.java,
spatial/*.java, CQLToGeoWaveFilterVisitor.java)."""

import numpy as np
import pyarrow as pa
import pytest

from geowave_ray.cql import (
    parse_cql,
    scol,
    tcol,
    tinterval,
    tlit,
    _INSTANT_US,
)

US = 1_000_000  # one second in microseconds


def _interval_table():
    # intervals in epoch-us (as timestamp cols); a mix of widths incl.
    # empty (end == start -> instant width per TimeUtils.getIntervalEnd)
    starts = np.array([0, 5, 10, 20, 20, 30], dtype=np.int64) * US
    ends = np.array([10, 15, 10, 40, 25, 90], dtype=np.int64) * US
    return pa.table(
        {
            "s": pa.array(starts, pa.timestamp("us")),
            "e": pa.array(ends, pa.timestamp("us")),
        }
    )


def _brute(starts, ends, lit_s, lit_e, fn):
    ends = np.maximum(ends, starts + _INSTANT_US)
    if lit_e <= lit_s:
        lit_e = lit_s + _INSTANT_US
    return np.array([fn(s, e, lit_s, lit_e) for s, e in zip(starts, ends)])


TEMPORAL_MATRIX = [
    # (method, brute-force semantics straight from the reference java)
    ("after", lambda s, e, ls, le: s >= le),
    ("before", lambda s, e, ls, le: e <= ls),
    ("during", lambda s, e, ls, le: s >= ls and e <= le),
    ("before_or_during", lambda s, e, ls, le: e <= le),
    ("during_or_after", lambda s, e, ls, le: s >= ls),
    ("time_overlaps", lambda s, e, ls, le: e > ls and s < le),
    ("tequals", lambda s, e, ls, le: s == ls and e == le),
]


@pytest.mark.parametrize("name,brute", TEMPORAL_MATRIX)
def test_temporal_predicate_matrix(name, brute):
    t = _interval_table()
    starts = t.column("s").cast(pa.int64()).to_numpy()
    ends = t.column("e").cast(pa.int64()).to_numpy()
    iv = tinterval("s", "e")
    for lit_s, lit_e in [(5 * US, 25 * US), (10 * US, 10 * US), (0, 90 * US)]:
        expr = getattr(iv, name)(tlit(lit_s, lit_e))
        got = expr.evaluate(t).to_numpy(zero_copy_only=False)
        want = _brute(starts, ends, lit_s, lit_e, brute)
        assert np.array_equal(got, want), (name, lit_s, lit_e, got, want)


def test_tbetween_and_instant_column():
    t = _interval_table()
    # instant column: width is exactly 1ms (reference TimeUtils +1ms rule)
    inst = tcol("s")
    s0, e0 = inst.evaluate(t)
    assert (e0[0].as_py() - s0[0].as_py()) == _INSTANT_US
    got = tinterval("s", "e").tbetween(tlit(5 * US), tlit(0, 40 * US)).evaluate(t)
    starts = t.column("s").cast(pa.int64()).to_numpy()
    ends = np.maximum(t.column("e").cast(pa.int64()).to_numpy(), starts + _INSTANT_US)
    want = (starts >= 5 * US) & (ends <= 40 * US)
    assert np.array_equal(got.to_numpy(zero_copy_only=False), want)


def test_temporal_null_is_false():
    t = pa.table(
        {
            "s": pa.array([None, 1 * US], pa.timestamp("us")),
            "e": pa.array([2 * US, 2 * US], pa.timestamp("us")),
        }
    )
    got = tinterval("s", "e").during(tlit(0, 10 * US)).evaluate(t)
    assert got.to_pylist() == [False, True]


def _points_table():
    rng = np.random.default_rng(7)
    lon = rng.uniform(-10, 10, 200)
    lat = rng.uniform(-10, 10, 200)
    return pa.table({"lon": lon, "lat": lat, "tag": pa.array(["a"] * 200)})


def test_spatial_bbox_and_pip():
    t = _points_table()
    lon = t.column("lon").to_numpy()
    lat = t.column("lat").to_numpy()
    s = scol()
    got = s.bbox(-5, -5, 5, 5).evaluate(t).to_numpy(zero_copy_only=False)
    want = (lon >= -5) & (lon <= 5) & (lat >= -5) & (lat <= 5)
    assert np.array_equal(got, want)
    # concave polygon goes through the raycast kernel
    ring = np.array([(-5, -5), (5, -5), (5, 5), (0, 0), (-5, 5)], float)
    got2 = s.intersects(ring).evaluate(t).to_numpy(zero_copy_only=False)
    from geowave_ray.geom import pip_raycast

    want2 = pip_raycast(lon, lat, np.vstack([ring, ring[:1]]))
    assert np.array_equal(got2, want2)
    got3 = s.disjoint(ring).evaluate(t).to_numpy(zero_copy_only=False)
    assert np.array_equal(got3, ~want2)


def test_cql_scalar_roundtrip():
    t = pa.table(
        {
            "v": pa.array([1.0, 15.0, 30.0, 70.0]),
            "kind": pa.array(["click", "view", "error", "click"]),
            "note": pa.array(["abc", None, "bcd", "abd"]),
        }
    )
    e = parse_cql("v BETWEEN 10 AND 60 AND kind IN ('click', 'view')")
    assert e.evaluate(t).to_pylist() == [False, True, False, False]
    e2 = parse_cql("note LIKE 'ab%' OR note IS NULL")
    assert e2.evaluate(t).to_pylist() == [True, True, False, True]
    e3 = parse_cql("NOT (v < 20)")
    assert e3.evaluate(t).to_pylist() == [False, False, True, True]


def test_cql_temporal_and_spatial():
    t = pa.table(
        {
            "ts": pa.array(
                np.array([0, 5, 10, 20], dtype=np.int64) * US * 86400,
                pa.timestamp("us"),
            ),
            "lon": pa.array([0.0, 3.0, 9.0, -3.0]),
            "lat": pa.array([0.0, 3.0, 9.0, -3.0]),
        }
    )
    # days since epoch: 1970-01-01 .. 1970-01-21
    e = parse_cql("ts AFTER 1970-01-06T00:00:00Z")
    assert e.evaluate(t).to_pylist() == [False, False, True, True]
    # instant at the interval end is NOT during: its +1ms width
    # extends past the literal end (TimeUtils.getIntervalEnd rule)
    e2 = parse_cql("ts DURING 1970-01-01T00:00:00Z/1970-01-11T00:00:00Z")
    assert e2.evaluate(t).to_pylist() == [True, True, False, False]
    e3 = parse_cql("BBOX(geometry, -5, -5, 5, 5) AND ts BEFORE 1970-01-02T00:00:00Z")
    assert e3.evaluate(t).to_pylist() == [True, False, False, False]
    e4 = parse_cql("INTERSECTS(geometry, POLYGON((-1 -1, 4 -1, 4 4, -1 4)))")
    assert e4.evaluate(t).to_pylist() == [True, True, False, False]
    e5 = parse_cql("DWITHIN(geometry, POINT(0 0), 5)")
    assert e5.evaluate(t).to_pylist() == [True, True, False, True]


def test_cql_filter_batch_on_dataset(ray_session):
    import ray.data

    t = _points_table()
    ds = ray.data.from_arrow(t)
    e = parse_cql("BBOX(geometry, -5, -5, 5, 5) AND tag = 'a'")
    n = ds.map_batches(e.filter_batch, batch_format="pyarrow").count()
    lon = t.column("lon").to_numpy()
    lat = t.column("lat").to_numpy()
    assert n == int(((lon >= -5) & (lon <= 5) & (lat >= -5) & (lat <= 5)).sum())


def test_cql_filter_functions():
    """OGC filter-function library (GeoTools FilterFunction_* via
    CQLQueryFilter role): string/math functions compose with
    comparisons; boolean functions work bare."""
    import numpy as np
    import pyarrow as pa

    from geowave_ray.cql import parse_cql

    t = pa.table(
        {
            "s": pa.array(["Hello", "world", "  pad  ", "abcdef", "xyz"]),
            "v": pa.array([-3.7, 2.5, 10.0, -0.5, 7.2], pa.float64()),
        }
    )

    def run(q):
        return list(
            np.flatnonzero(
                parse_cql(q).evaluate(t).combine_chunks().to_numpy(
                    zero_copy_only=False
                )
            )
        )

    assert run("strToLowerCase(s) = 'hello'") == [0]
    assert run("strToUpperCase(s) = 'WORLD'") == [1]
    assert run("strLength(s) = 5") == [0, 1]
    assert run("strTrim(s) = 'pad'") == [2]
    assert run("strConcat(s, s) = 'xyzxyz'") == [4]
    assert run("strSubstring(s, 1, 3) = 'bc'") == [3]
    assert run("strIndexOf(s, 'orl') = 1") == [1]
    assert run("strStartsWith(s, 'ab')") == [3]
    assert run("strEndsWith(s, 'lo') = true") == [0]
    assert run("strMatches(s, '[a-z]{3}')") == [4]
    assert run("strReplace(s, 'l', 'L') = 'HeLLo'") == [0]
    assert run("abs(v) > 7") == [2, 4]
    assert run("ceil(v) = 3") == [1]
    assert run("floor(v) = -1") == [3]
    # GeoTools round = Java Math.round = floor(x + 0.5)
    assert run("round(v) = 3") == [1]
    assert run("round(v) = 0") == [3]
    assert run("min(v, 5) = 5") == [2, 4]
    assert run("max(v, 0) = 0") == [0, 3]
    assert run("sqrt(v) > 3") == [2]
    # composition with boolean algebra and plain comparisons
    assert run("strLength(s) = 5 AND v > 0") == [1]
    import pytest as _pt
    with _pt.raises(ValueError):
        parse_cql("strLength(s, 'extra') = 1")


def test_cql_geometry_functions():
    """Geometry scalar functions (FilterFunction_area / geomLength /
    getX(centroid()) roles): closed-form squares make every measure
    analytic; the quantization origin is the geometry's own min
    vertex, so values are exact at 1e-4 snap."""
    from geowave_ray.cql import parse_cql
    from geowave_ray.formats import wkb_encode

    def square(cx, cy, half):
        # CCW closed ring
        return [
            (cx - half, cy - half), (cx + half, cy - half),
            (cx + half, cy + half), (cx - half, cy + half),
            (cx - half, cy - half),
        ]

    geoms = [
        ("Polygon", [square(0.0, 0.0, 1.0)]),     # area 4, perim 8
        ("Polygon", [square(10.0, -5.0, 0.5)]),   # area 1, perim 4
        ("Polygon", [square(-20.0, 3.0, 2.0)]),   # area 16, perim 16
    ]
    t = pa.table(
        {
            "rid": pa.array([0, 1, 2], pa.int64()),
            "geometry_wkb": pa.array(
                [wkb_encode(g) for g in geoms], pa.binary()
            ),
        }
    )

    def vals(q):
        from geowave_ray.cql import _CQL_FUNCS

        return _CQL_FUNCS[q][1](t.column("geometry_wkb")).to_pylist()

    assert vals("area") == [4.0, 1.0, 16.0]
    assert vals("geomlength") == [8.0, 4.0, 16.0]
    assert vals("centroidx") == [0.0, 10.0, -20.0]
    assert vals("centroidy") == [0.0, -5.0, 3.0]

    def run(q):
        m = parse_cql(q).evaluate(t)
        if isinstance(m, pa.ChunkedArray):
            m = m.combine_chunks()
        return list(np.flatnonzero(m.to_numpy(zero_copy_only=False)))

    assert run("area(geometry_wkb) > 2.0") == [0, 2]
    assert run("geomLength(geometry_wkb) = 4.0") == [1]
    assert run("centroidX(geometry_wkb) < 0 AND centroidY(geometry_wkb) > 0") == [2]
    # composes with non-geometry functions and boolean algebra
    assert run("area(geometry_wkb) < 2.0 OR abs(rid) = 2") == [1, 2]


def test_gwql_geometry_scalars():
    """AREA/GEOMLENGTH/CENTROIDX/CENTROIDY in the GWQL select list."""
    import pandas as pd

    from geowave_ray import gwql
    from geowave_ray.formats import wkb_encode

    ring = [(2.0, 1.0), (6.0, 1.0), (6.0, 4.0), (2.0, 4.0), (2.0, 1.0)]
    t = pa.table(
        {
            "region_id": pa.array([7], pa.int64()),
            "geometry_wkb": pa.array([wkb_encode(("Polygon", [ring]))]),
        }
    )
    import ray.data

    out = gwql.execute(
        "SELECT region_id, AREA(geometry_wkb) AS area, "
        "GEOMLENGTH(geometry_wkb) AS perimeter, "
        "CENTROIDX(geometry_wkb) AS cx, CENTROIDY(geometry_wkb) AS cy "
        "FROM t",
        {"t": ray.data.from_arrow(t)},
    )
    row = out.take_all()[0]
    assert row["area"] == 12.0 and row["perimeter"] == 14.0
    assert row["cx"] == 4.0 and row["cy"] == 2.5


def test_cql_math_functions_bit_exact():
    """Transcendental tier (exp/log/pow/trig/atan2/toDegrees): Arrow
    kernels match python libm bit-for-bit, and comparisons compose."""
    import math

    from geowave_ray.cql import parse_cql

    vals = [0.01, 0.7, 1.5, 3.9, 250.0]
    t = pa.table({"id": pa.array(range(len(vals))), "v": pa.array(vals)})

    def run(q):
        return parse_cql(q).filter_batch(t).column("id").to_pylist()

    assert run("sin(v) > 0.0") == [
        i for i, x in enumerate(vals) if math.sin(x) > 0.0
    ]
    assert run("log(exp(v)) >= 1.5") == [
        i for i, x in enumerate(vals) if math.log(math.exp(x)) >= 1.5
    ]
    assert run("pow(v, 3) > 3.0") == [
        i for i, x in enumerate(vals) if x ** 3 > 3.0
    ]
    assert run("atan2(v, 2.0) < 0.3") == [
        i for i, x in enumerate(vals) if math.atan2(x, 2.0) < 0.3
    ]
    assert run("toDegrees(v) >= 85.0") == [
        i for i, x in enumerate(vals) if math.degrees(x) >= 85.0
    ]
    assert run("toRadians(toDegrees(v)) = v") == list(range(len(vals)))
    assert run("acos(min(v, 1.0)) <= asin(1.0)") == list(range(len(vals)))


def test_cql_strcapitalize_and_dateformat():
    import numpy as np

    from geowave_ray.cql import parse_cql

    t = pa.table(
        {
            "id": pa.array([0, 1, 2]),
            "name": pa.array(["hello world", "FOO BAR", "miXed caSe"]),
            "ts": pa.array(
                [
                    np.datetime64("2024-03-05T07:08:09"),
                    np.datetime64("2024-12-31T23:59:59"),
                    np.datetime64("2025-01-01T00:00:00"),
                ]
            ),
        }
    )
    e = parse_cql("strCapitalize(name) = 'Foo Bar'")
    assert e.filter_batch(t).column("id").to_pylist() == [1]
    e2 = parse_cql("dateFormat('%Y-%m', ts) = '2024-03'")
    assert e2.filter_batch(t).column("id").to_pylist() == [0]
    e3 = parse_cql("dateFormat('%H:%M:%S', ts) = '23:59:59'")
    assert e3.filter_batch(t).column("id").to_pylist() == [1]


def test_geometry_structure_functions():
    """numPoints/numGeometries/geometryType follow JTS semantics
    (closing vertices count; MultiPolygon sums parts) across every
    WKB geometry type, including the multi types the parquet-fixture
    oracle never exercises."""
    from geowave_ray.cql import parse_cql
    from geowave_ray.formats import wkb_encode

    sq = [(0.0, 0.0), (1.0, 0.0), (1.0, 1.0), (0.0, 1.0), (0.0, 0.0)]
    tri = [(5.0, 5.0), (6.0, 5.0), (5.0, 6.0), (5.0, 5.0)]
    geoms = [
        wkb_encode(("Point", (2.0, 3.0))),
        wkb_encode(("LineString", [(0.0, 0.0), (1.0, 1.0), (2.0, 0.0)])),
        wkb_encode(("Polygon", [sq])),
        wkb_encode(("Polygon", [sq, tri])),  # shell + hole
        wkb_encode(("MultiPolygon", [[sq], [tri]])),
    ]
    t = pa.table(
        {"id": pa.array(range(5)), "g": pa.array(geoms, pa.binary())}
    )

    def vals(q):
        return parse_cql(q).filter_batch(t).column("id").to_pylist()

    assert vals("numPoints(g) = 1") == [0]
    assert vals("numPoints(g) = 3") == [1]
    assert vals("numPoints(g) = 5") == [2]
    assert vals("numPoints(g) = 9") == [3, 4]  # 5+4 both ways
    assert vals("numGeometries(g) = 2") == [4]
    assert vals("geometryType(g) = 'MultiPolygon'") == [4]
    assert vals("geometryType(g) = 'Polygon'") == [2, 3]


def test_gwql_nested_scalar_calls(ray_session):
    """Nested select-list calls: EXP(TORADIANS(v)) parses and the
    composition matches python math exactly."""
    import math

    import ray.data

    from geowave_ray import gwql

    t = pa.table({"id": pa.array([0, 1]), "v": pa.array([45.0, 180.0])})
    out = gwql.execute(
        "SELECT id, EXP(TORADIANS(v)) AS ev, STRLENGTH(DATEFORMAT('%Y', ts)) AS yl "
        "FROM t",
        {
            "t": ray.data.from_arrow(
                t.append_column(
                    "ts",
                    pa.array(
                        [
                            __import__("numpy").datetime64("2024-01-02T03:04:05"),
                            __import__("numpy").datetime64("2025-06-07T08:09:10"),
                        ]
                    ),
                )
            )
        },
    )
    rows = sorted(out.take_all(), key=lambda r: r["id"])
    assert rows[0]["ev"] == math.exp(math.radians(45.0))
    assert rows[1]["ev"] == math.exp(math.radians(180.0))
    assert rows[0]["yl"] == 4 and rows[1]["yl"] == 4


def test_gwql_scalar_where(ray_session):
    """Scalar catalog functions on the LHS (or both sides) of WHERE
    comparisons: AREA/STRLENGTH/EXP/TORADIANS/SIN/COS compose with
    AND/OR exactly like plain column comparisons."""
    import math

    import numpy as np
    import ray.data

    from geowave_ray import gwql
    from geowave_ray.geom import polygon_wkb

    ring = np.array([[0.0, 0.0], [3.0, 0.0], [3.0, 3.0], [0.0, 3.0]])
    t = pa.table(
        {
            "region_id": pa.array(["r1", "r2"]),
            "geometry_wkb": pa.array(
                [polygon_wkb(ring), polygon_wkb(ring * 0.1)], pa.binary()
            ),
            "v": pa.array([50.0, 1.0]),
        }
    )
    ds = ray.data.from_arrow(t)
    out = gwql.execute(
        "SELECT region_id FROM t WHERE AREA(geometry_wkb) > 2.0 "
        "AND STRLENGTH(region_id) >= 2 OR EXP(TORADIANS(v)) < 1.1",
        {"t": ds},
    )
    assert sorted(r["region_id"] for r in out.take_all()) == ["r1", "r2"]
    out2 = gwql.execute(
        "SELECT region_id FROM t WHERE SIN(v) < COS(v)", {"t": ds}
    )
    expect = [
        r for r, x in (("r1", 50.0), ("r2", 1.0)) if math.sin(x) < math.cos(x)
    ]
    assert sorted(r["region_id"] for r in out2.take_all()) == expect
