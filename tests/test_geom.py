import numpy as np

from geowave_ray import geom


def square(x0, y0, x1, y1):
    return np.array([[x0, y0], [x1, y0], [x1, y1], [x0, y1]], dtype=np.float64)  # CCW


def test_wkb_roundtrip():
    ring = square(0, 0, 2, 3)
    wkb = geom.polygon_wkb(ring)
    back = geom.parse_wkb_polygon(wkb)
    assert np.array_equal(back[:-1], ring)  # closed on write
    x, y = geom.parse_wkb_point(geom.point_wkb(1.5, -2.5))
    assert (x, y) == (1.5, -2.5)


def test_pip_convex_square():
    ring = square(0, 0, 2, 2)
    px = np.array([1.0, 3.0, 0.0, 2.0, -0.001])
    py = np.array([1.0, 1.0, 0.0, 2.0, 1.0])
    got = geom.pip_convex(px, py, ring)
    assert got.tolist() == [True, False, True, True, False]  # boundary inclusive


def test_pip_raycast_concave():
    # concave "L" shape
    ring = np.array(
        [[0, 0], [4, 0], [4, 4], [3, 4], [3, 1], [0, 1]], dtype=np.float64
    )
    px = np.array([0.5, 3.5, 2.0, 2.0])
    py = np.array([0.5, 2.0, 0.5, 2.0])
    got = geom.pip_raycast(px, py, ring)
    assert got.tolist() == [True, True, True, False]


def test_pip_convex_matches_raycast_random():
    rng = np.random.default_rng(7)
    angles = np.sort(rng.uniform(0, 2 * np.pi, 7))
    ring = np.column_stack([10 + 5 * np.cos(angles), -3 + 5 * np.sin(angles)])
    px = rng.uniform(0, 20, 2000)
    py = rng.uniform(-13, 7, 2000)
    a = geom.pip_convex(px, py, ring)
    b = geom.pip_raycast(px, py, ring)
    # interior points agree (boundary measure-zero for random floats)
    assert (a == b).mean() > 0.999


def test_haversine_known():
    # London -> Paris ~ 343.5 km
    d = geom.haversine_m(np.array([-0.1276]), np.array([51.5072]),
                         np.array([2.3522]), np.array([48.8566]))
    assert abs(d[0] - 343_500) < 2_000


def test_grid_index_matches_bruteforce():
    rng = np.random.default_rng(3)
    rings = []
    for j in range(50):
        k = 4 + j % 4
        angles = np.sort(rng.uniform(0, 2 * np.pi, k))
        cx, cy = rng.uniform(-150, 150), rng.uniform(-70, 70)
        r = rng.uniform(1, 8)
        rings.append(np.column_stack([cx + r * np.cos(angles), cy + r * np.sin(angles)]))
    idx = geom.GridIndex(rings, tier=6, convex=True)
    px = rng.uniform(-180, 180, 5000)
    py = rng.uniform(-90, 90, 5000)
    pi, pj = idx.query_points(px, py)
    got = set(zip(pi.tolist(), pj.tolist()))
    expect = set()
    for j, ring in enumerate(rings):
        m = geom.pip_convex(px, py, ring)
        for i in np.nonzero(m)[0]:
            expect.add((int(i), j))
    assert got == expect


def test_web_mercator_roundtrip_and_known():
    import numpy as np

    from geowave_ray import geom

    lon = np.array([0.0, -77.0, 151.2])
    lat = np.array([0.0, 38.9, -33.9])
    x, y = geom.to_web_mercator(lon, lat)
    # known value: lon 0 lat 0 -> (0, 0); lon 180 -> ~20037508.34
    assert abs(x[0]) < 1e-9 and abs(y[0]) < 1e-9
    x180, _ = geom.to_web_mercator(np.array([180.0]), np.array([0.0]))
    assert abs(x180[0] - 20037508.342789244) < 1e-3
    lon2, lat2 = geom.from_web_mercator(x, y)
    assert np.allclose(lon, lon2) and np.allclose(lat, lat2, atol=1e-9)


def test_convex_intersects():
    import numpy as np

    from geowave_ray.geom import convex_intersects

    a = square(0, 0, 2, 2)
    assert convex_intersects(a, square(1, 1, 3, 3))      # overlap
    assert convex_intersects(a, square(2, 0, 4, 2))      # touching edge
    assert not convex_intersects(a, square(3, 3, 4, 4))  # disjoint
    assert convex_intersects(a, square(0.5, 0.5, 1.5, 1.5))  # containment
    # rotated triangle vs square
    tri = np.array([[1.0, 2.5], [2.5, 1.0], [3.0, 3.0]])
    assert convex_intersects(a, tri)
    assert not convex_intersects(square(-3, -3, -2.5, -2.5), tri)


def test_convex_predicate_matrix():
    """DE-9IM predicate matrix on hand-constructed squares
    (GeomFunction UDF family semantics)."""
    import numpy as np

    from geowave_ray.geom import convex_clip, convex_predicate, ring_area

    def sq(x0, y0, x1, y1):
        return np.array([[x0, y0], [x1, y0], [x1, y1], [x0, y1]], dtype=float)

    A = sq(0, 0, 2, 2)
    cases = [
        # (B, {predicate: expected})
        (sq(0, 0, 2, 2), dict(equals=True, intersects=True, touches=False,
                              overlaps=False, within=True, contains=True,
                              disjoint=False)),
        (sq(1, 1, 3, 3), dict(overlaps=True, intersects=True, touches=False,
                              equals=False, within=False, contains=False)),
        (sq(2, 0, 4, 2), dict(touches=True, intersects=True, overlaps=False,
                              disjoint=False)),          # shared edge
        (sq(2, 2, 3, 3), dict(touches=True, overlaps=False)),  # shared vertex
        (sq(3, 3, 4, 4), dict(disjoint=True, intersects=False, touches=False)),
        (sq(0.5, 0.5, 1.5, 1.5), dict(contains=True, covers=True, within=False,
                                      overlaps=False, intersects=True)),
        (sq(-1, -1, 3, 3), dict(within=True, covered_by=True, contains=False,
                                overlaps=False)),
    ]
    for B, expect in cases:
        for pred, want in expect.items():
            got = convex_predicate(A, B, pred)
            assert got == want, (pred, B.tolist(), got, want)
        assert convex_predicate(A, B, "crosses") is False
    # clip sanity: intersection area of offset squares = 1
    assert abs(abs(ring_area(convex_clip(A, sq(1, 1, 3, 3)))) - 1.0) < 1e-12


def test_pip_rings_hole_semantics():
    """Point inside the hole is OUTSIDE the polygon (even-odd parity
    over both rings — JTS interior-ring semantics)."""
    import numpy as np

    from geowave_ray.geom import pip_rings

    outer = np.array([(-4, -4), (4, -4), (4, 4), (-4, 4)], float)
    hole = np.array([(-1, -1), (1, -1), (1, 1), (-1, 1)], float)
    px = np.array([0.0, 2.0, 5.0, -3.0])
    py = np.array([0.0, 0.0, 0.0, 3.0])
    got = pip_rings(px, py, [outer, hole])
    assert got.tolist() == [False, True, False, True]


def test_segments_cross_matrix():
    import numpy as np

    from geowave_ray.geom import segments_cross

    # crossing, touching-at-endpoint, parallel-disjoint, collinear-overlap
    a = np.array([[0, 0, 2, 2], [0, 0, 1, 1], [0, 0, 1, 0], [0, 0, 2, 0]], float)
    b = np.array([[0, 2, 2, 0], [1, 1, 2, 2], [0, 1, 1, 1], [1, 0, 3, 0]], float)
    got = segments_cross(
        a[:, 0], a[:, 1], a[:, 2], a[:, 3], b[:, 0], b[:, 1], b[:, 2], b[:, 3]
    )
    assert got.tolist() == [True, True, False, True]


def test_polyline_intersects_rings_cases():
    import numpy as np

    from geowave_ray.geom import polyline_intersects_rings

    ring = np.array([(0, 0), (10, 0), (10, 10), (0, 10)], float)
    # crosses through without any vertex inside
    assert polyline_intersects_rings(
        np.array([-5.0, 15.0]), np.array([5.0, 5.0]), [ring]
    )
    # entirely inside
    assert polyline_intersects_rings(
        np.array([2.0, 3.0]), np.array([2.0, 3.0]), [ring]
    )
    # disjoint
    assert not polyline_intersects_rings(
        np.array([20.0, 30.0]), np.array([20.0, 30.0]), [ring]
    )
    # inside the hole of a holed polygon -> disjoint
    hole = np.array([(2, 2), (8, 2), (8, 8), (2, 8)], float)
    assert not polyline_intersects_rings(
        np.array([4.0, 6.0]), np.array([4.0, 6.0]), [ring, hole]
    )
    # crossing the hole boundary -> intersects (touches interior ring)
    assert polyline_intersects_rings(
        np.array([4.0, 9.0]), np.array([4.0, 9.0]), [ring, hole]
    )


def test_region_query_general_position(ray_session):
    """The overlaps oracle equates 'interiors intersect' with
    'intersects' — valid only if no fixture pair touches boundary-only.
    Assert that invariant, plus the DE-9IM partition: intersects =
    contains + within + overlaps (+ equals, none here) exactly."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq
    import ray.data

    from geowave_ray.fixtures import ensure_fixtures
    from geowave_ray.pipelines.spatial_join import polygon_intersects_join

    fx = ensure_fixtures("/root/testdata/sf0.001")
    qt = pq.read_table(f"{fx}/queries.parquet")
    polys = qt.filter(pc.equal(qt["kind"], "polygon"))

    def pairs(pred):
        regions = ray.data.read_parquet(f"{fx}/regions.parquet")
        t = polygon_intersects_join(regions, polys, predicate=pred).to_pandas()
        if t.empty:
            return set()
        return set(zip(t["region_id"], t["query_id"]))

    touches = pairs("touches")
    assert touches == set()
    inter = pairs("intersects")
    parts = [pairs("contains"), pairs("within"), pairs("overlaps"), pairs("equals")]
    got = set().union(*parts)
    assert got == inter
    # pairwise disjoint (equals is empty so contains/within can't overlap)
    assert sum(len(p) for p in parts) == len(got)


def test_grid_rect_predicates(ray_session):
    """Boundary-exact DE-9IM over the lattice grid_rects fixture: the
    engine's convex kernel must agree with the bbox predicate algebra
    on every pair, including shared edges and corner contacts (the
    GeomTouches/GeomEquals/GeomDisjoint/GeomCovers UDF roles)."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq
    import ray.data

    from geowave_ray.fixtures import ensure_fixtures
    from geowave_ray.pipelines.spatial_join import polygon_intersects_join

    fx = ensure_fixtures("/root/testdata/sf0.001")
    t = pq.read_table(f"{fx}/grid_rects.parquet")
    a = t.filter(pc.equal(t["side"], "a")).to_pandas()
    b = t.filter(pc.equal(t["side"], "b")).to_pandas()

    def expected(pred):
        out = set()
        for _, ra in a.iterrows():
            for _, rb in b.iterrows():
                ix = min(ra.xmax, rb.xmax) >= max(ra.xmin, rb.xmin)
                iy = min(ra.ymax, rb.ymax) >= max(ra.ymin, rb.ymin)
                inter = ix and iy
                edge = inter and (
                    min(ra.xmax, rb.xmax) == max(ra.xmin, rb.xmin)
                    or min(ra.ymax, rb.ymax) == max(ra.ymin, rb.ymin)
                )
                val = {
                    "touches": edge,
                    "equals": (ra.xmin, ra.ymin, ra.xmax, ra.ymax)
                    == (rb.xmin, rb.ymin, rb.xmax, rb.ymax),
                    "disjoint": not inter,
                    "covers": ra.xmin <= rb.xmin
                    and rb.xmax <= ra.xmax
                    and ra.ymin <= rb.ymin
                    and rb.ymax <= ra.ymax,
                }[pred]
                if val:
                    out.add((ra.rect_id, rb.rect_id))
        return out

    import pyarrow as pa

    for pred in ("touches", "equals", "disjoint", "covers"):
        left = ray.data.from_arrow(
            pa.table(
                {
                    "a_id": pa.array(a["rect_id"]),
                    "geometry_wkb": pa.array(a["geometry_wkb"], pa.binary()),
                }
            )
        )
        right = pa.table(
            {
                "b_id": pa.array(b["rect_id"]),
                "geometry_wkb": pa.array(b["geometry_wkb"], pa.binary()),
            }
        )
        got = polygon_intersects_join(
            left, right, left_id="a_id", right_id="b_id", predicate=pred
        ).to_pandas()
        got_set = set(zip(got["a_id"], got["b_id"])) if not got.empty else set()
        assert got_set == expected(pred), pred
    # the fixture exercises every mode: touches includes both an edge
    # and a corner contact, equals and covers are non-empty
    assert expected("equals") and expected("covers") and expected("touches")


# ---------------------------------------------------------------------------
# general (concave / holed) polygon predicates — VERDICT r2 #3
# ---------------------------------------------------------------------------

PREDICATES = [
    "intersects", "disjoint", "within", "contains", "covers",
    "covered_by", "equals", "touches", "overlaps", "crosses",
]


def _sq(x0, y0, x1, y1):
    return np.array([[x0, y0], [x1, y0], [x1, y1], [x0, y1]], float)


def test_general_predicate_matches_convex_kernel():
    """The general-ring kernel must agree with the independent convex
    SAT/clip kernel on every predicate for random convex pairs."""
    from geowave_ray.geom import convex_predicate, general_predicate

    rng = np.random.RandomState(7)
    for trial in range(60):
        def poly():
            cx, cy = rng.uniform(-4, 4, 2)
            r = rng.uniform(0.5, 3.0)
            k = rng.randint(3, 9)
            ang = np.sort(rng.uniform(0, 2 * np.pi, k))
            return np.column_stack([cx + r * np.cos(ang), cy + r * np.sin(ang)])

        a, b = poly(), poly()
        for p in PREDICATES:
            assert general_predicate(a, b, p) == convex_predicate(a, b, p), (
                trial, p, a, b,
            )


def test_general_predicate_concave_holed_truth_matrix():
    """Hand-computed DE-9IM truth matrix over concave stars and holed
    polygons (the configurations the convex kernel cannot decide)."""
    from geowave_ray.geom import general_predicate as gp

    star = np.array(
        [[0, 3], [1, 1], [3, 0], [1, -1], [0, -3], [-1, -1], [-3, 0], [-1, 1]],
        float,
    )
    inner = _sq(-0.5, -0.5, 0.5, 0.5)      # strictly inside the star body
    annulus = [_sq(-4, -4, 4, 4), _sq(-2, -2, 2, 2)]  # holed polygon
    in_hole = _sq(-1, -1, 1, 1)            # strictly inside the hole
    fills_hole = _sq(-2, -2, 2, 2)         # exactly fills the hole
    over_hole = _sq(-3, -3, 3, 3)          # covers hole + part of body
    body_bar = np.array([[2.5, -3], [3.5, -3], [3.5, 3], [2.5, 3]], float)
    far = _sq(10, 10, 11, 11)

    cases = {
        # (A, B): {predicate: expected}
        ("star", "inner"): dict(intersects=True, contains=True, covers=True,
                                within=False, overlaps=False, touches=False),
        ("inner", "star"): dict(within=True, covered_by=True, contains=False),
        ("star", "far"): dict(disjoint=True, intersects=False),
        ("annulus", "in_hole"): dict(disjoint=True, intersects=False,
                                     contains=False),
        ("annulus", "fills_hole"): dict(touches=True, intersects=True,
                                        overlaps=False, contains=False),
        ("fills_hole", "annulus"): dict(within=False, touches=True),
        ("annulus", "over_hole"): dict(intersects=True, overlaps=True,
                                       contains=False, touches=False),
        ("over_hole", "annulus"): dict(within=False, overlaps=True),
        ("body_bar", "annulus"): dict(within=True, covered_by=True,
                                      overlaps=False),
        ("annulus", "body_bar"): dict(contains=True, covers=True),
        ("annulus", "annulus"): dict(equals=True, within=True, contains=True,
                                     overlaps=False, touches=False),
        ("star", "star"): dict(equals=True, intersects=True),
    }
    geoms = dict(star=star, inner=inner, annulus=annulus, in_hole=in_hole,
                 fills_hole=fills_hole, over_hole=over_hole,
                 body_bar=body_bar, far=far)
    for (an, bn), expect in cases.items():
        for pred, want in expect.items():
            got = gp(geoms[an], geoms[bn], pred)
            assert got == want, (an, bn, pred, got, want)
        # crosses is always False for area/area
        assert gp(geoms[an], geoms[bn], "crosses") is False


def test_general_predicate_vs_bruteforce_sampling():
    """Independent brute-force check of interiors-intersect /
    containment for random concave pairs: dense-grid even-odd sampling
    (no shared code path with the predicate kernel's strict-point and
    crossing logic beyond the elementary parity test)."""
    from geowave_ray.geom import general_predicate as gp
    from geowave_ray.geom import pip_raycast

    rng = np.random.RandomState(11)

    def star(cx, cy, r_out, k, phase):
        ang = phase + np.arange(2 * k) * (np.pi / k)
        rad = np.where(np.arange(2 * k) % 2 == 0, r_out, r_out * 0.4)
        return np.column_stack([cx + rad * np.cos(ang), cy + rad * np.sin(ang)])

    hits = 0
    for _ in range(40):
        a = star(rng.uniform(-2, 2), rng.uniform(-2, 2), rng.uniform(1, 3),
                 rng.randint(4, 8), rng.uniform(0, np.pi))
        b = star(rng.uniform(-2, 2), rng.uniform(-2, 2), rng.uniform(1, 3),
                 rng.randint(4, 8), rng.uniform(0, np.pi))
        # dense sample of the joint bbox
        x0 = min(a[:, 0].min(), b[:, 0].min())
        x1 = max(a[:, 0].max(), b[:, 0].max())
        y0 = min(a[:, 1].min(), b[:, 1].min())
        y1 = max(a[:, 1].max(), b[:, 1].max())
        gx, gy = np.meshgrid(np.linspace(x0, x1, 90), np.linspace(y0, y1, 90))
        px, py = gx.ravel(), gy.ravel()
        in_a = pip_raycast(px, py, a)
        in_b = pip_raycast(px, py, b)
        both = in_a & in_b
        if both.any():
            # sampled interior overlap => interiors intersect
            assert gp(a, b, "intersects"), "sampled overlap but disjoint"
            assert not gp(a, b, "touches"), "sampled overlap but touches"
            hits += 1
        if both.any() and not (in_a & ~in_b).any():
            # no sampled A-point outside B at this resolution: A should
            # be within B unless the kernel sees sub-grid protrusion —
            # only assert the implication that holds exactly:
            if gp(a, b, "within"):
                assert gp(b, a, "contains")
        if gp(a, b, "within"):
            assert not (in_a & ~in_b).any(), "within but sampled point outside"
    assert hits >= 5  # the fixture actually exercised overlaps


def test_ring_measures_q_square():
    from geowave_ray.geom import ring_measures_q

    # unit square at origin, CCW: area 1, perimeter 4, centroid (.5, .5)
    sq = np.array([[0.0, 0.0], [1.0, 0.0], [1.0, 1.0], [0.0, 1.0]])
    a2, cxn, cyn, perim_u = ring_measures_q([sq], 0.0, 0.0)
    assert a2 / 2e8 == 1.0
    assert perim_u / 1e6 == 4.0
    assert cxn / (3.0 * a2) / 1e4 == 0.5
    assert cyn / (3.0 * a2) / 1e4 == 0.5


def test_ring_measures_q_closure_invariant():
    from geowave_ray.geom import ring_measures_q

    rng = np.random.default_rng(7)
    ang = np.sort(rng.uniform(0, 2 * np.pi, 9))
    ring = np.column_stack([3 + 2 * np.cos(ang), -1 + 2 * np.sin(ang)])
    closed = np.vstack([ring, ring[:1]])
    assert ring_measures_q([ring], 1.0, -3.0) == ring_measures_q([closed], 1.0, -3.0)


def test_ring_measures_q_hole_subtracts():
    from geowave_ray.geom import ring_measures_q

    outer = np.array([[0.0, 0.0], [4.0, 0.0], [4.0, 4.0], [0.0, 4.0]])  # CCW
    hole = np.array([[1.0, 1.0], [1.0, 3.0], [3.0, 3.0], [3.0, 1.0]])  # CW
    a2, _, _, perim_u = ring_measures_q([outer, hole], 0.0, 0.0)
    assert a2 / 2e8 == 16.0 - 4.0
    assert perim_u / 1e6 == 16.0 + 8.0


def test_ring_measures_q_translation_invariant_area():
    from geowave_ray.geom import ring_measures_q

    tri = np.array([[0.0, 0.0], [2.0, 0.0], [0.0, 2.0]])
    a2_a, _, _, p_a = ring_measures_q([tri], 0.0, 0.0)
    a2_b, _, _, p_b = ring_measures_q([tri + 10.0], 10.0, 10.0)
    assert a2_a == a2_b and p_a == p_b


def test_buffer_points_octagon_radius_exact():
    from geowave_ray.geom import buffer_points_octagon

    rng = np.random.default_rng(7)
    lon = rng.uniform(-170, 170, 100)
    lat = rng.uniform(-80, 80, 100)
    v = buffer_points_octagon(lon, lat, 3.0)
    d = np.hypot(v[:, :, 0] - lon[:, None], v[:, :, 1] - lat[:, None])
    assert np.allclose(d, 3.0, atol=1e-12)
    # CCW orientation
    from geowave_ray.geom import ring_area

    assert all(ring_area(v[i]) > 0 for i in range(len(v)))


def test_buffer_convex_ring_minkowski():
    from geowave_ray.geom import buffer_convex_ring, pip_convex, ring_area

    rng = np.random.default_rng(13)
    for _ in range(20):
        # random convex ring via hull of random points
        pts = rng.uniform(-50, 50, (12, 2))
        hull = _hull(pts)
        r = float(rng.uniform(0.5, 5.0))
        b = buffer_convex_ring(hull, r)
        # vertex count = n_edges + 8
        assert len(b) == len(hull) + 8
        # output convex CCW
        e = np.roll(b, -1, axis=0) - b
        assert (np.cross(e, np.roll(e, -1, axis=0)) >= -1e-9).all()
        # contains every original vertex
        assert pip_convex(hull[:, 0], hull[:, 1], b).all()
        # Minkowski area identity: A + perim * apothem-weighted strips
        # + octagon area; for the inscribed octagon the strip height is
        # r for axis-normal edges... use the general identity
        # A(P + Q) = A(P) + A(Q) + mixed term = A + sum over edges of
        # cross(edge, support point span); just bound it instead:
        A0, A1 = abs(ring_area(hull)), abs(ring_area(b))
        per = np.linalg.norm(np.diff(np.vstack([hull, hull[:1]]), axis=0), axis=1).sum()
        oct_area = 2 * np.sqrt(2) * r * r
        # true buffered area lies between apothem and radius strips
        assert A0 + per * r * np.cos(np.pi / 8) + oct_area - 1e-6 <= A1 <= A0 + per * r + oct_area + 1e-6
        # probe containment: points just inside the apothem distance in,
        # points beyond r out
        c = hull.mean(axis=0)
        for k in range(len(hull)):
            p0, p1 = hull[k], hull[(k + 1) % len(hull)]
            mid = (p0 + p1) / 2
            nrm = np.array([p1[1] - p0[1], -(p1[0] - p0[0])])
            nrm = nrm / np.linalg.norm(nrm)  # (dy, -dx): outward for CCW
            pin = mid + nrm * (r * np.cos(np.pi / 8) * 0.98)
            pout = mid + nrm * (r * 1.02)
            assert pip_convex(pin[:1], pin[1:], b)[0]
            assert not pip_convex(pout[:1], pout[1:], b)[0]


def _hull(pts):
    """Tiny Andrew monotone chain (CCW, open ring) for test input."""
    pts = pts[np.lexsort((pts[:, 1], pts[:, 0]))]

    def half(seq):
        out = []
        for p in seq:
            while len(out) >= 2 and np.cross(out[-1] - out[-2], p - out[-2]) <= 0:
                out.pop()
            out.append(p)
        return out

    lo = half(pts)
    hi = half(pts[::-1])
    return np.asarray(lo[:-1] + hi[:-1])
