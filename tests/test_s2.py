"""Structural invariants of the pure-numpy S2 cell-id implementation
(geowave_ray/s2.py). The native s2 library is absent from this
environment, so correctness is pinned by the properties that uniquely
characterize the published scheme: exact (face,i,j) roundtrip, Hilbert
edge-adjacency of id-consecutive leaves, parent range containment,
center-in-cell at every level, and id uniqueness."""

import numpy as np

from geowave_ray import s2


def test_face_ij_roundtrip():
    rng = np.random.default_rng(7)
    face = rng.integers(0, 6, 50000)
    i = rng.integers(0, 1 << 30, 50000)
    j = rng.integers(0, 1 << 30, 50000)
    cid = s2.cell_id_from_face_ij(face, i, j)
    f2, i2, j2 = s2.face_ij_from_cell_id(cid)
    assert np.array_equal(face, f2)
    assert np.array_equal(i, i2)
    assert np.array_equal(j, j2)


def test_hilbert_adjacency():
    """Leaf ids differing by exactly one curve step (id delta 2) must
    be edge-adjacent in (i, j) — the defining Hilbert property."""
    gi, gj = np.meshgrid(np.arange(64), np.arange(64))
    gi = gi.ravel() + 12345
    gj = gj.ravel() + 54321
    for face in range(6):
        cids = np.sort(s2.cell_id_from_face_ij(np.full(gi.shape, face), gi, gj))
        _, ii, jj = s2.face_ij_from_cell_id(cids)
        consec = np.diff(cids) == 2
        step = np.abs(np.diff(ii)) + np.abs(np.diff(jj))
        assert consec.sum() > 3000
        assert np.all(step[consec] == 1)


def test_parent_containment_and_level():
    rng = np.random.default_rng(11)
    lat = rng.uniform(-89, 89, 20000)
    lng = rng.uniform(-180, 180, 20000)
    leaf = s2.cell_id_from_latlng(lat, lng, 30)
    assert np.array_equal(s2.cell_level(leaf), np.full(len(leaf), 30))
    for lvl in (2, 8, 14, 22, 29):
        par = s2.parent(leaf, lvl)
        lo, hi = s2.cell_range(par)
        assert np.all((leaf >= lo) & (leaf <= hi))
        assert np.array_equal(s2.cell_level(par), np.full(len(par), lvl))
        # a sibling's range never contains the leaf
        other = s2.parent(
            s2.cell_id_from_latlng(lat + 90.0 * np.sign(0.5 - (lat > 0)), lng, 30),
            lvl,
        )
        diff = other != par
        lo2, hi2 = s2.cell_range(other[diff])
        assert not np.any((leaf[diff] >= lo2) & (leaf[diff] <= hi2))


def test_center_reencodes_to_same_cell():
    rng = np.random.default_rng(13)
    lat = rng.uniform(-89, 89, 20000)
    lng = rng.uniform(-180, 180, 20000)
    leaf = s2.cell_id_from_latlng(lat, lng, 30)
    for lvl in (1, 5, 12, 20, 30):
        c = s2.parent(leaf, lvl)
        clat, clng = s2.latlng_from_cell_id(c)
        c2 = s2.parent(s2.cell_id_from_latlng(clat, clng, 30), lvl)
        assert np.array_equal(c, c2)


def test_leaf_ids_unique_and_face_bits():
    rng = np.random.default_rng(17)
    lat = rng.uniform(-89, 89, 30000)
    lng = rng.uniform(-180, 180, 30000)
    leaf = s2.cell_id_from_latlng(lat, lng, 30)
    assert len(np.unique(leaf)) == len(leaf)
    faces = (leaf >> np.uint64(61)).astype(int)
    assert set(np.unique(faces)) <= set(range(6))
    assert len(np.unique(faces)) == 6  # global spread hits every face
    # equator/prime-meridian axis points land on the expected faces
    f0 = s2.cell_id_from_latlng(np.array([0.0]), np.array([0.0]), 30)
    assert int(f0[0] >> np.uint64(61)) == 0  # +x
    f2 = s2.cell_id_from_latlng(np.array([90.0]), np.array([0.0]), 30)
    assert int(f2[0] >> np.uint64(61)) == 2  # +z (north pole)
