"""Property-based tests (hypothesis) for the pure-numpy codecs — the
layers where a silent corner-case bug (header off-by-one, morton bit
mix-up, ring offset drift) would corrupt results without failing any
example-based test. No SparkSession needed; deterministic profile."""

import numpy as np
from hypothesis import given, settings, strategies as st

from gdal_vfr_spark.geo import cells, wkb
from gdal_vfr_spark.operators import multimodal as mm

settings.register_profile("repo", max_examples=60, deadline=None, derandomize=True)
settings.load_profile("repo")

finite_coord = st.floats(
    min_value=-180.0, max_value=180.0, allow_nan=False, allow_infinity=False
)
ring_strategy = st.lists(
    st.tuples(finite_coord, finite_coord), min_size=4, max_size=12
)


@given(st.lists(ring_strategy, min_size=1, max_size=3))
def test_wkb_polygon_roundtrip(rings):
    rings = [np.asarray(r, dtype=np.float64) for r in rings]
    buf = wkb.polygon(rings)
    back = wkb.decode_rings(buf)
    assert len(back) == len(rings)
    for a, b in zip(rings, back):
        assert np.array_equal(a, b)
    xs = np.concatenate([r[:, 0] for r in rings])
    ys = np.concatenate([r[:, 1] for r in rings])
    assert wkb.bbox(buf) == (xs.min(), ys.min(), xs.max(), ys.max())


@given(st.lists(ring_strategy, min_size=1, max_size=3))
def test_wkb_multilinestring_roundtrip(lines):
    lines = [np.asarray(l, dtype=np.float64) for l in lines]
    buf = wkb.multilinestring(lines)
    back = wkb.decode_lines(buf)
    assert len(back) == len(lines)
    for a, b in zip(lines, back):
        assert np.array_equal(a, b)


@given(
    st.lists(st.integers(min_value=0, max_value=(1 << 29) - 1), min_size=1, max_size=50),
    st.lists(st.integers(min_value=0, max_value=(1 << 29) - 1), min_size=1, max_size=50),
)
def test_morton_roundtrip_and_order(ixs, iys):
    k = min(len(ixs), len(iys))
    ix = np.asarray(ixs[:k], dtype=np.int64)
    iy = np.asarray(iys[:k], dtype=np.int64)
    m = cells.morton_encode(ix, iy)
    bx, by = cells.morton_decode(m)
    assert np.array_equal(bx, ix) and np.array_equal(by, iy)


@given(
    st.lists(finite_coord, min_size=1, max_size=40),
    st.lists(st.floats(min_value=-90.0, max_value=90.0, allow_nan=False), min_size=1, max_size=40),
    st.integers(min_value=0, max_value=cells.MAX_RES),
)
def test_cell_encode_decode_consistent(lons, lats, res):
    k = min(len(lons), len(lats))
    lon = np.asarray(lons[:k], dtype=np.float64)
    lat = np.asarray(lats[:k], dtype=np.float64)
    cell = cells.cell_encode(lon, lat, res)
    ix, iy, r = cells.cell_decode(cell)
    assert np.all(r == res)
    wx, wy = cells.lonlat_to_grid(lon, lat, res)
    assert np.array_equal(ix, wx) and np.array_equal(iy, wy)
    # the cell's center must lie strictly inside the cell's bounds and
    # cell_parent must agree with direct encoding at the coarser res
    x0, y0, x1, y1 = cells.cell_bounds(cell)
    cx, cy = cells.cell_center(cell)
    assert np.all((x0 < cx) & (cx < x1) & (y0 < cy) & (cy < y1))
    if res > 0:
        parent = cells.cell_parent(cell, res - 1)
        assert np.array_equal(parent, cells.cell_encode(cx, cy, res - 1))


@given(
    st.integers(min_value=1, max_value=16),
    st.integers(min_value=1, max_value=16),
    st.integers(min_value=0, max_value=2**32 - 1),
)
def test_ppm_roundtrip(w, h, seed):
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    assert np.array_equal(mm.decode_ppm(mm.encode_ppm(img)), img)


@given(
    st.lists(st.integers(min_value=-32768, max_value=32767), min_size=0, max_size=200),
    st.sampled_from([8000, 16000, 44100]),
)
def test_wav_roundtrip(samples, rate):
    arr = np.asarray(samples, dtype=np.int16)
    back, r = mm.decode_wav_pcm16(mm.encode_wav_pcm16(arr, rate))
    assert r == rate and np.array_equal(back, arr)


@given(
    st.integers(min_value=1, max_value=12),
    st.integers(min_value=1, max_value=12),
    st.integers(min_value=1, max_value=12),
    st.integers(min_value=1, max_value=12),
    st.integers(min_value=0, max_value=2**32 - 1),
)
def test_resize_nearest_index_map(w, h, ow, oh, seed):
    """nearest_resize (the kernel resize_nearest runs per payload):
    floor index map vs direct fancy indexing, any up/down-scale, and
    every output pixel exists in the source."""
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    got = mm.nearest_resize(img, ow, oh)
    yi = (np.arange(oh, dtype=np.int64) * h) // oh
    xi = (np.arange(ow, dtype=np.int64) * w) // ow
    assert got.shape == (oh, ow, 3)
    assert np.array_equal(got, img[yi[:, None], xi[None, :], :])
    # identity when shapes match
    assert np.array_equal(mm.nearest_resize(img, w, h), img)
