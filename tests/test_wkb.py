import numpy as np

from gdal_vfr_spark.geo import wkb


def test_point_roundtrip():
    b = wkb.point(14.25, 50.5)
    assert wkb.geom_type(b) == wkb.POINT
    assert wkb.decode_point(b) == (14.25, 50.5)


def test_polygon_roundtrip():
    ring = np.asarray([[0, 0], [4, 0], [4, 4], [0, 4], [0, 0]], dtype=float)
    hole = np.asarray([[1, 1], [2, 1], [2, 2], [1, 2], [1, 1]], dtype=float)
    b = wkb.polygon([ring, hole])
    rings = wkb.decode_rings(b)
    assert len(rings) == 2
    assert np.allclose(rings[0], ring) and np.allclose(rings[1], hole)
    assert wkb.bbox(b) == (0.0, 0.0, 4.0, 4.0)


def test_multipolygon_roundtrip():
    r1 = np.asarray([[0, 0], [1, 0], [1, 1], [0, 1], [0, 0]], dtype=float)
    r2 = np.asarray([[5, 5], [6, 5], [6, 6], [5, 6], [5, 5]], dtype=float)
    b = wkb.multipolygon([[r1], [r2]])
    rings = wkb.decode_rings(b)
    assert len(rings) == 2
    assert wkb.bbox(b) == (0.0, 0.0, 6.0, 6.0)


def test_multipoint_and_lines():
    mp = wkb.multipoint([[1, 2], [3, 4]])
    pts = wkb.decode_points(mp)
    assert np.allclose(pts, [[1, 2], [3, 4]])
    ml = wkb.multilinestring([np.asarray([[0, 0], [1, 1]]), np.asarray([[2, 2], [3, 3]])])
    lines = wkb.decode_lines(ml)
    assert len(lines) == 2 and np.allclose(lines[1], [[2, 2], [3, 3]])
    assert wkb.bbox(ml) == (0.0, 0.0, 3.0, 3.0)


def test_polygon_validity_udf_cases(spark):
    """Structural validity: valid ring -> True; truncated buffer,
    unclosed ring, <4-point ring, NaN coords -> False; NULL -> NULL."""
    import numpy as np
    from pyspark.sql import functions as F

    from gdal_vfr_spark.geo import wkb as W
    from gdal_vfr_spark.operators.counts import polygon_validity_expr

    good = W.polygon([np.asarray([[0, 0], [1, 0], [1, 1], [0, 0]], dtype=float)])
    unclosed = W.polygon([np.asarray([[0, 0], [1, 0], [1, 1], [0.5, 0.5]], dtype=float)])
    tiny = W.polygon([np.asarray([[0, 0], [1, 0], [0, 0]], dtype=float)])
    nan = W.polygon(
        [np.asarray([[0, 0], [np.nan, 0], [1, 1], [0, 0]], dtype=float)]
    )
    rows = [(1, good), (2, b"\x01\x03\x00\x00\x00"), (3, unclosed), (4, tiny),
            (5, nan), (6, None)]
    df = spark.createDataFrame(rows, "id long, g binary")
    got = {
        r["id"]: r["v"]
        for r in df.select("id", polygon_validity_expr()(F.col("g")).alias("v")).collect()
    }
    assert got == {1: True, 2: False, 3: False, 4: False, 5: False, 6: None}


def test_shape_stats_cases(spark):
    import numpy as np
    from pyspark.sql import functions as F

    from gdal_vfr_spark.geo import wkb as W
    from gdal_vfr_spark.operators.counts import shape_stats_expr

    sq = np.asarray([[0, 0], [4, 0], [4, 4], [0, 4], [0, 0]], dtype=float)
    hole = np.asarray([[1, 1], [2, 1], [2, 2], [1, 2], [1, 1]], dtype=float)
    # hole written in the SAME orientation as the shell: the sign
    # normalization, not writer orientation, must make it subtract
    donut = W.polygon([sq, hole])
    # clockwise (reversed) square: area must still come out positive
    cw = W.polygon([sq[::-1].copy()])
    two = W.multipolygon([[sq], [sq + 10.0]])
    rows = [
        (1, W.polygon([sq])),
        (2, donut),
        (3, cw),
        (4, two),
        (5, b"\x01\x03\x00\x00\x00"),
        (6, None),
    ]
    df = spark.createDataFrame(rows, "id long, g binary")
    got = {
        r["id"]: (r["s"]["area"], r["s"]["perimeter"], r["s"]["cx"], r["s"]["cy"])
        for r in df.select("id", shape_stats_expr()(F.col("g")).alias("s")).collect()
    }
    assert got[1] == (16.0, 16.0, 2.0, 2.0)
    assert got[2][0] == 15.0 and got[2][1] == 20.0  # hole subtracts, rim adds
    # donut centroid stays the shell center by symmetry... not quite:
    # hole at (1.5,1.5) pulls it away from (2,2) — exact shoelace value
    assert abs(got[2][2] - (16.0 * 2.0 - 1.0 * 1.5) / 15.0) < 1e-12
    assert got[3] == (16.0, 16.0, 2.0, 2.0)
    assert got[4][0] == 32.0 and got[4][2] == 7.0 and got[4][3] == 7.0
    assert got[5] == (None, None, None, None)
    assert got[6] == (None, None, None, None)
