"""Minimal WKB (Well-Known Binary, ISO 13249-3 / OGC SFA) codec.

The reference carries geometry inside GDAL's OGRGeometry objects; this
engine carries geometry as WKB ``binary`` columns (FIXTURES.md) and
decodes to packed numpy arrays only at the edges (index build, refine
UDFs). Supported types cover exactly the reference's layer inventory
(SURVEY.md §1.2): Point, LineString, Polygon, MultiPoint,
MultiLineString, MultiPolygon — 2-D, little-endian.
"""

from __future__ import annotations

import struct

import numpy as np

POINT = 1
LINESTRING = 2
POLYGON = 3
MULTIPOINT = 4
MULTILINESTRING = 5
MULTIPOLYGON = 6

_HDR = struct.Struct("<BI")
_U32 = struct.Struct("<I")


def point(x: float, y: float) -> bytes:
    return _HDR.pack(1, POINT) + struct.pack("<2d", x, y)


def linestring(coords) -> bytes:
    arr = np.asarray(coords, dtype="<f8")
    return _HDR.pack(1, LINESTRING) + _U32.pack(len(arr)) + arr.tobytes()


def _ring_bytes(coords) -> bytes:
    arr = np.asarray(coords, dtype="<f8")
    return _U32.pack(len(arr)) + arr.tobytes()


def polygon(rings) -> bytes:
    """rings: list of Nx2 arrays; ring 0 = shell, rest = holes.
    Rings should be closed (first == last vertex)."""
    out = [_HDR.pack(1, POLYGON), _U32.pack(len(rings))]
    out += [_ring_bytes(r) for r in rings]
    return b"".join(out)


def multipoint(coords) -> bytes:
    arr = np.asarray(coords, dtype=np.float64)
    out = [_HDR.pack(1, MULTIPOINT), _U32.pack(len(arr))]
    out += [point(float(x), float(y)) for x, y in arr]
    return b"".join(out)


def multilinestring(lines) -> bytes:
    out = [_HDR.pack(1, MULTILINESTRING), _U32.pack(len(lines))]
    out += [linestring(l) for l in lines]
    return b"".join(out)


def multipolygon(polys) -> bytes:
    """polys: list of list-of-rings."""
    out = [_HDR.pack(1, MULTIPOLYGON), _U32.pack(len(polys))]
    out += [polygon(rings) for rings in polys]
    return b"".join(out)


def geom_type(buf: bytes) -> int:
    byte_order, gtype = _HDR.unpack_from(buf, 0)
    if byte_order != 1:
        raise ValueError("only little-endian WKB supported")
    return gtype & 0xFF  # mask off any SRID/Z flags


def _read_ring(buf: bytes, off: int) -> tuple[np.ndarray, int]:
    (n,) = _U32.unpack_from(buf, off)
    off += 4
    arr = np.frombuffer(buf, dtype="<f8", count=2 * n, offset=off).reshape(n, 2)
    return arr, off + 16 * n


def decode_point(buf: bytes) -> tuple[float, float]:
    x, y = struct.unpack_from("<2d", buf, 5)
    return x, y


def decode_linestring(buf: bytes) -> np.ndarray:
    arr, _ = _read_ring(buf, 5)
    return arr


def decode_polygon(buf: bytes, off: int = 0) -> tuple[list[np.ndarray], int]:
    (nrings,) = _U32.unpack_from(buf, off + 5)
    off += 9
    rings = []
    for _ in range(nrings):
        r, off = _read_ring(buf, off)
        rings.append(r)
    return rings, off


def decode_rings(buf: bytes) -> list[np.ndarray]:
    """Polygon or MultiPolygon -> flat list of rings (even-odd PIP does
    not need shell/hole structure, matching this engine's winding
    semantics)."""
    t = geom_type(buf)
    if t == POLYGON:
        rings, _ = decode_polygon(buf)
        return rings
    if t == MULTIPOLYGON:
        (npoly,) = _U32.unpack_from(buf, 5)
        off = 9
        rings: list[np.ndarray] = []
        for _ in range(npoly):
            rs, off2 = decode_polygon(buf, off)
            rings.extend(rs)
            off = off2
        return rings
    raise ValueError(f"expected (Multi)Polygon, got WKB type {t}")


def decode_polygons(buf: bytes) -> list[list[np.ndarray]]:
    """Polygon or MultiPolygon -> list of polygons, each a list of
    rings with ring 0 the shell and the rest holes (the structure
    decode_rings deliberately flattens; shoelace area/centroid needs
    it because holes subtract)."""
    t = geom_type(buf)
    if t == POLYGON:
        rings, _ = decode_polygon(buf)
        return [rings]
    if t == MULTIPOLYGON:
        (npoly,) = _U32.unpack_from(buf, 5)
        off = 9
        polys: list[list[np.ndarray]] = []
        for _ in range(npoly):
            rs, off = decode_polygon(buf, off)
            polys.append(rs)
        return polys
    raise ValueError(f"expected (Multi)Polygon, got WKB type {t}")


def decode_points(buf: bytes) -> np.ndarray:
    """Point or MultiPoint -> Nx2 array."""
    t = geom_type(buf)
    if t == POINT:
        return np.asarray([decode_point(buf)])
    if t == MULTIPOINT:
        (n,) = _U32.unpack_from(buf, 5)
        off = 9
        pts = np.empty((n, 2), dtype=np.float64)
        for i in range(n):
            pts[i] = struct.unpack_from("<2d", buf, off + 5)
            off += 21
        return pts
    raise ValueError(f"expected (Multi)Point, got WKB type {t}")


def decode_lines(buf: bytes) -> list[np.ndarray]:
    """LineString or MultiLineString -> list of Nx2 arrays."""
    t = geom_type(buf)
    if t == LINESTRING:
        return [decode_linestring(buf)]
    if t == MULTILINESTRING:
        (n,) = _U32.unpack_from(buf, 5)
        off = 9
        lines = []
        for _ in range(n):
            arr, off = _read_ring(buf, off + 5)
            lines.append(arr)
        return lines
    raise ValueError(f"expected (Multi)LineString, got WKB type {t}")


def bbox(buf: bytes) -> tuple[float, float, float, float]:
    """(xmin, ymin, xmax, ymax) of any supported geometry."""
    t = geom_type(buf)
    if t in (POINT, MULTIPOINT):
        pts = decode_points(buf)
    elif t in (LINESTRING, MULTILINESTRING):
        pts = np.concatenate(decode_lines(buf))
    else:
        pts = np.concatenate(decode_rings(buf))
    return (
        float(pts[:, 0].min()),
        float(pts[:, 1].min()),
        float(pts[:, 0].max()),
        float(pts[:, 1].max()),
    )
