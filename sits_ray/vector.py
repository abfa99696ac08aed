"""Vector IO: minimal pure-numpy ESRI Shapefile + dBASE III reader/writer
and a vectorized point-in-polygon ROI filter — the reference's vector
surface (``R/api_shp.R``, ``R/api_sf.R``, ``R/api_vector.R``: sample
points and ROI polygons arrive as shapefiles; ``sits_get_data.shp``
reads them, cubes crop to polygon ROIs).

Both formats are fully public (ESRI Shapefile Technical Description
1998; dBASE III header layout) and simple enough to parse with
``struct``/numpy — no GDAL/fiona in the container, none needed for
points and polygons:

* ``.shp`` — 100-byte header (file code 9994 big-endian, shape type
  little-endian), then records of (BE record header, LE shape content).
  Implemented: Point (1), Polygon (5, multi-ring).
* ``.dbf`` — 32-byte header + 32-byte field descriptors + fixed-width
  ASCII records. Implemented: C (char) and N (numeric) fields.

The ROI filter is the even-odd ray-crossing test vectorized over a
whole batch of points at once (handles holes and multiple rings
naturally), exposed as a ``map_batches`` filter so a polygon crop
streams like every other stage.
"""

from __future__ import annotations

import os
import struct

import numpy as np
import pandas as pd

# --- .shp ---------------------------------------------------------------


def write_shp_points(path: str, xs, ys) -> str:
    """Write a Point (type 1) shapefile. Returns ``path``."""
    xs = np.asarray(xs, dtype=np.float64)
    ys = np.asarray(ys, dtype=np.float64)
    n = len(xs)
    rec = b"".join(
        struct.pack(">ii", i + 1, 10) + struct.pack("<idd", 1, xs[i], ys[i])
        for i in range(n)
    )
    _write_shp(path, 1, rec, xs, ys)
    return path


def write_shp_polygon(path: str, rings) -> str:
    """Write a one-record Polygon (type 5) shapefile; ``rings`` is a list
    of (x, y) vertex arrays (first = outer, rest = holes; each ring
    closed or not — the writer closes it)."""
    closed = []
    for rx, ry in rings:
        rx = np.asarray(rx, dtype=np.float64)
        ry = np.asarray(ry, dtype=np.float64)
        if rx[0] != rx[-1] or ry[0] != ry[-1]:
            rx = np.append(rx, rx[0])
            ry = np.append(ry, ry[0])
        closed.append((rx, ry))
    all_x = np.concatenate([r[0] for r in closed])
    all_y = np.concatenate([r[1] for r in closed])
    parts = np.cumsum([0] + [len(r[0]) for r in closed[:-1]]).astype(np.int32)
    npts = len(all_x)
    content = struct.pack(
        "<idddd", 5, all_x.min(), all_y.min(), all_x.max(), all_y.max()
    )
    content += struct.pack("<ii", len(closed), npts)
    content += parts.tobytes()
    xy = np.empty(npts * 2, dtype=np.float64)
    xy[0::2] = all_x
    xy[1::2] = all_y
    content += xy.tobytes()
    rec = struct.pack(">ii", 1, len(content) // 2) + content
    _write_shp(path, 5, rec, all_x, all_y)
    return path


def _write_shp(path: str, shape_type: int, records: bytes,
               xs: np.ndarray, ys: np.ndarray) -> None:
    total_words = (100 + len(records)) // 2
    hdr = struct.pack(">i", 9994) + b"\x00" * 20 + struct.pack(">i", total_words)
    hdr += struct.pack("<ii", 1000, shape_type)
    box = (float(xs.min()), float(ys.min()), float(xs.max()), float(ys.max())) \
        if len(xs) else (0.0, 0.0, 0.0, 0.0)
    hdr += struct.pack("<4d", *box) + struct.pack("<4d", 0, 0, 0, 0)
    with open(path, "wb") as fh:
        fh.write(hdr + records)


def read_shp(path: str) -> dict:
    """Parse a .shp file. Returns ``{"shape_type", "bbox", "records"}``
    where each record is ``{"x", "y"}`` (Point) or ``{"rings": [(x, y),
    ...]}`` (Polygon)."""
    with open(path, "rb") as fh:
        buf = fh.read()
    if struct.unpack(">i", buf[:4])[0] != 9994:
        raise ValueError(f"{path}: not a shapefile (bad file code)")
    version, shape_type = struct.unpack("<ii", buf[28:36])
    if version != 1000:
        raise ValueError(f"{path}: unsupported shapefile version {version}")
    bbox = struct.unpack("<4d", buf[36:68])
    records = []
    off = 100
    while off + 8 <= len(buf):
        _recno, clen = struct.unpack(">ii", buf[off:off + 8])
        off += 8
        content = buf[off:off + clen * 2]
        off += clen * 2
        stype = struct.unpack("<i", content[:4])[0]
        if stype == 0:  # null shape
            continue
        if stype == 1:
            x, y = struct.unpack("<dd", content[4:20])
            records.append({"x": x, "y": y})
        elif stype == 5:
            nparts, npts = struct.unpack("<ii", content[36:44])
            parts = np.frombuffer(content, dtype="<i4", count=nparts, offset=44)
            xy = np.frombuffer(content, dtype="<f8", count=npts * 2,
                               offset=44 + 4 * nparts)
            xs, ys = xy[0::2], xy[1::2]
            bounds = np.append(parts, npts)
            rings = [(xs[bounds[i]:bounds[i + 1]].copy(),
                      ys[bounds[i]:bounds[i + 1]].copy())
                     for i in range(nparts)]
            records.append({"rings": rings})
        else:
            raise NotImplementedError(
                f"shape type {stype} (only Point=1 and Polygon=5)"
            )
    return {"shape_type": shape_type, "bbox": bbox, "records": records}


# --- .dbf ---------------------------------------------------------------


def write_dbf(path: str, df: pd.DataFrame) -> str:
    """Write attributes as dBASE III: strings -> C fields, numbers -> N
    (18 wide, 6 decimals for floats). Field names are upper-cased and
    truncated to 10 chars per the format."""
    fields = []
    for c in df.columns:
        name = str(c).upper()[:10].ljust(11, "\x00").encode("ascii")
        if pd.api.types.is_integer_dtype(df[c]):
            fields.append((name, b"N", 18, 0))
        elif pd.api.types.is_float_dtype(df[c]):
            fields.append((name, b"N", 18, 6))
        else:
            w = max(1, min(254, int(df[c].astype(str).str.len().max() or 1)))
            fields.append((name, b"C", w, 0))
    rec_len = 1 + sum(f[2] for f in fields)
    hdr_len = 32 + 32 * len(fields) + 1
    out = bytearray()
    out += struct.pack("<B3BIHH20x", 0x03, 26, 8, 19, len(df), hdr_len, rec_len)
    for name, typ, w, dec in fields:
        out += name + typ + b"\x00" * 4 + struct.pack("<BB", w, dec) + b"\x00" * 14
    out += b"\x0d"
    for _, row in df.iterrows():
        out += b" "  # not deleted
        for (name, typ, w, dec), c in zip(fields, df.columns):
            v = row[c]
            if typ == b"N":
                s = (f"{v:.{dec}f}" if dec else f"{int(v)}").rjust(w)[:w]
            else:
                s = str(v).ljust(w)[:w]
            out += s.encode("ascii", "replace")
    out += b"\x1a"
    with open(path, "wb") as fh:
        fh.write(bytes(out))
    return path


def read_dbf(path: str) -> pd.DataFrame:
    with open(path, "rb") as fh:
        buf = fh.read()
    n_rec, hdr_len, rec_len = struct.unpack("<IHH", buf[4:12])
    fields = []
    off = 32
    while buf[off] != 0x0D:
        name = buf[off:off + 11].split(b"\x00")[0].decode("ascii")
        typ = chr(buf[off + 11])
        w, dec = buf[off + 16], buf[off + 17]
        fields.append((name, typ, w, dec))
        off += 32
    cols: dict[str, list] = {f[0]: [] for f in fields}
    off = hdr_len
    for _ in range(n_rec):
        rec = buf[off:off + rec_len]
        off += rec_len
        if rec[:1] == b"*":  # deleted
            continue
        p = 1
        for name, typ, w, dec in fields:
            raw = rec[p:p + w].decode("ascii", "replace")
            p += w
            if typ == "N":
                s = raw.strip()
                v = None if not s else (float(s) if dec else int(s))
            else:
                v = raw.rstrip()
            cols[name].append(v)
    return pd.DataFrame(cols)


def read_shapefile_points(base: str) -> pd.DataFrame:
    """Read ``base.shp`` (+ ``base.dbf`` attributes when present) into a
    DataFrame with ``x``/``y`` columns — the sample-point source of
    ``sits_get_data.shp`` (``R/api_shp.R``)."""
    base = base[:-4] if base.endswith(".shp") else base
    shp = read_shp(base + ".shp")
    if shp["shape_type"] != 1:
        raise ValueError("read_shapefile_points expects a Point shapefile")
    geo = pd.DataFrame({"x": [r["x"] for r in shp["records"]],
                        "y": [r["y"] for r in shp["records"]]})
    dbf_path = base + ".dbf"
    if os.path.exists(dbf_path):
        attrs = read_dbf(dbf_path)
        if len(attrs) != len(geo):
            raise ValueError(".dbf record count != .shp record count")
        geo = pd.concat([attrs.reset_index(drop=True), geo], axis=1)
    return geo


# --- point-in-polygon ROI -------------------------------------------------


def points_in_polygon(px, py, rings) -> np.ndarray:
    """Even-odd ray-crossing test, vectorized over all points x all ring
    edges at once; multiple rings compose by XOR so holes subtract.
    Points exactly on a horizontal edge follow the half-open [y1, y2)
    convention (deterministic, split-invariant)."""
    px = np.asarray(px, dtype=np.float64)
    py = np.asarray(py, dtype=np.float64)
    inside = np.zeros(len(px), dtype=bool)
    for rx, ry in rings:
        rx = np.asarray(rx, dtype=np.float64)
        ry = np.asarray(ry, dtype=np.float64)
        if rx[0] != rx[-1] or ry[0] != ry[-1]:
            rx = np.append(rx, rx[0])
            ry = np.append(ry, ry[0])
        x1, y1 = rx[:-1], ry[:-1]
        x2, y2 = rx[1:], ry[1:]
        # edge straddles the point's horizontal line (half-open)
        cond = (y1[None, :] > py[:, None]) != (y2[None, :] > py[:, None])
        with np.errstate(divide="ignore", invalid="ignore"):
            xint = x1 + (py[:, None] - y1) * (x2 - x1) / (y2 - y1)
        crosses = cond & (px[:, None] < xint)
        inside ^= (crosses.sum(axis=1) % 2).astype(bool)
    return inside


def roi_filter(ds, rings, x_col: str = "x", y_col: str = "y"):
    """Streaming polygon crop: keep rows whose (x, y) lies inside the ROI
    polygon (rings as in :func:`points_in_polygon`, or the dict returned
    by :func:`read_shp` for a Polygon shapefile). The polygon ships once
    per task closure; each batch is one vectorized crossing test."""
    if isinstance(rings, dict):
        rings = rings["records"][0]["rings"]
    rings = [(np.asarray(rx, np.float64), np.asarray(ry, np.float64))
             for rx, ry in rings]

    import pyarrow as pa

    def pick(t: pa.Table) -> pa.Table:
        keep = points_in_polygon(
            t[x_col].to_numpy(zero_copy_only=False),
            t[y_col].to_numpy(zero_copy_only=False), rings
        )
        return t.filter(pa.array(keep))

    return ds.map_batches(pick, batch_format="pyarrow")
