"""ESRI shapefile reader (.shp geometry + .dbf attributes).

Counterpart of /root/reference/fdaPDE/utils/IO/shp_reader.h:49-408: supports
Point (1), PolyLine (3), Polygon (5) and their M/Z variants' XY data, plus
the dBASE attribute table. Pure-Python struct parsing, host-side.
"""

from __future__ import annotations

import os
import struct
from dataclasses import dataclass, field

import numpy as np

__all__ = ["ShapeFile", "read_shp", "read_dbf"]

_SHAPE_NAMES = {0: "Null", 1: "Point", 3: "PolyLine", 5: "Polygon",
                8: "MultiPoint", 11: "PointZ", 13: "PolyLineZ", 15: "PolygonZ"}


@dataclass
class ShapeRecord:
    shape_type: int
    points: np.ndarray  # (n, 2)
    parts: np.ndarray  # part start offsets into points


def read_shp(path: str):
    """Parse a .shp file -> (shape_type, bbox, [ShapeRecord])."""
    with open(path, "rb") as fh:
        header = fh.read(100)
        (magic,) = struct.unpack(">i", header[:4])
        if magic != 9994:  # shp_reader.h file-code check
            raise ValueError(f"{path}: not a shapefile (code {magic})")
        (file_len_words,) = struct.unpack(">i", header[24:28])
        version, shape_type = struct.unpack("<ii", header[28:36])
        bbox = struct.unpack("<4d", header[36:68])
        records = []
        body = fh.read(2 * file_len_words - 100)
    off = 0
    while off < len(body):
        _, content_len = struct.unpack(">ii", body[off : off + 8])
        off += 8
        rec = body[off : off + 2 * content_len]
        off += 2 * content_len
        (stype,) = struct.unpack("<i", rec[:4])
        if stype == 0:
            records.append(ShapeRecord(0, np.empty((0, 2)), np.zeros(1, np.int64)))
        elif stype in (1, 11, 21):  # point variants: x, y first
            x, y = struct.unpack("<2d", rec[4:20])
            records.append(
                ShapeRecord(stype, np.array([[x, y]]), np.zeros(1, np.int64))
            )
        elif stype in (3, 5, 13, 15, 23, 25):  # polyline/polygon variants
            n_parts, n_points = struct.unpack("<2i", rec[36:44])
            parts = np.frombuffer(rec, "<i4", n_parts, 44).astype(np.int64)
            pts = np.frombuffer(
                rec, "<f8", 2 * n_points, 44 + 4 * n_parts
            ).reshape(n_points, 2)
            records.append(ShapeRecord(stype, pts.copy(), parts))
        elif stype == 8:  # multipoint
            (n_points,) = struct.unpack("<i", rec[36:40])
            pts = np.frombuffer(rec, "<f8", 2 * n_points, 40).reshape(n_points, 2)
            records.append(ShapeRecord(stype, pts.copy(), np.zeros(1, np.int64)))
        else:
            raise NotImplementedError(f"shape type {stype}")
    return shape_type, np.asarray(bbox), records


def read_dbf(path: str):
    """Parse a dBASE III .dbf attribute table -> (field_names, rows)."""
    with open(path, "rb") as fh:
        header = fh.read(32)
        n_records = struct.unpack("<I", header[4:8])[0]
        header_size, record_size = struct.unpack("<2H", header[8:12])
        fields = []
        while True:
            desc = fh.read(32)
            if desc[0:1] == b"\r":
                break
            name = desc[:11].split(b"\0")[0].decode("ascii")
            ftype = desc[11:12].decode("ascii")
            length = desc[16]
            fields.append((name, ftype, length))
            if fh.tell() >= header_size - 1:
                fh.read(1)
                break
        fh.seek(header_size)
        rows = []
        for _ in range(n_records):
            rec = fh.read(record_size)
            if not rec or rec[0:1] == b"\x1a":
                break
            offp = 1  # skip deletion flag
            row = {}
            for name, ftype, length in fields:
                raw = rec[offp : offp + length].decode("latin1").strip()
                offp += length
                if ftype in ("N", "F"):
                    row[name] = float(raw) if raw else np.nan
                elif ftype == "L":
                    row[name] = raw in ("Y", "y", "T", "t")
                else:
                    row[name] = raw
            rows.append(row)
    return [f[0] for f in fields], rows


class ShapeFile:
    """A .shp/.dbf pair (shp_reader.h:354 ShapeFile)."""

    def __init__(self, path: str):
        base = path[:-4] if path.lower().endswith(".shp") else path
        self.shape_type, self.bbox, self.records = read_shp(base + ".shp")
        dbf = base + ".dbf"
        if os.path.exists(dbf):
            self.field_names, self.attributes = read_dbf(dbf)
        else:
            self.field_names, self.attributes = [], []

    @property
    def shape_type_name(self) -> str:
        return _SHAPE_NAMES.get(self.shape_type, str(self.shape_type))

    def __len__(self):
        return len(self.records)

    def points(self, i: int) -> np.ndarray:
        return self.records[i].points
