"""Geo transforms and reductions. SURVEY.md §2.11 / §2.17.

Parity targets:
- ``CoordinatesDistanceTransform`` (datavec-geo/.../CoordinatesDistanceTransform.java:38)
  — new Double column = distance between two "lat,long"-style delimited
  coordinate columns (we implement Haversine meters + a flat "euclidean
  degrees" mode matching the reference's CoordinatesDistance naive mode).
- ``GeographicMidpointReduction`` (reduce/impl/GeographicMidpointReduction.java:41)
  — mean-of-unit-vectors geographic midpoint of "lat,long" strings,
  usable as a custom reduction (register_reduce_op).
- ``IPAddressToCoordinatesTransform`` (datavec-geo/.../IPAddressToCoordinatesTransform.java:31)
  — per-worker cached GeoIP database lookup. The MaxMind database is not
  available in this environment, so GeoIPLookup is an actor-pool stage
  with the db-load-once-per-actor structure intact and a deterministic
  stub resolver (clearly marked; swap `_resolve` for a real geoip2
  Reader when the library/db exist).
"""

from __future__ import annotations

from typing import Any

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from datavec_ray.registry import register
from datavec_ray.schema import ColumnMeta, Schema
from datavec_ray.steps.base import Step, combine

EARTH_RADIUS_M = 6_371_000.0


def _parse_latlon(col: pa.Array, delimiter: str = ",") -> tuple[np.ndarray, np.ndarray]:
    parts = pc.split_pattern(pc.fill_null(col, "0,0"), delimiter)
    flat = pc.list_flatten(parts).cast(pa.float64()).to_numpy(zero_copy_only=False)
    lat = flat[0::2]
    lon = flat[1::2]
    return lat, lon


@register("step")
class CoordinatesDistance(Step):
    """new Double column = distance between two "lat<delim>lon" columns.

    mode: "haversine" (meters) | "euclidean" (degrees, the reference's
    naive CoordinatesDistanceTransform behavior).
    """

    def __init__(self, new_column: str, first: str, second: str,
                 delimiter: str = ",", mode: str = "haversine"):
        if mode not in ("haversine", "euclidean"):
            raise ValueError("mode must be haversine or euclidean")
        self.new_column, self.first, self.second = new_column, first, second
        self.delimiter, self.mode = delimiter, mode

    def output_schema(self, schema: Schema) -> Schema:
        schema.require(self.first, self.second)
        return schema.with_column(self.new_column, pa.float64(), ColumnMeta("Double"))

    def apply(self, table: pa.Table) -> pa.Table:
        la1, lo1 = _parse_latlon(combine(table[self.first]), self.delimiter)
        la2, lo2 = _parse_latlon(combine(table[self.second]), self.delimiter)
        if self.mode == "euclidean":
            d = np.sqrt((la1 - la2) ** 2 + (lo1 - lo2) ** 2)
        else:
            p1, p2 = np.radians(la1), np.radians(la2)
            dp = p2 - p1
            dl = np.radians(lo2 - lo1)
            a = np.sin(dp / 2) ** 2 + np.cos(p1) * np.cos(p2) * np.sin(dl / 2) ** 2
            # atan2 form: no NaN when float error pushes a past 1, and
            # numerically stable at (near-)antipodal pairs
            a = np.clip(a, 0.0, 1.0)
            d = 2 * EARTH_RADIUS_M * np.arctan2(np.sqrt(a), np.sqrt(1.0 - a))
        return table.append_column(pa.field(self.new_column, pa.float64()),
                                   pa.array(d))

    def to_dict(self) -> dict[str, Any]:
        return {"cls": "CoordinatesDistance", "new_column": self.new_column,
                "first": self.first, "second": self.second,
                "delimiter": self.delimiter, "mode": self.mode}


def geographic_midpoint(latlon_strings, delimiter: str = ",") -> str:
    """Mean-of-unit-vectors midpoint (GeographicMidpointReduction.java:41).
    Input: iterable/array of "lat,lon" strings → "lat,lon" string."""
    arr = pa.array([s for s in latlon_strings if s], pa.string())
    if len(arr) == 0:
        return None
    lat, lon = _parse_latlon(arr, delimiter)
    la, lo = np.radians(lat), np.radians(lon)
    x = np.cos(la) * np.cos(lo)
    y = np.cos(la) * np.sin(lo)
    z = np.sin(la)
    mx, my, mz = x.mean(), y.mean(), z.mean()
    lon_m = np.arctan2(my, mx)
    lat_m = np.arctan2(mz, np.sqrt(mx * mx + my * my))
    return f"{np.degrees(lat_m):.6f},{np.degrees(lon_m):.6f}"


def ipv4_to_uint32(col: pa.Array | pa.ChunkedArray) -> np.ndarray:
    """Vectorized dotted-quad IPv4 strings → uint32 (invalid → 0)."""
    col = combine(col) if isinstance(col, pa.ChunkedArray) else col
    parts = pc.split_pattern(pc.fill_null(col, "0.0.0.0"), ".")
    counts = np.diff(np.asarray(parts.offsets))
    ok = counts == 4
    flat = pc.list_flatten(parts)
    octets = np.zeros(len(flat), dtype=np.uint64)
    try:
        octets = pc.cast(flat, pa.int64()).to_numpy(
            zero_copy_only=False).astype(np.uint64)
    except Exception:  # noqa: BLE001 — per-value fallback for junk rows
        vals = flat.to_pylist()
        octets = np.array([int(v) if v and v.isdigit() else 0 for v in vals],
                          dtype=np.uint64)
    out = np.zeros(len(counts), dtype=np.uint64)
    pos = 0
    weights = np.array([1 << 24, 1 << 16, 1 << 8, 1], dtype=np.uint64)
    idx4 = np.flatnonzero(ok)
    if idx4.size:
        starts = np.concatenate(([0], np.cumsum(counts)))[:-1][ok]
        quad = octets[(starts[:, None] + np.arange(4)[None, :])]
        out[idx4] = (quad * weights[None, :]).sum(axis=1)
    return out.astype(np.uint32)


class GeoIPLookup:
    """Actor-pool stage: IP string column → "lat,lon" coordinate column
    (IPAddressToCoordinatesTransform.java:31 — per-worker cached GeoIP
    database, lookups per batch).

    Database backends, chosen by ``db_path``:
    - ``*.csv``: an IP-RANGE table ``ip_lo,ip_hi,lat,lon`` (dotted-quad
      or integer bounds). Loaded ONCE per actor into sorted numpy
      arrays; per-batch lookup is one vectorized ``np.searchsorted`` —
      a real, fully-functional resolver with zero native deps.
    - ``*.mmdb``: MaxMind via geoip2 when that library exists
      (not in this container).
    - ``None``: deterministic hash stub (plumbing tests only).
    """

    def __init__(self, ip_column: str = "ip", out_column: str = "coords",
                 db_path: str | None = None):
        self.ip_column, self.out_column = ip_column, out_column
        self.reader = None
        self.ranges = None
        if db_path is not None and db_path.endswith(".csv"):
            import csv
            lo, hi, lat, lon = [], [], [], []

            def as_int(v: str) -> int:
                v = v.strip()
                if "." in v:
                    a, b, c, d = (int(x) for x in v.split("."))
                    return (a << 24) | (b << 16) | (c << 8) | d
                return int(v)

            with open(db_path, newline="") as f:
                for row in csv.reader(f):
                    if not row or row[0].lstrip().startswith("#") \
                            or row[0].strip() == "ip_lo":
                        continue
                    lo.append(as_int(row[0]))
                    hi.append(as_int(row[1]))
                    lat.append(float(row[2]))
                    lon.append(float(row[3]))
            order = np.argsort(np.array(lo, dtype=np.uint64))
            self.ranges = (np.array(lo, np.uint64)[order],
                           np.array(hi, np.uint64)[order],
                           np.array(lat, np.float64)[order],
                           np.array(lon, np.float64)[order])
        elif db_path is not None:
            try:
                import geoip2.database  # type: ignore
                self.reader = geoip2.database.Reader(db_path)
            except ImportError as e:  # pragma: no cover
                raise NotImplementedError(
                    "geoip2 not available in this environment; use the "
                    "CSV range-db backend") from e

    def _resolve_ranges(self, col) -> list:
        lo, hi, lat, lon = self.ranges
        ips = ipv4_to_uint32(col).astype(np.uint64)
        idx = np.searchsorted(lo, ips, side="right") - 1
        valid = idx >= 0
        idx = np.maximum(idx, 0)
        valid &= ips <= hi[idx]
        return [f"{lat[i]:.6f},{lon[i]:.6f}" if v else None
                for i, v in zip(idx, valid)]

    def _resolve(self, col) -> list:
        if self.ranges is not None:
            return self._resolve_ranges(col)
        ips = col.to_pylist()
        if self.reader is not None:  # pragma: no cover (no db in sandbox)
            out = []
            for ip in ips:
                try:
                    r = self.reader.city(ip)
                    out.append(f"{r.location.latitude},{r.location.longitude}")
                except Exception:  # noqa: BLE001
                    out.append(None)
            return out
        # deterministic stub: hash the IP into a plausible lat/lon
        from datavec_ray.hll import hash64
        h = hash64(np.array([ip or "" for ip in ips], dtype=object))
        lat = (h % np.uint64(180_000)).astype(np.float64) / 1000.0 - 90.0
        lon = ((h >> np.uint64(20)) % np.uint64(360_000)).astype(np.float64) / 1000.0 - 180.0
        return [f"{a:.3f},{b:.3f}" for a, b in zip(lat, lon)]

    def __call__(self, batch: pa.Table) -> pa.Table:
        coords = self._resolve(combine(batch[self.ip_column]))
        return batch.append_column(pa.field(self.out_column, pa.string()),
                                   pa.array(coords, pa.string()))
