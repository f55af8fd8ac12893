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
            d = 2 * EARTH_RADIUS_M * np.arcsin(np.sqrt(a))
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


class GeoIPLookup:
    """Actor-pool stage: IP string column → "lat,lon" coordinate column.

    Structure mirrors the reference (database opened ONCE per worker in
    __init__, lookups per batch). The MaxMind db/library are absent here,
    so the resolver is a deterministic stub keyed on the IP's hash;
    replace ``_resolve`` with a geoip2.database.Reader when available.
    """

    def __init__(self, ip_column: str = "ip", out_column: str = "coords",
                 db_path: str | None = None):
        self.ip_column, self.out_column = ip_column, out_column
        self.reader = None
        if db_path is not None:
            try:
                import geoip2.database  # type: ignore
                self.reader = geoip2.database.Reader(db_path)
            except ImportError as e:  # pragma: no cover
                raise NotImplementedError(
                    "geoip2 not available in this environment") from e

    def _resolve(self, ips: list) -> list:
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
        ips = combine(batch[self.ip_column]).to_pylist()
        coords = self._resolve(ips)
        return batch.append_column(pa.field(self.out_column, pa.string()),
                                   pa.array(coords, pa.string()))
