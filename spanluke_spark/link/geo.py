"""Geospatial entity blocking — geohash cells + haversine verify: the
spatial member of the blocking family (phonetic.py blocks sound,
editdist.py blocks segments, jaro.py blocks prefixes; this blocks
coordinates) for venue/POI/org deduplication when web entities carry
lat/lon (schema.org GeoCoordinates, sitemaps, microdata).

Geohash (Niemeyer 2008, the de-facto public standard): interleave
longitude/latitude binary subdivision bits (lon first) and write every
5 bits as one char of the base32 alphabet
"0123456789bcdefghjkmnpqrstuvwxyz". Implemented as pure native
arithmetic — the integer cell index per axis is one floor division of
the normalized coordinate, each output char is its own 5-step bit
aggregate (the full interleaved integer is never materialized: at
precision 11 it would be 55 bits, and a long routed through double
division loses bits above 2^53 — per-char extraction keeps every
intermediate below 2^28, where floor-division by powers of two is
exact in IEEE double). Published-vector pytest anchors (the
Wikipedia/original vectors, e.g. (57.64911, 10.40744) -> u4pruydqqvj).

The near-join is the standard lossless cell+neighbors contract: two
points within radius r can straddle a cell boundary, but if r <= the
minimum cell dimension at precision p, they MUST lie in the same or
one of the 8 adjacent cells (pigeonhole on the axis grids). Neighbor
cells are computed by offsetting the point by +-one cell size per axis
and re-encoding — no base32 neighbor lookup tables, pure arithmetic,
and the join stays a content-keyed equi-join (each point emits its
home cell on the build side and its 9-cell probe keys on the probe
side: constant fan-out, never a cross join; at 10^9 points the
shuffle key is the cell id). Haversine (great-circle) verify on the
candidates only.

Latitude cell heights are uniform (180/2^latbits degrees ~ 111 km per
degree); longitude cell widths shrink with cos(lat), so the lossless
bound uses the WORST-CASE (highest-|lat|) point in the data — callers
pick precision so that r <= min(cell_height, cell_width_at_max_lat),
asserted in the fixture pytest.

Known limitation (documented, not silent): neighbor probes that cross
the antimeridian (lon +-180) or a pole clamp to the boundary cell
instead of wrapping, so pairs straddling lon=180 exactly can be
missed. Crawl-entity coordinates cluster on land far from the
antimeridian; callers with Pacific data should pre-rotate longitudes.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["geohash", "haversine_km", "geo_near_pairs"]

_B32 = "0123456789bcdefghjkmnpqrstuvwxyz"
EARTH_RADIUS_KM = 6371.0


def _axis_cell(coord: Column, lo: float, hi: float, bits: int) -> Column:
    """Integer cell index of coord on [lo, hi) subdivided 2^bits times
    (clamped so the upper boundary lands in the top cell)."""
    idx = F.floor((coord - lo) / (hi - lo) * (2**bits)).cast("long")
    return F.greatest(F.lit(0), F.least(idx, F.lit(2**bits - 1)))


def _bit_of(v: Column, total_bits: int, i: Column) -> Column:
    """i-th bit, MSB-first, of a total_bits-wide non-negative integer
    (pow-based: shiftright takes only literal bit counts)."""
    denom = F.pow(F.lit(2.0), (F.lit(total_bits - 1) - i).cast("double"))
    return F.floor(v / denom).cast("long") % 2


def geohash(lat: Column, lon: Column, precision: int = 6) -> Column:
    """Standard geohash string of the given precision (chars).

    Char c covers interleaved bit positions [5c, 5c+5) (MSB-first, bit
    k from lon when k is even, lat when odd); each char is a 5-step
    aggregate over its own bits, so no intermediate ever exceeds the
    per-axis cell index (< 2^28 at precision 11) and every floor
    division by a power of two is IEEE-exact."""
    nbits = 5 * precision
    lon_bits = (nbits + 1) // 2  # even positions (0-based) are longitude
    lat_bits = nbits // 2
    x = _axis_cell(lon, -180.0, 180.0, lon_bits)
    y = _axis_cell(lat, -90.0, 90.0, lat_bits)

    def bit(k: Column) -> Column:
        return (
            F.when(k % 2 == 0, _bit_of(x, lon_bits, F.floor(k / 2)))
            .otherwise(_bit_of(y, lat_bits, F.floor(k / 2)))
        )

    alphabet = F.split(F.lit(_B32), "")
    chars = F.transform(
        F.sequence(F.lit(0), F.lit(precision - 1)),
        lambda c: F.get(
            alphabet,
            F.aggregate(
                F.sequence(F.lit(0), F.lit(4)),
                F.lit(0).cast("long"),
                lambda acc, j: acc * 2 + bit(c * 5 + j),
            ).cast("int"),
        ),
    )
    return F.array_join(chars, "")


def haversine_km(
    lat1: Column, lon1: Column, lat2: Column, lon2: Column
) -> Column:
    """Great-circle distance in km (haversine formula, R = 6371 km)."""
    rl1, rl2 = F.radians(lat1), F.radians(lat2)
    dlat = F.radians(lat2 - lat1) / 2
    dlon = F.radians(lon2 - lon1) / 2
    a = F.sin(dlat) * F.sin(dlat) + F.cos(rl1) * F.cos(rl2) * F.sin(
        dlon
    ) * F.sin(dlon)
    return 2 * EARTH_RADIUS_KM * F.asin(F.sqrt(a))


def cell_sizes_deg(precision: int) -> tuple[float, float]:
    """(lat_height_deg, lon_width_deg) of one geohash cell."""
    nbits = 5 * precision
    return 180.0 / 2 ** (nbits // 2), 360.0 / 2 ** ((nbits + 1) // 2)


def geo_near_pairs(
    points: DataFrame,
    radius_km: float,
    precision: int = 5,
    id_col: str = "id",
    lat_col: str = "lat",
    lon_col: str = "lon",
) -> DataFrame:
    """(id, lat, lon) -> (id_a, id_b, cell_a, dist_km): unordered pairs
    within radius_km. Lossless while radius_km <= the minimum cell
    dimension over the data's latitude range (module docstring)."""
    lat_h, lon_w = cell_sizes_deg(precision)
    p = points.select(
        F.col(id_col).alias("id"),
        F.col(lat_col).cast("double").alias("lat"),
        F.col(lon_col).cast("double").alias("lon"),
    )
    build = p.select(
        F.col("id").alias("id_a"),
        F.col("lat").alias("lat_a"),
        F.col("lon").alias("lon_a"),
        geohash(F.col("lat"), F.col("lon"), precision).alias("cell"),
    )
    d = F.explode(
        F.array(*[F.lit(i) for i in (-1, 0, 1)])
    ).alias("dy")
    probe = (
        p.select("id", "lat", "lon", d)
        .select(
            "id", "lat", "lon", "dy",
            F.explode(F.array(*[F.lit(i) for i in (-1, 0, 1)])).alias(
                "dx"
            ),
        )
        .select(
            F.col("id").alias("id_b"),
            F.col("lat").alias("lat_b"),
            F.col("lon").alias("lon_b"),
            geohash(
                F.col("lat") + F.col("dy") * lat_h,
                F.col("lon") + F.col("dx") * lon_w,
                precision,
            ).alias("cell"),
        )
        .distinct()
    )
    dist = haversine_km(
        F.col("lat_a"), F.col("lon_a"), F.col("lat_b"), F.col("lon_b")
    )
    return (
        build.join(probe, "cell")
        .where(F.col("id_a") < F.col("id_b"))
        .withColumn("dist_km", dist)
        .where(F.col("dist_km") <= F.lit(radius_km))
        .select(
            "id_a",
            "id_b",
            F.col("cell").alias("cell_a"),
            "dist_km",
        )
    )
