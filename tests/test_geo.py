"""Geospatial blocking (link/geo.py) gates.

(a) published geohash vectors (the Wikipedia/Niemeyer anchors every
mainstream implementation reproduces), (b) a 240-point deterministic
fuzz sweep against an in-test pure-Python bisection encoder (the
classic textbook algorithm, structurally unrelated to the column
implementation's floor-index + per-char bit aggregate), (c) haversine
against the definitional formula, (d) geo_near_pairs recall == the
unblocked brute force on the q286 city fixture (losslessness under the
documented cell-size bound), (e) the q286 oracle-stability margins: no
candidate pair sits near the 15 km threshold or a 0.5 m rounding
boundary, so a cross-engine libm ulp wobble can never flip a row.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from spanluke_spark.link.geo import (
    EARTH_RADIUS_KM,
    cell_sizes_deg,
    geo_near_pairs,
    geohash,
    haversine_km,
)

_B32 = "0123456789bcdefghjkmnpqrstuvwxyz"

# Published vectors: Niemeyer's original example (Wikipedia: geohash)
# and the canonical ezs42 walkthrough example.
PUBLISHED = [
    (57.64911, 10.40744, 11, "u4pruydqqvj"),
    (42.605, -5.603, 5, "ezs42"),
    (0.0, 0.0, 1, "s"),
]


def ref_geohash(lat: float, lon: float, precision: int) -> str:
    """Classic bisection geohash encoder (independent reference)."""
    lat_lo, lat_hi = -90.0, 90.0
    lon_lo, lon_hi = -180.0, 180.0
    bits, out, even = 0, [], True
    ch = 0
    while len(out) < precision:
        if even:
            mid = (lon_lo + lon_hi) / 2
            if lon >= mid:
                ch = ch * 2 + 1
                lon_lo = mid
            else:
                ch = ch * 2
                lon_hi = mid
        else:
            mid = (lat_lo + lat_hi) / 2
            if lat >= mid:
                ch = ch * 2 + 1
                lat_lo = mid
            else:
                ch = ch * 2
                lat_hi = mid
        even = not even
        bits += 1
        if bits == 5:
            out.append(_B32[ch])
            bits, ch = 0, 0
    return "".join(out)


def ref_haversine_km(lat1, lon1, lat2, lon2):
    rl1, rl2 = math.radians(lat1), math.radians(lat2)
    dlat = math.radians(lat2 - lat1) / 2
    dlon = math.radians(lon2 - lon1) / 2
    a = math.sin(dlat) ** 2 + math.cos(rl1) * math.cos(rl2) * math.sin(dlon) ** 2
    return 2 * EARTH_RADIUS_KM * math.asin(math.sqrt(a))


# --- q286 fixture (mirrors __spark_entry__.q286_geo_blocking) ---------
CITY_LAT = [51.5, 40.71, 35.68, 48.85, 55.75, -33.86, 1.35]
CITY_LON = [-0.12, -74.0, 139.69, 2.35, 37.61, 151.2, 103.8]
N_POINTS = 400
RADIUS_KM = 15.0
PRECISION = 4


def fixture_points():
    pts = []
    for i in range(N_POINTS):
        lat = CITY_LAT[i % 7] + ((i * 7919) % 220 - 110) / 1000.0
        lon = CITY_LON[i % 7] + ((i * 104729) % 220 - 110) / 1000.0
        pts.append((i, lat, lon))
    return pts


def fixture_df(spark):
    return spark.createDataFrame(fixture_points(), "id long, lat double, lon double")


def test_geohash_published_vectors(spark):
    rows = [(i, lat, lon) for i, (lat, lon, _, _) in enumerate(PUBLISHED)]
    df = spark.createDataFrame(rows, "i int, lat double, lon double")
    for i, (lat, lon, prec, want) in enumerate(PUBLISHED):
        got = (
            df.where(F.col("i") == i)
            .select(geohash(F.col("lat"), F.col("lon"), prec).alias("gh"))
            .collect()[0][0]
        )
        assert got == want, (lat, lon, prec, got, want)
        assert ref_geohash(lat, lon, prec) == want  # reference agrees too


def test_geohash_fuzz_vs_bisection_reference(spark):
    # deterministic sweep incl. boundary-adjacent points; precision 1..11
    pts = []
    for i in range(240):
        lat = ((i * 9176) % 17999) / 100.0 - 89.99
        lon = ((i * 30011) % 35999) / 100.0 - 179.99
        pts.append((i, lat, lon, 1 + i % 11))
    df = spark.createDataFrame(pts, "i int, lat double, lon double, p int")
    for prec in range(1, 12):
        sub = df.where(F.col("p") == prec)
        got = {
            r["i"]: r["gh"]
            for r in sub.select(
                "i", geohash(F.col("lat"), F.col("lon"), prec).alias("gh")
            ).collect()
        }
        for i, lat, lon, p in pts:
            if p == prec:
                assert got[i] == ref_geohash(lat, lon, prec), (i, lat, lon, prec)


def test_haversine_definitional(spark):
    pairs = [
        (51.5, -0.12, 48.85, 2.35),   # London-Paris ~343 km
        (0.0, 0.0, 0.0, 1.0),         # one equatorial degree ~111.19 km
        (10.0, 20.0, 10.0, 20.0),     # zero
    ]
    df = spark.createDataFrame(
        [(i, *p) for i, p in enumerate(pairs)],
        "i int, la1 double, lo1 double, la2 double, lo2 double",
    )
    got = {
        r["i"]: r["d"]
        for r in df.select(
            "i", haversine_km(F.col("la1"), F.col("lo1"), F.col("la2"), F.col("lo2")).alias("d")
        ).collect()
    }
    for i, (la1, lo1, la2, lo2) in enumerate(pairs):
        assert got[i] == pytest.approx(ref_haversine_km(la1, lo1, la2, lo2), abs=1e-9)
    assert got[0] == pytest.approx(343.5, abs=1.0)
    assert got[1] == pytest.approx(111.19, abs=0.01)
    assert got[2] == 0.0


def test_lossless_bound_holds_for_fixture():
    # r <= min(cell_height_km, cell_width_km at the data's max |lat|)
    lat_h, lon_w = cell_sizes_deg(PRECISION)
    km_per_deg = math.pi * EARTH_RADIUS_KM / 180.0
    max_abs_lat = max(abs(lat) for _, lat, _ in fixture_points())
    height_km = lat_h * km_per_deg
    width_km = lon_w * km_per_deg * math.cos(math.radians(max_abs_lat))
    assert RADIUS_KM <= min(height_km, width_km), (height_km, width_km)


def test_geo_near_pairs_equals_brute_force(spark):
    pts = fixture_points()
    brute = set()
    for ai in range(len(pts)):
        for bi in range(ai + 1, len(pts)):
            _, la1, lo1 = pts[ai]
            _, la2, lo2 = pts[bi]
            if ref_haversine_km(la1, lo1, la2, lo2) <= RADIUS_KM:
                brute.add((pts[ai][0], pts[bi][0]))
    assert len(brute) > 500  # fixture is non-trivial
    got = {
        (r["id_a"], r["id_b"])
        for r in geo_near_pairs(
            fixture_df(spark), radius_km=RADIUS_KM, precision=PRECISION
        ).collect()
    }
    assert got == brute


def test_no_duplicate_pairs_and_cell_is_home_cell(spark):
    out = geo_near_pairs(
        fixture_df(spark), radius_km=RADIUS_KM, precision=PRECISION
    ).collect()
    keys = [(r["id_a"], r["id_b"]) for r in out]
    assert len(keys) == len(set(keys))
    by_id = {i: (lat, lon) for i, lat, lon in fixture_points()}
    for r in out[:50]:
        lat, lon = by_id[r["id_a"]]
        assert r["cell_a"] == ref_geohash(lat, lon, PRECISION)


def test_q286_oracle_margins():
    # every candidate pair (same or adjacent cell — superset: all
    # within-city pairs) keeps a safe margin from the 15 km threshold
    # and from a 0.5 m rounding boundary, so the q286 value hash is
    # immune to cross-engine libm ulp differences.
    pts = fixture_points()
    min_thresh_margin = float("inf")
    min_round_margin = float("inf")
    for ai in range(len(pts)):
        for bi in range(ai + 1, len(pts)):
            if pts[ai][0] % 7 != pts[bi][0] % 7:
                continue  # different cities: >1000 km, irrelevant
            _, la1, lo1 = pts[ai]
            _, la2, lo2 = pts[bi]
            d = ref_haversine_km(la1, lo1, la2, lo2)
            min_thresh_margin = min(min_thresh_margin, abs(d - RADIUS_KM))
            if d <= RADIUS_KM:
                frac = abs((d * 1000) % 1.0 - 0.5)
                min_round_margin = min(min_round_margin, frac)
    assert min_thresh_margin > 1e-6, min_thresh_margin
    assert min_round_margin > 1e-6, min_round_margin


def test_probe_fanout_is_constant(spark):
    # the probe side emits at most 9 distinct cells per point — the
    # join is a constant-fan-out equi-join, never a cross join.
    df = fixture_df(spark)
    lat_h, lon_w = cell_sizes_deg(PRECISION)
    probe = (
        df.select(
            "id",
            F.explode(F.array(*[F.lit(i) for i in (-1, 0, 1)])).alias("dy"),
            "lat",
            "lon",
        )
        .select(
            "id", "dy",
            F.explode(F.array(*[F.lit(i) for i in (-1, 0, 1)])).alias("dx"),
            "lat", "lon",
        )
        .select(
            "id",
            geohash(
                F.col("lat") + F.col("dy") * lat_h,
                F.col("lon") + F.col("dx") * lon_w,
                PRECISION,
            ).alias("cell"),
        )
        .groupBy("id")
        .agg(F.countDistinct("cell").alias("n"))
        .agg(F.max("n").alias("mx"))
        .collect()[0]["mx"]
    )
    assert probe <= 9
