"""Geospatial analytics: nearest-hub assignment and grid hotspot detection
over deterministically geotagged customers.

The reference has no location data, but its serving layer (Superset — the
dashboard charts at `README.md:25-64`) is exactly where a real deployment
adds "orders by region on a map"; this family supplies the two spatial
primitives those dashboards need: assign each entity to its nearest service
hub, and find spatial clusters. The fixture tables carry no coordinates, so
each customer gets a deterministic synthetic location derived from
``md5(custkey)`` (both engines compute identical digests) — the *derivation*
is a stand-in for a real lat/lon column; the operators downstream of it are
the real thing.

Exactness discipline: coordinates are integer micro-degrees, distances are
quantized-equirectangular integer milli-degree² (per-hub ``cos(lat)``
correction as precomputed per-mille literals — no runtime trigonometry, so
no libm divergence between engines), and every mean is a truncating BIGINT
division of exact sums.

Scale shapes (1e9–1e11 point rows):

- ``geo_hub_assign`` is the IVF-assign pattern on a sphere: the K hub
  centers ride along as a **literal array constant** (the broadcast analog),
  each point computes its argmin MAP-SIDE via ``transform`` + ``array_min``
  — no join, no per-point shuffle; the only exchange is the K-row census
  groupBy. mean-distance sums hold in BIGINT to ~1e8 points per hub
  (mdeg² ≤ 6.5e10 each); past that the sum moves to DECIMAL(38,0).
- ``geo_grid_hotspots`` reduces points to a 10°-cell census first (one
  shuffle, ≤ 703 live cells at full coverage), then runs the 3×3
  neighborhood sum as an **offset-explode convolution on the census** —
  cells ×9, never points ×9, and no self-join. The oracle computes the
  same neighborhoods with a naive census self-join, proving the
  convolution decomposition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import Catalog
from .registry import query

#: (hub_id, lat_µdeg, lon_µdeg, cos(lat) in per-mille) — fixed service hubs.
_HUBS = (
    (0, 40_700_000, -74_000_000, 758),
    (1, 51_500_000, -100_000, 623),
    (2, 35_700_000, 139_700_000, 812),
    (3, -33_900_000, 151_200_000, 830),
    (4, 19_400_000, -99_100_000, 943),
    (5, 28_600_000, 77_200_000, 878),
    (6, -23_500_000, -46_600_000, 917),
    (7, 55_800_000, 37_600_000, 562),
)

#: Spark SQL: 48-bit BIGINT from hex chars [start, start+12) of md5('g'||key).
_SPARK_H = (
    "CAST(conv(substr(md5(concat('g', CAST(c_custkey AS STRING))),"
    " {start}, 12), 16, 10) AS BIGINT)"
)

#: DuckDB: same 48-bit decode (no conv(); fold the hex digits).
_DUCK_H = """
    list_reduce(list_transform(range(0, 12),
        i -> CAST(strpos('0123456789abcdef',
                         substr(md5('g' || CAST(c_custkey AS VARCHAR)),
                                {start} + i, 1)) - 1 AS BIGINT)),
        (a, b) -> a * 16 + b)
"""

#: lat ∈ [-90e6, 90e6] µdeg, lon ∈ [-180e6, 180e6] µdeg.
_SPARK_LAT = f"({_SPARK_H.format(start=1)} % 180000001 - 90000000)"
_SPARK_LON = f"({_SPARK_H.format(start=13)} % 360000001 - 180000000)"
_DUCK_LAT = f"({_DUCK_H.format(start=1)} % 180000001 - 90000000)"
_DUCK_LON = f"({_DUCK_H.format(start=13)} % 360000001 - 180000000)"


def _points(spark: SparkSession, sf_dir: str) -> DataFrame:
    """customer → (c_custkey, c_nationkey, lat_udeg, lon_udeg), map-side."""
    cat = Catalog(spark, sf_dir)
    return cat.customer.select(
        "c_custkey",
        "c_nationkey",
        F.expr(_SPARK_LAT).alias("lat_udeg"),
        F.expr(_SPARK_LON).alias("lon_udeg"),
    )


def _dist2(lat: str, lon: str, hlat: int, hlon: int, cpm: int) -> str:
    """Quantized-equirectangular mdeg² distance: dlat² + (dlon·cos(hlat))²,
    longitude wrapped at ±180°, both deltas quantized to milli-degrees
    BEFORE squaring (that quantization IS the defined metric)."""
    dlat_m = f"(({lat}) - {hlat}) div 1000"
    dlon_u = f"least(abs(({lon}) - {hlon}), 360000000 - abs(({lon}) - {hlon}))"
    dlon_m = f"(({dlon_u}) * {cpm}) div 1000000"
    return f"(({dlat_m}) * ({dlat_m}) + ({dlon_m}) * ({dlon_m}))"


@query(
    "geo_hub_assign",
    oracle=f"""
    WITH hubs(hub_id, hlat, hlon, cpm) AS (
        VALUES {", ".join(f"({h}, {la}, {lo}, {c})" for h, la, lo, c in _HUBS)}
    ), pts AS (
        SELECT c_custkey, c_nationkey,
               {_DUCK_LAT} AS lat, {_DUCK_LON} AS lon
        FROM customer
    ), pairs AS (
        SELECT c_custkey, c_nationkey, hub_id,
               ((lat - hlat) // 1000) * ((lat - hlat) // 1000)
               + ((least(abs(lon - hlon), 360000000 - abs(lon - hlon)) * cpm)
                  // 1000000)
                 * ((least(abs(lon - hlon), 360000000 - abs(lon - hlon)) * cpm)
                    // 1000000) AS dist2
        FROM pts CROSS JOIN hubs
    ), best AS (
        SELECT c_custkey, c_nationkey, hub_id, dist2,
               row_number() OVER (PARTITION BY c_custkey
                                  ORDER BY dist2, hub_id) AS rn
        FROM pairs
    )
    SELECT CAST(hub_id AS BIGINT)                       AS hub_id,
           CAST(COUNT(*) AS BIGINT)                     AS n_customers,
           CAST(COUNT(DISTINCT c_nationkey) AS BIGINT)  AS n_nations,
           CAST(SUM(dist2) // COUNT(*) AS BIGINT)       AS mean_dist2_mdeg2
    FROM best WHERE rn = 1 GROUP BY hub_id
    """,
)
def geo_hub_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-service-hub assignment + per-hub census. The 8 hub centers
    are a literal struct array; each point evaluates all 8 quantized-
    equirectangular distances and takes ``array_min(struct(dist2, hub_id))``
    — argmin entirely map-side, ties broken by hub_id. The oracle cross
    joins points × hubs and ranks naively; parity proves the map-side
    argmin. Only the 8-row census groupBy shuffles."""
    elems = ", ".join(
        f"named_struct('d', CAST({_dist2('lat_udeg', 'lon_udeg', la, lo, c)}"
        f" AS BIGINT), 'hub_id', CAST({h} AS BIGINT))"
        for h, la, lo, c in _HUBS
    )
    assigned = _points(spark, sf_dir).select(
        "c_nationkey",
        F.expr(f"array_min(array({elems}))").alias("m"),
    )
    return (
        assigned.select(
            F.col("m.hub_id").alias("hub_id"),
            F.col("m.d").alias("dist2"),
            "c_nationkey",
        )
        .groupBy("hub_id")
        .agg(
            F.count("*").cast("long").alias("n_customers"),
            F.countDistinct("c_nationkey").cast("long").alias("n_nations"),
            F.expr("CAST(SUM(dist2) div COUNT(*) AS BIGINT)").alias(
                "mean_dist2_mdeg2"
            ),
        )
    )


@query(
    "geo_grid_hotspots",
    oracle=f"""
    WITH pts AS (
        SELECT {_DUCK_LAT} AS lat, {_DUCK_LON} AS lon FROM customer
    ), census AS (
        SELECT (lat + 90000000) // 10000000  AS cy,
               (lon + 180000000) // 10000000 AS cx,
               CAST(COUNT(*) AS BIGINT)      AS n
        FROM pts GROUP BY 1, 2
    ), hood AS (
        SELECT a.cy, a.cx, a.n AS own_n,
               CAST(SUM(b.n) AS BIGINT) AS neigh_n
        FROM census a
        JOIN census b
          ON b.cy BETWEEN a.cy - 1 AND a.cy + 1
         AND b.cx BETWEEN a.cx - 1 AND a.cx + 1
        GROUP BY a.cy, a.cx, a.n
    )
    SELECT CAST(cy AS BIGINT) AS cy, CAST(cx AS BIGINT) AS cx,
           own_n, neigh_n
    FROM hood WHERE neigh_n >= 3
    """,
)
def geo_grid_hotspots(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spatial hotspots: 10°-grid census, then the 3×3 neighborhood count
    per live cell, keeping cells whose neighborhood holds ≥ 3 points.
    The neighborhood sum is an offset-explode convolution ON THE CENSUS
    (each cell scatters its count to its 9 neighbors; a second groupBy
    gathers) — no self-join, and the points table is shuffled exactly
    once. Phantom cells (scatter targets with no points of their own) are
    dropped by requiring an own-count contribution. Grid edges keep plain
    offsets (no longitude wraparound) — documented metric choice, same in
    the oracle's join form."""
    pts = _points(spark, sf_dir).select(
        F.expr("(lat_udeg + 90000000) div 10000000").alias("cy"),
        F.expr("(lon_udeg + 180000000) div 10000000").alias("cx"),
    )
    census = pts.groupBy("cy", "cx").agg(F.count("*").alias("n"))
    offsets = F.expr(
        "explode(array({}))".format(
            ", ".join(
                f"named_struct('dy', {dy}, 'dx', {dx})"
                for dy in (-1, 0, 1)
                for dx in (-1, 0, 1)
            )
        )
    )
    scattered = census.select("cy", "cx", "n", offsets.alias("o")).select(
        (F.col("cy") + F.col("o.dy")).alias("tcy"),
        (F.col("cx") + F.col("o.dx")).alias("tcx"),
        "n",
        ((F.col("o.dy") == 0) & (F.col("o.dx") == 0)).alias("is_own"),
    )
    hood = scattered.groupBy("tcy", "tcx").agg(
        F.sum(F.when(F.col("is_own"), F.col("n"))).alias("own_n"),
        F.sum("n").cast("long").alias("neigh_n"),
    )
    return (
        hood.filter(F.col("own_n").isNotNull() & (F.col("neigh_n") >= 3))
        .select(
            F.col("tcy").cast("long").alias("cy"),
            F.col("tcx").cast("long").alias("cx"),
            F.col("own_n").cast("long").alias("own_n"),
            "neigh_n",
        )
    )
