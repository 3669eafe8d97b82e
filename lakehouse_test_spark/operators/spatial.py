"""Geospatial bucketing — geohash encoding and grid-cell radius joins.

A radius self-join ("all pairs of points within d") is the spatial
analog of similarity join: naive is O(n²) — a non-starter at 100 TB.
The scalable plan is the same shape as the MinHash/LSH dedup stack:
bucket points into grid cells sized to the radius, expand each probe
to its 3×3 neighbor cells (explode of a 9-element literal — no row
amplification beyond ×9), hash-join on the cell id, then apply the
exact distance predicate to the candidates.  Every heavy step is a
single hash shuffle on a bounded key; no point ever compares against
points more than one cell away.

Geohash is the textbook cell id: interleave quantized lon/lat bits
(lon first) and emit base-32 characters, so string-prefix containment
≙ spatial containment.  The encoder here is pure JVM codegen
(shift/and/or + an array lookup — no UDF), and
:func:`geohash_sql` emits the bit-identical DuckDB expression so the
encoding itself sits under the value-hash oracle gate.

Distances use an equirectangular metric with a FIXED longitude scale
(``sqrt(dlat² + (scale·dlon)²)`` in degree units): only +,-,×,√ —
all IEEE-754 correctly-rounded in both engines — so Spark and the
oracle agree bit-for-bit, with no libm sin/cos divergence deciding
boundary pairs.  (Swap the predicate for haversine on a cluster where
the oracle isn't hashed; the plan shape is unchanged.)

Reference parity: extends §2a op 7 (partition expansion — cell
buckets are spatial partitions) and the LLM-data similarity-join
mandate to the spatial domain.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["GEOHASH_ALPHABET", "geohash_col", "geohash_sql", "radius_join_pairs"]

GEOHASH_ALPHABET = "0123456789bcdefghjkmnpqrstuvwxyz"


def _bit_split(precision: int) -> tuple[int, int, int]:
    total = 5 * precision
    lon_bits = (total + 1) // 2  # lon leads: gets the extra bit when odd
    lat_bits = total // 2
    return total, lon_bits, lat_bits


def geohash_col(lat: Column, lon: Column, precision: int = 6) -> Column:
    """Base-32 geohash of (lat, lon), standard bit order (longitude
    first), built entirely from codegen-friendly primitives."""
    total, lon_bits, lat_bits = _bit_split(precision)
    nlon = F.least(
        F.lit((1 << lon_bits) - 1),
        F.floor((lon + F.lit(180.0)) / F.lit(360.0) * F.lit(float(1 << lon_bits))),
    ).cast("bigint")
    nlat = F.least(
        F.lit((1 << lat_bits) - 1),
        F.floor((lat + F.lit(90.0)) / F.lit(180.0) * F.lit(float(1 << lat_bits))),
    ).cast("bigint")
    h = F.lit(0).cast("bigint")
    for j in range(total):  # j = 0 is the MSB; even positions are lon
        if j % 2 == 0:
            src, bit = nlon, lon_bits - 1 - j // 2
        else:
            src, bit = nlat, lat_bits - 1 - (j - 1) // 2
        h = h + F.shiftleft(
            F.shiftright(src, bit).bitwiseAND(F.lit(1)), total - 1 - j
        )
    chars = F.array(*[F.lit(c) for c in GEOHASH_ALPHABET])
    out = [
        F.element_at(
            chars,
            (
                F.shiftright(h, 5 * (precision - 1 - i)).bitwiseAND(F.lit(31))
                + F.lit(1)
            ).cast("int"),
        )
        for i in range(precision)
    ]
    return F.concat(*out)


def geohash_sql(lat_expr: str, lon_expr: str, precision: int = 6) -> dict[str, str]:
    """The DuckDB-SQL twin of :func:`geohash_col` — same quantization,
    same bit order, same alphabet — generated so oracle strings stay
    in lockstep with the Spark expression by construction.

    Returns staged expressions for the oracle's CTE chain:
    ``nlon``/``nlat`` (over the caller's lat/lon exprs), ``h`` (over
    columns named ``nlon``/``nlat``), and ``chars`` (over a column
    named ``h``)."""
    total, lon_bits, lat_bits = _bit_split(precision)
    nlon = (
        f"least({(1 << lon_bits) - 1}, CAST(floor((({lon_expr}) + 180.0) / 360.0"
        f" * {float(1 << lon_bits)}) AS BIGINT))"
    )
    nlat = (
        f"least({(1 << lat_bits) - 1}, CAST(floor((({lat_expr}) + 90.0) / 180.0"
        f" * {float(1 << lat_bits)}) AS BIGINT))"
    )
    terms = []
    for j in range(total):
        if j % 2 == 0:
            src, bit = "nlon", lon_bits - 1 - j // 2
        else:
            src, bit = "nlat", lat_bits - 1 - (j - 1) // 2
        terms.append(f"((({src} >> {bit}) & 1) << {total - 1 - j})")
    chars = " || ".join(
        f"substr('{GEOHASH_ALPHABET}', CAST(((h >> {5 * (precision - 1 - i)})"
        f" & 31) + 1 AS INTEGER), 1)"
        for i in range(precision)
    )
    return {"nlon": nlon, "nlat": nlat, "h": " + ".join(terms), "chars": chars}


def radius_join_pairs(
    pts: DataFrame,
    id_col: str,
    lat_col: str,
    lon_col: str,
    radius: float,
    lon_scale: float = 0.5,
) -> DataFrame:
    """All unordered point pairs with equirectangular distance
    ``sqrt(dlat² + (lon_scale·dlon)²) ≤ radius`` (degree units).

    Grid-cell candidate generation: scaled coords are bucketed into
    cells of side ``radius``; the left side explodes to its 3×3
    neighborhood, so every qualifying pair meets in EXACTLY one
    (cell, offset) combination — no dedup pass needed.  Output:
    ``(id_a, id_b, dist)`` with ``id_a < id_b``, dist rounded to 3
    decimals."""
    u = F.col(lat_col)
    v = F.col(lon_col) * F.lit(lon_scale)
    cells = pts.select(
        F.col(id_col).alias("pid"),
        F.col(lat_col).alias("plat"),
        F.col(lon_col).alias("plon"),
        F.floor(u / F.lit(radius)).alias("cu"),
        F.floor(v / F.lit(radius)).alias("cv"),
    )
    offsets = F.array(
        *[
            F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
            for dx in (-1, 0, 1)
            for dy in (-1, 0, 1)
        ]
    )
    # explode once, then project both offset components
    left = cells.withColumn("o", F.explode(offsets)).select(
        F.col("pid").alias("id_a"),
        F.col("plat").alias("lat_a"),
        F.col("plon").alias("lon_a"),
        (F.col("cu") + F.col("o.dx")).alias("ju"),
        (F.col("cv") + F.col("o.dy")).alias("jv"),
    )
    right = cells.select(
        F.col("pid").alias("id_b"),
        F.col("plat").alias("lat_b"),
        F.col("plon").alias("lon_b"),
        F.col("cu").alias("ju"),
        F.col("cv").alias("jv"),
    )
    # explicit self-multiplication, NOT **2: POWER() lowers to libm
    # pow (≤1 ulp error, not correctly rounded) while the oracle
    # multiplies — the metric must be bit-identical in both engines
    dlat = F.col("lat_a") - F.col("lat_b")
    dlon = (F.col("lon_a") - F.col("lon_b")) * F.lit(lon_scale)
    dist = F.sqrt(dlat * dlat + dlon * dlon)
    return (
        left.join(right, ["ju", "jv"])
        .where(F.col("id_a") < F.col("id_b"))
        .withColumn("dist", dist)
        .where(F.col("dist") <= F.lit(radius))
        .select("id_a", "id_b", F.round("dist", 3).alias("dist"))
    )


def point_in_convex_polygon_col(
    x: Column, y: Column, polygon: list[tuple[float, float]]
) -> Column:
    """True when (x, y) lies inside (or on) the CONVEX polygon given
    as CCW vertices — the half-plane test: the cross product
    ``(v2-v1) × (p-v1)`` is ≥ 0 for every edge.  Pure +,-,× (no trig,
    no sqrt), so Spark and any SQL oracle agree bit-for-bit; the
    whole test is one codegen conjunction per point, zero shuffle."""
    cond = F.lit(True)
    n = len(polygon)
    for i in range(n):
        x1, y1 = polygon[i]
        x2, y2 = polygon[(i + 1) % n]
        cross = (F.lit(x2 - x1) * (y - F.lit(y1))) - (
            F.lit(y2 - y1) * (x - F.lit(x1))
        )
        cond = cond & (cross >= 0)
    return cond


def point_in_convex_polygon_sql(
    x_expr: str, y_expr: str, polygon: list[tuple[float, float]]
) -> str:
    """The DuckDB twin of :func:`point_in_convex_polygon_col`,
    generated from the same vertex list so the two cannot drift."""
    n = len(polygon)
    terms = []
    for i in range(n):
        x1, y1 = polygon[i]
        x2, y2 = polygon[(i + 1) % n]
        terms.append(
            f"(({x2 - x1!r}) * (({y_expr}) - ({y1!r}))"
            f" - ({y2 - y1!r}) * (({x_expr}) - ({x1!r})) >= 0)"
        )
    return "(" + " AND ".join(terms) + ")"
