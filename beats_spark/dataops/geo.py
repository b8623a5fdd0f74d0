"""Geospatial grid primitives: exact integer geohash encoding and the
cell rollup built on it.

The reference's geoip processor (``add_geo_metadata`` /
``libbeat/processors/add_observer_metadata``, plus the ES-side
``geoip`` enrichment Beats defers to) ATTACHES coordinates to events;
what every consumer does next is grid-aggregate them (traffic per
cell, abuse per region, CDN placement). Geohash is the standard cell
key — base32-encoded bit-interleaved lat/lon (Niemeyer 2008, public
spec) — and, like the repo's Z-order key, it is pure closed-form bit
arithmetic, so the engine computes it JVM-side in whole-stage codegen
and a SQL oracle replays it bit-for-bit.

Exactness: inputs are integer MICRO-DEGREES (the repo's fixed-point
discipline — lat_micro ∈ [−90·10^6, 90·10^6]). Quantization
``q = (x_micro + off) · 2^bits div span`` is the exact rational form
of the spec's successive interval halving, so the encoding is
engine-portable with no float anywhere. Values outside the valid
range clamp to the edge cells (same policy as ``zorder_key``).

Scale shape: encode is a map-side projection; the rollup is ONE
partial-combining groupBy on the ≤ 32^precision cell key. Nothing
else moves.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, functions as F

__all__ = ["GEOHASH_BASE32", "geohash_col", "geohash_rollup",
           "geohash_oracle_sql", "with_geohash"]

#: the geohash alphabet (public spec): 0-9 + b..z minus a, i, l, o
GEOHASH_BASE32 = "0123456789bcdefghjkmnpqrstuvwxyz"


def _quant(micro: Column, off: int, span: int, bits: int) -> Column:
    # layout._normalize is the repo's exact integer quantizer
    # ((x - lo) * 2^bits div span, decimal-exact with correction,
    # clamped both edges); span = hi - lo + 1, so hi = span - off - 1
    from .layout import _normalize
    return _normalize(micro, F.lit(-off).cast("long"),
                      F.lit(span - off - 1).cast("long"), bits)


def _interleave(qlon: Column, qlat: Column, lon_bits: int,
                lat_bits: int) -> Column:
    """MSB-first spec interleave (longitude owns the even positions)
    of two already-quantized coordinate Columns into one long."""
    total = lon_bits + lat_bits
    val = F.lit(0).cast("long")
    for i in range(total):
        if i % 2 == 0:
            bit = F.shiftright(qlon, lon_bits - 1 - i // 2)
        else:
            bit = F.shiftright(qlat, lat_bits - 1 - i // 2)
        val = val.bitwiseOR(
            F.shiftleft(bit.bitwiseAND(F.lit(1)), total - 1 - i)
            .cast("long"))
    return val


def _base32(val: Column, precision: int) -> Column:
    alphabet = F.array(*[F.lit(c) for c in GEOHASH_BASE32])
    return F.concat(*[
        F.element_at(alphabet,
                     (F.shiftright(val, 5 * (precision - 1 - ci))
                      .bitwiseAND(F.lit(31)) + 1).cast("int"))
        for ci in range(precision)])


def geohash_col(lat_micro: Column, lon_micro: Column,
                precision: int = 6) -> Column:
    """Geohash string of integer micro-degree coordinates at
    ``precision`` characters (5 bits/char; longitude owns the even
    bit positions per the spec, so it gets ``ceil(5p/2)`` bits).
    ``precision`` ≤ 12 keeps the 5p-bit key in a signed long.
    NULL coordinates yield NULL."""
    if not 1 <= precision <= 12:
        raise ValueError(f"geohash_col: precision must be in [1, 12], "
                         f"got {precision}")
    total = 5 * precision
    lon_bits = (total + 1) // 2
    lat_bits = total // 2
    qlon = _quant(lon_micro, 180_000_000, 360_000_000, lon_bits)
    qlat = _quant(lat_micro, 90_000_000, 180_000_000, lat_bits)
    out = _base32(_interleave(qlon, qlat, lon_bits, lat_bits),
                  precision)
    return F.when(lat_micro.isNotNull() & lon_micro.isNotNull(), out)


def geohash_oracle_sql(lat_sql: str, lon_sql: str,
                       precision: int = 6) -> str:
    """The identical encoding as one SQL expression (DuckDB/Trino) —
    the oracle emitter, mirroring ``_zorder_oracle``'s discipline."""
    total = 5 * precision
    lon_bits = (total + 1) // 2
    lat_bits = total // 2

    def quant(x, off, span, bits):
        return (f"greatest(least(((({x})::BIGINT + {off}) "
                f"* {1 << bits}) // {span}, {(1 << bits) - 1}), 0)")

    qlon = quant(lon_sql, 180_000_000, 360_000_000, lon_bits)
    qlat = quant(lat_sql, 90_000_000, 180_000_000, lat_bits)
    terms = []
    for i in range(total):
        if i % 2 == 0:
            bit = f"(({qlon} >> {lon_bits - 1 - i // 2}) & 1)"
        else:
            bit = f"(({qlat} >> {lat_bits - 1 - i // 2}) & 1)"
        terms.append(f"({bit} << {total - 1 - i})")
    val = "(" + " | ".join(terms) + ")"
    chars = [f"substr('{GEOHASH_BASE32}', "
             f"CAST(({val} >> {5 * (precision - 1 - ci)}) % 32 + 1 "
             f"AS INT), 1)"
             for ci in range(precision)]
    return " || ".join(chars)


def with_geohash(
    df: DataFrame,
    lat_col: str,
    lon_col: str,
    precision: int = 6,
    out_col: str = "cell",
) -> DataFrame:
    """``df`` plus a geohash column — the DataFrame-level form, staged
    through named intermediate columns (quantized lat/lon, then the
    interleaved key, then the base32 chars) so no single projection
    repeats the quantization expression per bit: the one-expression
    spelling exceeds janino's method-size limit past ~precision 4 and
    silently falls back to interpreted eval. Three small codegen
    projections instead."""
    if not 1 <= precision <= 12:
        raise ValueError(f"with_geohash: precision must be in [1, 12],"
                         f" got {precision}")
    total = 5 * precision
    lon_bits = (total + 1) // 2
    lat_bits = total // 2
    st1 = df.withColumns({
        "__gh_qlon": _quant(F.col(lon_col), 180_000_000,
                            360_000_000, lon_bits),
        "__gh_qlat": _quant(F.col(lat_col), 90_000_000,
                            180_000_000, lat_bits)})
    st2 = st1.withColumn(
        "__gh_val", _interleave(F.col("__gh_qlon"),
                                F.col("__gh_qlat"),
                                lon_bits, lat_bits))
    cell = F.when(F.col(lat_col).isNotNull()
                  & F.col(lon_col).isNotNull(),
                  _base32(F.col("__gh_val"), precision))
    return (st2.withColumn(out_col, cell)
            .drop("__gh_qlon", "__gh_qlat", "__gh_val"))


def geohash_rollup(
    df: DataFrame,
    lat_col: str,
    lon_col: str,
    precision: int = 5,
) -> DataFrame:
    """Traffic per geohash cell: ``(cell, n)`` — the grid heatmap
    aggregate. Map-side encode (codegen bit arithmetic, no UDF) +
    ONE partial-combining groupBy whose key space is bounded by
    32^precision; rows with NULL coordinates land in the NULL cell
    rather than being silently dropped."""
    return (with_geohash(df.select(lat_col, lon_col), lat_col,
                         lon_col, precision, out_col="cell")
            .groupBy("cell")
            .agg(F.count(F.lit(1)).alias("n")))
