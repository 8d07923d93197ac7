"""Shared deterministic-sketch primitives: the md5->60-bit hash
contract and the integer-exact HyperLogLog register algebra.

ONE home for spellings that must stay bit-identical everywhere they
appear -- the query catalog's oracle-checked sketches
(plans/sketches.py), the engine's ANALYZE statistics
(sources/laketable.py), and every md5-die/fingerprint query
(plans/textops.py re-exports ``md5_long`` as its ``_md5_long``).

Determinism rules (see plans/sketches.py for the full rationale):
- md5 -> first 15 hex chars -> 60-bit BIGINT (both engines agree);
- integer DIV for hash splitting (60-bit values exceed double range);
- register rho from length(bin(x)), never floor(log2);
- the harmonic denominator as an exact integer sum of 2^(rest_bits+1-rho).
"""

from __future__ import annotations

import math

from pyspark.sql import Column
from pyspark.sql import functions as F

#: DuckDB spelling of the same 60-bit hash (format with x=<sql expr>)
MD5_LONG_SQL = "CAST(concat('0x', substr(md5({x}), 1, 15)) AS BIGINT)"


def md5_long(c: Column) -> Column:
    """60-bit hash from md5 -- identical in Spark and DuckDB
    (``MD5_LONG_SQL`` is the oracle-side spelling)."""
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


def hll_rho(rest: Column, rest_bits: int) -> Column:
    """HLL register value: 1-based leading-zero rank of ``rest``
    interpreted as a ``rest_bits``-wide integer (rest == 0 -> the
    maximal rank rest_bits + 1). Uses length(bin(x)) -- exact integer
    arithmetic, unlike floor(log2) whose last-ulp rounding differs
    between engines."""
    return F.when(rest == 0, F.lit(rest_bits + 1)).otherwise(
        F.lit(rest_bits) - F.length(F.bin(rest)) + 1
    )


def hll_denom_term(rho_col: str, rest_bits: int) -> Column:
    """The register's harmonic-sum contribution 2^-rho, scaled by
    2^(rest_bits+1) so the sum stays an exact BIGINT."""
    return F.expr(
        f"shiftleft(CAST(1 AS BIGINT), {rest_bits} + 1 - {rho_col})"
    )


_ALPHA = {16: 0.673, 32: 0.697, 64: 0.709}


def hll_alpha(m: int) -> float:
    """Flajolet et al. 2007 bias constant."""
    return _ALPHA.get(m, 0.7213 / (1 + 1.079 / m))


def hll_estimate(
    nonzero: int, denom_used: int | None, m: int, rest_bits: int,
    small_range: bool = True,
) -> float:
    """Driver-side estimate from a collected sketch: ``nonzero``
    occupied registers whose scaled terms sum to ``denom_used``
    (empty registers contribute 2^(rest_bits+1) each). With
    ``small_range`` the standard linear-counting patch applies below
    2.5m -- it uses ln(), which is only safe OFF the cross-engine
    oracle path (driver code, tests); oracle-checked queries must
    publish the raw estimate instead."""
    scale = 1 << (rest_bits + 1)
    empties = m - nonzero
    denom = (denom_used or 0) + empties * scale
    est = hll_alpha(m) * m * m * scale / denom
    if small_range and est <= 2.5 * m and empties > 0:
        est = m * math.log(m / empties)
    return est
