"""Fixed-point int64 ordinates, 10 decimal digits (ordinate × 10^10).

Mirrors the reference's intgeom convention (reference:
``intgeom/intgeom.go:27-50``): an ordinate is stored as
``int64(trunc(x * 1e10))``; 10 decimal digits locate a grain of sand in
degrees while leaving 9 digits for whole units. All grid arithmetic in
the snap kernel happens on these ints so that distributed results are
bit-identical to serial ones, machine-independent.

Conversion float->int truncates toward zero (Go ``int64(f)`` semantics),
NOT floor — this matters for negative ordinates.
"""

from __future__ import annotations

import numpy as np

PRECISION = 10
ONE = 10_000_000_000  # 10^PRECISION
HALF = ONE // 2

_SCALE = float(ONE)


def from_ord(o: float) -> int:
    """float ordinate -> fixed-point int64 (truncation toward zero)."""
    return int(o * _SCALE)


def to_ord(i: int) -> float:
    """fixed-point int64 -> float ordinate."""
    if i == 0:
        return 0.0
    return i / _SCALE


def from_ords(a: np.ndarray) -> np.ndarray:
    """Vectorized float64 array -> int64 fixed point (trunc toward zero)."""
    return np.trunc(np.asarray(a, dtype=np.float64) * _SCALE).astype(np.int64)


def to_ords(a: np.ndarray) -> np.ndarray:
    """Vectorized int64 fixed point -> float64."""
    return np.asarray(a, dtype=np.int64) / _SCALE


def from_point(pt) -> tuple[int, int]:
    return (from_ord(pt[0]), from_ord(pt[1]))


def to_point(ipt) -> tuple[float, float]:
    return (to_ord(ipt[0]), to_ord(ipt[1]))


def print_with_decimals(o: int, n: int) -> str:
    """Fixed-point int64 -> decimal string with n fraction digits
    (truncated below PRECISION, zero-padded above) — the debug
    pretty-print of the reference (``intgeom/intgeom.go:63-74``)."""
    sign = "-" if o < 0 else ""
    s = str(abs(int(o))).rjust(PRECISION + 1, "0")
    whole, frac = s[:-PRECISION], s[-PRECISION:]
    frac = frac[:n] if n < PRECISION else frac + "0" * (n - PRECISION)
    return f"{sign}{whole}.{frac}"
