#!/usr/bin/env python3
"""Characterize the dec12 cross-engine rounding boundary (ADVICE r11).

The engine quantizes PCA iteration products with
`BigDecimal.valueOf(x).setScale(12, HALF_EVEN)` — HALF_EVEN on the
double's SHORTEST decimal representation (what valueOf/Double.toString
produce). The oracle side is DuckDB's `CAST(double AS DECIMAL(28,12))`.
This sweep measures how often the two disagree, against adversarial
inputs parked within a couple of ulps of scale-12 midpoints, and against
"ordinary" doubles.

Findings on duckdb 1.x (2026-08, this container), n=42855 adversarial
near-midpoint probes:
  - DuckDB CAST != shortest-repr HALF_EVEN on ~24% of them
  - DuckDB CAST != exact-binary-value HALF_EVEN on ~22% of them
  - DuckDB CAST(x AS DECIMAL(28,0)) TRUNCATES (1.5->1, 2.5->2, 3.5->3)
    while scale>0 casts round — the cast is not even one convention
    across scales, so no Scala-side model can track it exactly.
  - On doubles that are NOT within ~2 ulps of a scale-12 midpoint, all
    three conventions agree (0 divergences in the random sweep below).

Conclusion (the SCALING.md note this tool backs): certified corpora
agree because their values are essentially never parked AT a scale-12
midpoint; a future gate mismatch inside the midpoint band is a
cross-engine CONVENTION tie, not an algorithm bug. PropertySpec pins
the ENGINE-side convention (valueOf/HALF_EVEN vs exact-binary
HALF_EVEN divergence happens only at shortest-repr midpoints).

Run: python3 tools/dec12_boundary.py
"""
import decimal
import struct
import sys

import duckdb


def nudge(x: float, ulps: int) -> float:
    b = struct.unpack("<q", struct.pack("<d", x))[0] + ulps
    return struct.unpack("<d", struct.pack("<q", b))[0]


def main() -> int:
    con = duckdb.connect()

    def duck(x: float):
        return con.execute(
            "SELECT CAST(? AS DECIMAL(28,12))", [x]).fetchone()[0]

    q = decimal.Decimal("1e-12")

    def shortest_he(x: float):
        return decimal.Decimal(repr(x)).quantize(
            q, rounding=decimal.ROUND_HALF_EVEN)

    def exact_he(x: float):
        return decimal.Decimal(x).quantize(
            q, rounding=decimal.ROUND_HALF_EVEN)

    # adversarial: within +-2 ulps of scale-12 midpoints across magnitudes
    n = d_short = d_exact = 0
    for k in range(1, 20000, 7):
        for base in (k * 1e-12 + 5e-13, k * 1e-9 + 5e-13, k * 1e-6 + 5e-13):
            for ulps in (-2, -1, 0, 1, 2):
                x = nudge(base, ulps)
                d = duck(x)
                n += 1
                d_short += d != shortest_he(x)
                d_exact += d != exact_he(x)
    print(f"adversarial near-midpoint probes: n={n} "
          f"duck!=shortest_HALF_EVEN={d_short} "
          f"duck!=exact_HALF_EVEN={d_exact}")

    # ordinary doubles: deterministic LCG sweep, no midpoint parking
    rng_state, m = 123456789, (1 << 63) - 25
    n2 = d2 = 0
    for _ in range(20000):
        rng_state = (6364136223846793005 * rng_state + 1442695040888963407) % m
        x = (rng_state / m - 0.5) * 1e-3
        if duck(x) != shortest_he(x):
            d2 += 1
        n2 += 1
    print(f"ordinary doubles: n={n2} duck!=shortest_HALF_EVEN={d2}")
    return 0 if d2 == 0 else 1


if __name__ == "__main__":
    sys.exit(main())
