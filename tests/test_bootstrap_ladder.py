"""Property-based proof of the bootstrap hex-threshold ladder.

bootstrap_mean_ci derives each replica's Poisson(1) count by comparing an
8-hex md5 slice LEXICOGRAPHICALLY against literal hex CDF edges instead of
converting hex→int and dividing by 2^32. The claimed equivalence is

    hex8(h) < format(ceil(edge·2^32), '08x')   ⟺   h / 2^32 < edge

for every uint32 h and every CDF edge. Hypothesis sweeps h across the full
domain (plus the exact threshold boundaries, where an off-by-one would
hide) and checks the string ladder against the arithmetic ladder.
"""

from __future__ import annotations

import math

from hypothesis import given, settings
from hypothesis import strategies as st

from kafka_connect_storage_cloud_spark.plans.warehouse import _POIS_CDF, _POIS_HEX

_POW2_32 = float(1 << 32)

# boundary values: each threshold itself and its neighbours
_BOUNDARIES = [
    t + d
    for _, edge in _POIS_CDF
    for t in [math.ceil(edge * (1 << 32))]
    for d in (-1, 0, 1)
]


def _count_arith(h: int) -> int:
    u = h / _POW2_32
    for k, edge in _POIS_CDF:
        if u < edge:
            return k
    return 6


def _count_hex(h: int) -> int:
    s = format(h, "08x")
    for k, hx in _POIS_HEX:
        if s < hx:
            return k
    return 6


def test_hex_edges_are_fixed_width_lowercase():
    for _, hx in _POIS_HEX:
        assert len(hx) == 8 and hx == hx.lower()


def test_boundaries_agree_exactly():
    for h in _BOUNDARIES:
        if 0 <= h < (1 << 32):
            assert _count_hex(h) == _count_arith(h), h


@settings(max_examples=2000)
@given(st.integers(min_value=0, max_value=(1 << 32) - 1))
def test_ladders_agree(h):
    assert _count_hex(h) == _count_arith(h)
