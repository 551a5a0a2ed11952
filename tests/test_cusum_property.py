"""Property test for the CUSUM closed form used by
``anomaly_cusum_daily_events`` (queries_graph_ext.py): the clamped
recurrence

    S+_t = max(0, S+_{t-1} + y_t)      (S+_0 = 0)

equals the reflected-random-walk form

    S+_t = C_t - min(0, min_{j<=t} C_j)    with C_t = sum_{i<=t} y_i

on ARBITRARY integer deviation sequences (the catalog query quantizes
deviations to integers before the cumulative sums, so integer inputs
are exactly the production domain).  Pure math, no Spark session —
this pins the identity the two chained window functions rely on; the
cross-engine oracle then pins the Spark expression of it.
"""

from hypothesis import given
from hypothesis import strategies as st

_SERIES = st.lists(
    st.integers(min_value=-(10**12), max_value=10**12),
    min_size=1,
    max_size=60,
)


def _recurrence(ys):
    out, s = [], 0
    for y in ys:
        s = max(0, s + y)
        out.append(s)
    return out


def _closed_form(ys):
    out, c, prefix_min = [], 0, 0
    for y in ys:
        c += y
        prefix_min = min(prefix_min, c)
        out.append(c - min(0, prefix_min))
    return out


@given(_SERIES)
def test_closed_form_equals_recurrence(ys):
    assert _closed_form(ys) == _recurrence(ys)


@given(_SERIES)
def test_negative_side_via_negated_deviations(ys):
    # the catalog query computes S- by feeding the NEGATED second
    # deviation sequence through the same closed form
    neg = [-y for y in ys]
    direct = []
    s = 0
    for y in ys:
        s = max(0, s - y)
        direct.append(s)
    assert _closed_form(neg) == direct


def test_known_shift():
    # a persistent +1 drift after a flat prefix accumulates linearly,
    # and a reset below zero clamps at 0 (the reflection)
    ys = [0, 0, -5, 1, 1, 1]
    assert _recurrence(ys) == [0, 0, 0, 1, 2, 3]
    assert _closed_form(ys) == [0, 0, 0, 1, 2, 3]
