"""Property tests for the as-of join family: on ARBITRARY key/time
layouts (duplicate timestamps, same-instant left/right rows, empty
sides per key, band edges), BOTH implementations — range-join
(``asof_join``) and merge-carry (``asof_join_merge``) — must equal a
brute-force pure-Python reference in every direction.  The example
tests pin known shapes; these search for boundary cases around the
tie/tolerance rules."""

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

_LEFT = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=2),   # key
        st.integers(min_value=0, max_value=60),  # seconds
    ),
    min_size=1,
    max_size=12,
)
_RIGHT = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=2),
        st.integers(min_value=0, max_value=60),
    ),
    min_size=1,
    max_size=12,
)
_TOL = st.sampled_from([5, 15, 61])  # seconds; 61 = effectively unbounded
_DIR = st.sampled_from(["backward", "forward", "nearest"])


def _reference(lrows, rrows, direction, tol_s):
    """Brute force over (lid, key, lt): pick the winning right row per
    the documented ordering rules; inner semantics (no-match dropped)."""
    out = {}
    for lid, k, lt in lrows:
        cands = []
        for rid, rk, rt in rrows:
            if rk != k:
                continue
            if direction == "backward":
                if rt <= lt and rt >= lt - tol_s:
                    cands.append((-rt, -rid, rid))  # latest rt, largest rid
            elif direction == "forward":
                if rt >= lt and rt <= lt + tol_s:
                    cands.append((rt, rid, rid))  # earliest rt, smallest rid
            else:
                if lt - tol_s <= rt <= lt + tol_s:
                    # smallest |d|, backward preferred, largest rid
                    cands.append((abs(rt - lt), int(rt > lt), -rid, rid))
        if cands:
            out[lid] = min(cands)[-1]
    return out


@settings(
    max_examples=12, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(lrows=_LEFT, rrows=_RIGHT, tol=_TOL, direction=_DIR)
def test_asof_both_forms_match_brute_force(spark, lrows, rrows, tol,
                                           direction):
    from label_maker_dask_spark.operators.asof import (
        asof_join,
        asof_join_merge,
    )

    lr = [(i, k, s) for i, (k, s) in enumerate(lrows)]
    rr = [(100 + i, k, s) for i, (k, s) in enumerate(rrows)]
    left = spark.createDataFrame(lr, "lid long, k long, s long").select(
        "lid", "k", F.timestamp_micros(F.col("s") * 1_000_000).alias("lt")
    )
    right = spark.createDataFrame(rr, "rid long, k long, s long").select(
        "rid", "k", F.timestamp_micros(F.col("s") * 1_000_000).alias("rt")
    )
    want = _reference(lr, rr, direction, tol)
    tol_expr = f"INTERVAL {tol} SECOND"
    got_range = {
        r["lid"]: r["rid"]
        for r in asof_join(
            left, right, on=["k"], left_time="lt", right_time="rt",
            left_key=["lid"], tie_break="rid", tolerance=tol_expr,
            direction=direction,
        ).collect()
    }
    assert got_range == want, ("range", direction, tol)
    got_merge = {
        r["lid"]: r["rid"]
        for r in asof_join_merge(
            left, right, on=["k"], left_time="lt", right_time="rt",
            tie_break="rid", tolerance=tol_expr, direction=direction,
        ).collect()
    }
    assert got_merge == want, ("merge", direction, tol)
