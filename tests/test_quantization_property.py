"""Property tests for the scalar/product quantization tier: on ARBITRARY
small vector sets (duplicates, constant dimensions, extreme ranges), the
distributed encoders must equal brute-force pure-Python references —
the same argmin/tie rules, the same quantization grid — and the PQ
Arrow path must equal the expression path bit-for-bit.  Example tests
pin known shapes; these search the boundary cases (FP ties, mx == mn,
empty subspace winners)."""

import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

_VALS = st.integers(min_value=-1000, max_value=1000)
_VECS = st.lists(
    st.lists(_VALS, min_size=4, max_size=4),
    min_size=2,
    max_size=10,
    unique_by=lambda v: tuple(v),
)


def _sq8_reference(vecs):
    """Brute-force SQ8: per-dim min/max over the set, floor-encode."""
    dims = list(zip(*vecs))
    mns = [min(d) for d in dims]
    mxs = [max(d) for d in dims]
    out = []
    for v in vecs:
        code = []
        for x, mn, mx in zip(v, mns, mxs):
            if mx == mn:
                code.append(0)
            else:
                u8 = math.floor(((x - mn) / (mx - mn)) * 255)
                code.append(int(u8) - 128)
        out.append(code)
    return out


@settings(max_examples=20, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(vecs=_VECS)
def test_sq8_encode_matches_reference(spark, vecs):
    from label_maker_dask_spark.operators.similarity import (
        sq8_encode,
        sq8_train_ranges,
    )

    # scale ints to floats exactly representable in float32 (k/4)
    fvecs = [[x / 4.0 for x in v] for v in vecs]
    emb = spark.createDataFrame(
        [(i, v) for i, v in enumerate(fvecs)],
        "vec_id long, embedding array<float>",
    )
    ranges = sq8_train_ranges(emb)
    got = {
        r.vec_id: list(r.code)
        for r in sq8_encode(emb, ranges, dim=4).collect()
    }
    want = _sq8_reference(fvecs)
    for i, code in enumerate(want):
        assert got[i] == code, (i, got[i], code)
        assert all(-128 <= c <= 127 for c in got[i])


def _pq_assign_reference(vecs, codebook):
    """Brute-force nearest-entry per (vector, subspace): squared L2 with
    left-to-right accumulation, lowest-code ties."""
    out = {}
    for vid, v in enumerate(vecs):
        for m, subs in ((1, v[:2]), (2, v[2:])):
            best = None
            for code, cu in codebook[m]:
                d = 0.0
                for a, b in zip(subs, cu):
                    d = d + (a - b) * (a - b)
                if best is None or d < best[0]:
                    best = (d, code)
            out[(vid, m)] = best[1]
    return out


@settings(max_examples=20, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(vecs=_VECS)
def test_pq_assignment_both_paths_match_reference(spark, vecs):
    from label_maker_dask_spark.operators.similarity import (
        _pq_assign,
        _pq_assign_arrow,
        pq_subvectors,
        pq_train_codebooks,
    )

    fvecs = [[x / 4.0 for x in v] for v in vecs]
    emb = spark.createDataFrame(
        [(i, v) for i, v in enumerate(fvecs)],
        "vec_id long, embedding array<float>",
    )
    subv = pq_subvectors(emb, n_sub=2, sub_dim=2)
    k = min(3, len(fvecs))
    cb = pq_train_codebooks(subv, k=k, refine_iters=0)
    codebook = {1: [], 2: []}
    for r in cb.orderBy("m", "code").collect():
        codebook[r.m].append((r.code, list(r.cu)))
    want = _pq_assign_reference(fvecs, codebook)

    for fn in (_pq_assign, _pq_assign_arrow):
        got = {
            (r.vec_id, r.m): r.code for r in fn(subv, cb).collect()
        }
        assert got == want, fn.__name__
