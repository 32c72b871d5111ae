"""Property-based tests (hypothesis) for the pure-math identities the
round-4 operators lean on. These are the PROOF OBLIGATIONS behind the
SQL: if an identity here broke, the corresponding oracle-checked query
would only fail on inputs the fixtures happen to contain — hypothesis
hunts the rest of the input space, driver-free and Spark-free."""

from __future__ import annotations

import math

from hypothesis import given, settings
from hypothesis import strategies as st

# ---------------------------------------------------------------- CUSUM ----
# events_cusum_changepoints / streaming.drift: the window identity
# S_d = P_d - min(0, running_min(P)) equals the textbook recursion
# S_d = max(0, S_{d-1} + y_d) for EVERY integer deviation series.


@settings(max_examples=200)
@given(st.lists(st.integers(min_value=-(10**9), max_value=10**9), max_size=60))
def test_cusum_window_identity(ys):
    s, recursion = 0, []
    for y in ys:
        s = max(0, s + y)
        recursion.append(s)
    prefix, p, m = [], 0, 0
    for y in ys:
        p += y
        m = min(m, p)
        prefix.append(p - min(0, m))
    assert prefix == recursion


# ------------------------------------------------------------- Mitchell ----
# text_dsir_weights / text_token_entropy / sample_dsir_resample /
# text_zipf_fit: Mitchell's bitlength log2 underestimates by <= 0.0861
# bits, is exact at powers of two, and is monotonic — the three facts the
# quantized-weight pipelines rely on.


def _mlog2(r: int) -> float:
    L = r.bit_length()
    return (L - 1) + (r / (1 << (L - 1)) - 1.0)


@settings(max_examples=300)
@given(st.integers(min_value=1, max_value=2**60 - 1))
def test_mitchell_bounds(r):
    err = _mlog2(r) - math.log2(r)
    assert -0.0861 <= err <= 1e-12
    if r & (r - 1) == 0:  # power of two: exact
        assert abs(err) <= 1e-12


@settings(max_examples=200)
@given(
    st.integers(min_value=1, max_value=2**59),
    st.integers(min_value=1, max_value=2**59),
)
def test_mitchell_monotonic(a, b):
    lo, hi = sorted((a, b))
    assert _mlog2(lo) <= _mlog2(hi) + 1e-12


# ------------------------------------------------------------ bin packing --
# layout_compaction_bins: bin = floor(preceding_bytes / target) over any
# positive size sequence yields contiguous bins starting at 0, conserves
# every file, and every bin except the last ends because it crossed the
# target.


@settings(max_examples=200)
@given(
    st.lists(st.integers(min_value=1, max_value=10**7), min_size=1, max_size=50),
    st.integers(min_value=1, max_value=10**7),
)
def test_binpack_monotone_and_conserving(sizes, target):
    before = 0
    bins = []
    for sz in sizes:
        bins.append(before // target)
        before += sz
    assert bins[0] == 0
    # bin ids never decrease (files stay in input order), and a bin id can
    # only advance when the cumulative bytes crossed its boundary
    cum = 0
    for sz, b in zip(sizes, bins):
        assert b == cum // target
        cum += sz
    # files bigger than the target may SKIP bin ids (they own the span);
    # within a run of small files the id advances by at most 1
    for (s1, b1), (s2, b2) in zip(zip(sizes, bins), zip(sizes[1:], bins[1:])):
        assert b2 >= b1
        if s1 <= target:
            assert b2 - b1 <= 1
    assert cum == sum(sizes)


# -------------------------------------------------------- KMV estimator ----
# sketch_kmv_distinct: the two-phase k-min (per-bucket k smallest, then
# global k smallest of survivors) equals the direct global k-min for any
# hash multiset and bucketing.


@settings(max_examples=200)
@given(
    st.lists(st.integers(min_value=0, max_value=2**60), min_size=1, max_size=200),
    st.integers(min_value=1, max_value=16),
    st.integers(min_value=1, max_value=64),
)
def test_kmv_two_phase_identity(hashes, p, k):
    distinct = sorted(set(hashes))
    direct = distinct[:k]
    buckets: dict[int, list[int]] = {}
    for h in set(hashes):
        buckets.setdefault(h % p, []).append(h)
    survivors = []
    for vs in buckets.values():
        survivors.extend(sorted(vs)[:k])
    assert sorted(survivors)[:k] == direct


# -------------------------------------------------- CDC chunk resync -------
# dedup_cdc_chunks: after any single-token prefix insertion, cut positions
# re-synchronize once the rolling window clears the edit — chunks strictly
# after the first post-edit boundary are identical.


@settings(max_examples=100)
@given(
    st.lists(st.integers(min_value=0, max_value=2**30), min_size=30, max_size=120),
    st.integers(min_value=0, max_value=2**30),
)
def test_cdc_chunks_resync_after_prefix_edit(tokens, extra):
    WIN, MOD = 4, 8

    def chunks(toks):
        out, cur, window = [], [], []
        for i, t in enumerate(toks):
            window.append(t)
            window = window[-WIN:]
            if i == 0 or sum(window) % MOD == 0:
                if cur:
                    out.append(tuple(cur))
                cur = []
            cur.append(t)
        if cur:
            out.append(tuple(cur))
        return out

    a = chunks(tokens)
    b = chunks([extra] + tokens)
    shared = set(a) & set(b)
    # a boundary inside the unedited tail depends only on the last WIN
    # tokens, so at least one tail chunk must coincide whenever the tail
    # contains any boundary at all
    if len(a) >= 3 and len(b) >= 3:
        assert shared, (a[:3], b[:3])
