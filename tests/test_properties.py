"""Property-based tests (hypothesis) for the pure kernels — extends the
reference's inline-golden-row style (SURVEY.md §5.2)."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from feature_engineering_poc_spark.config.env import EngineConfig
from feature_engineering_poc_spark.plans.binpack import pack_bins
from feature_engineering_poc_spark.plans.sfc import (
    hilbert_index,
    interleave_bits,
    normalize_to_grid,
    string_prefix_ordinal,
)


@given(
    st.lists(st.integers(0, 2**16 - 1), min_size=1, max_size=200),
    st.lists(st.integers(0, 2**16 - 1), min_size=1, max_size=200),
)
def test_zorder_monotone_in_each_dim(xs, ys):
    """Fixing one coordinate, the z-key is monotone in the other."""
    n = min(len(xs), len(ys))
    a = np.array(sorted(xs[:n]), dtype=np.uint64)
    fixed = np.full(n, ys[0], dtype=np.uint64)
    z = interleave_bits([a, fixed], 16)
    assert (np.diff(z.astype(np.int64)) >= 0).all()


@given(st.integers(2, 3), st.data())
@settings(max_examples=25, deadline=None)
def test_hilbert_bijective_on_random_points(dims, data):
    bits = 4
    pts = data.draw(
        st.lists(
            st.tuples(*[st.integers(0, 2**bits - 1) for _ in range(dims)]),
            min_size=1, max_size=50, unique=True,
        )
    )
    arr = np.array(pts, dtype=np.uint64)
    h = hilbert_index([arr[:, j] for j in range(dims)], bits)
    assert len(set(h.tolist())) == len(pts)  # injective
    assert (h < (1 << (dims * bits))).all()


@given(st.lists(st.text(max_size=20), min_size=2, max_size=100))
@settings(deadline=None)
def test_string_ordinal_order_preserving(strings):
    import pandas as pd

    o = string_prefix_ordinal(strings)
    trunc = [s.encode("utf-8")[:8] for s in pd.Series(strings).fillna("").astype(str)]
    for i in range(len(strings)):
        for j in range(i + 1, len(strings)):
            if trunc[i] < trunc[j]:
                assert o[i] <= o[j]
            elif trunc[i] > trunc[j]:
                assert o[i] >= o[j]


@given(st.floats(-1e6, 1e6), st.floats(0.1, 1e6), st.integers(1, 16))
def test_normalize_to_grid_bounds(lo, span, bits):
    vals = np.linspace(lo, lo + span, 50)
    g = normalize_to_grid(vals, lo, lo + span, bits)
    assert g.min() >= 0 and g.max() <= (1 << bits) - 1
    assert (np.diff(g.astype(np.int64)) >= 0).all()  # monotone


@given(
    st.lists(st.tuples(st.text(min_size=1, max_size=8), st.integers(1, 10**8),
                       st.integers(1, 10**5)), min_size=1, max_size=100),
    st.integers(10**6, 10**9),
)
def test_binpack_invariants(entries, target):
    paths = [(f"f{i}_{p}", b, r) for i, (p, b, r) in enumerate(entries)]
    bins = pack_bins(paths, "part", target)
    packed = [f for b in bins for f in b.files]
    assert sorted(packed) == sorted(p for p, _, _ in paths)  # exactly once
    for b in bins:
        # a bin only exceeds target when a single file does
        assert b.bytes <= target or len(b.files) == 1


def test_engine_config_env_validation():
    import pytest

    cfg = EngineConfig.from_env({"SPARK_GRAFT_CPUS": "16"})
    assert cfg.cpus == 16 and cfg.bench_rows == 200_000
    with pytest.raises(ValueError, match="SPARK_GRAFT_CPUS"):
        EngineConfig.from_env({"SPARK_GRAFT_CPUS": "abc"})
    with pytest.raises(ValueError, match=">= 1"):
        EngineConfig.from_env({"SPARK_GRAFT_CPUS": "0"})
