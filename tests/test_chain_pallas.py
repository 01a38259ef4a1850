"""Pallas chain-DP kernel vs the lax.scan oracle (interpret mode)."""

import numpy as np
import pytest

from flye_tpu.ops.chain import _chain_dp_scan
from flye_tpu.ops.chain_pallas import chain_dp_pallas


def make_matches(T, M, rng, span=6000, noise=60):
    cur = np.sort(rng.integers(0, span, size=(T, M)), axis=1)
    ext = cur + 300 + rng.integers(-noise, noise, size=(T, M))
    nvalid = rng.integers(1, M + 1, size=T)
    return (cur.astype(np.int32), ext.astype(np.int32),
            nvalid.astype(np.int32))


@pytest.mark.parametrize("T,M,lookback,mc", [
    (4, 96, 32, 96),      # single chunk
    (3, 128, 16, 32),     # multi-chunk carry, L < Mc
    (2, 100, 48, 50),     # multi-chunk, window spans a chunk boundary
    (9, 64, 64, 64),      # T padding to the 128-lane tile
])
def test_pallas_matches_scan(T, M, lookback, mc, rng):
    k, max_jump = 15, 1500
    cur, ext, nvalid = make_matches(T, M, rng)
    s_ref, p_ref = _chain_dp_scan(cur, ext, nvalid, k, max_jump, lookback)
    s_pl, p_pl = chain_dp_pallas(cur, ext, nvalid, k, max_jump, lookback,
                                 interpret=True, mc=mc)
    np.testing.assert_array_equal(np.asarray(s_ref), np.asarray(s_pl))
    np.testing.assert_array_equal(np.asarray(p_ref), np.asarray(p_pl))


def test_pallas_empty_rows(rng):
    k, max_jump, lookback = 15, 1500, 16
    cur, ext, _ = make_matches(2, 32, rng)
    nvalid = np.array([0, 32], np.int32)
    s_ref, p_ref = _chain_dp_scan(cur, ext, nvalid, k, max_jump, lookback)
    s_pl, p_pl = chain_dp_pallas(cur, ext, nvalid, k, max_jump, lookback,
                                 interpret=True, mc=32)
    np.testing.assert_array_equal(np.asarray(s_ref), np.asarray(s_pl))
    np.testing.assert_array_equal(np.asarray(p_ref), np.asarray(p_pl))
