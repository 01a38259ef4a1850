"""Interpret-mode equivalence of the fused Pallas polish scoring vs the
jnp scan formulation (the TPU path's correctness oracle)."""

import numpy as np
import jax.numpy as jnp
import pytest

from flye_tpu.ops.polish import _score_edits_jnp, polish_bubbles
from flye_tpu.ops.polish_pallas import score_edits_pallas


@pytest.mark.parametrize("seed,shape", [
    (0, (5, 24, 3, 40)),     # pack=2 (S+1 <= 64)
    (3, (5, 24, 3, 40)),
    (1, (4, 20, 12, 28)),    # pack=4 (S+1 <= 32), 12 branches -> 2 rows
    (2, (4, 20, 18, 60)),    # pack=2, 18 branches -> 2 packed rows + pad
    (5, (3, 16, 5, 130)),    # pack=1, W=256 (two lane tiles)
])
def test_score_edits_matches_jnp(seed, shape):
    rng = np.random.default_rng(seed)
    B, Cb, R, S = shape
    cand = rng.integers(0, 4, (B, Cb)).astype(np.uint8)
    clen = rng.integers(10, Cb + 1, B).astype(np.int32)
    branches = rng.integers(0, 4, (B, R, S)).astype(np.uint8)
    blen = rng.integers(8, S + 1, (B, R)).astype(np.int32)
    bmask = rng.random((B, R)) < 0.8
    bmask[:, 0] = True
    subs = np.log(rng.random((5, 5)) * 0.5 + 0.01).astype(np.float32)

    ref = _score_edits_jnp(jnp.asarray(cand), jnp.asarray(clen),
                           jnp.asarray(branches), jnp.asarray(blen),
                           jnp.asarray(bmask), jnp.asarray(subs))
    out = score_edits_pallas(cand, clen, branches, blen, bmask, subs,
                             interpret=True)
    names = ["total", "del", "ins", "ins_chr", "sub", "sub_chr"]
    for name, r, o in zip(names, ref, out):
        r, o = np.asarray(r), np.asarray(o)
        assert r.shape == o.shape, name
        if name.endswith("chr"):
            np.testing.assert_array_equal(r, o, err_msg=name)
        else:
            finite = r > -1e29
            assert np.array_equal(finite, o > -1e29), name
            diff = np.abs(np.where(finite, r - o, 0)).max()
            assert diff < 1e-3, (name, diff)


@pytest.mark.parametrize("R", [3, 24])
def test_polish_bubbles_pallas_path(R):
    """Full hill climb through the interpret-mode kernels converges to
    the same candidates as the jnp path.  R=24 exercises the packed
    grouping (gsz=16 on the pallas path vs 8-branch groups on jnp)."""
    rng = np.random.default_rng(7)
    B, C, Cb, S = 4, 30, 40, 60
    true = rng.integers(0, 4, (B, C)).astype(np.uint8)
    cand = np.zeros((B, Cb), np.uint8)
    cand[:, :C] = true
    for i in range(B):
        idx = rng.integers(0, C, 2)
        cand[i, idx] = (cand[i, idx] + 1) % 4
    clen = np.full(B, C, np.int32)
    branches = np.zeros((B, R, S), np.uint8)
    branches[:, :, :C] = true[:, None, :]
    blen = np.full((B, R), C, np.int32)
    bmask = np.ones((B, R), bool)
    subs = np.log(np.full((5, 5), 0.05, np.float32))
    np.fill_diagonal(subs[:4, :4], np.log(0.8))

    import flye_tpu.ops.polish as P
    import flye_tpu.ops.polish_pallas as PP
    orig = PP._score_edits_pallas
    o_j = P.polish_bubbles(cand, clen, branches, blen, bmask, subs,
                           max_iters=24, use_pallas=False)
    # route the pallas path through the interpreter on CPU
    PP._score_edits_pallas = (
        lambda *a, interpret=False, **k: orig(*a, interpret=True, **k))
    try:
        o_p = P.polish_bubbles(cand, clen, branches, blen, bmask, subs,
                               max_iters=24, use_pallas=True)
    finally:
        PP._score_edits_pallas = orig
    np.testing.assert_array_equal(np.asarray(o_j[0]), np.asarray(o_p[0]))
    np.testing.assert_array_equal(np.asarray(o_j[1]), np.asarray(o_p[1]))
    # and it actually fixed the errors
    for i in range(B):
        n = int(o_p[1][i])
        assert n == C
        np.testing.assert_array_equal(np.asarray(o_p[0][i][:n]), true[i])


def test_pick_tile_vmem_budget():
    """Buckets observed to exceed the 16 MB scoped-VMEM limit (E. coli
    30x E2E: long bubbles W=1280, and a (32, 8, 640, 385) bucket that
    measured 16.19M with the per-char output planes) must stay inside
    the 13 MB model budget; the production short-bubble shapes must get
    large per-step work (tile*U) to amortize the sequential-step cost."""
    from flye_tpu.ops.polish_pallas import (_pick_tile, _vmem_bytes,
                                            fits_vmem)
    for rp, w, c1 in [(8, 1280, 769), (8, 640, 385), (32, 256, 385),
                      (16, 256, 129)]:
        tile, U = _pick_tile(rp, w, c1)
        assert _vmem_bytes(tile, U, rp, w, c1) <= 13 * 1024 * 1024
    # 56-branch 640-wide buckets exceed VMEM at any tile -> jnp path
    # (branch-group tiling in polish_bubbles avoids this in practice)
    assert _pick_tile(56, 640, 385) is None
    assert not fits_vmem(50, 620, 384)
    assert fits_vmem(16, 255, 128)
    # dominant production shape (Rp=8 groups, W=128): per-step work
    # must be >= 16x the round-3 tile-32 x 1-row baseline
    tile, U = _pick_tile(8, 128, 65)
    assert tile * U >= 512
