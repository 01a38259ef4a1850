"""Fused Pallas TPU kernels for the bubble-polishing edit scoring.

The jnp formulation in ops/polish.py materializes the full forward (F)
and backward (B) score tensors [C+1, batch, R, S+1] in HBM and makes
multiple passes over them (the 4-character insertion/substitution
scoring plus the per-row associative scans) — ~10x more HBM traffic
than the data requires.  These kernels keep each DP row in VMEM:

  phase 1 (backward): one sequential grid walk over candidate rows,
    carrying the current row in VMEM scratch and resolving the in-row
    branch-gap dependency with a log-step shift-max (suffix-max trick);
    only the B rows stream out to HBM.
  phase 2 (forward + scoring): walks rows forward, carrying F in VMEM
    (never materialized in HBM), streams each B row in once, and
    computes del/ins/sub scores for all 4 characters in the same pass.

Semantics match ops/polish.py's forward_rows/backward_rows/scoring
exactly (same masks, same NEG padding); the only difference is
float reduction order (<=2e-5 on the scores, far under the polisher's
1e-3 acceptance threshold).

Used on TPU; CPU paths (tests) run the kernels in interpreter mode or
fall back to the jnp version.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -1e30
_TILE_B = 32  # batch padding granularity (tiles may be up to 64)


def _pick_tile(Rp: int, W: int, C1: int) -> int:
    """Largest batch tile whose VMEM working set fits on-chip.

    Working-set model (calibrated against Mosaic scoped-allocation
    reports): ~20 [tile, Rp, W] f32 planes (match tables, gap tables,
    streamed B rows with double buffering, F carry, shift-max and
    4-char loop temporaries) plus the double-buffered score outputs
    (del + 4-char ins/sub planes = 9 x [tile, C1]).  The observed OOM
    margin is thin (a (32, 8, 640, 385) bucket measured 16.19M against
    the 16M scoped-VMEM limit), so budget 13 MB.  Returns None if no
    tile fits (caller falls back to the jnp/XLA scoring path)."""
    for tile in (64, 32, 16, 8):
        planes = 20 * tile * Rp * W * 4
        outs = 2 * 9 * tile * C1 * 4
        if planes + outs <= 13 * 1024 * 1024:
            return tile
    return None


def fits_vmem(R: int, S: int, Cb: int) -> bool:
    """Whether a [*, R, S] branch bucket with a Cb-wide candidate can
    run through the fused Pallas kernels on a 16 MB-VMEM core (very
    long windows cannot; the jnp path takes those)."""
    Rp = _round_up(R, 8)
    W = _round_up(S + 1, 128)
    return _pick_tile(Rp, W, Cb + 1) is not None


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _shift_r(x, fill):
    """x[..., j] -> x[..., j-1], fill at j=0."""
    tb, r, w = x.shape
    return jnp.concatenate(
        [jnp.full((tb, r, 1), fill, x.dtype), x[:, :, :-1]], axis=2)


def _shift_l(x, fill):
    """x[..., j] -> x[..., j+1], fill at j=W-1."""
    tb, r, w = x.shape
    return jnp.concatenate(
        [x[:, :, 1:], jnp.full((tb, r, 1), fill, x.dtype)], axis=2)


def _prefix_max(g, n_shifts):
    for p in range(n_shifts):
        s = 1 << p
        tb, r, w = g.shape
        rolled = jnp.concatenate(
            [jnp.full((tb, r, s), NEG, g.dtype), g[:, :, :-s]], axis=2)
        g = jnp.maximum(g, rolled)
    return g


def _suffix_max(g, n_shifts):
    for p in range(n_shifts):
        s = 1 << p
        tb, r, w = g.shape
        rolled = jnp.concatenate(
            [g[:, :, s:], jnp.full((tb, r, s), NEG, g.dtype)], axis=2)
        g = jnp.maximum(g, rolled)
    return g


def _sel_match(cx, sw):
    """Per-lane match plane: sw[cx[b]] as selects (gathers are slow)."""
    match = jnp.zeros_like(sw[0])
    for x in range(4):
        match = jnp.where((cx == x)[:, None, None], sw[x], match)
    return match


def _col(ref, i):
    """Column i of a [TB, C] block as a [TB] vector (iota-masked sum —
    Mosaic cannot lower dynamic lane-dimension slices)."""
    row = ref[:]
    jj = jax.lax.broadcasted_iota(jnp.int32, row.shape, 1)
    return jnp.sum(jnp.where(jj == i, row, 0), axis=1)


def _setcol(ref, i, val):
    """Write val [TB] into column i of a [TB, C] block."""
    jj = jax.lax.broadcasted_iota(jnp.int32, ref.shape, 1)
    ref[:] = jnp.where(jj == i, val[:, None], ref[:])


def _setcol3(ref, x, i, val):
    """Write val [TB] into [x, :, i] of a [4, TB, C] block."""
    jj = jax.lax.broadcasted_iota(jnp.int32, ref.shape, 2)
    xx = jax.lax.broadcasted_iota(jnp.int32, ref.shape, 0)
    ref[:] = jnp.where((jj == i) & (xx == x), val[None, :, None],
                       ref[:])


def _backward_kernel(sw_ref, sg_ref, cand_ref, vgap_ref, ds_ref,
                     clen_ref, blen_ref, out_ref, carry, *, Cb: int,
                     n_shifts: int):
    t = pl.program_id(1)
    i = Cb - 1 - t

    @pl.when(t == 0)
    def _():
        carry[:] = sg_ref[:]

    nxt = carry[:]
    sg = sg_ref[:]
    TB, R, W = nxt.shape
    cx = _col(cand_ref, i)
    match = _sel_match(cx, sw_ref[:])
    vg = _col(vgap_ref, i)[:, None, None]
    dsi = _col(ds_ref, i)[:, None, None]
    blen3 = blen_ref[:][:, :, None]
    jpos = jax.lax.broadcasted_iota(jnp.int32, (TB, R, W), 2)

    diag = jnp.where(jpos < blen3, _shift_l(nxt, NEG) + match, NEG)
    tmp = jnp.maximum(diag, nxt + vg)
    tmp = jnp.where(jpos <= blen3, tmp, NEG)
    row = _suffix_max(tmp - sg, n_shifts) + sg
    in_range = (i < clen_ref[:, 0])[:, None, None]
    row = jnp.where(in_range, row, sg)
    row = jnp.where(jpos <= blen3, row, dsi)
    carry[:] = row
    out_ref[0] = row


def _forward_score_kernel(sw_ref, gp_ref, sg_ref, b_ref,
                          cand_ref, vgap_ref, clen_ref, blen_ref,
                          bmask_ref, xgap_ref,
                          del_ref, ins4_ref, sub4_ref, total_ref,
                          carry, bprev, *, Cb: int, n_shifts: int):
    """Grid step t loads ONE backward row (B[t], clamped to Cb-1) and
    scores position i = t - 1 against (B[i] carried in scratch from the
    previous step, B[i+1] just loaded).  Streaming the backward tensor
    once instead of twice (the b_row(0)/b_row(1) formulation) removes
    ~40% of this pass's HBM traffic — its dominant cost."""
    t = pl.program_id(1)
    sg = sg_ref[:]
    bmaskf = bmask_ref[:]

    @pl.when(t == 0)
    def _():
        carry[:] = gp_ref[:]
        # B[0]; for an empty candidate (Cb row range never entered in
        # backward) the loaded row equals the base row anyway
        B0 = b_ref[0]
        bprev[:] = B0
        tot = jnp.sum(B0[:, :, 0] * bmaskf, axis=1)
        total_ref[:] = jnp.broadcast_to(tot[:, None], total_ref.shape)

    @pl.when(t > 0)
    def _():
        i = t - 1
        F = carry[:]
        TB, R, W = F.shape
        blen3 = blen_ref[:][:, :, None]
        jpos = jax.lax.broadcasted_iota(jnp.int32, (TB, R, W), 2)
        jmask = jnp.where(jpos <= blen3, 0.0, NEG)

        B0 = bprev[:]                               # B[i]
        # B[i+1]; indices beyond Cb-1 resolve to the base row sg
        B1 = jnp.where(i + 1 <= Cb - 1, b_ref[0], sg)

        # raw per-char sums only: position-validity and cand!=x masks
        # are per-lane and apply after the branch-group reduction
        # (ops/polish._finish_scores)
        dmax = jnp.max(F + (B1 + jmask), axis=2)
        _setcol(del_ref, i, jnp.sum(dmax * bmaskf, axis=1))

        cx = _col(cand_ref, i)
        B0m = B0 + jmask
        B1m = B1 + jmask
        for x in range(4):
            mx = sw_ref[x]
            xg = xgap_ref[0, x]
            subx = jnp.maximum(_shift_r(F + mx, NEG), F + xg)
            ins_x = jnp.sum(jnp.max(subx + B0m, axis=2) * bmaskf, axis=1)
            sub_x = jnp.sum(jnp.max(subx + B1m, axis=2) * bmaskf, axis=1)
            _setcol3(ins4_ref, x, i, ins_x)
            _setcol3(sub4_ref, x, i, sub_x)

        bprev[:] = B1

        # advance F -> next row (uses this row's candidate character)
        @pl.when(i < Cb)
        def _():
            gp = gp_ref[:]
            match = _sel_match(cx, sw_ref[:])
            vg = _col(vgap_ref, i)[:, None, None]
            tmp = jnp.maximum(_shift_r(F + match, NEG), F + vg)
            carry[:] = _prefix_max(tmp - gp, n_shifts) + gp


def prepare_branches_pallas(branches, blen, bmask, subs):
    """Precompute the branch-side tables (constant across hill-climb
    iterations): padded match planes, gap prefix/suffix costs, masks."""
    with jax.enable_x64(False):
        return _prepare_branches(
            jnp.asarray(branches, jnp.int32), jnp.asarray(blen, jnp.int32),
            jnp.asarray(bmask), jnp.asarray(subs, jnp.float32))


@jax.jit
def _prepare_branches(branches, blen, bmask, subs):
    Bb, R, S = branches.shape
    W = _round_up(S + 1, 128)
    Rp = _round_up(R, 8)
    pad_b = (-Bb) % _TILE_B

    # ---- per-branch tables (identical to ops/polish.py) ----
    b1h = jax.nn.one_hot(branches, 4, dtype=jnp.float32)
    sw = jnp.einsum("brsx,yx->ybrs", b1h, subs[:4, :4])      # [4,B,R,S]
    gap_b = jnp.einsum("brsx,x->brs", b1h, subs[4, :4])
    jpos_s = jax.lax.broadcasted_iota(jnp.int32, (Bb, R, S), 2)
    gap_bm = jnp.where(jpos_s < blen[:, :, None], gap_b, 0.0)
    gp = jnp.concatenate(
        [jnp.zeros((Bb, R, 1), jnp.float32),
         jnp.cumsum(gap_bm, axis=2)], axis=2)                # [B,R,S+1]
    sg = gp[:, :, -1:] - gp

    def pad_brw(x, fill):
        x = jnp.pad(x, ((0, pad_b), (0, Rp - R),
                        (0, W - x.shape[2])),
                    constant_values=fill)
        return x.astype(jnp.float32)

    # replicate gp's last column into the pad so prefix-max transforms
    # stay exact; sg pad is 0 by the same identity
    gp_p = jnp.concatenate(
        [gp, jnp.broadcast_to(gp[:, :, -1:], (Bb, R, W - S - 1))],
        axis=2)
    gp_p = jnp.pad(gp_p, ((0, pad_b), (0, Rp - R), (0, 0)))
    sg_p = pad_brw(sg, 0.0)
    sw_p = jnp.pad(sw, ((0, 0), (0, pad_b), (0, Rp - R),
                        (0, W - S))).astype(jnp.float32)
    # padded branch rows must never win reductions: blen pad = -1
    blen_p = jnp.pad(blen, ((0, pad_b), (0, Rp - R)),
                     constant_values=-1).astype(jnp.int32)
    bmask_p = jnp.pad(bmask.astype(jnp.float32),
                      ((0, pad_b), (0, Rp - R)))
    xgaps = jnp.broadcast_to(subs[:4, 4][None], (8, 4))      # [8, 4]
    return (sw_p, gp_p, sg_p, blen_p, bmask_p, xgaps)


def score_edits_pallas_raw(cand, cand_len, branches, blen, bmask,
                           subs, interpret: bool = False, prep=None):
    """Raw per-char edit scores for every bubble, fused on-chip.

    Returns (total [B], del_raw [Cb,B], ins4 [4,Cb+1,B],
    sub4 [4,Cb,B]) — the same contract as
    ops/polish._score_edits_raw_jnp (masks/argmax applied by
    _finish_scores after any branch-group reduction).  Pass
    prep=prepare_branches_pallas(...) to reuse the branch tables
    across hill-climbing iterations.
    """
    with jax.enable_x64(False):
        if prep is None:
            prep = _prepare_branches(
                jnp.asarray(branches, jnp.int32),
                jnp.asarray(blen, jnp.int32), jnp.asarray(bmask),
                jnp.asarray(subs, jnp.float32))
        return _score_edits_pallas(
            jnp.asarray(cand, jnp.int32), jnp.asarray(cand_len, jnp.int32),
            jnp.asarray(subs, jnp.float32), *prep,
            interpret=interpret)


def score_edits_pallas(cand, cand_len, branches, blen, bmask, subs,
                       interpret: bool = False, prep=None):
    """All single-edit scores for every bubble, fused on-chip.

    Returns (total [B], del_sc [Cb,B], ins_sc [Cb+1,B], ins_chr,
    sub_sc [Cb,B], sub_chr), matching ops/polish._score_edits_jnp."""
    from flye_tpu.ops.polish import _finish_scores
    raw = score_edits_pallas_raw(cand, cand_len, branches, blen,
                                 bmask, subs, interpret=interpret,
                                 prep=prep)
    with jax.enable_x64(False):
        return _finish_scores(jnp.asarray(cand, jnp.int32),
                              jnp.asarray(cand_len, jnp.int32), *raw,
                              groups=1)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _score_edits_pallas(cand, cand_len, subs, sw_p, gp_p, sg_p,
                        blen_p, bmask_p, xgaps,
                        interpret: bool = False):
    Bb, Cb = cand.shape
    _, Bp, Rp, W = sw_p.shape
    n_shifts = (W - 1).bit_length()
    pad_b = Bp - Bb
    C1 = Cb + 1
    tile = _pick_tile(Rp, W, C1)
    if tile is None:
        raise ValueError(
            f"bucket Rp={Rp} W={W} exceeds VMEM even at tile 8; "
            "guard calls with fits_vmem()")
    while tile > 8 and Bp % tile:  # grid tiles must divide the batch
        tile //= 2

    c1h = jax.nn.one_hot(cand, 4, dtype=jnp.float32)
    vgap_all = jnp.einsum("bcx,x->bc", c1h, subs[:4, 4])
    live_c = (jax.lax.broadcasted_iota(jnp.int32, (Bb, Cb), 1) <
              cand_len[:, None])
    vgap_m = jnp.where(live_c, vgap_all, 0.0)
    csum = jnp.cumsum(vgap_m, axis=1)
    ds = jnp.concatenate([jnp.zeros((Bb, 1), jnp.float32), csum], axis=1)
    ds = csum[:, -1:] - ds                                   # [B, Cb+1]

    cand_pad = jnp.pad(cand, ((0, pad_b), (0, 1)))           # [Bp, Cb+1]
    vgap_pad = jnp.pad(vgap_m, ((0, pad_b), (0, 1)))         # [Bp, Cb+1]
    ds_pad = jnp.pad(ds, ((0, pad_b), (0, 0)))               # [Bp, Cb+1]
    clen_p = jnp.pad(cand_len, (0, pad_b))[:, None]          # [Bp, 1]

    nB = Bp // tile

    vmem_full = pl.BlockSpec(
        (4, tile, Rp, W), lambda b, t: (0, b, 0, 0),
        memory_space=pltpu.VMEM)
    vmem_brw = pl.BlockSpec(
        (tile, Rp, W), lambda b, t: (b, 0, 0),
        memory_space=pltpu.VMEM)
    vmem_br = pl.BlockSpec(
        (tile, Rp), lambda b, t: (b, 0), memory_space=pltpu.VMEM)
    vmem_b1 = pl.BlockSpec(
        (tile, 1), lambda b, t: (b, 0), memory_space=pltpu.VMEM)
    # whole per-lane row span in one block (constant over t; columns
    # are indexed dynamically in-kernel)
    vmem_rows = pl.BlockSpec(
        (tile, C1), lambda b, t: (b, 0), memory_space=pltpu.VMEM)

    # ---- phase 1: backward rows ----
    bw = pl.pallas_call(
        functools.partial(_backward_kernel, Cb=Cb, n_shifts=n_shifts),
        grid=(nB, Cb),
        in_specs=[
            vmem_full, vmem_brw,
            vmem_rows,                                # cand
            vmem_rows,                                # vgap
            vmem_rows,                                # ds
            vmem_b1, vmem_br,
        ],
        out_specs=pl.BlockSpec((1, tile, Rp, W),
                               lambda b, t: (Cb - 1 - t, b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Cb, Bp, Rp, W), jnp.float32),
        scratch_shapes=[pltpu.VMEM((tile, Rp, W), jnp.float32)],
        interpret=interpret,
    )(sw_p, sg_p, cand_pad, vgap_pad, ds_pad, clen_p, blen_p)

    # ---- phase 2: forward + scoring ----
    # step t streams ONE backward row B[min(t, Cb-1)]; B[i] for the
    # position being scored (i = t-1) carries over in scratch
    b_row = pl.BlockSpec(
        (1, tile, Rp, W),
        lambda b, t: (jnp.minimum(t, Cb - 1), b, 0, 0),
        memory_space=pltpu.VMEM)

    vmem_rows4 = pl.BlockSpec((4, tile, C1), lambda b, t: (0, b, 0),
                              memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        functools.partial(_forward_score_kernel, Cb=Cb,
                          n_shifts=n_shifts),
        grid=(nB, Cb + 2),
        in_specs=[
            vmem_full, vmem_brw, vmem_brw,
            b_row,
            vmem_rows,                                # cand
            vmem_rows,                                # vgap
            vmem_b1, vmem_br, vmem_br,
            pl.BlockSpec((8, 4), lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            vmem_rows,                                # del (raw)
            vmem_rows4,                               # ins4 (raw)
            vmem_rows4,                               # sub4 (raw)
            pl.BlockSpec((tile, 128), lambda b, t: (b, 0),
                         memory_space=pltpu.VMEM),    # total
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Bp, C1), jnp.float32),
            jax.ShapeDtypeStruct((4, Bp, C1), jnp.float32),
            jax.ShapeDtypeStruct((4, Bp, C1), jnp.float32),
            jax.ShapeDtypeStruct((Bp, 128), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((tile, Rp, W), jnp.float32),
                        pltpu.VMEM((tile, Rp, W), jnp.float32)],
        interpret=interpret,
    )(sw_p, gp_p, sg_p, bw, cand_pad, vgap_pad, clen_p, blen_p,
      bmask_p, xgaps)

    del_raw, ins4, sub4, total = outs
    return (total[:Bb, 0], del_raw[:Bb, :Cb].T,
            ins4[:, :Bb].transpose(0, 2, 1),
            sub4[:, :Bb, :Cb].transpose(0, 2, 1))
