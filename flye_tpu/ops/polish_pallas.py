"""Fused Pallas TPU kernels for the bubble-polishing edit scoring.

The jnp formulation in ops/polish.py materializes the full forward (F)
and backward (B) score tensors [C+1, batch, R, S+1] in HBM and makes
multiple passes over them (the 4-character insertion/substitution
scoring plus the per-row associative scans) — ~10x more HBM traffic
than the data requires.  These kernels keep each DP row in VMEM:

  phase 1 (backward): a sequential grid walk over candidate-row BLOCKS
    (U rows per grid step, descending), carrying the current row in
    VMEM scratch and resolving the in-row branch-gap dependency with a
    log-step shift-max (suffix-max trick); only the B rows stream out
    to HBM.
  phase 2 (forward + scoring): walks row blocks forward, carrying F in
    VMEM (never materialized in HBM), streams each B row in once, and
    computes del/ins/sub scores for all 4 characters in the same pass.

Row blocking (round 4): with one candidate row per grid step the
per-step work is a handful of [tile, 8, 128] elementwise ops (~1 us of
VPU time) against ~2 us of fixed per-step cost (sequential carry
dependency + grid bookkeeping), which capped the kernel at 2.5-6% of
the VPU roofline (BENCH_r03).  Each grid step now processes U rows
(U and the batch tile are chosen jointly by `_pick_tile` to maximize
tile*U under the VMEM budget), amortizing the fixed cost ~U*tile/32 x.
The backward tensor stores Cbp = ceil((Cb+2)/U)*U rows where row j
holds B[j] (rows j >= Cb hold the base row sg), so phase 2's U-row
input blocks never need cross-block row reads: position i = t*U+u-1
takes B[i+1] from block lane u and B[i] from the previous lane (the
step carry for u=0).

Branch packing (round 3): the production bubbles are short (~15-40 bp
branches, the reference's own fine-partition scale,
flye/polishing/bubbles.py:317-359) while the VPU row is 128 lanes —
one branch per row wastes 2-4x of every vector op.  For branch buffers
with S+1 <= 64 (resp. 32), `pack` = 2 (resp. 4) branches share each
128-lane row as independent Wseg-lane segments: shifts and the
prefix/suffix-max scans mask at segment boundaries, per-branch maxima
are read off segment slices, and branch r of segment g is branch index
g*Rp + r.

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
_TILE_B = 128  # batch padding granularity (max batch tile)


def pack_for(S: int) -> int:
    """Branches per 128-lane row for a branch buffer of S bases."""
    if S + 1 <= 32:
        return 4
    if S + 1 <= 64:
        return 2
    return 1


def _vmem_bytes(tile: int, U: int, Rp: int, W: int, C1: int) -> int:
    """Working-set model (calibrated against Mosaic scoped-allocation
    reports): double-buffered branch-table input blocks (sw 4 + gp + sg
    = 6 planes x2), the U-row backward block x2, carry/bprev scratch,
    and ~8 live compute temporaries — all [tile, Rp, W] f32 — plus the
    double-buffered per-row blocks (cand/vgap/ds inputs and the
    del + 4-char ins/sub score outputs, [tile, C1])."""
    planes = (22 + 2 * U) * tile * Rp * W * 4
    rows = 26 * tile * C1 * 4
    return planes + rows + 2048 * tile


def _pick_tile(Rp: int, W: int, C1: int):
    """(tile, U): batch tile and rows-per-grid-step maximizing tile*U
    (the per-step work that amortizes the fixed sequential-step cost)
    under a 13 MB VMEM budget (the observed Mosaic margin against the
    16 MB scoped limit is thin).  Returns None if nothing fits (caller
    falls back to the jnp/XLA scoring path)."""
    best = None
    best_key = None
    for U in (8, 4, 2, 1):
        for tile in (128, 64, 32, 16, 8):
            if _vmem_bytes(tile, U, Rp, W, C1) <= 13 * 1024 * 1024:
                key = (tile * U, tile)
                if best is None or key > best_key:
                    best, best_key = (tile, U), key
                break  # smaller tiles only lower the product
    return best


def _kernel_dims(R: int, S: int):
    """(pack, Wseg, Rp, W) of the kernel layout for an [*, R, S] bucket."""
    pack = pack_for(S)
    if pack > 1:
        Wseg = 128 // pack
        Rp = _round_up(-(-R // pack), 8)
        return pack, Wseg, Rp, pack * Wseg
    W = _round_up(S + 1, 128)
    return 1, W, _round_up(R, 8), W


def fits_vmem(R: int, S: int, Cb: int) -> bool:
    """Whether a [*, R, S] branch bucket with a Cb-wide candidate can
    run through the fused Pallas kernels on a 16 MB-VMEM core (very
    long windows cannot; the jnp path takes those)."""
    _, _, Rp, W = _kernel_dims(R, S)
    return _pick_tile(Rp, W, Cb + 1) is not None


def _fused_vmem_bytes(tile: int, Rp: int, W: int, C1: int) -> int:
    """Working-set model for the single-pass fused kernel: the whole
    backward tensor lives in VMEM scratch ((C1+1) rows of
    [tile, Rp, W] f32), plus double-buffered branch-table input blocks
    (sw 4 + gp + sg = 6 planes x2), ~10 live compute temporaries, and
    the per-row input/output blocks."""
    planes = (C1 + 1 + 22 + 8) * tile * Rp * W * 4  # +U-block stack
    rows = 30 * tile * C1 * 4
    return planes + rows + 2048 * tile


def _pick_tile_fused(Rp: int, W: int, C1: int):
    """Largest batch tile for which the fused kernel's backward scratch
    fits the 13 MB VMEM budget; None when even tile 8 overflows (the
    two-phase kernels take those shapes)."""
    for tile in (128, 64, 32, 16, 8):
        if _fused_vmem_bytes(tile, Rp, W, C1) <= 13 * 1024 * 1024:
            return tile
    return None


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _shift_r(x, fill, jmod=None):
    """x[..., j] -> x[..., j-1], fill at j=0 (and at every segment
    start when jmod is given — packed rows)."""
    tb, r, w = x.shape
    out = jnp.concatenate(
        [jnp.full((tb, r, 1), fill, x.dtype), x[:, :, :-1]], axis=2)
    if jmod is not None:
        out = jnp.where(jmod == 0, fill, out)
    return out


def _shift_l(x, fill, jmod=None, Wseg=None):
    """x[..., j] -> x[..., j+1], fill at j=W-1 (and at every segment
    end when jmod is given — packed rows)."""
    tb, r, w = x.shape
    out = jnp.concatenate(
        [x[:, :, 1:], jnp.full((tb, r, 1), fill, x.dtype)], axis=2)
    if jmod is not None:
        out = jnp.where(jmod == Wseg - 1, fill, out)
    return out


def _prefix_max(g, n_shifts, jmod=None):
    for p in range(n_shifts):
        s = 1 << p
        tb, r, w = g.shape
        rolled = jnp.concatenate(
            [jnp.full((tb, r, s), NEG, g.dtype), g[:, :, :-s]], axis=2)
        if jmod is not None:
            rolled = jnp.where(jmod < s, NEG, rolled)
        g = jnp.maximum(g, rolled)
    return g


def _suffix_max(g, n_shifts, jmod=None, Wseg=None):
    for p in range(n_shifts):
        s = 1 << p
        tb, r, w = g.shape
        rolled = jnp.concatenate(
            [g[:, :, s:], jnp.full((tb, r, s), NEG, g.dtype)], axis=2)
        if jmod is not None:
            rolled = jnp.where(jmod >= Wseg - s, NEG, rolled)
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
    Mosaic cannot lower dynamic lane-dimension slices).  Out-of-range i
    yields zeros."""
    row = ref[:]
    jj = jax.lax.broadcasted_iota(jnp.int32, row.shape, 1)
    return jnp.sum(jnp.where(jj == i, row, 0), axis=1)


def _setcol(ref, i, val):
    """Write val [TB] into column i of a [TB, C] block (no-op when i is
    out of range)."""
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
                     n_shifts: int, pack: int, Wseg: int, Rp: int,
                     U: int):
    """Grid step t computes backward rows j = k*U+U-1 .. k*U descending
    (k = nT-1-t) into the U-row output block; storage row j holds B[j],
    rows j >= Cb hold the base row sg."""
    t = pl.program_id(1)
    nT = pl.num_programs(1)
    k = nT - 1 - t
    sg = sg_ref[:]
    TB, R, W = sg.shape
    jpos = jax.lax.broadcasted_iota(jnp.int32, (TB, R, W), 2)
    if pack > 1:
        # blen_ref is a precomputed [TB, Rp, W] lane plane (packed)
        jmod = jpos & (Wseg - 1)
        blen3 = blen_ref[:]
        jmod_eff = jmod
    else:
        jmod = None
        blen3 = blen_ref[:][:, :, None]
        jmod_eff = jpos
    clen = clen_ref[:, 0]
    sw = sw_ref[:]

    # at t == 0 the first rows processed have j >= Cb and select sg
    # regardless of the (uninitialized) carry, so no explicit init
    nxt = carry[:]
    for u in range(U - 1, -1, -1):
        j = k * U + u
        cx = _col(cand_ref, j)
        match = _sel_match(cx, sw)
        vg = _col(vgap_ref, j)[:, None, None]
        dsi = _col(ds_ref, j)[:, None, None]
        diag = jnp.where(jmod_eff < blen3,
                         _shift_l(nxt, NEG, jmod, Wseg) + match, NEG)
        tmp = jnp.maximum(diag, nxt + vg)
        tmp = jnp.where(jmod_eff <= blen3, tmp, NEG)
        row = _suffix_max(tmp - sg, n_shifts, jmod, Wseg) + sg
        in_range = (j < clen)[:, None, None]
        row = jnp.where(in_range, row, sg)
        row = jnp.where(jmod_eff <= blen3, row, dsi)
        # rows at/beyond the candidate buffer are the base row exactly
        row = jnp.where(j >= Cb, sg, row)
        out_ref[u] = row
        nxt = row
    carry[:] = nxt


def _forward_score_kernel(sw_ref, gp_ref, sg_ref, b_ref,
                          cand_ref, vgap_ref, clen_ref, blen_ref,
                          bmask_ref, xgap_ref,
                          del_ref, ins4_ref, sub4_ref, total_ref,
                          carry, bprev, *, Cb: int, n_shifts: int,
                          pack: int, Wseg: int, Rp: int, U: int):
    """Grid step t scores positions i = t*U-1 .. t*U+U-2 (i = -1 is the
    init slot; i > Cb are no-ops since the masked column writes miss).
    The U-row input block holds B[t*U .. t*U+U-1]: B[i+1] is block lane
    u, B[i] the previous lane (carried across steps for u = 0).
    Streaming the backward tensor exactly once this way keeps phase 2's
    HBM traffic at its floor."""
    t = pl.program_id(1)
    sg = sg_ref[:]
    gp = gp_ref[:]
    TBs, Rs, Ws = sg.shape
    jpos = jax.lax.broadcasted_iota(jnp.int32, (TBs, Rs, Ws), 2)
    if pack > 1:
        # blen_ref is a precomputed [TB, Rp, W] lane plane; bmask_ref
        # stays a flat [TB, pack*Rp] branch-weight block.  Per-branch
        # maxima come from static lane slices (one Wseg-wide segment
        # per packed branch) + a plain max-reduce.
        jmod = jpos & (Wseg - 1)
        blen3 = blen_ref[:]
        bflat = bmask_ref[:]
        jmod_eff = jmod

        def reduce_wmax(x):
            out = None
            for g in range(pack):
                m = jnp.max(x[:, :, g * Wseg:(g + 1) * Wseg], axis=2)
                c = jnp.sum(m * bflat[:, g * Rp:(g + 1) * Rp], axis=1)
                out = c if out is None else out + c
            return out
    else:
        jmod = None
        blen3 = blen_ref[:][:, :, None]
        bmaskf = bmask_ref[:]
        jmod_eff = jpos

        def reduce_wmax(x):
            return jnp.sum(jnp.max(x, axis=2) * bmaskf, axis=1)

    jmask = jnp.where(jmod_eff <= blen3, 0.0, NEG)
    sw = sw_ref[:]

    F = carry[:]
    Bi = bprev[:]
    for u in range(U):
        i = t * U + u - 1
        B1 = b_ref[u]                                # B[i+1]
        is_init = i == -1

        @pl.when(is_init)
        def _():
            # total score = B[0][0] per branch
            if pack > 1:
                tot = reduce_wmax(jnp.where(jmod == 0, B1, NEG))
            else:
                tot = jnp.sum(B1[:, :, 0] * bmaskf, axis=1)
            total_ref[:] = jnp.broadcast_to(tot[:, None],
                                            total_ref.shape)

        F = jnp.where(is_init, gp, F)

        # raw per-char sums only: position-validity and cand!=x masks
        # are per-lane and apply after the branch-group reduction
        # (ops/polish._finish_scores).  Column writes at i < 0 or
        # i >= C1 miss every lane, so init/pad slots are no-ops.
        _setcol(del_ref, i, reduce_wmax(F + (B1 + jmask)))

        cx = _col(cand_ref, i)
        B0m = Bi + jmask
        B1m = B1 + jmask
        for x in range(4):
            mx = sw[x]
            xg = xgap_ref[0, x]
            subx = jnp.maximum(_shift_r(F + mx, NEG, jmod), F + xg)
            _setcol3(ins4_ref, x, i, reduce_wmax(subx + B0m))
            _setcol3(sub4_ref, x, i, reduce_wmax(subx + B1m))

        # advance F -> next row (uses this row's candidate character)
        match = _sel_match(cx, sw)
        vg = _col(vgap_ref, i)[:, None, None]
        tmp = jnp.maximum(_shift_r(F + match, NEG, jmod), F + vg)
        Fn = _prefix_max(tmp - gp, n_shifts, jmod) + gp
        F = jnp.where((i >= 0) & (i < Cb), Fn, F)
        Bi = B1
    carry[:] = F
    bprev[:] = Bi


def _fused_score_kernel(sw_ref, gp_ref, sg_ref, cand_ref, vgap_ref,
                        ds_ref, clen_ref, blen_ref, bmask_ref,
                        xgap_ref, del_ref, ins4_ref, sub4_ref,
                        total_ref, bscratch, *, Cb: int, n_shifts: int,
                        pack: int, Wseg: int, Rp: int, U: int):
    """Single-pass fused scoring: backward rows into VMEM scratch, then
    forward + scoring reading the scratch — the backward tensor never
    touches HBM.  Gated OFF by default (FLYE_TPU_FUSED=1 enables).

    Round-5 measurement, production shape (64,96,8..56) on the v5e
    chip: the two-phase kernels stream the backward tensor through HBM
    (~4 GB/hill-climb-iteration) yet run ~20% FASTER than this fused
    kernel (1.80 s vs 2.19 s per 8192-bubble batch at equal
    convergence depth) — the HBM stream overlaps completely under the
    compute, which is bound by the in-row suffix/prefix-max shift
    chains (measured ~75% of row cost; pltpu.roll lowers identically
    to the concat shifts).  Kept as the measured record of why the
    "obvious" fusion is not the win the roofline model suggested, and
    as the starting point if a future Mosaic lowers multi-op scans
    better.  Semantics identical to the two-phase pair (same masks,
    same NEG padding, same float reduction order per row)."""
    sg = sg_ref[:]
    gp = gp_ref[:]
    TB, R, W = sg.shape
    jpos = jax.lax.broadcasted_iota(jnp.int32, (TB, R, W), 2)
    if pack > 1:
        jmod = jpos & (Wseg - 1)
        blen3 = blen_ref[:]
        bflat = bmask_ref[:]
        jmod_eff = jmod

        def reduce_wmax(x):
            out = None
            for g in range(pack):
                m = jnp.max(x[:, :, g * Wseg:(g + 1) * Wseg], axis=2)
                c = jnp.sum(m * bflat[:, g * Rp:(g + 1) * Rp], axis=1)
                out = c if out is None else out + c
            return out
    else:
        jmod = None
        blen3 = blen_ref[:][:, :, None]
        bmaskf = bmask_ref[:]
        jmod_eff = jpos

        def reduce_wmax(x):
            return jnp.sum(jnp.max(x, axis=2) * bmaskf, axis=1)

    clen = clen_ref[:, 0]
    sw = sw_ref[:]
    jmask = jnp.where(jmod_eff <= blen3, 0.0, NEG)

    # ---- backward sweep: B[j] rows into scratch, descending ----
    # scratch rows Cb and Cb+1 hold the base row sg (B[j >= clen] = sg
    # via the in_range select; row Cb+1 serves the forward sweep's
    # B[i+1] read at i = Cb).  Rows run in blocks of U (U | Cb, chosen
    # by the caller): the inner U rows unroll statically, amortizing
    # the fori-loop bookkeeping ~U x, and each block stores once.
    bscratch[Cb] = sg
    bscratch[Cb + 1] = sg
    nTb = Cb // U

    def bwd_body(t, nxt):
        jlo = (nTb - 1 - t) * U
        rows = [None] * U
        for u in range(U - 1, -1, -1):
            j = jlo + u
            cx = _col(cand_ref, j)
            match = _sel_match(cx, sw)
            vg = _col(vgap_ref, j)[:, None, None]
            dsi = _col(ds_ref, j)[:, None, None]
            diag = jnp.where(jmod_eff < blen3,
                             _shift_l(nxt, NEG, jmod, Wseg) + match, NEG)
            tmp = jnp.maximum(diag, nxt + vg)
            tmp = jnp.where(jmod_eff <= blen3, tmp, NEG)
            row = _suffix_max(tmp - sg, n_shifts, jmod, Wseg) + sg
            row = jnp.where((j < clen)[:, None, None], row, sg)
            row = jnp.where(jmod_eff <= blen3, row, dsi)
            rows[u] = row
            nxt = row
        bscratch[pl.ds(jlo, U)] = jnp.stack(rows, axis=0)
        return nxt

    jax.lax.fori_loop(0, nTb, bwd_body, sg, unroll=1)

    # ---- forward sweep + scoring ----
    B0 = bscratch[0]                                        # B[0]
    if pack > 1:
        tot = reduce_wmax(jnp.where(jmod == 0, B0, NEG))
    else:
        tot = jnp.sum(B0[:, :, 0] * bmaskf, axis=1)
    total_ref[:] = jnp.broadcast_to(tot[:, None], total_ref.shape)

    def score_at(i, F, Bi, B1, advance: bool):
        _setcol(del_ref, i, reduce_wmax(F + (B1 + jmask)))
        B0m = Bi + jmask
        B1m = B1 + jmask
        for x in range(4):
            mx = sw[x]
            xg = xgap_ref[0, x]
            subx = jnp.maximum(_shift_r(F + mx, NEG, jmod), F + xg)
            _setcol3(ins4_ref, x, i, reduce_wmax(subx + B0m))
            _setcol3(sub4_ref, x, i, reduce_wmax(subx + B1m))
        if not advance:
            return F
        cx = _col(cand_ref, i)
        match = _sel_match(cx, sw)
        vg = _col(vgap_ref, i)[:, None, None]
        tmp = jnp.maximum(_shift_r(F + match, NEG, jmod), F + vg)
        return _prefix_max(tmp - gp, n_shifts, jmod) + gp

    def fwd_body(t, carry):
        F, Bi = carry
        blk = bscratch[pl.ds(t * U + 1, U)]           # B[tU+1 .. tU+U]
        for u in range(U):
            B1 = blk[u]
            F = score_at(t * U + u, F, Bi, B1, advance=True)
            Bi = B1
        return F, Bi

    F, Bi = jax.lax.fori_loop(0, nTb, fwd_body, (gp, B0), unroll=1)
    # epilogue: position i = Cb (insert-at-end; B[Cb+1] = sg, no
    # further F advance)
    score_at(Cb, F, Bi, sg, advance=False)


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
    pack, Wseg, Rp, W = _kernel_dims(R, S)
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

    nR = pack * Rp  # total branch slots after packing

    def pack_rows(x, fill, dtype=jnp.float32):
        """[*, B, R, <=Wseg] per-branch table -> [*, B, Rp, W] lane
        plane with pack branches per row (branch g*Rp + r at segment
        g of row r); leading * dims preserved."""
        lead = x.shape[:-3]
        b, r, s = x.shape[-3:]
        x = jnp.pad(x, [(0, 0)] * len(lead)
                    + [(0, pad_b), (0, nR - r), (0, Wseg - s)],
                    constant_values=fill).astype(dtype)
        if pack == 1:
            return x
        x = x.reshape(*lead, Bb + pad_b, pack, Rp, Wseg)
        perm = tuple(range(len(lead))) + (len(lead), len(lead) + 2,
                                          len(lead) + 1, len(lead) + 3)
        return x.transpose(perm).reshape(*lead, Bb + pad_b, Rp, W)

    # replicate gp's last column into the pad so prefix-max transforms
    # stay exact; sg pad is 0 by the same identity
    gp_t = jnp.concatenate(
        [gp, jnp.broadcast_to(gp[:, :, -1:], (Bb, R, Wseg - S - 1))],
        axis=2)
    gp_p = pack_rows(gp_t, 0.0)
    sg_p = pack_rows(sg, 0.0)
    sw_p = pack_rows(sw, 0.0)
    if pack > 1:
        # per-lane branch-length plane (an in-kernel per-branch select
        # does not lower through Mosaic); weights stay flat
        blen_t = jnp.broadcast_to(blen[:, :, None], (Bb, R, Wseg))
        blen_p = pack_rows(blen_t, -1, jnp.int32)
    else:
        # padded branch slots must never win reductions: blen pad = -1
        blen_p = jnp.pad(blen, ((0, pad_b), (0, nR - R)),
                         constant_values=-1).astype(jnp.int32)
    bmask_p = jnp.pad(bmask.astype(jnp.float32),
                      ((0, pad_b), (0, nR - R)))
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
    from flye_tpu.ops.polish import _deep_recursion
    with jax.enable_x64(False), _deep_recursion():
        if prep is None:
            prep = _prepare_branches(
                jnp.asarray(branches, jnp.int32),
                jnp.asarray(blen, jnp.int32), jnp.asarray(bmask),
                jnp.asarray(subs, jnp.float32))
        pack, Wseg, Rp, _ = _kernel_dims(branches.shape[1],
                                         branches.shape[2])
        return _score_edits_pallas(
            jnp.asarray(cand, jnp.int32), jnp.asarray(cand_len, jnp.int32),
            jnp.asarray(subs, jnp.float32), *prep,
            pack=pack, Wseg=Wseg, interpret=interpret)


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


def _score_edits_fused(cand, cand_len, sw_p, gp_p, sg_p, blen_p,
                       bmask_p, xgaps, pack: int, Wseg: int,
                       n_shifts: int, tile: int, interpret: bool):
    """Single-kernel scoring: grid over batch tiles only (see
    _fused_score_kernel)."""
    Bb, Cb = cand.shape
    _, Bp, Rp, W = sw_p.shape
    pad_b = Bp - Bb
    C1 = Cb + 1
    # per-candidate tables (xgaps[0] == subs[:4, 4], the per-char gap
    # costs — the only piece of the substitution matrix needed here)
    c1h = jax.nn.one_hot(cand, 4, dtype=jnp.float32)
    vgap_all = jnp.einsum("bcx,x->bc", c1h, xgaps[0])
    live_c = (jax.lax.broadcasted_iota(jnp.int32, (Bb, Cb), 1) <
              cand_len[:, None])
    vgap_m = jnp.where(live_c, vgap_all, 0.0)
    csum = jnp.cumsum(vgap_m, axis=1)
    ds = jnp.concatenate([jnp.zeros((Bb, 1), jnp.float32), csum], axis=1)
    ds = csum[:, -1:] - ds
    cand_pad = jnp.pad(cand, ((0, pad_b), (0, 1)))
    vgap_pad = jnp.pad(vgap_m, ((0, pad_b), (0, 1)))
    ds_pad = jnp.pad(ds, ((0, pad_b), (0, 0)))
    clen_p = jnp.pad(cand_len, (0, pad_b))[:, None]

    nB = Bp // tile
    U = next(u for u in (8, 4, 2, 1) if Cb % u == 0)
    kdims = dict(Cb=Cb, n_shifts=n_shifts, pack=pack, Wseg=Wseg, Rp=Rp,
                 U=U)
    vmem_full = pl.BlockSpec((4, tile, Rp, W), lambda b: (0, b, 0, 0),
                             memory_space=pltpu.VMEM)
    vmem_brw = pl.BlockSpec((tile, Rp, W), lambda b: (b, 0, 0),
                            memory_space=pltpu.VMEM)
    vmem_br = pl.BlockSpec((tile, bmask_p.shape[1]), lambda b: (b, 0),
                           memory_space=pltpu.VMEM)
    vmem_blen = vmem_brw if pack > 1 else vmem_br
    vmem_b1 = pl.BlockSpec((tile, 1), lambda b: (b, 0),
                           memory_space=pltpu.VMEM)
    vmem_rows = pl.BlockSpec((tile, C1), lambda b: (b, 0),
                             memory_space=pltpu.VMEM)
    vmem_rows4 = pl.BlockSpec((4, tile, C1), lambda b: (0, b, 0),
                              memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        functools.partial(_fused_score_kernel, **kdims),
        grid=(nB,),
        in_specs=[
            vmem_full, vmem_brw, vmem_brw,
            vmem_rows,                                # cand
            vmem_rows,                                # vgap
            vmem_rows,                                # ds
            vmem_b1, vmem_blen, vmem_br,
            pl.BlockSpec((8, 4), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            vmem_rows,                                # del (raw)
            vmem_rows4,                               # ins4 (raw)
            vmem_rows4,                               # sub4 (raw)
            pl.BlockSpec((tile, 128), lambda b: (b, 0),
                         memory_space=pltpu.VMEM),    # total
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Bp, C1), jnp.float32),
            jax.ShapeDtypeStruct((4, Bp, C1), jnp.float32),
            jax.ShapeDtypeStruct((4, Bp, C1), jnp.float32),
            jax.ShapeDtypeStruct((Bp, 128), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((Cb + 2, tile, Rp, W), jnp.float32)],
        interpret=interpret,
    )(sw_p, gp_p, sg_p, cand_pad, vgap_pad, ds_pad, clen_p, blen_p,
      bmask_p, xgaps)
    del_raw, ins4, sub4, total = outs
    return (total[:Bb, 0], del_raw[:Bb, :Cb].T,
            ins4[:, :Bb].transpose(0, 2, 1),
            sub4[:, :Bb, :Cb].transpose(0, 2, 1))


@functools.partial(jax.jit,
                   static_argnames=("pack", "Wseg", "interpret"))
def _score_edits_pallas(cand, cand_len, subs, sw_p, gp_p, sg_p,
                        blen_p, bmask_p, xgaps, pack: int = 1,
                        Wseg: int = 0, interpret: bool = False):
    Bb, Cb = cand.shape
    _, Bp, Rp, W = sw_p.shape
    if pack == 1:
        Wseg = W
    n_shifts = (Wseg - 1).bit_length()
    pad_b = Bp - Bb
    C1 = Cb + 1
    import os
    use_fused = bool(os.environ.get("FLYE_TPU_FUSED"))
    tile_f = _pick_tile_fused(Rp, W, C1) if use_fused else None
    picked = _pick_tile(Rp, W, C1)
    if picked is None and tile_f is None and use_fused:
        tile_f = _pick_tile_fused(Rp, W, C1)
    if picked is None and tile_f is None:
        raise ValueError(
            f"bucket Rp={Rp} W={W} exceeds VMEM even at tile 8; "
            "guard calls with fits_vmem()")
    if tile_f is not None:
        while tile_f > 8 and Bp % tile_f:
            tile_f //= 2
        return _score_edits_fused(
            cand, cand_len, sw_p, gp_p, sg_p, blen_p, bmask_p, xgaps,
            pack, Wseg, n_shifts, tile_f, interpret)
    tile, U = picked
    while tile > 8 and Bp % tile:  # grid tiles must divide the batch
        tile //= 2
    nT = -(-(Cb + 2) // U)  # row blocks; storage rows Cbp = nT*U
    Cbp = nT * U

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

    kdims = dict(Cb=Cb, n_shifts=n_shifts, pack=pack, Wseg=Wseg,
                 Rp=Rp, U=U)

    vmem_full = pl.BlockSpec(
        (4, tile, Rp, W), lambda b, t: (0, b, 0, 0),
        memory_space=pltpu.VMEM)
    vmem_brw = pl.BlockSpec(
        (tile, Rp, W), lambda b, t: (b, 0, 0),
        memory_space=pltpu.VMEM)
    # bmask: flat per-branch weights; blen: flat (pack=1) or lane plane
    vmem_br = pl.BlockSpec(
        (tile, bmask_p.shape[1]), lambda b, t: (b, 0),
        memory_space=pltpu.VMEM)
    vmem_blen = vmem_brw if pack > 1 else vmem_br
    vmem_b1 = pl.BlockSpec(
        (tile, 1), lambda b, t: (b, 0), memory_space=pltpu.VMEM)
    # whole per-lane row span in one block (constant over t; columns
    # are indexed dynamically in-kernel)
    vmem_rows = pl.BlockSpec(
        (tile, C1), lambda b, t: (b, 0), memory_space=pltpu.VMEM)

    # ---- phase 1: backward rows, U per grid step, descending ----
    bw = pl.pallas_call(
        functools.partial(_backward_kernel, **kdims),
        grid=(nB, nT),
        in_specs=[
            vmem_full, vmem_brw,
            vmem_rows,                                # cand
            vmem_rows,                                # vgap
            vmem_rows,                                # ds
            vmem_b1, vmem_blen,
        ],
        out_specs=pl.BlockSpec((U, tile, Rp, W),
                               lambda b, t, nT=nT: (nT - 1 - t, b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Cbp, Bp, Rp, W), jnp.float32),
        scratch_shapes=[pltpu.VMEM((tile, Rp, W), jnp.float32)],
        interpret=interpret,
    )(sw_p, sg_p, cand_pad, vgap_pad, ds_pad, clen_p, blen_p)

    # ---- phase 2: forward + scoring, U positions per grid step ----
    b_row = pl.BlockSpec(
        (U, tile, Rp, W), lambda b, t: (t, b, 0, 0),
        memory_space=pltpu.VMEM)

    vmem_rows4 = pl.BlockSpec((4, tile, C1), lambda b, t: (0, b, 0),
                              memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        functools.partial(_forward_score_kernel, **kdims),
        grid=(nB, nT),
        in_specs=[
            vmem_full, vmem_brw, vmem_brw,
            b_row,
            vmem_rows,                                # cand
            vmem_rows,                                # vgap
            vmem_b1, vmem_blen, vmem_br,
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
