"""Batched bubble-polishing kernel — the flagship device kernel.

Behavioral port of GeneralPolisher's single-edit hill climbing
(reference: src/polishing/general_polisher.cpp:8-125,
src/polishing/alignment.cpp:17-190) redesigned for TPU:

The reference scores one candidate edit at a time with an O(row) loop
over cached forward/reverse DP matrices, per thread, per bubble.  Here
thousands of bubbles run in lockstep: two lax.scans compute the full
prefix (F) and suffix (B) score tensors [C+1, batch, R, S+1] — the
suffix matrix directly via a reverse-order scan, so no per-lane tensor
flips — and then EVERY deletion / insertion / substitution at every
position scores simultaneously as dense tensor algebra:

    del(p)    = max_j F[p]    + B[p+1]
    ins(p, x) = max_j SUBx[p] + B[p]
    sub(p, x) = max_j SUBx[p] + B[p+1]
    SUBx[p][j] = max(F[p][j-1] + M[x, w_j], F[p][j] + M[x, '-'])

TPU performance notes: substitution-matrix lookups are one-hot
contractions (gathers are slow on TPU); all branch-dependent tables are
hoisted out of the convergence loop; the in-row DP dependency resolves
via associative prefix/suffix-max scans.

Edits in different parity-active blocks (>= block_size apart, NW deltas
effectively independent) apply simultaneously, converging in
~2x(max edits per block) iterations; block precedence follows the
reference (del > ins > sub, earliest position on ties). block_size=0
restores the strictly serial reference semantics.
"""

from __future__ import annotations

import contextlib
import functools
import sys

import jax
import jax.numpy as jnp
import numpy as np

NEG = np.float32(-1e30)  # np scalar: no backend init at import


@contextlib.contextmanager
def _deep_recursion(limit: int = 20000):
    """Tracing the U-row-unrolled Pallas kernels nested inside the
    convergence while_loop exceeds CPython's default 1000-frame limit;
    raise it only around those tracing calls (a module-wide raise would
    leak to every package consumer and mask unrelated runaway
    recursion)."""
    old = sys.getrecursionlimit()
    sys.setrecursionlimit(max(old, limit))
    try:
        yield
    finally:
        sys.setrecursionlimit(old)


def _score_edits_raw_jnp(cand, cand_len, branches, blen, bmask, subs):
    """Raw per-character edit scores against all branches — the
    pure-jnp formulation (two lax.scans materializing full F/B
    tensors).

    Returns (total [B], del_raw [Cb,B], ins4 [4,Cb+1,B],
    sub4 [4,Cb,B]) WITHOUT the position-validity or cand!=x masks —
    those are per-lane and applied by _finish_scores, after the
    branch-group reduction (see polish_bubbles): scores are sums of
    per-branch maxima, so groups of branches scored in separate lanes
    sum exactly, but only BEFORE the 4-character argmax."""
    Bb, Cb = cand.shape
    _, R, S = branches.shape
    subs = subs.astype(jnp.float32)
    bmaskf = bmask.astype(jnp.float32)

    # ---- static per-branch tables (hoisted out of the loop) ----
    b1h = jax.nn.one_hot(branches.astype(jnp.int32), 4,
                         dtype=jnp.float32)                 # [B,R,S,4]
    sw = jnp.einsum("brsx,yx->ybrs", b1h, subs[:4, :4])     # [4,B,R,S]
    gap_b = jnp.einsum("brsx,x->brs", b1h, subs[4, :4])     # [B,R,S]
    jpos_s = jax.lax.broadcasted_iota(jnp.int32, (Bb, R, S), 2)
    jvalid = jpos_s < blen[:, :, None]
    gap_bm = jnp.where(jvalid, gap_b, 0.0)
    # gp[j] = cost of inserting branch[0:j] (prefix), [B,R,S+1]
    gp = jnp.concatenate(
        [jnp.zeros((Bb, R, 1), jnp.float32),
         jnp.cumsum(gap_bm, axis=2)], axis=2)
    # sg[j] = cost of inserting branch[j:blen] (suffix)
    sg = gp[:, :, -1:] - gp
    jpos1 = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, S + 1), 3)
    jmask = jnp.where(jpos1 <= blen[None, :, :, None], 0.0, NEG)
    ppos_c = jnp.arange(Cb, dtype=jnp.int32)
    ppos_c1 = jnp.arange(Cb + 1, dtype=jnp.int32)
    ivec_bc = jax.lax.broadcasted_iota(jnp.int32, (Bb, Cb), 1)

    def masked_reduce(x, b_shifted):
        """max over j then masked sum over branches: x [C*, B, R, S+1]."""
        s = jnp.max(x + b_shifted + jmask, axis=3)          # [C*, B, R]
        return jnp.sum(s * bmaskf[None], axis=2)            # [C*, B]

    # On TPU, hoisting all match-cost planes into one big einsum beats
    # a per-step einsum inside the scan body by ~10x; on CPU the
    # materialized [Cb,B,R,S] tensor thrashes cache, so each step
    # contracts its own row there.
    hoist_match = jax.default_backend() != "cpu"

    def _row_match(x):
        if hoist_match:
            return x
        return jnp.einsum("bx,xbrs->brs", x, sw)

    def forward_rows(match_cols, vgap_cols):
        """F[i] rows via forward scan. match_cols [Cb,B,R,S] (hoisted)
        or [Cb,B,4] one-hot columns (CPU), vgap_cols [Cb,B].
        Returns [Cb+1,B,R,S+1]."""
        row0 = gp

        def step(prev, xs):
            match, vg = xs
            match = _row_match(match)                        # [B,R,S]
            vgap = vg[:, None, None]
            tmp = jnp.concatenate(
                [prev[:, :, :1] + vgap,
                 jnp.maximum(prev[:, :, :-1] + match,
                             prev[:, :, 1:] + vgap)], axis=2)
            # row[j] = max(tmp[j], row[j-1] + gap_b[j]):
            # prefix-max of (tmp - gp) plus gp
            row = jax.lax.associative_scan(
                jnp.maximum, tmp - gp, axis=2) + gp
            return row, row

        _, rows = jax.lax.scan(step, row0, (match_cols, vgap_cols))
        return jnp.concatenate([row0[None], rows], axis=0)

    def backward_rows(match_cols, vgap_cols, ds_cols, row_idx):
        """B[i][j] = best score of cand[i:clen] vs branch[j:blen], via a
        reverse scan — no per-lane flips. ds_cols [Cb,B] = candidate
        suffix deletion cost per row; row_idx [Cb] row numbers.
        Returns [Cb+1,B,R,S+1]."""
        # base row at i >= clen: insert the whole branch suffix
        # (sg[j>=blen] is already 0 because padded gap costs are masked)
        base_row = sg

        def step(nxt, xs):
            match, vg, dsi, i = xs
            match = _row_match(match)
            vgap = vg[:, None, None]
            # tmp[j] = max(B[i+1][j+1] + M(v,w_j), B[i+1][j] + M(v,'-'))
            diag = jnp.where(jpos_s < blen[:, :, None],
                             nxt[:, :, 1:] + match, NEG)
            tmp = jnp.concatenate(
                [jnp.maximum(diag, nxt[:, :, :-1] + vgap),
                 nxt[:, :, -1:] + vgap], axis=2)
            tmp = jnp.where(jpos1[0] <= blen[:, :, None], tmp, NEG)
            # row[j] = max(tmp[j], row[j+1] + gap_b[j]):
            # row = sg + suffix-max(tmp - sg)
            row = jax.lax.associative_scan(
                jnp.maximum, tmp - sg, axis=2, reverse=True) + sg
            # lanes where this row is out of range keep the base row;
            # columns beyond blen carry the cand-suffix deletion cost
            in_range = (i < cand_len)[:, None, None]
            row = jnp.where(in_range, row, base_row)
            row = jnp.where(jpos1[0] <= blen[:, :, None], row,
                            dsi[:, None, None])
            return row, row

        _, rows = jax.lax.scan(
            step, base_row,
            (match_cols, vgap_cols, ds_cols, row_idx), reverse=True)
        # rows[i] = B[i] for i in 0..Cb-1; append B[Cb] = base
        return jnp.concatenate([rows, base_row[None]], axis=0)

    c1h = jax.nn.one_hot(cand.astype(jnp.int32), 4,
                         dtype=jnp.float32)                  # [B,Cb,4]
    vgap_all = jnp.einsum("bcx,x->bc", c1h, subs[:4, 4])     # [B,Cb]
    live_c = ivec_bc < cand_len[:, None]
    vgap_m = jnp.where(live_c, vgap_all, 0.0)
    # ds[i] = cost of deleting cand[i:clen], [B, Cb+1]
    csum = jnp.cumsum(vgap_m, axis=1)
    ds = jnp.concatenate(
        [jnp.zeros((Bb, 1), jnp.float32), csum], axis=1)
    ds = csum[:, -1:] - ds

    if hoist_match:
        match_cols = jnp.einsum("bcx,xbrs->cbrs", c1h, sw)
    else:
        match_cols = jnp.moveaxis(c1h, 0, 1)                 # [Cb,B,4]
    vgap_cols = vgap_m.T                                     # [Cb,B]
    F = forward_rows(match_cols, vgap_cols)
    Bm = backward_rows(match_cols, vgap_cols, ds[:, :Cb].T,
                       jnp.arange(Cb, dtype=jnp.int32))

    # current total score = B[0][0]
    total = jnp.sum(Bm[0, :, :, 0] * bmaskf, axis=1)         # [B]

    del_raw = masked_reduce(F[:-1], Bm[1:])                  # [Cb, B]

    ins4, sub4 = [], []
    for x in range(4):
        mx = sw[x]                                           # [B,R,S]
        xgap = subs[x, 4]
        subx = jnp.concatenate(
            [F[:, :, :, :1] + xgap,
             jnp.maximum(F[:, :, :, :-1] + mx[None],
                         F[:, :, :, 1:] + xgap)], axis=3)
        ins4.append(masked_reduce(subx, Bm))                 # [Cb+1, B]
        sub4.append(masked_reduce(subx[:-1], Bm[1:]))        # [Cb, B]
    return total, del_raw, jnp.stack(ins4), jnp.stack(sub4)


def _finish_scores(cand, cand_len, total, del_raw, ins4, sub4,
                   groups: int):
    """Reduce raw per-char planes over branch groups, then apply the
    per-lane masks and the 4-char argmax (earliest char wins ties,
    matching the reference's scan order).

    Raw inputs have Bg = B*groups lanes (lane b*groups+j holds group j
    of bubble b); outputs have B lanes."""
    if groups > 1:
        Bg = total.shape[0]
        B = Bg // groups

        def red(a):  # [..., Bg] -> [..., B]
            return a.reshape(*a.shape[:-1], B, groups).sum(axis=-1)

        total, del_raw = red(total), red(del_raw)
        ins4, sub4 = red(ins4), red(sub4)
    Cb = del_raw.shape[0]
    Bb = total.shape[0]
    ppos_c = jnp.arange(Cb, dtype=jnp.int32)
    ppos_c1 = jnp.arange(Cb + 1, dtype=jnp.int32)
    pvalid_del = jnp.where(ppos_c[:, None] < cand_len[None, :],
                           0.0, NEG)
    pvalid_ins = jnp.where(ppos_c1[:, None] <= cand_len[None, :],
                           0.0, NEG)
    del_sc = del_raw + pvalid_del
    ins_all = ins4 + pvalid_ins[None]                        # [4,Cb+1,B]
    cand_t = cand.astype(jnp.int32).T                        # [Cb, B]
    xs = jnp.arange(4, dtype=jnp.int32)[:, None, None]
    sub_all = (sub4 + pvalid_del[None]
               + jnp.where(cand_t[None] == xs, NEG, 0.0))
    ins_chr = jnp.argmax(ins_all, axis=0).astype(jnp.int32)
    ins_sc = jnp.max(ins_all, axis=0)
    sub_chr = jnp.argmax(sub_all, axis=0).astype(jnp.int32)
    sub_sc = jnp.max(sub_all, axis=0)
    return total, del_sc, ins_sc, ins_chr, sub_sc, sub_chr


def _score_edits_jnp(cand, cand_len, branches, blen, bmask, subs):
    """Score every single-base edit against all branches.

    Returns (total [B], del_sc [Cb,B], ins_sc [Cb+1,B], ins_chr,
    sub_sc [Cb,B], sub_chr)."""
    raw = _score_edits_raw_jnp(cand, cand_len, branches, blen, bmask,
                               subs)
    return _finish_scores(cand, cand_len, *raw, groups=1)


def _polish_step(cand, cand_len, done, streak, it_count,
                 branches, blen, bmask, subs, block_size: int = 64,
                 steepest: bool = True, use_pallas: bool = False,
                 prep=None, groups: int = 1):
    """One hill-climbing step over the whole batch (the convergence
    loop is driven from the host — a lax.while_loop formulation
    miscompiled the loop-carried suffix scan on this JAX version, and
    host stepping also gives early exit).  Scoring runs either as the
    jnp scans or the fused Pallas kernels (TPU); edit selection and the
    candidate rebuild are a separate jitted stage.

    groups > 1: branches/blen/bmask carry B*groups lanes of <=8
    branches each (see polish_bubbles); raw scores reduce over groups
    inside _select_apply before the char argmax."""
    if groups > 1:
        cand_s, clen_s = _expand_lanes(cand, cand_len, groups=groups)
    else:
        cand_s, clen_s = cand, cand_len
    if use_pallas:
        from flye_tpu.ops.polish_pallas import score_edits_pallas_raw
        raw = score_edits_pallas_raw(cand_s, clen_s, branches, blen,
                                     bmask, subs, prep=prep)
    else:
        raw = _score_raw_jit(cand_s, clen_s, branches, blen, bmask,
                             subs)
    return _select_apply(cand, cand_len, done, streak, it_count,
                         *raw, groups=groups, block_size=block_size,
                         steepest=steepest)


_score_raw_jit = jax.jit(_score_edits_raw_jnp)


def _converge_loop(cand, cand_len, subs, prep, pack: int, Wseg: int,
                   groups: int, block_size: int, steepest: bool,
                   max_iters: int):
    """The whole hill climb as ONE device program: a lax.while_loop
    over (Pallas scoring -> edit selection) with an all-lanes-done exit.

    The host loop it replaces polled convergence every few iterations;
    on a deployment where the chip sits behind a high-latency tunnel
    each poll is a ~0.4 s blocking round trip, which dominated polish
    wall time for medium batches.  One dispatch + one final fetch per
    bucket batch removes that entirely.  (The jnp scoring path keeps
    the host loop: a loop-carried suffix scan miscompiled under
    while_loop on this JAX version; the Pallas kernels don't carry that
    construct.)"""
    from flye_tpu.ops.polish_pallas import _score_edits_pallas
    B = cand.shape[0]

    def cond(state):
        it = state[0]
        return (it < max_iters) & ~jnp.all(state[3])

    def body(state):
        it, cand, cand_len, done, streak, score, iters = state
        if groups > 1:
            cand_s = jnp.repeat(cand, groups, axis=0)
            clen_s = jnp.repeat(cand_len, groups, axis=0)
        else:
            cand_s, clen_s = cand, cand_len
        raw = _score_edits_pallas(cand_s.astype(jnp.int32), clen_s,
                                  subs, *prep, pack=pack, Wseg=Wseg)
        ncand, nlen, ndone, nstreak, total = _select_apply(
            cand, cand_len, done, streak, it, *raw, groups=groups,
            block_size=block_size, steepest=steepest)
        iters = jnp.where(done, iters, it + 1)
        return (it + 1, ncand, nlen, ndone, nstreak, total, iters)

    state = (jnp.int32(0), cand, cand_len,
             jnp.zeros((B,), bool), jnp.zeros((B,), jnp.int32),
             jnp.zeros((B,), jnp.float32), jnp.zeros((B,), jnp.int32))
    state = jax.lax.while_loop(cond, body, state)
    return state[1], state[2], state[5], state[6]


@functools.partial(
    jax.jit, static_argnames=("pack", "Wseg", "groups", "block_size",
                              "steepest", "max_iters"))
def _converge_pallas(cand, cand_len, done, streak, score, iters, subs,
                     prep, pack: int, Wseg: int, groups: int,
                     block_size: int, steepest: bool, max_iters: int):
    """Unpacked-argument entry (mesh-sharded batches keep this path;
    done/streak/score/iters are accepted for sharding-layout parity but
    re-derived inside)."""
    del done, streak, score, iters
    return _converge_loop(cand, cand_len, subs, tuple(prep), pack,
                          Wseg, groups, block_size, steepest, max_iters)


def _pack_2bit(a: "np.ndarray") -> "np.ndarray":
    """[..., L] u8 codes (0..3) -> [..., ceil(L/4)] packed u8."""
    L = a.shape[-1]
    pad = (-L) % 4
    if pad:
        a = np.concatenate(
            [a, np.zeros((*a.shape[:-1], pad), np.uint8)], axis=-1)
    a = a.reshape(*a.shape[:-1], -1, 4).astype(np.uint8)
    return (a[..., 0] | (a[..., 1] << 2) | (a[..., 2] << 4)
            | (a[..., 3] << 6)).astype(np.uint8)


def _unpack_2bit(p, L: int):
    """packed [..., P] u8 -> [..., L] int32 codes (device)."""
    shifts = jnp.array([0, 2, 4, 6], jnp.int32)
    x = (p[..., :, None].astype(jnp.int32) >> shifts) & 3
    return x.reshape(*p.shape[:-1], p.shape[-1] * 4)[..., :L]


def _pack_polish_inputs(cand, cand_len, branches, blen, bmask):
    """One flat uint8 buffer: 2-bit cand + 2-bit branches + raw
    clen/blen int32 bytes + bmask bytes.  A single host->device
    transfer replaces ~8 per batch (each blocking transfer costs a
    tunnel round trip on this deployment, and 2-bit packing cuts the
    dominant branch payload 4x)."""
    parts = [
        _pack_2bit(np.asarray(cand, np.uint8)).ravel(),
        _pack_2bit(np.asarray(branches, np.uint8)).ravel(),
        np.ascontiguousarray(cand_len, np.int32).view(np.uint8),
        np.ascontiguousarray(blen, np.int32).view(np.uint8).ravel(),
        np.asarray(bmask, np.uint8).ravel(),
    ]
    return np.concatenate(parts)


@functools.partial(
    jax.jit, static_argnames=("B", "Bg", "Cb", "R", "S", "pack",
                              "Wseg", "groups", "block_size",
                              "steepest", "max_iters"))
def _converge_pallas_packed(buf, subs, B: int, Bg: int, Cb: int,
                            R: int, S: int, pack: int, Wseg: int,
                            groups: int, block_size: int,
                            steepest: bool, max_iters: int):
    """Single-transfer entry: unpack the flat buffer on device, build
    the branch tables, and run the convergence while_loop — one
    dispatch, one input transfer, one output fetch per bucket batch."""
    from flye_tpu.ops.polish_pallas import _prepare_branches
    nc4, ns4 = -(-Cb // 4), -(-S // 4)
    o = 0
    cand2 = buf[o:o + B * nc4].reshape(B, nc4)
    o += B * nc4
    br2 = buf[o:o + Bg * R * ns4].reshape(Bg, R, ns4)
    o += Bg * R * ns4
    clen = jax.lax.bitcast_convert_type(
        buf[o:o + 4 * B].reshape(B, 4), jnp.int32).reshape(B)
    o += 4 * B
    blen = jax.lax.bitcast_convert_type(
        buf[o:o + 4 * Bg * R].reshape(Bg, R, 4),
        jnp.int32).reshape(Bg, R)
    o += 4 * Bg * R
    bmask = buf[o:o + Bg * R].reshape(Bg, R) != 0

    cand = _unpack_2bit(cand2, Cb).astype(jnp.uint8)
    branches = _unpack_2bit(br2, S)
    prep = _prepare_branches(branches, blen, bmask,
                             subs.astype(jnp.float32))
    return _converge_loop(cand, clen, subs, prep, pack, Wseg, groups,
                          block_size, steepest, max_iters)


@functools.partial(jax.jit, static_argnames=("groups",))
def _expand_lanes(cand, cand_len, groups: int):
    return (jnp.repeat(cand, groups, axis=0),
            jnp.repeat(cand_len, groups, axis=0))


@functools.partial(jax.jit,
                   static_argnames=("groups", "block_size", "steepest"))
def _select_apply(cand, cand_len, done, streak, it_count,
                  total, del_raw, ins4, sub4, groups: int = 1,
                  block_size: int = 64, steepest: bool = True):
    (total, del_sc, ins_sc, ins_chr, sub_sc,
     sub_chr) = _finish_scores(cand, cand_len, total, del_raw, ins4,
                               sub4, groups)
    Bb, Cb = cand.shape
    G = block_size if block_size > 0 else Cb + 1
    nb = -(-(Cb + 1) // G)
    blk_ids = jnp.arange(nb, dtype=jnp.int32)
    streak_needed = 1 if nb == 1 else 2
    ivec_bc = jax.lax.broadcasted_iota(jnp.int32, (Bb, Cb), 1)
    live_c = ivec_bc < cand_len[:, None]

    def body(cand, cand_len, done, streak, it_count):
        # ---- block-parallel edit selection ----
        def to_blocks(arr, rows):
            pad = nb * G - rows
            a = jnp.concatenate([arr, jnp.full((pad, Bb), NEG)], axis=0)
            return a.reshape(nb, G, Bb)

        def blk_pick(b):
            best = jnp.max(b, axis=1)                        # [nb, B]
            pos = (jnp.argmax(b, axis=1).astype(jnp.int32) +
                   blk_ids[:, None] * G)
            return best, pos

        delb_best, delb_pos = blk_pick(to_blocks(del_sc, Cb))
        insb_best, insb_pos = blk_pick(to_blocks(ins_sc, Cb + 1))
        subb_best, subb_pos = blk_pick(to_blocks(sub_sc, Cb))

        eps = jnp.float32(1e-3)
        thr = total[None, :] + eps
        active = ((blk_ids % 2) == (it_count % 2)) | (nb == 1)
        live = active[:, None] & ~done[None, :]
        if steepest:
            # steepest ascent: best-scoring edit type per block (fixes a
            # substitution in one step instead of the reference's
            # del-then-ins dance; same or better local optima)
            best3 = jnp.maximum(jnp.maximum(delb_best, insb_best),
                                subb_best)
            improving = live & (best3 > thr)
            choose_del = improving & (delb_best >= best3)
            choose_ins = improving & ~choose_del & (insb_best >= best3)
            choose_sub = improving & ~choose_del & ~choose_ins
        else:
            # reference precedence: all deletions, then insertions,
            # then substitutions (general_polisher.cpp:70-125)
            choose_del = live & (delb_best > thr)
            choose_ins = live & ~choose_del & (insb_best > thr)
            choose_sub = live & ~choose_del & ~choose_ins & \
                (subb_best > thr)

        n_del = jnp.sum(choose_del, axis=0).astype(jnp.int32)
        n_ins = jnp.sum(choose_ins, axis=0).astype(jnp.int32)
        overflow = cand_len + n_ins - n_del > Cb
        choose_ins &= ~overflow[None, :]
        n_ins = jnp.sum(choose_ins, axis=0).astype(jnp.int32)

        any_edit = (choose_del | choose_ins | choose_sub).any(axis=0)
        new_streak = jnp.where(any_edit, 0, streak + 1)
        new_done = done | (new_streak >= streak_needed)

        # ---- scatter chosen edits to per-position masks ----
        lane = jnp.arange(Bb)[None, :].repeat(nb, 0)         # [nb, B]
        is_del = jnp.zeros((Bb, Cb), bool).at[
            lane, jnp.where(choose_del, delb_pos, Cb)].max(
            choose_del, mode="drop")
        is_ins = jnp.zeros((Bb, Cb + 1), bool).at[
            lane, jnp.where(choose_ins, insb_pos, Cb + 1)].max(
            choose_ins, mode="drop")
        is_sub = jnp.zeros((Bb, Cb), bool).at[
            lane, jnp.where(choose_sub, subb_pos, Cb)].max(
            choose_sub, mode="drop")
        ins_char_at = jnp.zeros((Bb, Cb + 1), jnp.int32).at[
            lane, jnp.where(choose_ins, insb_pos, Cb + 1)].max(
            jnp.take_along_axis(ins_chr, jnp.clip(insb_pos, 0, Cb),
                                axis=0),
            mode="drop")
        sub_char_at = jnp.zeros((Bb, Cb), jnp.int32).at[
            lane, jnp.where(choose_sub, subb_pos, Cb)].max(
            jnp.take_along_axis(sub_chr, jnp.clip(subb_pos, 0, Cb - 1),
                                axis=0),
            mode="drop")

        # ---- apply all edits at once, scatter-free ----
        # TPU scatters serialize per element, so the rebuild uses
        # bounded shifted-copy selects instead: each position moves by
        # at most nb slots (one ins/del per active block), so the new
        # candidate is a select over 2*nb+1 rolled copies.
        cand_subbed = jnp.where(is_sub, sub_char_at.astype(jnp.uint8),
                                cand)
        dels_cum = jnp.cumsum(is_del.astype(jnp.int32), axis=1)
        dels_excl = dels_cum - is_del.astype(jnp.int32)
        ins_cum = jnp.cumsum(is_ins.astype(jnp.int32), axis=1)
        W = Cb + 1
        ivec1 = jax.lax.broadcasted_iota(jnp.int32, (Bb, W), 1)
        # old chars: position i moves to i + shift_old[i]
        shift_old = ins_cum[:, :Cb] - dels_excl
        keep = (~is_del) & live_c
        # inserted chars: char at insert-slot p lands at p + shift_ins[p]
        dels_before = jnp.concatenate(
            [jnp.zeros((Bb, 1), jnp.int32), dels_cum], axis=1)[:, :W]
        shift_ins = ins_cum - dels_before - 1

        def pad_w(a, fill):
            return jnp.concatenate(
                [a, jnp.full((Bb, W - a.shape[1]), fill, a.dtype)], axis=1)

        cs_pad = pad_w(cand_subbed, jnp.uint8(0))
        keep_pad = pad_w(keep, False)
        shift_old_pad = pad_w(shift_old, jnp.int32(0))
        out = jnp.zeros((Bb, W), jnp.uint8)
        smax = min(nb, W - 1)
        for s in range(-smax, smax + 1):
            m_old = keep_pad & (shift_old_pad == s)
            m_ins = is_ins & (shift_ins == s)
            if s == 0:
                out = jnp.where(m_old, cs_pad, out)
                out = jnp.where(m_ins, ins_char_at.astype(jnp.uint8), out)
                continue
            dst_ok = (ivec1 >= s) if s > 0 else (ivec1 < W + s)
            out = jnp.where(
                jnp.roll(m_old, s, axis=1) & dst_ok,
                jnp.roll(cs_pad, s, axis=1), out)
            out = jnp.where(
                jnp.roll(m_ins, s, axis=1) & dst_ok,
                jnp.roll(ins_char_at, s, axis=1).astype(jnp.uint8), out)
        out = out[:, :Cb]
        new_len = cand_len + n_ins - n_del

        return out, new_len, new_done, new_streak, total

    return body(cand, cand_len, done, streak, it_count)


def _polish_bubbles_native(cand, cand_len, branches, blen, bmask, subs,
                           max_iters: int, eps: float = 1e-3):
    """CPU fallback through flye_native.polish_bubbles_host; None when
    the native module is unavailable."""
    import numpy as np

    from flye_tpu import native
    mod = native.get()
    if mod is None or not hasattr(mod, "polish_bubbles_host"):
        return None
    cand = np.ascontiguousarray(cand, dtype=np.uint8)
    Bn, Cb = cand.shape
    _, R, S = branches.shape
    out = mod.polish_bubbles_host(
        cand.tobytes(),
        np.ascontiguousarray(cand_len, np.int32).tobytes(),
        np.ascontiguousarray(branches, np.uint8).tobytes(),
        np.ascontiguousarray(blen, np.int32).tobytes(),
        np.ascontiguousarray(bmask, np.uint8).tobytes(),
        np.ascontiguousarray(subs, np.float32).tobytes(),
        Bn, Cb, R, S, int(max_iters), float(eps))
    cand_b, len_b, score_b, iters_b = out
    return (np.frombuffer(cand_b, np.uint8).reshape(Bn, Cb),
            np.frombuffer(len_b, np.int32),
            np.frombuffer(score_b, np.float32),
            np.frombuffer(iters_b, np.int32))


def polish_bubbles(cand, cand_len, branches, blen, bmask, subs,
                   max_iters: int, block_size: int = 64,
                   steepest: bool = True, use_pallas=None):
    """Hill-climb every bubble to convergence.

    Args:
      cand: [B, Cb] uint8 candidate codes (Cb leaves growth headroom).
      cand_len: [B] int32.
      branches: [B, R, S] uint8; blen [B, R] int32; bmask [B, R] bool.
      subs: [5, 5] float32 log-prob matrix.
      max_iters: outer-iteration cap.
      block_size: parallel-edit block width (0 = serial reference mode).

    Returns (cand [B, Cb], cand_len [B], score [B], iters [B]).
    """
    import numpy as np

    # CPU backend: the threaded native (C++) hill climber replaces the
    # jnp scan formulation, which rescans the full F/B tensors every
    # iteration and runs ~100x slower than the reference's threaded C++
    # on CPU.  Only engaged when the caller didn't pin a path
    # (use_pallas=None), so kernel-equivalence tests still exercise the
    # jnp program.
    if use_pallas is None and jax.default_backend() == "cpu":
        native_out = _polish_bubbles_native(cand, cand_len, branches,
                                            blen, bmask, subs, max_iters)
        if native_out is not None:
            return native_out

    # Branch-group tiling: buckets with many branches split into lanes
    # of <=8 branch ROWS (score sums over branches decompose exactly;
    # the char argmax happens after the group reduction in
    # _select_apply).  This keeps the Pallas working set at Rp=8
    # regardless of branch count — without it, 32/56-branch buckets
    # fell off the VMEM path onto the jnp formulation whose HBM
    # footprint forced batch size 1 (observed 877 single-bubble kernel
    # calls on an E. coli run).  When the Pallas kernels pack 2 or 4
    # short branches per 128-lane row (polish_pallas.pack_for), a group
    # carries 8*pack branches so each group still fills exactly 8 rows
    # — halving/quartering the number of group-lanes for the dominant
    # fine-bubble shapes.  The VMEM check runs BEFORE group sizing so a
    # shape that falls back to the jnp path keeps 8-branch groups (a
    # packed 16/32-branch group would inflate the jnp footprint beyond
    # _max_batch's model).
    R, S = branches.shape[1], branches.shape[2]
    maybe_pallas = (jax.default_backend() == "tpu" if use_pallas is None
                    else bool(use_pallas))
    gsz = 8
    if maybe_pallas:
        from flye_tpu.ops.polish_pallas import fits_vmem, pack_for
        gsz_p = 8 * pack_for(S)
        if fits_vmem(min(R, gsz_p), S, cand.shape[1]):
            gsz = gsz_p
        else:
            maybe_pallas = False
    groups = max(1, -(-R // gsz)) if R > gsz else 1
    if groups > 1:
        B0 = branches.shape[0]
        pad_r = groups * gsz - R
        branches = np.pad(np.asarray(branches),
                          ((0, 0), (0, pad_r), (0, 0)))
        blen = np.pad(np.asarray(blen), ((0, 0), (0, pad_r)))
        bmask = np.pad(np.asarray(bmask), ((0, 0), (0, pad_r)))
        branches = branches.reshape(B0 * groups, gsz, S)
        blen = blen.reshape(B0 * groups, gsz)
        bmask = bmask.reshape(B0 * groups, gsz)

    if use_pallas is None:
        # the fused Pallas scoring path is the TPU default
        use_pallas = jax.default_backend() == "tpu"
    if use_pallas:
        # buckets too large for VMEM (very long windows) take the
        # jnp/XLA scoring path instead
        from flye_tpu.ops.polish_pallas import fits_vmem
        use_pallas = fits_vmem(branches.shape[1], branches.shape[2],
                               cand.shape[1])
    import os

    from flye_tpu.parallel.runtime import get_runtime
    rt = get_runtime()
    Bb = cand.shape[0]
    if (use_pallas and not rt.active
            and not os.environ.get("FLYE_TPU_HOST_POLL")):
        # single-device fast path: 2-bit-packed single-buffer transfer
        # + the whole convergence loop on-device.  One host->device
        # transfer, one dispatch, one fetch per bucket batch (each
        # separate transfer costs a tunnel round trip here; the
        # mesh-sharded path below keeps per-array placement).
        from flye_tpu.ops.polish_pallas import _kernel_dims
        pack, Wseg, _, _ = _kernel_dims(branches.shape[1],
                                        branches.shape[2])
        buf = _pack_polish_inputs(cand, cand_len, branches, blen,
                                  bmask)
        with jax.enable_x64(False), _deep_recursion():
            # (64-bit doesn't lower in Mosaic)
            out = _converge_pallas_packed(
                jnp.asarray(buf), jnp.asarray(subs, jnp.float32),
                B=Bb, Bg=branches.shape[0], Cb=cand.shape[1],
                R=branches.shape[1], S=branches.shape[2], pack=pack,
                Wseg=Wseg, groups=groups, block_size=block_size,
                steepest=steepest, max_iters=max_iters)
        return out

    prep = None
    if use_pallas:
        from flye_tpu.ops.polish_pallas import prepare_branches_pallas
        prep = prepare_branches_pallas(branches, blen, bmask, subs)
    # bubble batch axis sharded over the runtime mesh — the polish phase
    # is embarrassingly parallel over windows (the reference runs it as
    # N worker threads, bubble_processor.h:29); XLA partitions the
    # jitted step across devices, no collectives needed
    done = rt.shard_rows(np.zeros((Bb,), bool))
    streak = rt.shard_rows(np.zeros((Bb,), np.int32))
    score = rt.shard_rows(np.zeros((Bb,), np.float32))
    cand = rt.shard_rows(np.asarray(cand))
    cand_len = rt.shard_rows(np.asarray(cand_len, np.int32))
    branches = rt.shard_rows(np.asarray(branches))
    blen = rt.shard_rows(np.asarray(blen, np.int32))
    bmask = rt.shard_rows(np.asarray(bmask))
    subs = jnp.asarray(subs, jnp.float32)

    if use_pallas and not os.environ.get("FLYE_TPU_HOST_POLL"):
        # mesh-sharded batches: whole convergence loop on-device with
        # per-array placement (shard_rows above)
        from flye_tpu.ops.polish_pallas import _kernel_dims
        pack, Wseg, _, _ = _kernel_dims(branches.shape[1],
                                        branches.shape[2])
        iters0 = rt.shard_rows(np.zeros(Bb, np.int32))
        with jax.enable_x64(False), _deep_recursion():
            # (64-bit scalars don't lower in Mosaic)
            cand, cand_len, score, iters = _converge_pallas(
                cand, cand_len, done, streak, score, iters0, subs,
                tuple(prep), pack=pack, Wseg=Wseg, groups=groups,
                block_size=block_size, steepest=steepest,
                max_iters=max_iters)
        return cand, cand_len, score, iters

    iters = np.zeros(Bb, np.int64)
    # convergence is polled every poll_every iterations: each poll is a
    # blocking device->host sync (~0.4 s RTT on the tunnel), while
    # un-polled steps pipeline freely (converged lanes are frozen by
    # their done flag either way).  Any device backend polls sparsely;
    # the CPU jnp path is synchronous anyway.
    poll_every = 1 if jax.default_backend() == "cpu" else 4
    for it in range(max_iters):
        cand, cand_len, done, streak, score = _polish_step(
            cand, cand_len, done, streak, jnp.int32(it),
            branches, blen, bmask, subs, block_size=block_size,
            steepest=steepest, use_pallas=bool(use_pallas), prep=prep,
            groups=groups)
        if (it + 1) % poll_every == 0 or it == max_iters - 1:
            done_h = np.asarray(done)
            iters = np.where(done_h, iters, it + 1)
            if done_h.all():
                break
    return cand, cand_len, score, jnp.asarray(iters.astype(np.int32))
