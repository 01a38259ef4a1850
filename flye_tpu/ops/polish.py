"""Batched bubble-polishing kernel — the flagship device kernel.

Behavioral port of GeneralPolisher's single-edit hill climbing
(reference: src/polishing/general_polisher.cpp:8-125,
src/polishing/alignment.cpp:17-190) redesigned for TPU:

The reference scores one candidate edit at a time with an O(row) loop
over cached forward/reverse DP matrices, per thread, per bubble.  Here
thousands of bubbles run in lockstep: one lax.scan computes the full
forward and suffix score tensors F, B [C+1, batch, R, S+1] (the row
recurrence's in-row dependency resolved by an associative prefix-max),
and then EVERY deletion / insertion / substitution at every position
scores simultaneously as dense tensor algebra:

    del(p)    = max_j F[p]   + B[p+1]
    ins(p, x) = max_j SUBx[p] + B[p]
    sub(p, x) = max_j SUBx[p] + B[p+1]
    SUBx[p][j] = max(F[p][j-1] + M[x, w_j], F[p][j] + M[x, '-'])

Edit precedence (all deletions, then insertions, then substitutions,
earliest position on ties) matches the reference exactly; one edit is
applied per lane per outer iteration inside a while_loop with per-lane
convergence, like the reference's per-bubble loop.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

NEG = jnp.float32(-1e30)


def _gather_subs(subs, a, b):
    """subs[a, b] with integer arrays a, b (broadcastable)."""
    return subs.reshape(-1)[a * 5 + b]


def _forward_matrix(cand, cand_len, branches, blen, subs):
    """F[i, lane, r, j] = best score of cand[:i] vs branch[:j].

    cand: [B, C] uint8; branches: [B, R, S] uint8. Returns
    [C+1, B, R, S+1] float32. Rows beyond cand_len are garbage (never
    gathered); columns beyond blen never corrupt valid columns because
    the prefix-max only flows left to right.
    """
    Bb, C = cand.shape
    _, R, S = branches.shape
    w = branches.astype(jnp.int32)
    # per-branch tables, fixed across rows
    gap_b = _gather_subs(subs, jnp.int32(4), w)            # [B, R, S]
    jvalid = (jax.lax.broadcasted_iota(jnp.int32, (Bb, R, S), 2)
              < blen[:, :, None])
    gp = jnp.cumsum(jnp.where(jvalid, gap_b, 0.0), axis=2)
    gp = jnp.concatenate([jnp.zeros((Bb, R, 1), jnp.float32), gp], axis=2)
    # match cost for each possible candidate char x: [4, B, R, S]
    sw = jnp.stack([_gather_subs(subs, jnp.int32(x), w) for x in range(4)])

    row0 = gp                                               # [B, R, S+1]
    cchars = cand.astype(jnp.int32)

    # the per-row candidate char selects its match-cost plane from sw via
    # a one-hot contraction (cheap: 4-wide)
    def step(prev, i):
        v = cchars[:, i]                                    # [B]
        vgap = _gather_subs(subs, v, jnp.int32(4))[:, None, None]
        onehot = jax.nn.one_hot(v, 4, dtype=jnp.float32)    # [B, 4]
        match = jnp.einsum("bx,xbrs->brs", onehot, sw)      # [B, R, S]
        tmp_head = prev[:, :, :1] + vgap
        tmp_tail = jnp.maximum(prev[:, :, :-1] + match,
                               prev[:, :, 1:] + vgap)
        tmp = jnp.concatenate([tmp_head, tmp_tail], axis=2)
        # row[j] = max(tmp[j], row[j-1] + gap_b[j]) -> prefix max of
        # (tmp - gp) plus gp
        row = jax.lax.associative_scan(jnp.maximum, tmp - gp, axis=2) + gp
        return row, row

    _, rows = jax.lax.scan(step, row0, jnp.arange(C, dtype=jnp.int32))
    return jnp.concatenate([row0[None], rows], axis=0)      # [C+1, B, R, S+1]


def _reverse_seqs(seqs, lens):
    """Reverse the valid prefix of each row: out[t] = seq[len-1-t]."""
    idx = lens[..., None] - 1 - jax.lax.broadcasted_iota(
        jnp.int32, seqs.shape, seqs.ndim - 1)
    return jnp.take_along_axis(seqs, jnp.clip(idx, 0), axis=-1)


def _suffix_matrix(rev_f, cand_len, blen):
    """B[i][j] = revF[clen - i][blen - j] (suffix alignment scores)."""
    Cp1, Bb, R, Sp1 = rev_f.shape
    rows = jnp.clip(cand_len[None, :] -
                    jnp.arange(Cp1, dtype=jnp.int32)[:, None], 0)
    bmat = jnp.take_along_axis(rev_f, rows[:, :, None, None], axis=0)
    cols = jnp.clip(blen[None, :, :, None] -
                    jnp.arange(Sp1, dtype=jnp.int32)[None, None, None, :], 0)
    return jnp.take_along_axis(bmat, cols, axis=3)


@functools.partial(jax.jit,
                   static_argnames=("max_iters", "block_size"))
def polish_bubbles(cand, cand_len, branches, blen, bmask, subs,
                   max_iters: int, block_size: int = 64):
    """Hill-climb every bubble to convergence.

    Args:
      cand: [B, Cb] uint8 candidate codes (Cb leaves growth headroom).
      cand_len: [B] int32.
      branches: [B, R, S] uint8; blen [B, R] int32; bmask [B, R] bool.
      subs: [5, 5] float32 log-prob matrix.
      max_iters: static outer-iteration cap.
      block_size: edits in different parity-active blocks of this many
        positions apply simultaneously (they are >= block_size apart, so
        their NW score deltas are effectively independent). Pass 0 for
        the reference's strictly serial one-edit-per-iteration semantics.

    Returns (cand [B, Cb], cand_len [B], score [B], iters [B]).
    """
    Bb, Cb = cand.shape
    _, R, S = branches.shape
    subs = subs.astype(jnp.float32)
    bmaskf = bmask.astype(jnp.float32)
    jpos = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, S + 1), 3)
    jmask = jnp.where(jpos <= blen[None, :, :, None], 0.0, NEG)
    ppos_c = jnp.arange(Cb, dtype=jnp.int32)                # edit positions
    ppos_c1 = jnp.arange(Cb + 1, dtype=jnp.int32)
    G = block_size if block_size > 0 else Cb + 1
    nb = -(-(Cb + 1) // G)
    blk_ids = jnp.arange(nb, dtype=jnp.int32)
    streak_needed = 1 if nb == 1 else 2

    def masked_reduce(x, bmat_shifted):
        """max over j then masked sum over branches: x [C*, B, R, S+1]."""
        s = jnp.max(x + bmat_shifted + jmask, axis=3)       # [C*, B, R]
        return jnp.sum(s * bmaskf[None], axis=2)            # [C*, B]

    def body(state):
        cand, cand_len, done, streak, iters, it_count, _ = state
        F = _forward_matrix(cand, cand_len, branches, blen, subs)
        rev_c = _reverse_seqs(cand, cand_len)
        rev_b = _reverse_seqs(branches, blen)
        revF = _forward_matrix(rev_c, cand_len, rev_b, blen, subs)
        Bm = _suffix_matrix(revF, cand_len, blen)

        # current total score: F[clen][blen]
        f_at_len = jnp.take_along_axis(
            F, cand_len[None, :, None, None], axis=0)[0]    # [B, R, S+1]
        cur = jnp.take_along_axis(f_at_len, blen[:, :, None], axis=2)[:, :, 0]
        total = jnp.sum(cur * bmaskf, axis=1)               # [B]

        pvalid_del = jnp.where(ppos_c[:, None] < cand_len[None, :], 0.0, NEG)
        pvalid_ins = jnp.where(
            ppos_c1[:, None] <= cand_len[None, :], 0.0, NEG)

        # deletions: per-position scores
        del_sc = masked_reduce(F[:-1], Bm[1:]) + pvalid_del  # [Cb, B]

        # per-letter SUBx tensors -> per-position best ins/sub + letter
        w = branches.astype(jnp.int32)
        ins_sc = jnp.full((Cb + 1, Bb), NEG)
        ins_chr = jnp.zeros((Cb + 1, Bb), jnp.int32)
        sub_sc = jnp.full((Cb, Bb), NEG)
        sub_chr = jnp.zeros((Cb, Bb), jnp.int32)
        cand_i = cand.astype(jnp.int32)
        for x in range(4):
            mx = _gather_subs(subs, jnp.int32(x), w)        # [B, R, S]
            xgap = subs[x, 4]
            subx = jnp.concatenate(
                [F[:, :, :, :1] + xgap,
                 jnp.maximum(F[:, :, :, :-1] + mx[None],
                             F[:, :, :, 1:] + xgap)], axis=3)
            ins_x = masked_reduce(subx, Bm) + pvalid_ins     # [Cb+1, B]
            better = ins_x > ins_sc
            ins_sc = jnp.where(better, ins_x, ins_sc)
            ins_chr = jnp.where(better, x, ins_chr)

            sub_x = masked_reduce(subx[:-1], Bm[1:]) + pvalid_del
            sub_x = sub_x + jnp.where(cand_i.T == x, NEG, 0.0)  # same letter
            better = sub_x > sub_sc
            sub_sc = jnp.where(better, sub_x, sub_sc)
            sub_chr = jnp.where(better, x, sub_chr)

        # ---- block-parallel edit selection (precedence del > ins > sub
        # per block, earliest position on ties) ----
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
        choose_del = live & (delb_best > thr)
        choose_ins = live & ~choose_del & (insb_best > thr)
        choose_sub = live & ~choose_del & ~choose_ins & (subb_best > thr)

        # buffer-overflow guard: drop a lane's insertions if they would
        # exceed the candidate buffer
        n_del = jnp.sum(choose_del, axis=0).astype(jnp.int32)
        n_ins = jnp.sum(choose_ins, axis=0).astype(jnp.int32)
        overflow = cand_len + n_ins - n_del > Cb
        choose_ins &= ~overflow[None, :]
        n_ins = jnp.sum(choose_ins, axis=0).astype(jnp.int32)

        any_edit = (choose_del | choose_ins | choose_sub).any(axis=0)
        new_streak = jnp.where(any_edit, 0, streak + 1)
        new_done = done | (new_streak >= streak_needed)

        # ---- scatter chosen edits to per-position masks (block
        # positions are disjoint, so no scatter collisions) ----
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
            jnp.take_along_axis(ins_chr, jnp.clip(insb_pos, 0, Cb), axis=0),
            mode="drop")
        sub_char_at = jnp.zeros((Bb, Cb), jnp.int32).at[
            lane, jnp.where(choose_sub, subb_pos, Cb)].max(
            jnp.take_along_axis(sub_chr, jnp.clip(subb_pos, 0, Cb - 1),
                                axis=0),
            mode="drop")

        # ---- apply all edits at once via index remapping ----
        cand_subbed = jnp.where(is_sub, sub_char_at.astype(jnp.uint8), cand)
        dels_cum = jnp.cumsum(is_del.astype(jnp.int32), axis=1)   # dels <= i
        dels_excl = dels_cum - is_del.astype(jnp.int32)           # dels < i
        ins_cum = jnp.cumsum(is_ins.astype(jnp.int32), axis=1)    # ins <= i
        ivec = jax.lax.broadcasted_iota(jnp.int32, (Bb, Cb), 1)
        new_idx_old = ivec - dels_excl + ins_cum[:, :Cb]
        keep = (~is_del) & (ivec < cand_len[:, None])
        out = jnp.zeros((Bb, Cb), jnp.uint8).at[
            jnp.arange(Bb)[:, None],
            jnp.where(keep, new_idx_old, Cb)].set(
            cand_subbed, mode="drop")
        # inserted chars: new index = p - dels(<p) + ins(<=p) - 1
        ivec1 = jax.lax.broadcasted_iota(jnp.int32, (Bb, Cb + 1), 1)
        dels_before = jnp.concatenate(
            [jnp.zeros((Bb, 1), jnp.int32), dels_cum], axis=1)[:, :Cb + 1]
        new_idx_ins = ivec1 - dels_before + ins_cum - 1
        out = out.at[
            jnp.arange(Bb)[:, None],
            jnp.where(is_ins, new_idx_ins, Cb)].set(
            ins_char_at.astype(jnp.uint8), mode="drop")
        new_len = cand_len + n_ins - n_del

        return (out, new_len, new_done, new_streak,
                iters + (~new_done).astype(jnp.int32), it_count + 1, total)

    def cond(state):
        _, _, done, _, iters, _, _ = state
        return (~done.all()) & (iters.max() < max_iters)

    state0 = (cand, cand_len, jnp.zeros((Bb,), bool),
              jnp.zeros((Bb,), jnp.int32), jnp.zeros((Bb,), jnp.int32),
              jnp.int32(0), jnp.zeros((Bb,), jnp.float32))
    cand, cand_len, done, streak, iters, it_count, score = \
        jax.lax.while_loop(cond, body, state0)
    return cand, cand_len, score, iters
