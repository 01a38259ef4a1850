"""Pallas TPU kernel for the seed-chaining DP.

Same recurrence as ops/chain.chain_dp (reference:
src/sequence/overlap.cpp:277-323) but laid out for the TPU memory
system: the match axis M goes on *sublanes* and the batch axis T on
*lanes*, so the lookback-window read is a dynamic sublane slice out of
VMEM instead of an unaligned lane slice.  Columns are processed 8 at a
time (one sublane tile): each outer iteration does a single 8-aligned
window read, runs 8 unrolled DP steps with the freshly computed scores
folded into the window in registers, and stores the 8 results with one
aligned write — no per-step relayouts, no HBM round trips.  M is
streamed in chunks with the last L rows carried between chunks, so
arbitrarily long match lists run in bounded VMEM.

The lax.scan formulation in ops/chain.py round-trips the score carry
through per-step dynamic_update_slice relayouts (~2.4 Gcells/s on a
v5e); this kernel keeps the whole DP state on-chip.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG = -(2 ** 30)
_TB = 128    # batch rows per grid program (lane dim)
# Match-axis chunk length (sublane dim).  VMEM stack per program is
# in+out double-buffered blocks (4 x Mc x 128 x 4B x 2) plus 3 carry
# scratches ((L+Mc) x 128 x 4B): at Mc=2048 with the engine's L=1024
# lookback this tops the 16 MB scoped-vmem limit on v5e (observed
# 17.1M); Mc=1024 bounds it at ~7.3 MB for any L <= 1024.
_MC = 1024
_U = 8       # columns per unrolled block (one sublane tile)


def _ceil8(x: int) -> int:
    return -(-x // _U) * _U


def _make_kernel(k: int, max_jump: int, L0: int, L: int, Mc: int):
    """L0: requested lookback; L: L0 rounded up to a sublane tile."""

    def kernel(curb, extb, score_out, parent_out, curs, exts, scs):
        m = pl.program_id(1)
        TB = curb.shape[1]

        @pl.when(m == 0)
        def _():
            curs[0:L, :] = jnp.full((L, TB), _NEG, jnp.int32)
            exts[0:L, :] = jnp.full((L, TB), _NEG, jnp.int32)
            scs[0:L, :] = jnp.full((L, TB), k, jnp.int32)

        @pl.when(m != 0)
        def _():
            # carry the trailing L columns of the previous chunk
            curs[0:L, :] = curs[Mc:Mc + L, :]
            exts[0:L, :] = exts[Mc:Mc + L, :]
            scs[0:L, :] = scs[Mc:Mc + L, :]

        curs[L:L + Mc, :] = curb[:]
        exts[L:L + Mc, :] = extb[:]

        W = L + _U
        io = jax.lax.broadcasted_iota(jnp.int32, (W, TB), 0)

        def block(b, _):
            base = pl.multiple_of(b * _U, _U)
            # one aligned window read serves all 8 columns of the block:
            # for column s, predecessors live at window rows [s, s+L)
            curw = curs[pl.ds(base, W), :]
            extw = exts[pl.ds(base, W), :]
            scw = scs[pl.ds(base, W), :]
            news, newp = [], []
            for s in range(_U):
                curn = curw[L + s, :][None, :]           # [1, TB]
                extn = extw[L + s, :][None, :]
                dcur = curn - curw
                dext = extn - extw
                ok = ((dcur > 0) & (dcur < max_jump)
                      & (dext > 0) & (dext < max_jump))
                valid = (io >= s + (L - L0)) & (io < s + L)
                mt = jnp.minimum(jnp.minimum(dcur, dext), k)
                jd = jnp.abs(dcur - dext)
                gap = jnp.where(jd > 100, 2 * jd, jd // 2)
                cand = jnp.where(ok & valid, scw + mt - gap, _NEG)
                best = jnp.max(cand, axis=0)                     # [TB]
                # latest predecessor wins ties (matches ops/chain.py)
                bidx = jnp.max(jnp.where(cand == best[None, :], io, -1),
                               axis=0)
                g = m * Mc + base + s              # global match index
                newscore = jnp.maximum(best, k)
                parent = jnp.where(best > k, m * Mc + base + bidx - L,
                                   -1)
                newscore = jnp.where(g == 0, k, newscore)
                parent = jnp.where(g == 0, -1, parent)
                # fold the fresh score into the register-resident window
                scw = jnp.where(io == L + s, newscore[None, :], scw)
                news.append(newscore)
                newp.append(parent)
            ns = jnp.stack(news, axis=0)                     # [U, TB]
            ps = jnp.stack(newp, axis=0)
            scs[pl.ds(base + L, _U), :] = ns
            score_out[pl.ds(base, _U), :] = ns
            parent_out[pl.ds(base, _U), :] = ps
            return 0

        jax.lax.fori_loop(0, Mc // _U, block, 0)

    return kernel


def chain_dp_pallas(cur, ext, nvalid, k, max_jump, lookback,
                    interpret: bool = False, mc: int = _MC):
    """Drop-in replacement for ops/chain.chain_dp on TPU.

    Runs with x64 disabled (Mosaic cannot lower 64-bit converts).
    """
    with jax.enable_x64(False):
        return _chain_dp_pallas(
            jnp.asarray(cur, jnp.int32), jnp.asarray(ext, jnp.int32),
            jnp.asarray(nvalid, jnp.int32), k=int(k),
            max_jump=int(max_jump), lookback=int(lookback),
            interpret=bool(interpret), mc=int(mc))


@functools.partial(jax.jit, static_argnames=(
    "k", "max_jump", "lookback", "interpret", "mc"))
def _chain_dp_pallas(cur, ext, nvalid, k, max_jump, lookback,
                     interpret=False, mc=_MC):
    T, M = cur.shape
    L0 = min(lookback, M)
    L = _ceil8(L0)
    Mc = max(_ceil8(min(mc, M)), L)
    Mp = -(-M // Mc) * Mc
    idx = jax.lax.broadcasted_iota(jnp.int32, (T, M), 1)
    live = idx < nvalid[:, None]
    curm = jnp.where(live, cur, _NEG)
    extm = jnp.where(live, ext, _NEG)

    pad_t = (-T) % _TB
    curT = jnp.pad(curm.T, ((0, Mp - M), (0, pad_t)),
                   constant_values=_NEG)
    extT = jnp.pad(extm.T, ((0, Mp - M), (0, pad_t)),
                   constant_values=_NEG)
    Tp = T + pad_t

    kernel = _make_kernel(int(k), int(max_jump), int(L0), int(L),
                          int(Mc))
    block = pl.BlockSpec((Mc, _TB), lambda t, m: (m, t),
                         memory_space=pltpu.VMEM)
    score, parent = pl.pallas_call(
        kernel,
        grid=(Tp // _TB, Mp // Mc),
        in_specs=[block, block],
        out_specs=[block, block],
        out_shape=[jax.ShapeDtypeStruct((Mp, Tp), jnp.int32),
                   jax.ShapeDtypeStruct((Mp, Tp), jnp.int32)],
        scratch_shapes=[pltpu.VMEM((L + Mc, _TB), jnp.int32)] * 3,
        interpret=interpret,
    )(curT, extT)
    score = score[:M, :T].T
    parent = parent[:M, :T].T
    score = jnp.where(live, score, 0)
    parent = jnp.where(live, parent, -1)
    return score, parent
