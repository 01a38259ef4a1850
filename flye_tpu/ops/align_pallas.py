"""Pallas TPU kernel for batched Levenshtein distance.

The jnp formulation in ops/align.py lowers to a lax.scan over rows; this
Pallas version keeps the DP row in VMEM across the whole scan and
resolves the in-row dependency with a log-step shift-min (the
prefix-min trick), removing per-step HBM round trips. One grid program
handles a tile of pairs; all arithmetic is int32 on the VPU.

Used on TPU; CPU paths (tests) run the kernel in interpreter mode or
fall back to the jnp version.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BIG = 2 ** 24  # plain int: jnp constants must not be captured by kernels
_TILE_B = 8


def _lev_kernel(a_ref, alen_ref, b_ref, blen_ref, out_ref):
    TB, S = a_ref.shape
    W = S + 128  # padded row width (S+1 rounded up to lanes)
    js = jax.lax.broadcasted_iota(jnp.int32, (TB, W), 1)
    alen = alen_ref[:, 0][:, None]                    # [TB, 1]
    blen = blen_ref[:, 0][:, None]
    bchars = b_ref[:]

    row0 = js
    res0 = jnp.where(alen == 0, row0, _BIG)

    n_shifts = max(1, (W - 1).bit_length())

    def step(i, carry):
        prev, result = carry
        ai = a_ref[:, pl.ds(i, 1)]                    # [TB, 1]
        sub = jnp.where(ai != bchars, jnp.int32(1), jnp.int32(0))
        # tmp[j] for j>=1 = min(prev[j-1] + sub_{j-1}, prev[j] + 1)
        # static shift-right by 1 (avoid pltpu.roll: its shift
        # operand materializes as int64 under x64 and Mosaic cannot
        # lower 64-bit converts)
        prev_shift = jnp.concatenate(
            [jnp.full((TB, 1), _BIG, jnp.int32), prev[:, :-1]], axis=1)
        sub_pad = jnp.concatenate(
            [jnp.zeros((TB, 1), jnp.int32),
             sub, jnp.full((TB, W - S - 1), _BIG, jnp.int32)], axis=1)
        tmp = jnp.minimum(prev_shift + sub_pad, prev + 1)
        tmp = jnp.where(js == 0, i + 1, tmp)
        # row[j] = min_k<=j tmp[k] + (j - k): prefix-min of (tmp - js)
        g = tmp - js
        shift = 1
        for _ in range(n_shifts):
            rolled = jnp.concatenate(
                [jnp.full((TB, shift), _BIG, jnp.int32), g[:, :-shift]],
                axis=1)
            g = jnp.minimum(g, rolled)
            shift *= 2
        row = g + js
        result = jnp.where((i + 1) == alen, row, result)
        return row, result

    _, result = jax.lax.fori_loop(jnp.int32(0), jnp.int32(S),
                                  step, (row0, res0))
    # gather result at column blen via masked reduce
    dist = jnp.sum(jnp.where(js == blen, result, 0), axis=1)
    out_ref[:, 0] = dist


def edit_distance_batch_pallas(a, alen, b, blen, interpret: bool = False):
    """[B] int32 Levenshtein distances; a/b [B, S] uint8, lens [B].

    Runs with x64 disabled: Mosaic cannot lower 64-bit converts and the
    remote TPU compiler rejects x64-traced kernels outright.
    """
    with jax.enable_x64(False):
        return _edit_distance_batch_pallas(a, alen, b, blen,
                                           interpret=interpret)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _edit_distance_batch_pallas(a, alen, b, blen, interpret: bool = False):
    B, S = a.shape
    a = a.astype(jnp.int32)
    b = b.astype(jnp.int32)
    pad_b = (-B) % _TILE_B
    if pad_b:
        a = jnp.concatenate([a, jnp.zeros((pad_b, S), a.dtype)])
        b = jnp.concatenate([b, jnp.zeros((pad_b, S), b.dtype)])
        alen = jnp.concatenate([alen, jnp.zeros(pad_b, alen.dtype)])
        blen = jnp.concatenate([blen, jnp.zeros(pad_b, blen.dtype)])
    Bp = B + pad_b
    out = pl.pallas_call(
        _lev_kernel,
        grid=(Bp // _TILE_B,),
        in_specs=[
            pl.BlockSpec((_TILE_B, S), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_TILE_B, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_TILE_B, S), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_TILE_B, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_TILE_B, 1), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Bp, 1), jnp.int32),
        interpret=interpret,
    )(a, alen.astype(jnp.int32)[:, None], b,
      blen.astype(jnp.int32)[:, None])
    return out[:B, 0]
