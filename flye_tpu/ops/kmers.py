"""Device kernels for k-mer extraction, hashing, and minimizer selection.

TPU-first equivalents of the reference's per-base rolling loops
(reference: src/sequence/kmer.h:65-98 appendRight/standardForm/splitmix64,
kmer.h:206-262 monotonic-deque minimizer sweep).  Instead of per-position
scalar updates, whole padded read batches [B, L] are processed with k
shifted adds (VPU, memory-bound) and the minimizer sweep becomes a
log-step sliding-window minimum — a data-parallel formulation of the same
selection rule: position p is a window minimum for some window iff its
hash equals the minimum over the (2w-1)-neighborhood of p.

All functions are jit-compatible with static k / w; dtypes are explicit
(int64 for packed k-mers — k <= 31 needs 62 bits, uint64 for hashes).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

MAX_K = 31
# sentinel hash for invalid positions: max uint64 so they never win a
# window minimum
_INVALID_HASH = jnp.uint64(0xFFFFFFFFFFFFFFFF)


@functools.partial(jax.jit, static_argnames=("k",))
def extract_kmers(codes: jax.Array, lengths: jax.Array, k: int):
    """Packed forward and reverse-complement k-mers at every position.

    Args:
      codes: [B, L] uint8 base codes (0..3), zero-padded.
      lengths: [B] int32 true sequence lengths.
      k: k-mer size (static, <= 31).

    Returns:
      fwd:   [B, L] int64, fwd[p] = codes[p..p+k-1] packed 2 bits/base,
             first base in the highest bits (positions p > len-k are junk).
      rc:    [B, L] int64, reverse-complement k-mer at the same window.
      valid: [B, L] bool, True where a complete k-mer starts.
    """
    assert 1 <= k <= MAX_K
    c = codes.astype(jnp.int64)
    B, L = c.shape
    fwd = jnp.zeros((B, L), dtype=jnp.int64)
    rc = jnp.zeros((B, L), dtype=jnp.int64)
    for j in range(k):
        # base at window offset j, i.e. codes shifted left by j positions
        shifted = jnp.roll(c, -j, axis=1) if j else c
        fwd = fwd | (shifted << (2 * (k - 1 - j)))
        rc = rc | ((3 - shifted) << (2 * j))
    pos = jax.lax.broadcasted_iota(jnp.int32, (B, L), 1)
    valid = pos <= (lengths[:, None] - k)
    return fwd, rc, valid


@functools.partial(jax.jit, static_argnames=("k",))
def canonical_kmers(codes: jax.Array, lengths: jax.Array, k: int):
    """Canonical (strand-symmetric) k-mers: min(fwd, revcomp).

    Matches the role of the reference's standardForm
    (reference: src/sequence/kmer.h:54-63).

    Returns (canon [B,L] int64, is_fwd [B,L] bool, valid [B,L] bool).
    """
    fwd, rc, valid = extract_kmers(codes, lengths, k)
    is_fwd = fwd <= rc
    canon = jnp.where(is_fwd, fwd, rc)
    return canon, is_fwd, valid


def splitmix64(x: jax.Array) -> jax.Array:
    """SplitMix64 finalizer (the same mixer family the reference uses for
    k-mer hashing, reference: src/sequence/kmer.h:91-98). Input any int
    dtype; output uint64."""
    x = x.astype(jnp.uint64)
    x = (x ^ (x >> jnp.uint64(30))) * jnp.uint64(0xBF58476D1CE4E5B9)
    x = (x ^ (x >> jnp.uint64(27))) * jnp.uint64(0x94D049BB133111EB)
    return x ^ (x >> jnp.uint64(31))


@functools.partial(jax.jit, static_argnames=("k",))
def kmer_hashes(codes: jax.Array, lengths: jax.Array, k: int):
    """Canonical k-mers + their hashes, invalid positions forced to the
    max hash. Returns (canon, hashes, valid)."""
    canon, _, valid = canonical_kmers(codes, lengths, k)
    h = splitmix64(canon)
    h = jnp.where(valid, h, _INVALID_HASH)
    return canon, h, valid


def _sliding_min(h: jax.Array, width: int) -> jax.Array:
    """out[p] = min(h[p .. p+width-1]) along the last axis, out-of-range
    treated as +inf (sparse-table doubling: O(log width) vector mins)."""
    if width <= 1:
        return h
    pad_val = _INVALID_HASH if h.dtype == jnp.uint64 else jnp.iinfo(h.dtype).max

    def shift(x, s):
        # shift left by s, fill tail with pad
        rolled = jnp.roll(x, -s, axis=-1)
        idx = jax.lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 1)
        return jnp.where(idx < x.shape[-1] - s, rolled, pad_val)

    # g = min over window of size 2^t
    g = h
    span = 1
    while span * 2 <= width:
        g = jnp.minimum(g, shift(g, span))
        span *= 2
    if span == width:
        return g
    return jnp.minimum(g, shift(g, width - span))


@functools.partial(jax.jit, static_argnames=("w",))
def minimizer_mask(hashes: jax.Array, valid: jax.Array, w: int) -> jax.Array:
    """Select minimizer positions: p is chosen iff its hash attains the
    minimum of some fully-in-bounds length-w window of k-mer positions.

    Equivalent to the reference's deque sweep
    (reference: src/sequence/kmer.h:206-262) modulo tie handling: all
    tied minima are selected here (the deque picks one), which only
    slightly enlarges the index and keeps the rule strand-symmetric.

    Vectorized as: W[s] = min(h[s..s+w-1]) via log-step sliding min, then
    selected(p) = OR over the w windows s = p-w+1..p of
    (window s in bounds) & (W[s] == h[p]).
    """
    if w <= 1:
        return valid
    h = jnp.where(valid, hashes, _INVALID_HASH)
    W = _sliding_min(h, w)
    # window s is fully in bounds iff its last position s+w-1 holds a
    # valid k-mer
    win_ok = jnp.roll(valid, -(w - 1), axis=-1)
    idx = jax.lax.broadcasted_iota(jnp.int32, h.shape, h.ndim - 1)
    win_ok = win_ok & (idx < h.shape[-1] - (w - 1))

    selected = jnp.zeros_like(valid)
    for j in range(w):
        # window starting at s = p - j
        Wj = jnp.roll(W, j, axis=-1)
        okj = jnp.roll(win_ok, j, axis=-1) & (idx >= j)
        selected = selected | (okj & (Wj == h))
    return valid & selected


@functools.partial(jax.jit, static_argnames=("sample",))
def sample_mask(valid: jax.Array, sample: int) -> jax.Array:
    """Every `sample`-th position (the reference's k-mer sampling,
    reference: asm_*.cfg assemble_kmer_sample)."""
    if sample <= 1:
        return valid
    idx = jax.lax.broadcasted_iota(jnp.int32, valid.shape, valid.ndim - 1)
    return valid & (idx % sample == 0)
