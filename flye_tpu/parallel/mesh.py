"""Device-mesh distribution for the assembly pipeline.

The reference is single-node shared-memory: concurrent cuckoo maps +
atomics over a thread pool (reference: src/common/parallel.h:14-58 and
the 13 processInParallel sites catalogued in SURVEY §2.3).  The TPU
replacement is a `jax.sharding.Mesh` with two logical axes:

  data   — read batches stream data-parallel (one shard per device/host),
           mirroring every "parallel over reads" loop;
  shard  — the minimizer index is hash-sharded across devices for large
           genomes (replicated for small ones).

K-mer histograms merge with psum; per-shard overlap hits merge with
all_gather — the collective analog of the reference's shared-memory
reductions.  Everything here compiles under jit over the mesh, which the
driver validates via __graft_entry__.dryrun_multichip on a virtual
device mesh.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from flye_tpu.ops.chain import chain_dp
from flye_tpu.ops.kmers import kmer_hashes, minimizer_mask

HIST_BUCKETS = 1 << 16  # hash-bucketed k-mer histogram size


def make_mesh(n_devices: Optional[int] = None,
              axes: Tuple[str, ...] = ("data",)) -> Mesh:
    devices = jax.devices()
    n = n_devices or len(devices)
    devs = np.asarray(devices[:n])
    if len(axes) == 1:
        return Mesh(devs, axes)
    # 2D (data, shard): factor n into the most square grid
    for d in range(int(np.sqrt(n)), 0, -1):
        if n % d == 0:
            return Mesh(devs.reshape(n // d, d), axes)
    return Mesh(devs.reshape(n, 1), axes)


def _local_step(codes, lengths, cur, ext, nmatch, k: int, w: int,
                max_jump: int, lookback: int):
    """Per-shard compute: minimizer selection + bucketed k-mer histogram
    + chain DP. This is the device-plane inner loop of the assembly
    pipeline (index build + overlap chaining)."""
    canon, h, valid = kmer_hashes(codes, lengths, k)
    sel = minimizer_mask(h, valid, w)
    buckets = (h % jnp.uint64(HIST_BUCKETS)).astype(jnp.int32)
    weights = sel.astype(jnp.int32)
    hist = jnp.zeros(HIST_BUCKETS, dtype=jnp.int32).at[
        buckets.reshape(-1)].add(weights.reshape(-1))
    # merge histograms across the data axis — the collective replacing
    # the reference's shared atomic counter array
    hist = jax.lax.psum(hist, axis_name="data")
    score, parent = chain_dp(cur, ext, nmatch, k, max_jump, lookback)
    n_sel = jax.lax.psum(sel.sum(), axis_name="data")
    return hist, score, parent, n_sel


def sharded_pipeline_step(mesh: Mesh, k: int = 15, w: int = 5,
                          max_jump: int = 1500, lookback: int = 64):
    """Build a jitted, mesh-sharded pipeline step.

    Returns (fn, make_example_args(per_shard_batch, read_len, n_matches)).
    Inputs are sharded over the 'data' axis; the k-mer histogram is
    replicated after the psum.
    """
    data_spec = P("data")

    local = functools.partial(_local_step, k=k, w=w, max_jump=max_jump,
                              lookback=lookback)
    fn = jax.jit(
        jax.shard_map(
            local, mesh=mesh,
            in_specs=(data_spec, data_spec, data_spec, data_spec, data_spec),
            out_specs=(P(), data_spec, data_spec, P()),
            check_vma=False,
        ))

    n_data = mesh.shape["data"]

    def make_example_args(batch_per_shard: int = 2, read_len: int = 256,
                          n_matches: int = 64, seed: int = 0):
        rng = np.random.default_rng(seed)
        B = batch_per_shard * n_data
        codes = rng.integers(0, 4, size=(B, read_len)).astype(np.uint8)
        lengths = np.full(B, read_len, dtype=np.int32)
        cur = np.sort(rng.integers(0, 4000, size=(B, n_matches)),
                      axis=1).astype(np.int32)
        ext = (cur + 100).astype(np.int32)
        nmatch = np.full(B, n_matches, dtype=np.int32)
        sharding = NamedSharding(mesh, data_spec)
        return tuple(jax.device_put(x, sharding)
                     for x in (codes, lengths, cur, ext, nmatch))

    return fn, make_example_args
