"""flye_tpu — a TPU-native long-read de novo assembler.

A from-scratch rebuild of the Flye assembly pipeline (reference:
zovoilis-lab/Flye 2.8.1) designed TPU-first:

- Device plane (JAX/XLA/Pallas): k-mer extraction & hashing, minimizer
  selection, sort-based k-mer counting/indexing, seed match chaining DP,
  banded edit-distance alignment, pileup consensus, and the bubble
  polishing kernel.
- Host plane (Python/NumPy): sequence IO, the greedy disjointig extender,
  repeat-graph construction & simplification, contig generation,
  orchestration with stage-level resume.
- Distribution: `jax.sharding.Mesh` over (data, index-shard) axes; k-mer
  histograms merge via psum, sharded index lookups via all-gather of
  per-shard hits.

64-bit integer support is required for packed k-mers (k up to 31 needs
62 bits), so x64 is enabled at import. All device kernels use explicit
dtypes (int32/float32 in the hot paths); int64 only appears in index
construction.
"""

import os as _os

from jax import config as _jax_config

_jax_config.update("jax_enable_x64", True)

# Persistent compilation cache: the pipeline's kernel set spans dozens of
# bucketed shapes; on a remote-compile TPU tunnel each shape costs
# ~10-40 s per process without this (the analog of the reference's
# one-time C++ build).  Opt out with FLYE_TPU_NO_COMPILE_CACHE=1.
if not _os.environ.get("FLYE_TPU_NO_COMPILE_CACHE"):
    _cache_dir = _os.environ.get(
        "FLYE_TPU_COMPILE_CACHE", _os.path.expanduser("~/.cache/jax"))
    _jax_config.update("jax_compilation_cache_dir", _cache_dir)
    _jax_config.update("jax_persistent_cache_min_compile_time_secs", 2)

__version__ = "0.1.0"
