"""Benchmark driver: prints ONE JSON line with the headline metric.

Current metric: chaining-DP throughput (the hot loop of overlap
detection, reference Flye's dominant assemble-phase cost) on the
available accelerator, versus a single-core vectorized NumPy baseline
standing in for optimized CPU code.

Will grow to cover polishing-windows/s once the polisher kernel lands.
"""

import json
import time

import numpy as np


def numpy_chain_dp(cur, ext, nvalid, k, max_jump, lookback):
    """Vectorized single-core host baseline (same per-step window math
    as the device kernel)."""
    T, M = cur.shape
    L = min(lookback, M)
    NEG = -(2 ** 30)
    curp = np.concatenate([np.full((T, L), NEG, np.int64), cur], axis=1)
    extp = np.concatenate([np.full((T, L), NEG, np.int64), ext], axis=1)
    score = np.concatenate([np.full((T, L), NEG, np.int64),
                            np.full((T, M), k, np.int64)], axis=1)
    for i in range(1, M):
        curw = curp[:, i:i + L]
        extw = extp[:, i:i + L]
        scw = score[:, i:i + L]
        dcur = curp[:, i + L:i + L + 1] - curw
        dext = extp[:, i + L:i + L + 1] - extw
        ok = (0 < dcur) & (dcur < max_jump) & (0 < dext) & (dext < max_jump)
        match = np.minimum(np.minimum(dcur, dext), k)
        jd = np.abs(dcur - dext)
        gap = np.where(jd > 100, 2 * jd, jd // 2)
        cand = np.where(ok, scw + match - gap, NEG)
        best = cand.max(axis=1)
        score[:, i + L] = np.maximum(best, k)
    return score


def main():
    import jax

    from flye_tpu.ops.chain import chain_dp

    k, max_jump, lookback = 17, 1500, 512
    T, M = 256, 2048
    rng = np.random.default_rng(0)
    cur = np.sort(rng.integers(0, 40000, size=(T, M)), axis=1).astype(
        np.int32)
    ext = (cur + 500 + rng.integers(-40, 40, size=(T, M))).astype(np.int32)
    nvalid = np.full(T, M, dtype=np.int32)

    # device benchmark (whatever backend is live: TPU in production)
    out = chain_dp(cur, ext, nvalid, k, max_jump, lookback)
    jax.block_until_ready(out)  # compile + warm up
    reps = 5
    t0 = time.perf_counter()
    for _ in range(reps):
        out = chain_dp(cur, ext, nvalid, k, max_jump, lookback)
    jax.block_until_ready(out)
    dev_time = (time.perf_counter() - t0) / reps
    cells = T * M * lookback
    dev_rate = cells / dev_time / 1e9  # Gcells/s

    # single-core numpy baseline on a smaller slice, scaled
    Tb, Mb = 64, 512
    t0 = time.perf_counter()
    numpy_chain_dp(cur[:Tb, :Mb].astype(np.int64),
                   ext[:Tb, :Mb].astype(np.int64),
                   nvalid[:Tb], k, max_jump, lookback)
    base_time = time.perf_counter() - t0
    base_cells = Tb * Mb * min(lookback, Mb)
    base_rate = base_cells / base_time / 1e9

    print(json.dumps({
        "metric": "chain_dp_throughput",
        "value": round(dev_rate, 3),
        "unit": "Gcells/s",
        "vs_baseline": round(dev_rate / base_rate, 2),
    }))


if __name__ == "__main__":
    main()
