"""Long-read simulator for tests and benchmarks.

The reference ships real PacBio read sets for its toy E2E test
(reference: flye/tests/test_toy.py:21-32); those blobs are not available
here, so tests synthesize reads from the bundled E. coli 500kb reference
sequence with a configurable error profile (insertion-dominated, matching
PacBio CLR / ONT characteristics).
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np

from flye_tpu.io.fasta import COMPLEMENT


def simulate_reads(
    genome: np.ndarray,
    coverage: float = 30.0,
    mean_length: int = 8000,
    min_length: int = 1000,
    error_rate: float = 0.08,
    error_mix: Tuple[float, float, float] = (0.2, 0.5, 0.3),  # sub, ins, del
    circular: bool = True,
    seed: int = 0,
) -> List[Tuple[str, np.ndarray]]:
    """Sample error-laden reads from a genome (uint8 codes).

    Lengths ~ gamma with the given mean; start positions uniform; strand
    uniform. For circular genomes reads may wrap the origin.
    """
    rng = np.random.default_rng(seed)
    glen = len(genome)
    target = int(coverage * glen)
    reads = []
    total = 0
    i = 0
    sub_p, ins_p, del_p = error_mix
    genome2 = np.concatenate([genome] * 3) if circular else genome
    while total < target:
        length = int(rng.gamma(4.0, mean_length / 4.0))
        # circular genomes may be read around the origin (up to ~2 circles)
        cap = 2 * glen if circular else glen
        length = max(min_length, min(length, cap))
        start = int(rng.integers(0, glen if circular else max(1, glen - length)))
        frag = genome2[start:start + length].copy()
        strand = "+"
        if rng.random() < 0.5:
            frag = COMPLEMENT[frag[::-1]]
            strand = "-"
        read = _apply_errors(frag, error_rate, sub_p, ins_p, del_p, rng)
        # the name encodes the true placement for tests:
        # sim_<i>_pos<genome start>_len<fragment len><strand>
        reads.append((f"sim_{i}_pos{start}_len{length}{strand}", read))
        total += len(read)
        i += 1
    return reads


def _apply_errors(seq, error_rate, sub_p, ins_p, del_p, rng):
    n = len(seq)
    if error_rate <= 0 or n == 0:
        return seq
    n_err = rng.poisson(error_rate * n)
    if n_err == 0:
        return seq
    pos = np.sort(rng.integers(0, n, size=n_err))
    kinds = rng.choice(3, size=n_err, p=[sub_p, ins_p, del_p])
    out = []
    prev = 0
    for p, kind in zip(pos, kinds):
        out.append(seq[prev:p])
        if kind == 0:  # substitution
            out.append(np.array([(seq[p] + rng.integers(1, 4)) % 4],
                                dtype=np.uint8))
            prev = p + 1
        elif kind == 1:  # insertion (homopolymer-biased: dup current base)
            base = seq[p] if rng.random() < 0.5 else rng.integers(0, 4)
            out.append(np.array([base], dtype=np.uint8))
            prev = p
        else:  # deletion
            prev = p + 1
    out.append(seq[prev:])
    return np.concatenate(out)


def random_genome(length: int, seed: int = 1,
                  repeat_spec: Optional[List[Tuple[int, int]]] = None
                  ) -> np.ndarray:
    """Uniform random genome; optionally paste (repeat_len, n_copies)
    repeats at random positions to exercise the repeat graph."""
    rng = np.random.default_rng(seed)
    g = rng.integers(0, 4, size=length, dtype=np.int64).astype(np.uint8)
    if repeat_spec:
        for rep_len, copies in repeat_spec:
            unit = rng.integers(0, 4, size=rep_len).astype(np.uint8)
            for _ in range(copies):
                at = int(rng.integers(0, length - rep_len))
                g[at:at + rep_len] = unit
    return g
