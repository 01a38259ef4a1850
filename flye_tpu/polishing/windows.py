"""Anchor-based bubble partitioning for polishing.

The reference partitions each contig at "solid" positions computed from
a base-level pileup profile (reference: flye/polishing/bubbles.py:317-359
_get_partition, solidity :220-236) that requires SAM alignments.  Here
solidity comes from the mapping anchors instead: a draft position where
many reads share an exact-match k-mer anchor is solid by construction.
Bubble boundaries are chosen at anchor-popular positions spaced at most
max_bubble apart; each covering read is sliced at its own anchor via
diagonal extrapolation from the nearest anchor (exact when no indel lies
between, off by at most the local indel count otherwise).
"""

from __future__ import annotations

import logging
from dataclasses import dataclass, field
from typing import List, Optional, Tuple

import numpy as np

from flye_tpu.io.seqstore import SequenceStore
from flye_tpu.overlap.structs import Overlap

logger = logging.getLogger("flye_tpu")


@dataclass
class Bubble:
    target_id: int
    position: int                  # bubble index along the target
    start: int                     # draft coords
    end: int
    candidate: np.ndarray          # uint8 codes
    branches: List[np.ndarray] = field(default_factory=list)
    polished: Optional[np.ndarray] = None

    @property
    def sub_bubbles(self):
        return []


def _project(anchors: np.ndarray, p: int) -> Tuple[int, int]:
    """Read coordinate for draft position p by diagonal extrapolation
    from the nearest anchor (anchors [N,2] = (draft, read), ascending).
    Returns (read_pos, distance_to_nearest_anchor)."""
    i = int(np.searchsorted(anchors[:, 0], p))
    if i == 0:
        c, e = anchors[0]
    elif i >= len(anchors):
        c, e = anchors[-1]
    else:
        # nearest of the two flanking anchors
        if p - anchors[i - 1][0] <= anchors[i][0] - p:
            c, e = anchors[i - 1]
        else:
            c, e = anchors[i]
    return int(e) + (p - int(c)), abs(p - int(c))


_REFINE_M = 12  # boundary-marker length (bases)


def _refine(read_codes: np.ndarray, marker: np.ndarray, center: int,
            dist: int) -> int:
    """Snap an extrapolated read coordinate onto the exact occurrence of
    the draft's boundary marker k-mer nearest to it.

    Extrapolation across a gap of `dist` draft bases can be off by the
    local indel count (~15% of dist for raw reads); searching a window
    of that radius for the exact marker makes the slice boundary exact
    whenever the read matches the draft at the boundary — the same
    "solid position" invariant the reference's partition relies on
    (reference: flye/polishing/bubbles.py:220-236 solidity test)."""
    m = len(marker)
    if m < _REFINE_M:
        return center
    radius = min(48, 4 + (dist * 2) // 10)
    lo = max(0, center - radius)
    hi = min(len(read_codes) - m, center + radius)
    if hi < lo:
        return center
    win = np.lib.stride_tricks.sliding_window_view(
        read_codes[lo:hi + m], m)
    hits = np.nonzero((win == marker).all(axis=1))[0]
    if len(hits) == 0:
        return center
    return int(lo + hits[np.argmin(np.abs(hits + lo - center))])


def make_bubbles(target_id: int, draft: np.ndarray,
                 alignments: List[Overlap], reads: SequenceStore,
                 max_bubble: int = 500, min_aln_length: int = 500,
                 max_branches: int = 50,
                 min_boundary_frac: float = 0.3) -> List[Bubble]:
    """Partition one draft sequence into bubbles with read branches."""
    L = len(draft)
    alns = [a for a in alignments if a.cur_range >= min_aln_length
            and a.kmer_matches is not None and len(a.kmer_matches) >= 2]
    if not alns:
        return []

    # anchor popularity + coverage per draft position
    anchor_count = np.zeros(L + 1, dtype=np.int32)
    coverage = np.zeros(L + 1, dtype=np.int32)
    for a in alns:
        km = a.kmer_matches
        pos = km[:, 0]
        anchor_count[np.clip(pos, 0, L)] += 1
        coverage[a.cur_begin:a.cur_end] += 1

    # boundaries: prefer popular anchor positions; enforce <= max_bubble
    boundaries = [0]
    p = 0
    while p < L:
        lo = p + max_bubble // 4
        hi = min(p + max_bubble, L)
        if hi >= L:
            break
        window = anchor_count[lo:hi]
        cov = np.maximum(coverage[lo:hi], 1)
        qual = window / cov
        best = int(np.argmax(qual))
        if qual[best] >= min_boundary_frac:
            nxt = lo + best
        else:
            # no popular anchor: cut at max span (extrapolated slicing)
            nxt = hi
        boundaries.append(nxt)
        p = nxt
    boundaries.append(L)

    bubbles = []
    for bi, (p0, p1) in enumerate(zip(boundaries[:-1], boundaries[1:])):
        if p1 <= p0:
            continue
        bubbles.append(Bubble(target_id, bi, int(p0), int(p1),
                              draft[p0:p1].copy()))

    # boundary markers: the draft k-mer starting at each boundary, used
    # to snap extrapolated read slices onto exact matches
    markers = {}
    for p in boundaries:
        markers[p] = draft[p:min(p + _REFINE_M, L)]

    # slice branches
    starts = np.asarray([b.start for b in bubbles])
    for a in alns:
        km = a.kmer_matches
        read_codes = reads.get(a.ext_id)
        first = int(np.searchsorted(starts, a.cur_begin, side="left"))
        for bi in range(first, len(bubbles)):
            b = bubbles[bi]
            if b.end > a.cur_end:
                break
            if b.start < a.cur_begin:
                continue
            if len(b.branches) >= max_branches:
                continue
            rp0, d0 = _project(km, b.start)
            rp1, d1 = _project(km, b.end)
            if d0:
                rp0 = _refine(read_codes, markers[b.start], rp0, d0)
            if d1:
                rp1 = _refine(read_codes, markers[b.end], rp1, d1)
            rp0 = max(0, min(rp0, len(read_codes)))
            rp1 = max(rp0, min(rp1, len(read_codes)))
            blen = rp1 - rp0
            span = b.end - b.start
            # discard wildly divergent branches (bad projections)
            if blen < span // 2 or blen > 2 * span + 16:
                continue
            b.branches.append(read_codes[rp0:rp1])
    return bubbles


def compose(bubbles: List[Bubble]) -> np.ndarray:
    """Concatenate polished bubbles back into a sequence
    (reference: flye/polishing/polish.py:285-312 _compose_sequence)."""
    parts = []
    for b in sorted(bubbles, key=lambda x: x.position):
        seq = b.polished if b.polished is not None else b.candidate
        parts.append(seq)
    if not parts:
        return np.zeros(0, dtype=np.uint8)
    return np.concatenate(parts)
