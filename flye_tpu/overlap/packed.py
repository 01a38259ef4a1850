"""Packed columnar overlap storage.

The all-vs-all overlap cache is the pipeline's dominant host allocation
after the k-mer index: at 50 Mb/30x it held ~10M Python `Overlap`
dataclass objects, each carrying a small int32 anchor ndarray — ~15
bytes of RSS per read-base, mostly CPython object headers plus int32
anchor pairs (the reference stores overlap records in packed C++
structs and never retains anchor traces at all,
reference: src/sequence/overlap.h:60-110).

This module stores each read's forward-overlap list as ONE structured
record array plus a shared int16 delta-encoded anchor arena:

  record (52 B): ids, cur/ext coords, score, divergence, anchor count,
    first anchor pair, arena offset
  anchors: consecutive (cur, ext) anchor deltas as int16 pairs (4 B per
    anchor; anchors ascend and are ~10-100 bases apart, so deltas fit
    int16 except across rare giant gaps, which fall back to a raw int32
    arena flagged by a negative offset)

`Overlap` objects materialize on demand (`get`), complements derived at
materialization — so the resident cost is ~45-50 B/overlap + 4 B/anchor
(~3-4x less than the object cache, and ~10x fewer Python objects), while
every consumer keeps the object API.
"""

from __future__ import annotations

from typing import Dict, Iterable, List, Optional

import numpy as np

from flye_tpu.overlap.structs import Overlap

REC_DT = np.dtype([
    ("cur_id", "i4"), ("ext_id", "i4"),
    ("cb", "i4"), ("ce", "i4"), ("cl", "i4"),
    ("eb", "i4"), ("ee", "i4"), ("el", "i4"),
    ("score", "i4"), ("div", "f4"),
    ("a_n", "i4"), ("first_c", "i4"), ("first_e", "i4"),
    ("a_off", "i8"),
])

_D16_MAX = 32000  # per-component delta magnitude the int16 arena takes


def encode_overlaps(ovlps: List[Overlap]):
    """Flat (recs, d16, raw) arrays for a list of overlaps — the same
    layout PackedOverlaps stores per read, usable standalone for file
    transport (the task-bus mapping partition ships per-target
    alignment lists this way)."""
    n = len(ovlps)
    recs = np.zeros(n, REC_DT)
    d16_parts: List[np.ndarray] = []
    raw_parts: List[np.ndarray] = []
    off16 = 0
    offraw = 0
    for i, o in enumerate(ovlps):
        r = recs[i]
        r["cur_id"] = o.cur_id
        r["ext_id"] = o.ext_id
        r["cb"], r["ce"], r["cl"] = o.cur_begin, o.cur_end, o.cur_len
        r["eb"], r["ee"], r["el"] = o.ext_begin, o.ext_end, o.ext_len
        r["score"] = o.score
        r["div"] = o.divergence
        km = o.kmer_matches
        if km is None or len(km) == 0:
            r["a_n"] = 0
            continue
        km = np.asarray(km, np.int64)
        r["a_n"] = len(km)
        r["first_c"], r["first_e"] = int(km[0, 0]), int(km[0, 1])
        if len(km) == 1:
            r["a_off"] = off16
            continue
        d = np.diff(km, axis=0)
        if np.abs(d).max() <= _D16_MAX:
            r["a_off"] = off16
            d16_parts.append(d.astype(np.int16).ravel())
            off16 += len(km) - 1
        else:
            r["a_off"] = ~offraw
            raw_parts.append(km.astype(np.int32).ravel())
            offraw += len(km)
    d16 = (np.concatenate(d16_parts) if d16_parts
           else np.zeros(0, np.int16))
    raw = (np.concatenate(raw_parts) if raw_parts
           else np.zeros(0, np.int32))
    return recs, d16, raw


def decode_overlaps(recs, d16, raw) -> List[Overlap]:
    """Inverse of encode_overlaps."""
    out: List[Overlap] = []
    for r in recs:
        ov = Overlap(int(r["cur_id"]), int(r["ext_id"]),
                     int(r["cb"]), int(r["ce"]), int(r["cl"]),
                     int(r["eb"]), int(r["ee"]), int(r["el"]),
                     score=int(r["score"]),
                     divergence=float(r["div"]))
        n = int(r["a_n"])
        if n > 0:
            off = int(r["a_off"])
            if off >= 0:
                km = np.empty((n, 2), np.int32)
                km[0, 0] = r["first_c"]
                km[0, 1] = r["first_e"]
                if n > 1:
                    d = d16[off * 2:(off + n - 1) * 2]
                    km[1:] = d.reshape(n - 1, 2)
                    np.cumsum(km, axis=0, out=km)
            else:
                o = ~off
                km = raw[o * 2:(o + n) * 2].reshape(n, 2).copy()
            ov.kmer_matches = km
        out.append(ov)
    return out


class PackedOverlaps:
    """fwd_id -> packed forward-overlap list (complements derived)."""

    def __init__(self) -> None:
        self._recs: Dict[int, np.ndarray] = {}
        self._d16: Dict[int, np.ndarray] = {}
        self._raw: Dict[int, np.ndarray] = {}

    def __contains__(self, fwd_id: int) -> bool:
        return fwd_id in self._recs

    def reads(self) -> Iterable[int]:
        return self._recs.keys()

    def __len__(self) -> int:
        return len(self._recs)

    def n_overlaps(self) -> int:
        return sum(len(r) for r in self._recs.values())

    def nbytes(self) -> int:
        return (sum(r.nbytes for r in self._recs.values())
                + sum(a.nbytes for a in self._d16.values())
                + sum(a.nbytes for a in self._raw.values()))

    # ---- encode ----
    def add(self, fwd_id: int, ovlps: List[Overlap]) -> None:
        recs, d16, raw = encode_overlaps(ovlps)
        self._recs[fwd_id] = recs
        self._d16[fwd_id] = d16
        if len(raw):
            self._raw[fwd_id] = raw

    def pop(self, fwd_id: int) -> None:
        self._recs.pop(fwd_id, None)
        self._d16.pop(fwd_id, None)
        self._raw.pop(fwd_id, None)

    # ---- decode ----
    def get(self, fwd_id: int) -> List[Overlap]:
        return decode_overlaps(self._recs[fwd_id],
                               self._d16.get(fwd_id),
                               self._raw.get(fwd_id))
