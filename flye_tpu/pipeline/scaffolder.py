"""Scaffolding and final assembly statistics.

Behavioral port of flye/assembly/scaffolder.py: chain contigs along
scaffold links with 100-N gaps (:20-78), generate assembly_info.txt
(:104-213) and the N50 summary log.
"""

from __future__ import annotations

import logging
from typing import Dict, List, Sequence, Tuple

import numpy as np

from flye_tpu.config.params import PIPELINE
from flye_tpu.contigger.extender import ContigInfo
from flye_tpu.io.fasta import codes_to_str

logger = logging.getLogger("flye_tpu")


def build_scaffolds(contigs: List[ContigInfo],
                    links: Sequence[Tuple[str, str]]
                    ) -> Dict[str, List[str]]:
    """Chain contigs into scaffolds following link pairs
    (reference: scaffolder.py:20-78). Links refer to signed unbranching
    path names; here we only chain whole contigs by name."""
    # map contig -> next contig
    nxt: Dict[str, str] = {}
    has_prev = set()
    names = {c.name for c in contigs}
    for a, b in links:
        ua, ub = a.lstrip("+-"), b.lstrip("+-")
        ca, cb = f"contig_{ua}", f"contig_{ub}"
        if ca in names and cb in names and ca not in nxt and \
                cb not in has_prev:
            nxt[ca] = cb
            has_prev.add(cb)

    scaffolds: Dict[str, List[str]] = {}
    idx = 1
    used = set()
    for c in contigs:
        if c.name in used or c.name in has_prev:
            continue
        chain = [c.name]
        used.add(c.name)
        while chain[-1] in nxt and nxt[chain[-1]] not in used:
            chain.append(nxt[chain[-1]])
            used.add(chain[-1])
        name = f"scaffold_{idx}" if len(chain) > 1 else chain[0]
        scaffolds[name] = chain
        idx += 1
    return scaffolds


def write_assembly(contigs: List[ContigInfo],
                   scaffolds: Dict[str, List[str]],
                   fasta_out: str, info_out: str) -> None:
    """Write assembly.fasta (with 100-N scaffold gaps) and
    assembly_info.txt (reference: scaffolder.py:104-213)."""
    by_name = {c.name: c for c in contigs}
    gap = "N" * int(PIPELINE["scaffold_gap"])
    records = []
    info_rows = []
    for scf_name, chain in scaffolds.items():
        seq = gap.join(codes_to_str(by_name[n].sequence) for n in chain)
        records.append((scf_name, seq))
        first = by_name[chain[0]]
        length = sum(by_name[n].length for n in chain) + \
            (len(chain) - 1) * int(PIPELINE["scaffold_gap"])
        cov = int(np.mean([by_name[n].coverage for n in chain]))
        mult = min(by_name[n].multiplicity for n in chain)
        info_rows.append((scf_name, length, cov,
                          "Y" if first.circular else "N",
                          "Y" if first.repetitive else "N",
                          mult,
                          first.alt_group if first.alt_group >= 0 else "*",
                          ",??,".join(by_name[n].graph_path
                                      for n in chain)))

    with open(fasta_out, "w") as f:
        for name, seq in records:
            f.write(f">{name}\n")
            for i in range(0, len(seq), 60):
                f.write(seq[i:i + 60] + "\n")

    info_rows.sort(key=lambda r: -r[1])
    with open(info_out, "w") as f:
        f.write("#seq_name\tlength\tcov.\tcirc.\trepeat\tmult.\t"
                "alt_group\tgraph_path\n")
        for row in info_rows:
            f.write("\t".join(str(x) for x in row) + "\n")

    lengths = [r[1] for r in info_rows]
    total = sum(lengths)
    n50 = 0
    acc = 0
    for ln in sorted(lengths, reverse=True):
        acc += ln
        if acc > total // 2:
            n50 = ln
            break
    mean_cov = (sum(r[1] * r[2] for r in info_rows) // total) if total \
        else 0
    logger.info(
        "Assembly statistics:\n\n\tTotal length:\t%d\n\tFragments:\t%d\n"
        "\tFragments N50:\t%d\n\tLargest frg:\t%d\n\tScaffolds:\t%d\n"
        "\tMean coverage:\t%d\n",
        total, len(info_rows), n50, max(lengths) if lengths else 0,
        sum(1 for s in scaffolds.values() if len(s) > 1), mean_cov)
