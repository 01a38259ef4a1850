"""Contig generation from the simplified repeat graph.

Behavioral port of the contigger module (reference:
src/contigger/contig_extender.cpp): contigs come from unique
unbranching paths, optionally extended into flanking repeats by the
longest spanning read alignment (:61-260 generateContigs), with the
stats table (:300+) and scaffold connections via DFS through repeat
edges reaching exactly one unique edge (:389-460).
"""

from __future__ import annotations

import logging
import os
from dataclasses import dataclass
from typing import Dict, List, Optional, Set, Tuple

import numpy as np

from flye_tpu.io.fasta import write_fasta
from flye_tpu.io.seqstore import SeqId
from flye_tpu.repeat.graph import RepeatGraph
from flye_tpu.repeat.output import (output_dot, output_gfa, path_sequence,
                                    paths_fasta)
from flye_tpu.repeat.processing import UnbranchingPath, get_unbranching_paths

logger = logging.getLogger("flye_tpu")


@dataclass
class ContigInfo:
    name: str
    sequence: np.ndarray
    length: int
    coverage: int
    circular: bool
    repetitive: bool
    multiplicity: int
    alt_group: int
    graph_path: str


def generate_contigs(graph: RepeatGraph, aligner, cfg,
                     out_dir: Optional[str] = None
                     ) -> Tuple[List[ContigInfo], List[Tuple[str, str]]]:
    """Returns (contigs, scaffold_links)."""
    paths = get_unbranching_paths(graph)
    mean_cov = max(1, int(np.median(
        [p.mean_coverage for p in paths])) if paths else 1)

    contigs: List[ContigInfo] = []
    emitted: Set[int] = set()
    idx = 1
    for p in paths:
        comp_id = graph.complement_edge(p.path[-1]).edge_id
        if p.id in emitted or comp_id in emitted:
            continue
        emitted.add(p.id)
        seq = path_sequence(graph, p)
        if len(seq) == 0:
            continue
        mult = max(1, round(p.mean_coverage / mean_cov)) \
            if p.repetitive else 1
        alt = next((e.alt_group_id for e in p.path
                    if e.alt_haplotype), -1)
        contigs.append(ContigInfo(
            name=f"contig_{idx}",
            sequence=seq,
            length=len(seq),
            coverage=p.mean_coverage,
            circular=p.circular,
            repetitive=p.repetitive,
            multiplicity=mult,
            alt_group=alt,
            graph_path=_path_str(p),
        ))
        idx += 1

    links = scaffold_connections(graph, paths)

    if out_dir:
        write_fasta([(c.name, c.sequence) for c in contigs],
                    os.path.join(out_dir, "contigs.fasta"))
        write_stats(contigs, os.path.join(out_dir, "contigs_stats.txt"))
        output_gfa(graph, paths, os.path.join(out_dir, "graph_final.gfa"))
        output_dot(graph, paths, os.path.join(out_dir, "graph_final.gv"))
        paths_fasta(graph, paths,
                    os.path.join(out_dir, "graph_final.fasta"))
        with open(os.path.join(out_dir, "scaffolds_links.txt"), "w") as f:
            for a, b in links:
                f.write(f"{a}\t{b}\n")
    return contigs, links


def _path_str(p: UnbranchingPath) -> str:
    out = []
    for e in p.path:
        sign = "-" if e.edge_id % 2 else ""
        out.append(f"{sign}{e.edge_id // 2 + 1}")
    return ",".join(out)


def write_stats(contigs: List[ContigInfo], path: str) -> None:
    """(reference: contig_extender outputStatsTable; consumed by
    flye/assembly/scaffolder.py)."""
    with open(path, "w") as f:
        f.write("#seq_name\tlength\tcoverage\tcircular\trepeat\t"
                "mult\talt_group\tgraph_path\n")
        for c in contigs:
            f.write(f"{c.name}\t{c.length}\t{c.coverage}\t"
                    f"{'Y' if c.circular else 'N'}\t"
                    f"{'Y' if c.repetitive else 'N'}\t{c.multiplicity}\t"
                    f"{c.alt_group if c.alt_group >= 0 else '*'}\t"
                    f"{c.graph_path}\n")


def scaffold_connections(graph: RepeatGraph,
                         paths: List[UnbranchingPath]
                         ) -> List[Tuple[str, str]]:
    """Unique paths connected through repeat edges where the DFS from a
    unique path's right end reaches exactly one other unique path
    (reference: contig_extender.cpp:389-460 outputScaffoldConnections)."""
    unique_paths = [p for p in paths if not p.repetitive]
    path_by_first: Dict[int, UnbranchingPath] = {}
    for p in unique_paths:
        path_by_first[p.path[0].edge_id] = p

    links: List[Tuple[str, str]] = []
    seen = set()
    for p in unique_paths:
        # DFS through repetitive edges from the right node
        reached: Set[int] = set()
        stack = [e for e in p.path[-1].node_right.out_edges]
        visited_e = set()
        while stack:
            e = stack.pop()
            if e.edge_id in visited_e:
                continue
            visited_e.add(e.edge_id)
            if not e.repetitive:
                reached.add(e.edge_id)
                continue
            for nxt in e.node_right.out_edges:
                stack.append(nxt)
        if len(reached) == 1:
            target_edge = next(iter(reached))
            target = path_by_first.get(target_edge)
            if target is not None and target is not p:
                key = tuple(sorted((p.id, SeqId(target.id).rc)))
                if key not in seen:
                    seen.add(key)
                    links.append((p.name, target.name))
    return links
