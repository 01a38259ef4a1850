"""Repeat classification and resolution by read bridging.

Behavioral port of RepeatResolver essentials
(reference: src/repeat_graph/repeat_resolver.cpp): repeat marking by
coverage/structure (:334-531 findRepeats, simplified), read-spanned
connections between unique edges (:615-800 getConnections), max-weight
matching on the transition graph with support confidence >=
min_repeat_res_support (:22-170 resolveConnections; networkx's exact
general matching replaces lemon), and path separation splicing the
median spanning read's sequence as a new edge (:963 separatePath).
"""

from __future__ import annotations

import logging
from dataclasses import dataclass
from typing import Dict, List, Tuple

import networkx as nx
import numpy as np

from flye_tpu.io.seqstore import SeqId
from flye_tpu.repeat.graph import EdgeSequence, GraphEdge, RepeatGraph

logger = logging.getLogger("flye_tpu")

_MAGIC_100 = 100


@dataclass
class Connection:
    path: List[GraphEdge]          # [unique_in, repeats..., unique_out]
    read_id: int
    read_start: int
    read_end: int


class RepeatResolver:
    def __init__(self, graph: RepeatGraph, reads, aligner, cfg,
                 unique_cov_threshold: float):
        self.graph = graph
        self.reads = reads
        self.aligner = aligner
        self.cfg = cfg
        self.unique_cov_threshold = unique_cov_threshold

    # ------------------------------------------------------------------

    def find_repeats(self) -> None:
        """Mark repetitive edges (reference: repeat_resolver.cpp:334-531;
        simplified to the coverage / loop / self-complement rules —
        read-extension voting lands next round)."""
        loop_rate = self.cfg.loop_coverage_rate
        for edge in self.graph.iter_edges():
            edge.repetitive = False
        for edge in self.graph.iter_edges():
            repetitive = False
            if len(edge.seq_segments) > 1:
                repetitive = True
            if edge.mean_coverage > self.unique_cov_threshold:
                repetitive = True
            if edge.self_complement:
                repetitive = True
            if (edge.is_looped and
                    edge.length() < self.cfg.max_separation * 2):
                repetitive = True
            if (edge.is_looped and edge.mean_coverage >
                    loop_rate * max(1, self._local_coverage(edge))):
                repetitive = True
            if repetitive:
                edge.repetitive = True
                self.graph.complement_edge(edge).repetitive = True
        n_rep = sum(1 for e in self.graph.iter_edges() if e.repetitive)
        logger.debug("Repetitive edges: %d / %d", n_rep,
                     len(self.graph.edges))

    def _local_coverage(self, edge: GraphEdge) -> int:
        covs = [e.mean_coverage
                for e in (edge.node_left.in_edges +
                          edge.node_right.out_edges)
                if e is not edge]
        return int(np.median(covs)) if covs else 0

    # ------------------------------------------------------------------

    def get_connections(self) -> List[Connection]:
        """(reference: repeat_resolver.cpp:615-800)."""
        def safe(edge: GraphEdge) -> bool:
            return not edge.repetitive

        connections: List[Connection] = []
        for chain in self.aligner.alignments:
            current: List = []
            read_start = 0
            for aln in chain:
                if not current:
                    if not safe(aln.edge):
                        continue
                    read_start = (aln.overlap.cur_end +
                                  aln.overlap.ext_len - aln.overlap.ext_end)
                    read_start = min(read_start,
                                     aln.overlap.cur_len - _MAGIC_100)
                current.append(aln)
                if safe(aln.edge) and current[0].edge is not aln.edge:
                    reliable = True
                    if (not current[0].edge.node_right.is_bifurcation or
                            not current[-1].edge.node_left.is_bifurcation):
                        reliable = False
                    if current[0].edge.resolved and current[-1].edge.resolved:
                        reliable = False
                    if (current[0].edge.right_link or
                            current[-1].edge.left_link):
                        reliable = False
                    if not reliable:
                        current = [aln]
                        read_start = (aln.overlap.cur_end +
                                      aln.overlap.ext_len -
                                      aln.overlap.ext_end)
                        read_start = min(read_start,
                                         aln.overlap.cur_len - _MAGIC_100)
                        continue
                    read_end = aln.overlap.cur_begin - aln.overlap.ext_begin
                    read_end = max(read_start + _MAGIC_100 - 1, read_end)
                    if read_start < 0 or read_end >= aln.overlap.cur_len:
                        logger.debug("bad bridging read coordinates")
                        break
                    connections.append(Connection(
                        [a.edge for a in current],
                        aln.overlap.cur_id, read_start, read_end))
                    current = [aln]
                    read_start = (aln.overlap.cur_end +
                                  aln.overlap.ext_len - aln.overlap.ext_end)
                    read_start = min(read_start,
                                     aln.overlap.cur_len - _MAGIC_100)
        logger.debug("Extracted %d read connections", len(connections))
        return connections

    # ------------------------------------------------------------------

    def resolve_repeats(self) -> int:
        connections = self.get_connections()
        return self.resolve_connections(
            connections, self.cfg.min_repeat_res_support)

    def resolve_connections(self, connections: List[Connection],
                            min_support: float) -> int:
        """(reference: repeat_resolver.cpp:22-170)."""
        if not connections:
            return 0
        left_cov: Dict[int, int] = {}
        right_cov: Dict[int, int] = {}
        weights: Dict[Tuple[int, int], int] = {}
        for conn in connections:
            left = conn.path[0].edge_id
            right_rc = SeqId(conn.path[-1].edge_id).rc
            if (conn.path[0].edge_id == conn.path[-1].edge_id or
                    conn.path[0].edge_id == right_rc):
                continue
            left_cov[left] = left_cov.get(left, 0) + 1
            right_cov[right_rc] = right_cov.get(right_rc, 0) + 1
            key = (left, int(right_rc))
            weights[key] = weights.get(key, 0) + 1

        G = nx.Graph()
        for (a, b), wt in weights.items():
            prev = G.get_edge_data(a, b, {}).get("weight", 0)
            G.add_edge(a, b, weight=prev + wt)
        matching = nx.max_weight_matching(G)

        used = set()
        unique_conns: List[Connection] = []
        unresolved = 0
        for a, b in sorted((tuple(sorted(m)) for m in matching)):
            for left, right in ((a, b), (b, a)):
                if left in used:
                    continue
                support = G[left][right]["weight"]
                conf = support / max(
                    1, left_cov.get(left, 0) + right_cov.get(right, 0))
                logger.debug("Connection %d %d support %d conf %.2f",
                             left, right, support, conf)
                if conf < min_support:
                    unresolved += 1
                    continue
                used.add(left)
                used.add(right)
                spanning = [
                    c for c in connections
                    if (c.path[0].edge_id == left and
                        SeqId(c.path[-1].edge_id).rc == right) or
                       (c.path[0].edge_id == right and
                        SeqId(c.path[-1].edge_id).rc == left)]
                if not spanning:
                    continue
                spanning.sort(key=lambda c: c.read_end - c.read_start)
                unique_conns.append(spanning[len(spanning) // 2])
                break

        for conn in unique_conns:
            self._separate_path(conn)
        logger.debug("[SIMPL] Resolved repeats: %d", len(unique_conns))
        logger.debug("RR links: %d, unresolved: %d",
                     len(connections) // 2, unresolved)
        return len(unique_conns)

    def _separate_path(self, conn: Connection) -> None:
        """Splice the bridging read sequence as a new edge
        (reference: repeat_resolver.cpp:963 separatePath)."""
        read_codes = self.reads.get(conn.read_id)
        bridge = read_codes[conn.read_start:conn.read_end]
        # add the bridge sequence (and complement view) to the asm store
        # as a pseudo-disjointig
        bid = self.graph.asm.add(
            f"bridge_{self.reads.name(conn.read_id)}_"
            f"{conn.read_start}_{conn.read_end}", np.ascontiguousarray(bridge))

        comp_path = self.graph.complement_path(conn.path)
        if comp_path[0] is conn.path[0]:
            comp_path = None  # palindromic connection: splice once
        base_id = self.graph._next_edge_id
        for offset, (path, seq_id) in enumerate(
                ((conn.path, int(bid)),
                 (comp_path, int(SeqId(bid).rc)))):
            if path is None:
                continue
            in_edge, out_edge = path[0], path[-1]
            for mid in path[1:-1]:
                mid.resolved = True
                mid.mean_coverage = max(
                    0, mid.mean_coverage - in_edge.mean_coverage)
            # detach and bridge
            new_left = self.graph.add_node()
            in_edge.node_right.in_edges.remove(in_edge)
            in_edge.node_right = new_left
            new_left.in_edges.append(in_edge)
            new_right = self.graph.add_node()
            out_edge.node_left.out_edges.remove(out_edge)
            out_edge.node_left = new_right
            new_right.out_edges.append(out_edge)
            bridge_edge = GraphEdge(new_left, new_right,
                                    base_id + offset)
            bridge_edge.seq_segments.append(EdgeSequence(
                seq_id, len(read_codes), 0, len(bridge)))
            bridge_edge.mean_coverage = in_edge.mean_coverage
            self.graph.add_edge(bridge_edge)

    def finalize_graph(self) -> None:
        """Un-mark repetitive edges that became structurally resolved
        (reference: repeat_resolver.cpp:533-571, simplified)."""
        for edge in self.graph.iter_edges():
            if edge.repetitive and edge.resolved:
                n_in, _ = edge.node_left.degree()
                _, n_out = edge.node_right.degree()
                if n_in <= 1 and n_out <= 1:
                    edge.repetitive = False
