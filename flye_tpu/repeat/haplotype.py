"""Heterozygous variation masking.

Behavioral port of HaplotypeResolver essentials
(reference: src/repeat_graph/haplotype_resolver.cpp): simple bubbles —
two parallel unbranching paths between a 1-in/2-out and a 2-in/1-out
node pair, branch length <= max_bubble_length (:13-133
findHeterozygousBulges) and heterozygous loops (:139).  BOTH bubble
sides are masked altHaplotype and the flanking edges are linked with a
bridging sequence (the lower-coverage side); collapseHaplotypes (:576)
then reroutes the flanks through a new bridge edge, leaving the masked
branches as separate alternative-haplotype components — sequence is
never deleted.

Roundabouts and superbubbles (meta mode, :485, :997) land next round.
"""

from __future__ import annotations

import logging
from typing import Dict, Tuple

import numpy as np

from flye_tpu.io.fasta import reverse_complement
from flye_tpu.repeat.graph import EdgeSequence, GraphEdge, RepeatGraph
from flye_tpu.repeat.processing import get_unbranching_paths

logger = logging.getLogger("flye_tpu")


class HaplotypeResolver:
    def __init__(self, graph: RepeatGraph, cfg):
        self.graph = graph
        self.cfg = cfg
        self._next_group = 0
        # (in_edge_id, out_edge_id) -> bridging sequence codes
        self._bridging_seqs: Dict[Tuple[int, int], np.ndarray] = {}

    def reset_edges(self) -> None:
        """Clear masking state before re-discovery
        (reference: haplotype_resolver.cpp resetEdges)."""
        for edge in self.graph.iter_edges():
            edge.left_link = None
            edge.right_link = None
            edge.alt_haplotype = False
            edge.alt_group_id = -1
        self._bridging_seqs.clear()

    def _link(self, in_edge: GraphEdge, out_edge: GraphEdge) -> None:
        """(reference: repeat_graph.h linkEdges, both strands)."""
        in_edge.right_link = out_edge
        out_edge.left_link = in_edge
        ci = self.graph.complement_edge(in_edge)
        co = self.graph.complement_edge(out_edge)
        co.right_link = ci
        ci.left_link = co

    def _store_bridge(self, in_edge: GraphEdge, out_edge: GraphEdge,
                      seq: np.ndarray) -> None:
        self._bridging_seqs[(in_edge.edge_id, out_edge.edge_id)] = seq
        ci = self.graph.complement_edge(in_edge)
        co = self.graph.complement_edge(out_edge)
        self._bridging_seqs[(co.edge_id, ci.edge_id)] = \
            reverse_complement(seq)

    def find_heterozygous_bulges(self) -> int:
        """(reference: haplotype_resolver.cpp:13-133)."""
        from flye_tpu.repeat.output import path_sequence
        max_len = self.cfg.max_bubble_length
        paths = get_unbranching_paths(self.graph)
        path_index = {}
        for p in paths:
            for e in p.path:
                path_index[e.edge_id] = p

        used = set()
        n_masked = 0
        for path in paths:
            if path.node_left() is path.node_right():
                continue
            nl, nr = path.node_left(), path.node_right()
            if (len(nl.in_edges) != 1 or len(nl.out_edges) != 2 or
                    len(nr.out_edges) != 1 or len(nr.in_edges) != 2):
                continue
            two = [path_index[e.edge_id] for e in nl.out_edges
                   if path_index[e.edge_id].node_right() is nr]
            if len(two) != 2:
                continue
            if two[0].id == two[1].id ^ 1:
                continue
            if two[0].id in used or two[1].id in used:
                continue
            entrance = path_index[nl.in_edges[0].edge_id]
            exit_p = path_index[nr.out_edges[0].edge_id]
            if entrance.id == exit_p.id ^ 1:
                continue
            if max(two[0].length, two[1].length) > max_len:
                continue
            for p in two:
                used.add(p.id)
                used.add(p.id ^ 1)
            if two[0].mean_coverage > two[1].mean_coverage:
                two = [two[1], two[0]]
            if (not two[0].path[0].alt_haplotype or
                    not two[1].path[0].alt_haplotype):
                n_masked += 1
            for p in two:
                for e in p.path:
                    e.alt_haplotype = True
                    e.alt_group_id = self._next_group
                    ce = self.graph.complement_edge(e)
                    ce.alt_haplotype = True
                    ce.alt_group_id = self._next_group + 1
            self._next_group += 2

            in_edge = entrance.path[-1]
            out_edge = exit_p.path[0]
            if in_edge.right_link or out_edge.left_link:
                continue
            logger.debug("Regular bubble: %r %r", in_edge, out_edge)
            self._link(in_edge, out_edge)
            self._store_bridge(in_edge, out_edge,
                               path_sequence(self.graph, two[0]))
        if n_masked:
            logger.debug("[SIMPL] Masked %d heterozygous bulges", n_masked)
        return n_masked

    def find_heterozygous_loops(self) -> int:
        """Low-coverage self-loop at a 2-in/2-out node: mask it and
        bridge the flanks — removing the loop if its coverage is very
        low, unrolling one copy otherwise
        (reference: haplotype_resolver.cpp:139-216)."""
        from flye_tpu.repeat.output import path_sequence
        cov_mult = self.cfg.loop_coverage_rate
        max_len = self.cfg.max_bubble_length
        paths = get_unbranching_paths(self.graph)
        n_masked = 0
        for loop in paths:
            if loop.id % 2:
                continue
            if loop.node_left() is not loop.node_right():
                continue
            if loop.path[0].self_complement:
                continue
            if loop.length > max_len:
                continue
            node = loop.node_left()
            if len(node.in_edges) != 2 or len(node.out_edges) != 2:
                continue
            entrance = exit_p = None
            for cand in paths:
                if cand.node_right() is node and cand.id != loop.id:
                    entrance = cand
                if cand.node_left() is node and cand.id != loop.id:
                    exit_p = cand
            if entrance is None or exit_p is None:
                continue
            if entrance.node_left() is entrance.node_right():
                continue
            if entrance.id == exit_p.id ^ 1:
                continue
            if loop.mean_coverage > cov_mult * entrance.mean_coverage:
                continue
            if loop.length > max(entrance.length, exit_p.length):
                continue

            if not loop.path[0].alt_haplotype:
                n_masked += 1
            for e in loop.path:
                e.alt_haplotype = True
                e.alt_group_id = self._next_group
                ce = self.graph.complement_edge(e)
                ce.alt_haplotype = True
                ce.alt_group_id = self._next_group + 1
            self._next_group += 2

            in_edge = entrance.path[-1]
            out_edge = exit_p.path[0]
            if in_edge.right_link or out_edge.left_link:
                continue
            logger.debug("Bubble-loop: %r %r", in_edge, out_edge)
            self._link(in_edge, out_edge)
            low_cov = (loop.mean_coverage <
                       (entrance.mean_coverage +
                        exit_p.mean_coverage) / 4)
            seq = (np.zeros(1, np.uint8) if low_cov
                   else path_sequence(self.graph, loop))
            self._store_bridge(in_edge, out_edge, seq)
        if n_masked:
            logger.debug("[SIMPL] Masked %d heterozygous loops", n_masked)
        return n_masked

    # ------------------------------------------------------------------

    def collapse_haplotypes(self) -> int:
        """Reroute each linked flank pair through its bridging sequence;
        masked branches stay in the graph as separate alt components
        (reference: haplotype_resolver.cpp:576-631 collapseHaplotypes)."""
        n_bridged = 0
        separated = set()
        for in_edge in self.graph.iter_edges():
            if in_edge.right_link is None:
                continue
            if in_edge.edge_id in separated:
                continue
            out_edge = in_edge.right_link
            if self.graph.edges.get(out_edge.edge_id) is not out_edge:
                logger.warning("Missing linked edge")
                continue
            if out_edge.left_link is not in_edge:
                logger.warning("Broken link")
                continue
            key = (in_edge.edge_id, out_edge.edge_id)
            if key not in self._bridging_seqs:
                logger.warning("No bridging path!")
                continue

            n_bridged += 1
            comp_in = self.graph.complement_edge(out_edge)
            comp_out = self.graph.complement_edge(in_edge)
            separated.add(comp_in.edge_id)

            seq = self._bridging_seqs[key]
            has_comp = (comp_in.edge_id, comp_out.edge_id) != key
            if len(seq) < 10:  # marker for "drop the branch entirely"
                self._separate_adjacent(in_edge, out_edge)
                if has_comp:
                    self._separate_adjacent(comp_in, comp_out)
            else:
                sid = self.graph.asm.add(
                    f"haplotype_bridge_{in_edge.edge_id}_"
                    f"{out_edge.edge_id}", np.ascontiguousarray(seq))
                base_id = self.graph._next_edge_id
                self._separate_distant(in_edge, out_edge, int(sid),
                                       len(seq), base_id)
                if has_comp:
                    self._separate_distant(comp_in, comp_out,
                                           int(sid) ^ 1, len(seq),
                                           base_id + 1)
                self.graph._next_edge_id = base_id + 2
        if n_bridged:
            logger.debug("[SIMPL] Collapsed %d haplotypes", n_bridged)
        return n_bridged

    def _separate_adjacent(self, in_edge: GraphEdge,
                           out_edge: GraphEdge) -> None:
        """(reference: haplotype_resolver.cpp separeteAdjacentEdges)."""
        new_node = self.graph.add_node()
        in_edge.node_right.in_edges.remove(in_edge)
        in_edge.node_right = new_node
        new_node.in_edges.append(in_edge)
        out_edge.node_left.out_edges.remove(out_edge)
        out_edge.node_left = new_node
        new_node.out_edges.append(out_edge)

    def _separate_distant(self, in_edge: GraphEdge, out_edge: GraphEdge,
                          seq_id: int, seq_len: int,
                          new_id: int) -> None:
        """(reference: haplotype_resolver.cpp separateDistantEdges)."""
        left = self.graph.add_node()
        in_edge.node_right.in_edges.remove(in_edge)
        in_edge.node_right = left
        left.in_edges.append(in_edge)
        right = self.graph.add_node()
        bridge = GraphEdge(left, right, new_id)
        bridge.seq_segments.append(
            EdgeSequence(seq_id, seq_len, 0, seq_len))
        bridge.mean_coverage = (in_edge.mean_coverage +
                                out_edge.mean_coverage) // 2
        self.graph.add_edge(bridge)
        out_edge.node_left.out_edges.remove(out_edge)
        out_edge.node_left = right
        right.out_edges.append(out_edge)
