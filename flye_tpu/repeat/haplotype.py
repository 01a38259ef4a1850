"""Heterozygous variation masking.

Behavioral port of HaplotypeResolver essentials
(reference: src/repeat_graph/haplotype_resolver.cpp): simple bubbles —
one node with exactly two single-edge branches reconverging, branch
length <= max_bubble_length (:13-133 findHeterozygousBulges) and
heterozygous loops (:139).  The lower-coverage branch is masked
altHaplotype and the flanking edges linked; collapseHaplotypes detaches
masked branches unless --keep-haplotypes.

Roundabouts and superbubbles (meta mode, :485, :997) land next round.
"""

from __future__ import annotations

import logging
from flye_tpu.repeat.graph import RepeatGraph

logger = logging.getLogger("flye_tpu")


class HaplotypeResolver:
    def __init__(self, graph: RepeatGraph, cfg):
        self.graph = graph
        self.cfg = cfg
        self._next_group = 0

    def find_heterozygous_bulges(self) -> int:
        """(reference: haplotype_resolver.cpp:13-133)."""
        max_len = self.cfg.max_bubble_length
        found = 0
        for node in list(self.graph.nodes):
            if len(node.out_edges) != 2:
                continue
            two = node.out_edges
            if any(e.is_looped or e.self_complement for e in two):
                continue
            if two[0].node_right is not two[1].node_right:
                continue
            end = two[0].node_right
            if end is node:
                continue
            if any(e.length() > max_len for e in two):
                continue
            if any(e.alt_haplotype for e in two):
                continue
            # entrance and exit must exist and be single
            if len(node.in_edges) != 1 or len(end.out_edges) != 1:
                continue
            minor = min(two, key=lambda e: e.mean_coverage)
            group = self._next_group
            self._next_group += 1
            for e in (minor, self.graph.complement_edge(minor)):
                e.alt_haplotype = True
                e.alt_group_id = group
            # link flanking edges through the bubble
            entrance = node.in_edges[0]
            exit_edge = end.out_edges[0]
            entrance.right_link = exit_edge
            exit_edge.left_link = entrance
            ce = self.graph.complement_edge(entrance)
            cx = self.graph.complement_edge(exit_edge)
            cx.right_link = ce
            ce.left_link = cx
            found += 1
        if found:
            logger.debug("[SIMPL] Masked %d heterozygous bulges", found)
        return found

    def find_heterozygous_loops(self) -> int:
        """Single low-coverage self-loop at a 1-in-1-out node
        (reference: haplotype_resolver.cpp:139)."""
        found = 0
        for edge in self.graph.iter_edges():
            if not edge.is_looped or edge.alt_haplotype:
                continue
            node = edge.node_left
            n_in = [e for e in node.in_edges if not e.is_looped]
            n_out = [e for e in node.out_edges if not e.is_looped]
            if len(n_in) != 1 or len(n_out) != 1:
                continue
            through_cov = max(n_in[0].mean_coverage,
                              n_out[0].mean_coverage)
            if edge.mean_coverage < through_cov // 2 and \
                    edge.length() <= self.cfg.max_bubble_length:
                group = self._next_group
                self._next_group += 1
                for e in (edge, self.graph.complement_edge(edge)):
                    e.alt_haplotype = True
                    e.alt_group_id = group
                found += 1
        if found:
            logger.debug("[SIMPL] Masked %d heterozygous loops", found)
        return found

    def collapse_haplotypes(self) -> int:
        """Detach masked alternative branches
        (reference: haplotype_resolver.cpp:576 collapseHaplotypes)."""
        collapsed = 0
        for edge in list(self.graph.iter_edges()):
            if edge.edge_id not in self.graph.edges:
                continue
            if not edge.alt_haplotype:
                continue
            comp = self.graph.complement_edge(edge)
            self.graph.remove_edge(edge)
            if comp is not edge and comp.edge_id in self.graph.edges:
                self.graph.remove_edge(comp)
            collapsed += 1
        if collapsed:
            logger.debug("[SIMPL] Collapsed %d haplotype edges", collapsed)
        return collapsed
