import numpy as np

from flye_tpu.config import Config
from flye_tpu.io import SequenceStore
from flye_tpu.repeat.graph import EdgeSequence, GraphEdge, RepeatGraph
from flye_tpu.repeat.haplotype import HaplotypeResolver


def make_bubble_graph():
    """in -> (branchA | branchB) -> out, plus complements."""
    store = SequenceStore()
    store.add("d", np.zeros(20000, np.uint8))
    g = RepeatGraph(store)
    nodes = [g.add_node() for _ in range(6)]  # fwd: 0-1-2; rc: 3-4-5

    def mk(eid, a, b, start, end, cov):
        e = GraphEdge(nodes[a], nodes[b], eid)
        e.seq_segments.append(EdgeSequence(0, 20000, start, end))
        e.mean_coverage = cov
        g.add_edge(e)
        return e

    e_in = mk(0, 0, 1, 0, 5000, 30)
    mk(1, 4, 3, 0, 5000, 30)           # complement of in
    br_a = mk(2, 1, 2, 5000, 6000, 18)
    mk(3, 5, 4, 5000, 6000, 18)
    br_b = mk(4, 1, 2, 5000, 6050, 9)  # lower coverage branch
    mk(5, 5, 4, 5000, 6050, 9)
    e_out = mk(6, 2, 0 + 0, 6000, 20000, 30)
    # fix: out edge goes 2 -> its own node
    g.edges[6].node_right.in_edges.remove(g.edges[6])
    extra = g.add_node()
    g.edges[6].node_right = extra
    extra.in_edges.append(g.edges[6])
    mk(7, 5 - 5, 5, 6000, 20000, 30)
    g.edges[7].node_left.out_edges.remove(g.edges[7])
    extra2 = g.add_node()
    g.edges[7].node_left = extra2
    extra2.out_edges.append(g.edges[7])
    return g, br_a, br_b


def test_find_and_collapse_bulge():
    g, br_a, br_b = make_bubble_graph()
    cfg = Config("raw", min_overlap=2000)
    hap = HaplotypeResolver(g, cfg)
    n = hap.find_heterozygous_bulges()
    assert n == 1
    assert br_b.alt_haplotype          # minor branch masked
    assert not br_a.alt_haplotype
    assert g.complement_edge(br_b).alt_haplotype
    assert br_b.alt_group_id >= 0
    # flanking edges linked
    assert g.edges[0].right_link is g.edges[6]

    collapsed = hap.collapse_haplotypes()
    assert collapsed == 1
    assert br_b.edge_id not in g.edges
    assert br_a.edge_id in g.edges


def test_keep_haplotypes_flag():
    cfg = Config("raw", keep_haplotypes=1)
    assert cfg.keep_haplotypes == 1
