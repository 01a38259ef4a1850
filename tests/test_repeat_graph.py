"""End-to-end repeat graph + contigger on simulated genomes."""

import numpy as np
import pytest

from flye_tpu.assemble import assemble_disjointigs
from flye_tpu.config import Config
from flye_tpu.contigger import generate_contigs
from flye_tpu.io import SequenceStore
from flye_tpu.repeat.driver import analyse_repeats
from flye_tpu.repeat.processing import get_unbranching_paths
from flye_tpu.utils.simulate import random_genome, simulate_reads


def build_stores(genome, coverage, seed, error_rate=0.0):
    reads = simulate_reads(genome, coverage=coverage, mean_length=6000,
                           min_length=2000, error_rate=error_rate,
                           circular=False, seed=seed)
    store = SequenceStore()
    for name, codes in reads:
        store.add(name, codes)
    return store


@pytest.mark.slow
def test_repeat_stage_simple_genome(tmp_path):
    # no repeats: expect a near-linear graph and ~1 contig
    genome = random_genome(30000, seed=401)
    reads = build_stores(genome, 15, 402)
    cfg = Config("corrected", min_overlap=2000)
    disjointigs = assemble_disjointigs(reads, cfg)
    assert disjointigs

    dstore = SequenceStore()
    for name, codes in disjointigs:
        dstore.add(name, codes)
    graph, aligner, inferer = analyse_repeats(
        dstore, reads, cfg, out_dir=str(tmp_path))
    assert len(graph.edges) >= 2  # fwd + rc of at least one edge
    assert not graph.validate()
    assert len(aligner.alignments) > 0
    assert inferer.mean_coverage > 5

    contigs, links = generate_contigs(graph, aligner, cfg,
                                      out_dir=str(tmp_path))
    assert contigs
    total = sum(c.length for c in contigs)
    assert total >= 0.85 * len(genome)
    # dumps written
    assert (tmp_path / "repeat_graph_dump").exists()
    assert (tmp_path / "contigs.fasta").exists()
    assert (tmp_path / "graph_final.gfa").exists()
    stats = (tmp_path / "contigs_stats.txt").read_text()
    assert stats.startswith("#seq_name")


@pytest.mark.slow
def test_repeat_stage_with_repeat(tmp_path):
    # genome with a long exact repeat: the graph should not be a single
    # edge — the repeat creates structure; contigs should still cover
    # most of the genome
    rng = np.random.default_rng(500)
    unique1 = rng.integers(0, 4, size=12000).astype(np.uint8)
    repeat = rng.integers(0, 4, size=4000).astype(np.uint8)
    unique2 = rng.integers(0, 4, size=12000).astype(np.uint8)
    unique3 = rng.integers(0, 4, size=12000).astype(np.uint8)
    genome = np.concatenate([unique1, repeat, unique2, repeat, unique3])

    reads = build_stores(genome, 18, 501)
    cfg = Config("corrected", min_overlap=2000)
    disjointigs = assemble_disjointigs(reads, cfg)
    assert disjointigs

    dstore = SequenceStore()
    for name, codes in disjointigs:
        dstore.add(name, codes)
    graph, aligner, inferer = analyse_repeats(
        dstore, reads, cfg, out_dir=str(tmp_path))
    assert not graph.validate()

    contigs, links = generate_contigs(graph, aligner, cfg,
                                      out_dir=str(tmp_path))
    assert contigs
    total = sum(c.length for c in contigs)
    # unique portion of the genome is 36kb + one repeat copy 4kb
    assert total >= 0.7 * (len(genome) - 4000)


def test_graph_dump_roundtrip(tmp_path):
    # construct a tiny graph by hand and round-trip the dump
    from flye_tpu.repeat.graph import (EdgeSequence, GraphEdge,
                                       RepeatGraph)
    store = SequenceStore()
    store.add("d1", np.zeros(1000, np.uint8))
    g = RepeatGraph(store)
    n1, n2 = g.add_node(), g.add_node()
    e = GraphEdge(n1, n2, 0)
    e.seq_segments.append(EdgeSequence(0, 1000, 10, 500))
    e.mean_coverage = 7
    g.add_edge(e)
    ce = GraphEdge(n2, n1, 1)
    ce.seq_segments.append(EdgeSequence(0, 1000, 10, 500).complement())
    g.add_edge(ce)

    path = str(tmp_path / "dump")
    g.store(path)
    g2 = RepeatGraph.load(store, path)
    assert len(g2.edges) == 2
    assert g2.edges[0].mean_coverage == 7
    assert g2.edges[0].seq_segments[0].start == 10
    assert g2.edges[1].seq_segments[0].orig_seq_id == 1
