"""Coarse mapper vs. a direct numpy port of the reference algorithm.

The oracle reimplements fault_tolerate_filter / distinguishability_filter /
query_sequence literally (cascaded bitsets etc., q_gram_mapper.h); the
production CoarseMapper uses the counting reformulation — results must be
identical.
"""

import math

import numpy as np
import pytest

from bucketmap_tpu.config import MapperConfig
from bucketmap_tpu.index.builder import build_index
from bucketmap_tpu.ops.coarse import CoarseMapper
from bucketmap_tpu.ops.encoding import kmer_hashes_ref, revcomp_hash, window_quality_sums
from bucketmap_tpu.ops.sampler import sample_deterministic
from bucketmap_tpu.sim.simulator import ShortReadSimulator, random_genome

CFG = MapperConfig(bucket_len=4096, read_len=150, index_seed=6, query_seed=9,
                   mapper_samples=8, kmer_fraction=1.0)


class Oracle:
    def __init__(self, index):
        cfg = index.config
        self.cfg = cfg
        self.n = index.n_buckets
        g = index.qgram_words.shape[0] - 1
        # expand words to a (G, N) bool matrix
        bits = (index.qgram_words[:g, :, None] >> np.arange(32, dtype=np.uint32)) & 1
        self.rows = bits.reshape(g, -1)[:, : self.n].astype(bool)
        self.k2r = index.kmer_to_row
        self.zeros = index.zeros[:g]
        self.threshold = int(cfg.distinguishability * self.n)
        self.fault = cfg.num_fault_tolerance

    def _is_dist(self, h):
        cfg = self.cfg
        qb = 4**cfg.index_seed - 1
        for i in range(cfg.query_seed - cfg.index_seed + 1):
            idx = self.k2r[(int(h) >> (2 * i)) & qb]
            if idx >= 0 and self.zeros[idx] >= self.threshold:
                return True
        return False

    def query(self, samples):
        # literal fault_tolerate_filter (q_gram_mapper.h:75-102)
        cfg = self.cfg
        qb = 4**cfg.index_seed - 1
        filters = np.ones((self.fault, self.n), dtype=bool)
        for h in samples:
            bf = np.ones(self.n, dtype=bool)
            for i in range(cfg.query_seed - cfg.index_seed + 1):
                idx = self.k2r[(int(h) >> (2 * i)) & qb]
                if idx >= 0:
                    bf &= self.rows[idx]
            for lvl in range(self.fault - 1):
                filters[lvl] &= filters[lvl + 1] | bf
            filters[self.fault - 1] &= bf
        for lvl in range(self.fault - 1, -1, -1):
            if filters[lvl].any():
                return np.flatnonzero(filters[lvl])
        return np.zeros(0, dtype=np.int64)

    def query_sequence(self, codes, quals):
        cfg = self.cfg
        k = cfg.query_seed
        if len(codes) < k:
            return [], []
        kmers = kmer_hashes_ref(codes, k)
        qs = window_quality_sums(np.asarray(quals, np.int32), k)
        good = [int(kmers[i]) for i in range(len(kmers))
                if self._is_dist(kmers[i]) and qs[i] >= cfg.mapper_min_kmer_quality]
        if len(good) < 0.2 * cfg.mapper_samples:   # double compare (:445)
            return [], []
        sel = sample_deterministic(cfg.mapper_samples, len(good) - 1)
        samples = [good[j] for j in sel]
        cand_o = self.query(samples)
        cand_r = self.query([int(revcomp_hash(np.uint32(h), k)) for h in samples])
        if len(cand_o) > cfg.max_candidate_buckets:
            cand_o = np.zeros(0, dtype=np.int64)
        if len(cand_r) > cfg.max_candidate_buckets:
            cand_r = np.zeros(0, dtype=np.int64)
        return list(cand_o), list(cand_r)


@pytest.fixture(scope="module")
def setup():
    genome = random_genome(80_000, seed=11, n_refs=2)
    index = build_index(genome, CFG)
    sim = ShortReadSimulator(CFG, substitution_rate=0.01, insertion_rate=0.002,
                             deletion_rate=0.002, seed=5)
    sim.read(genome)
    return index, sim


def _read_batch(sim, n, quals_val=36):
    cfg = sim.cfg
    codes = np.zeros((n, cfg.read_len), dtype=np.uint8)
    quals = np.zeros((n, cfg.read_len), dtype=np.uint8)
    lengths = np.zeros(n, dtype=np.int32)
    gt = []
    for i in range(n):
        c, bucket, start, rc, _ = sim.sample()
        c = c[: cfg.read_len]  # insertions can overflow read_len; clip
        codes[i, : len(c)] = c
        quals[i, : len(c)] = quals_val
        lengths[i] = len(c)
        gt.append((bucket, start, rc))
    return codes, quals, lengths, gt


def test_coarse_matches_oracle(setup):
    index, sim = setup
    mapper = CoarseMapper(index)
    oracle = Oracle(index)
    codes, quals, lengths, _ = _read_batch(sim, 64)
    cand, counts, num_good = mapper.query_batch(codes, quals, lengths)
    for i in range(64):
        o_orig, o_rc = oracle.query_sequence(codes[i, : lengths[i]],
                                             quals[i, : lengths[i]])
        got_orig = [c for c in cand[i, 0] if c >= 0]
        got_rc = [c for c in cand[i, 1] if c >= 0]
        assert got_orig == o_orig, f"read {i} orig"
        assert got_rc == o_rc, f"read {i} revcomp"
        assert counts[i, 0] == len(o_orig) and counts[i, 1] == len(o_rc)


def test_coarse_finds_true_bucket(setup):
    index, sim = setup
    mapper = CoarseMapper(index)
    codes, quals, lengths, gt = _read_batch(sim, 128)
    cand, counts, _ = mapper.query_batch(codes, quals, lengths)
    correct = 0
    for i, (bucket, _start, rc) in enumerate(gt):
        strand = 1 if rc else 0
        if bucket in cand[i, strand]:
            correct += 1
    # random genome, low error rate: nearly all reads hit their bucket
    assert correct >= 120, f"only {correct}/128 correct buckets"


def test_low_quality_reads_give_up(setup):
    index, sim = setup
    mapper = CoarseMapper(index)
    codes, quals, lengths, _ = _read_batch(sim, 8, quals_val=0)
    cand, counts, num_good = mapper.query_batch(codes, quals, lengths)
    assert (counts == 0).all() and (cand == -1).all()
    assert (num_good == 0).all()


def test_min_good_kmers_double_semantics():
    from bucketmap_tpu.ops.coarse import min_good_kmers

    # 0.2*s in double rounds exactly to an integer for these s; the strict
    # '<' in the reference then keeps reads with exactly that many good k-mers
    assert min_good_kmers(MapperConfig(mapper_samples=15)) == 3
    assert min_good_kmers(MapperConfig(mapper_samples=5)) == 1
    assert min_good_kmers(MapperConfig(mapper_samples=20)) == 4
    # a genuinely non-integral product rounds up
    assert min_good_kmers(MapperConfig(mapper_samples=17)) == 4  # 3.4000000000000004
