"""The three fine-vote kernels (packed-scan, sorted-positional,
prefix-accelerated) must produce identical results."""

import numpy as np

from bucketmap_tpu.config import MapperConfig
from bucketmap_tpu.index.builder import build_fine_index, build_index
from bucketmap_tpu.ops.vote import FineLocator
from bucketmap_tpu.sim.simulator import ShortReadSimulator, random_genome


def _world(genome):
    cfg = MapperConfig(bucket_len=2048, read_len=150, query_seed=12,
                       locator_samples=10)
    index = build_index(genome, cfg)
    build_fine_index(index, keep_unpacked=True)  # all four kernel paths
    assert index.fine_ptab is not None and index.fine_low is not None
    assert index.fine_packed is not None
    return cfg, index


def _vote_all_paths(index, bucket_ids, is_rc, samp_hash, samp_idx, seg_len):
    fl = FineLocator(index)
    outs = {}
    args = (bucket_ids, is_rc, samp_hash, samp_idx, seg_len)
    outs["packed"] = fl.vote(*args)
    fl.fine_packed = None
    outs["prefix"] = fl.vote(*args)
    fl.fine_ptab = fl.fine_low = None
    outs["sorted"] = fl.vote(*args)
    fl.fine_pos = None
    outs["scan"] = fl.vote(*args)
    return outs


def _check_paths_agree(index, codes, quals, seg_len, bucket_ids, is_rc):
    fl = FineLocator(index)
    samp_hash, samp_idx = fl.prepare(codes, quals, seg_len)
    outs = _vote_all_paths(index, bucket_ids, is_rc, samp_hash, samp_idx,
                           seg_len)
    for name in ("prefix", "sorted", "scan"):
        for a, b, what in zip(outs["packed"], outs[name],
                              ("offset", "votes", "accept")):
            np.testing.assert_array_equal(
                a, b, err_msg=f"packed vs {name}: {what}")
    return outs["packed"]


def test_vote_paths_agree_random_genome():
    rng = np.random.default_rng(21)
    genome = random_genome(20 * 2048, seed=20, n_refs=2)
    cfg, index = _world(genome)
    sim = ShortReadSimulator(cfg, substitution_rate=0.01, seed=22)
    sim.read(genome)
    n = 48
    codes = np.zeros((n, cfg.read_len), np.uint8)
    quals = np.full((n, cfg.read_len), 36, np.uint8)
    seg_len = np.zeros(n, np.int32)
    bucket_ids = np.zeros(n, np.int32)
    is_rc = np.zeros(n, bool)
    for i in range(n):
        c, bucket, _off, rc, _ = sim.sample()
        c = c[: cfg.read_len]
        codes[i, : len(c)] = c
        seg_len[i] = len(c)
        bucket_ids[i] = bucket
        is_rc[i] = rc
    off, votes, acc = _check_paths_agree(index, codes, quals, seg_len,
                                         bucket_ids, is_rc)
    assert acc.sum() >= n * 0.9  # nearly all should locate


def test_vote_paths_agree_repetitive_genome():
    """Tandem repeats + poly-A stretches stress MAX_OCC and the prefix
    search depth (many equal hashes per bucket)."""
    rng = np.random.default_rng(30)
    unit = rng.integers(0, 4, 37).astype(np.uint8)
    tandem = np.tile(unit, 200)[: 2 * 2048]
    polya = np.zeros(2048, np.uint8)
    rest = rng.integers(0, 4, 4 * 2048).astype(np.uint8)
    from bucketmap_tpu.io.fasta import FastaRecord
    genome = [FastaRecord("rep", np.concatenate([tandem, polya, rest]))]
    cfg, index = _world(genome)
    assert index.fine_search_steps >= 8  # repeats force deep segments

    n = 32
    codes = np.zeros((n, cfg.read_len), np.uint8)
    quals = np.full((n, cfg.read_len), 36, np.uint8)
    seg_len = np.full(n, cfg.read_len, np.int32)
    all_codes = genome[0].codes
    starts = rng.integers(0, len(all_codes) - cfg.read_len, n)
    for i, s in enumerate(starts):
        codes[i] = all_codes[s : s + cfg.read_len]
    bucket_ids = (starts // cfg.bucket_len).astype(np.int32)
    is_rc = rng.random(n) < 0.5
    _check_paths_agree(index, codes, quals, seg_len, bucket_ids, is_rc)


def test_fine_index_v2_artifact_roundtrip(tmp_path):
    from bucketmap_tpu.index.builder import load_index, save_index

    genome = random_genome(8 * 2048, seed=40, n_refs=1)
    cfg, index = _world(genome)
    save_index(index, tmp_path, "v2")
    loaded = load_index(tmp_path, "v2")
    np.testing.assert_array_equal(loaded.fine_ptab, index.fine_ptab)
    np.testing.assert_array_equal(loaded.fine_low, index.fine_low)
    np.testing.assert_array_equal(loaded.fine_pos, index.fine_pos)
    np.testing.assert_array_equal(loaded.fine_packed, index.fine_packed)
    assert loaded.fine_low_bits == index.fine_low_bits
    assert loaded.fine_search_steps == index.fine_search_steps
    # packed slots decode back to the positional arrays
    lb = index.fine_low_bits
    valid = index.fine_pos >= 0
    np.testing.assert_array_equal(
        np.where(valid, (index.fine_packed >> np.uint32(lb)).astype(np.int64),
                 -1),
        index.fine_pos.astype(np.int64))
    np.testing.assert_array_equal(
        (index.fine_packed & np.uint32((1 << lb) - 1))[valid].astype(np.uint16),
        index.fine_low[valid])
