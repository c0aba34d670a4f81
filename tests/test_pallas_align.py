"""The Pallas forward-DP kernel (ops/align.py:_dp_fwd_pallas) must agree
exactly with the lax.scan twin: scores, begin positions, and tracebacks.
Runs the kernel in interpret mode (tests are CPU-only; the compiled
kernel is additionally verified against the scan path on the real chip —
see PERF.md)."""

import numpy as np
import pytest

from bucketmap_tpu.config import MapperConfig
from bucketmap_tpu.index import builder
from bucketmap_tpu.ops import align as A
from bucketmap_tpu.sim.simulator import random_genome


@pytest.fixture(scope="module")
def small_index():
    cfg = MapperConfig(bucket_len=65536, read_len=300)
    genome = random_genome(300_000, seed=3, n_refs=1)
    return builder.build_index(genome, cfg)


def test_pallas_dp_matches_scan(small_index):
    idx = small_index
    rng = np.random.default_rng(0)
    P, Q = 130, 300  # non-multiple of the 128-lane block: exercises padding
    bids = rng.integers(0, idx.n_buckets, size=P).astype(np.int32)
    offs = rng.integers(0, 50000, size=P).astype(np.int32)
    isrc = rng.integers(0, 2, size=P).astype(bool)
    qlen = rng.integers(150, Q + 1, size=P).astype(np.int32)
    qcodes = rng.integers(0, 4, size=(P, Q)).astype(np.uint8)
    # half the pairs: real windows with errors, so scores are near zero
    # and tracebacks carry indels (not just all-mismatch garbage)
    bp = np.asarray(idx.buckets_packed)
    for i in range(0, P, 2):
        w = bp[bids[i]]
        bases = ((w[:, None] >> (np.arange(16, dtype=np.uint32) * 2)) & 3)
        seq = bases.reshape(-1)[offs[i]: offs[i] + Q].astype(np.uint8)
        mut = rng.random(len(seq)) < 0.05
        seq[mut] = (seq[mut] + rng.integers(1, 4, mut.sum())) % 4
        qcodes[i, : len(seq)] = seq
        isrc[i] = False

    al1 = A.BandedAligner(idx, pair_batch=256)
    al1._dp_mode = "scan"
    s1, b1, o1 = al1.align_batch(qcodes, qlen, bids, offs, isrc)

    al2 = A.BandedAligner(idx, pair_batch=256)
    al2._dp_mode = "pallas"
    al2._dp_interpret = True
    s2, b2, o2 = al2.align_batch(qcodes, qlen, bids, offs, isrc)

    assert np.array_equal(s1, s2)
    assert np.array_equal(b1, b2)
    assert np.array_equal(o1, o2)
    # mutated-window pairs whose window fits their bucket must align well
    blen = np.asarray(idx.bucket_lengths)[bids[::2]]
    in_range = offs[::2] + Q + A.BAND < blen
    assert in_range.any() and (s1[::2][in_range] > -40).all()
