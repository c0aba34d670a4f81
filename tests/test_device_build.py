"""Device fine-index build == host build, bit-exact.

The on-device construction (index/device_build.py) must reproduce the
host build_fine_index's fine_packed / fine_ptab / search_steps exactly
(same stable sort order, same prefix segmentation) — it replaces a
multi-GB host->device upload in production, so any divergence would
silently change vote results.
"""

import numpy as np

from bucketmap_tpu.config import MapperConfig
from bucketmap_tpu.index import builder
from bucketmap_tpu.index.device_build import build_fine_index_on_device
from bucketmap_tpu.sim.simulator import random_genome


def _world(bucket_len=2048, read_len=100, genome_len=30_000, k=8, seed=3):
    cfg = MapperConfig(bucket_len=bucket_len, read_len=read_len,
                       index_seed=5, query_seed=k)
    genome = random_genome(genome_len, seed=seed, n_refs=2)
    return builder.build_index(genome, cfg)


def test_device_build_matches_host():
    index = _world()
    host = _world()
    builder.build_fine_index(host)
    assert host.fine_packed is not None

    built = build_fine_index_on_device(index, row_chunk=4)  # force tail chunk
    assert built is not None
    fp, pt, steps, low_bits = built
    np.testing.assert_array_equal(np.asarray(fp), host.fine_packed)
    np.testing.assert_array_equal(np.asarray(pt), host.fine_ptab)
    assert steps == host.fine_search_steps
    assert low_bits == host.fine_low_bits


def test_device_build_respects_bucket_tail_lengths():
    # genome length chosen so the last bucket is short (residual > read_len)
    index = _world(genome_len=2048 * 3 + 500)
    host = _world(genome_len=2048 * 3 + 500)
    builder.build_fine_index(host)
    built = build_fine_index_on_device(index, row_chunk=3)
    fp, pt, steps, low_bits = built
    np.testing.assert_array_equal(np.asarray(fp), host.fine_packed)
    np.testing.assert_array_equal(np.asarray(pt), host.fine_ptab)
    assert steps == host.fine_search_steps


def test_device_build_gates_unsupported_k():
    # k=16 -> hash needs 32 bits, sentinel ambiguous: host build refuses,
    # device build returns None
    cfg = MapperConfig(bucket_len=2048, read_len=100, index_seed=5,
                       query_seed=16)
    genome = random_genome(10_000, seed=1, n_refs=1)
    index = builder.build_index(genome, cfg)
    assert build_fine_index_on_device(index) is None
