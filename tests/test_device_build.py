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
    # device fp is tile-stored 3-D (n, T, 128) with sentinel-filled
    # column padding for the hybrid vote search; real columns are
    # bit-identical to the host build
    lpos = host.fine_packed.shape[1]
    assert fp.ndim == 3 and fp.shape[2] == 128
    flat = np.asarray(fp).reshape(fp.shape[0], -1)
    assert flat.shape[1] >= lpos
    np.testing.assert_array_equal(flat[:, :lpos], host.fine_packed)
    assert (flat[:, lpos:] == 0xFFFFFFFF).all()
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
    lpos = host.fine_packed.shape[1]
    flat = np.asarray(fp).reshape(fp.shape[0], -1)
    np.testing.assert_array_equal(flat[:, :lpos], host.fine_packed)
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


def test_device_occupancy_build_matches_host():
    """Round-5: the coarse occupancy table built ON device from
    buckets_packed must be bit-identical to the host build
    (builder.py:290-347 scatter semantics), including FracMinHash
    subsetting, device-side column padding, and the sentinel row."""
    from bucketmap_tpu.index.device_build import build_occupancy_on_device

    for frac in (1.0, 0.25):
        cfg = MapperConfig(bucket_len=2048, read_len=100, index_seed=5,
                           query_seed=9, kmer_fraction=frac)
        genome = random_genome(200_000, seed=7, n_refs=2)
        index = builder.build_index(genome, cfg)
        w = -(-index.n_buckets // 32)
        wq = -(-w // 16) * 16
        dev = build_occupancy_on_device(index, width=wq, groups_per_call=3)
        got = np.asarray(dev)
        host = np.asarray(index.qgram_words)
        np.testing.assert_array_equal(got[:, :w], host)
        assert not got[:, w:].any()          # padding zero in EVERY row


def test_device_occupancy_wired_into_mapper(monkeypatch):
    """BMTPU_DEVICE_OCC=1 routes CoarseMapper's table through the device
    build; the full map step must produce identical results."""
    import jax

    from bucketmap_tpu.mapper.device_pipeline import DeviceMapper
    from bucketmap_tpu.sim.simulator import ShortReadSimulator, repeat_genome

    cfg = MapperConfig(bucket_len=2048, read_len=100, index_seed=5,
                       query_seed=9, mapper_samples=8, locator_samples=6,
                       max_candidate_buckets=4)
    genome = repeat_genome(200_000, seed=3, n_refs=2)
    index = builder.build_index(genome, cfg)
    sim = ShortReadSimulator(cfg, substitution_rate=0.01, seed=4)
    sim.read(genome)
    codes = np.zeros((32, 100), np.uint8)
    quals = np.full((32, 100), 36, np.uint8)
    lens = np.zeros(32, np.int32)
    for i in range(32):
        c, *_ = sim.sample()
        c = c[:100]
        codes[i, : len(c)] = c
        lens[i] = len(c)

    monkeypatch.setenv("BMTPU_DEVICE_OCC", "1")
    dm1 = DeviceMapper(index, batch_size=32, pairs_per_read=4, vote_chunk=32)
    h1 = dm1.decode_out(np.asarray(jax.device_get(dm1.step(codes, quals, lens))))
    monkeypatch.setenv("BMTPU_DEVICE_OCC", "0")
    dm2 = DeviceMapper(index, batch_size=32, pairs_per_read=4, vote_chunk=32)
    h2 = dm2.decode_out(np.asarray(jax.device_get(dm2.step(codes, quals, lens))))
    for key in ("lane_read", "lane_bucket", "offset", "votes", "counts",
                "n_accept"):
        np.testing.assert_array_equal(np.asarray(h1[key]), np.asarray(h2[key]))
