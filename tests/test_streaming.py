"""Streamed FASTQ mapping: iterator parity + chunked map_fastq parity.

The round-5 memory story (VERDICT r4 #6): parse + map + emit per chunk
instead of materializing 4 dense (n, L) matrices + the file bytes.
The streamed path must produce byte-identical SAM to the whole-file
path on the same input.
"""

import numpy as np
import pytest

from bucketmap_tpu.config import MapperConfig
from bucketmap_tpu.index import builder
from bucketmap_tpu.io.fastq import iter_fastq_batches, read_fastq
from bucketmap_tpu.mapper.pipeline import BucketMapPipeline
from bucketmap_tpu.sim.simulator import ShortReadSimulator, random_genome


@pytest.fixture(scope="module")
def world(tmp_path_factory):
    d = tmp_path_factory.mktemp("stream")
    cfg = MapperConfig(bucket_len=4096, read_len=100, mapper_samples=8,
                       locator_samples=6)
    genome = random_genome(120_000, seed=5, n_refs=2)
    idx = builder.build_index(genome, cfg)
    sim = ShortReadSimulator(cfg, substitution_rate=0.01,
                             insertion_rate=0.002, deletion_rate=0.002,
                             seed=6)
    sim.read(genome)
    sim.generate(d, "reads", 400)
    return d, idx


def test_iter_fastq_batches_parity(world):
    d, _ = world
    path = d / "reads.fastq"
    full = read_fastq(path)
    tot = 0
    for b in iter_fastq_batches(path, reads_per_batch=97):
        w = b.codes.shape[1]
        np.testing.assert_array_equal(
            b.codes, full.codes[tot: tot + b.num_reads, :w])
        np.testing.assert_array_equal(
            b.quals, full.quals[tot: tot + b.num_reads, :w])
        np.testing.assert_array_equal(
            b.lengths, full.lengths[tot: tot + b.num_reads])
        assert b.ids == full.ids[tot: tot + b.num_reads]
        tot += b.num_reads
    assert tot == full.num_reads


def test_iter_fastq_python_fallback(world):
    d, _ = world
    path = d / "reads.fastq"
    a = list(iter_fastq_batches(path, reads_per_batch=150, use_native=True))
    b = list(iter_fastq_batches(path, reads_per_batch=150, use_native=False))
    assert len(a) == len(b)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x.codes, y.codes)
        np.testing.assert_array_equal(x.lengths, y.lengths)


def test_map_fastq_streamed_sam_identical(world, monkeypatch):
    d, idx = world
    pipe = BucketMapPipeline(idx, batch_size=64, pair_batch=64)
    monkeypatch.setenv("BMTPU_STREAM_CHUNK", "0")
    st_whole = pipe.map_fastq(d / "reads.fastq", d / "whole.sam")
    monkeypatch.setenv("BMTPU_STREAM_CHUNK", "128")
    st_stream = pipe.map_fastq(d / "reads.fastq", d / "stream.sam")
    assert (d / "stream.sam").read_bytes() == (d / "whole.sam").read_bytes()
    assert st_stream.num_reads == st_whole.num_reads == 400
    assert st_stream.mapped_locations == st_whole.mapped_locations
    assert st_stream.num_bases == int(read_fastq(d / "reads.fastq").lengths.sum())


def test_slab_upload_matches_asarray():
    import jax.numpy as jnp

    from bucketmap_tpu.index.builder import slab_upload

    rng = np.random.default_rng(0)
    a = rng.integers(0, 2**32, (1000, 37), dtype=np.uint32)
    d = slab_upload(a, width=64, slab_bytes=37 * 4 * 128)  # many slabs + tail
    assert d.shape == (1000, 64)
    np.testing.assert_array_equal(np.asarray(d)[:, :37], a)
    assert not np.asarray(d)[:, 37:].any()
    d2 = slab_upload(a)
    np.testing.assert_array_equal(np.asarray(d2), a)
