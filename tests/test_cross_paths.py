"""Cross-path consistency: reference-format index vs native artifact, and
align mode on long reads."""

import numpy as np
import pytest

from bucketmap_tpu.config import MapperConfig
from bucketmap_tpu.index import builder
from bucketmap_tpu.io.fasta import write_fasta
from bucketmap_tpu.io.fastq import read_fastq
from bucketmap_tpu.io.sam import read_sam
from bucketmap_tpu.mapper.pipeline import BucketMapPipeline
from bucketmap_tpu.ops.encoding import decode_to_ascii
from bucketmap_tpu.sim.simulator import ShortReadSimulator, random_genome

CFG = MapperConfig(bucket_len=4096, read_len=150, index_seed=6, query_seed=9,
                   mapper_samples=8)


@pytest.fixture(scope="module")
def world(tmp_path_factory):
    d = tmp_path_factory.mktemp("cross")
    genome = random_genome(100_000, seed=61, n_refs=2)
    write_fasta(d / "g.fasta", [(r.id, decode_to_ascii(r.codes)) for r in genome])
    index = builder.build_index(genome, CFG)
    sim = ShortReadSimulator(CFG, substitution_rate=0.005, seed=62)
    sim.read(genome)
    paths = sim.generate(d, "rx", 150)
    return d, genome, index, paths


def test_reference_format_index_same_sam(world, tmp_path):
    """Mapping through an index round-tripped via the reference's on-disk
    formats must produce an identical SAM."""
    d, genome, index, paths = world
    builder.export_reference_format(index, tmp_path, "ref")
    index2 = builder.import_reference_format(tmp_path, "ref", CFG, d / "g.fasta")
    batch = read_fastq(paths["fastq"])
    BucketMapPipeline(index, batch_size=64, pair_batch=64).map_reads(
        batch, tmp_path / "a.sam")
    BucketMapPipeline(index2, batch_size=64, pair_batch=64).map_reads(
        batch, tmp_path / "b.sam")
    assert open(tmp_path / "a.sam").read() == open(tmp_path / "b.sam").read()


def test_align_mode_long_read(world, tmp_path):
    d, genome, index, _ = world
    start = 20_000
    frag = genome[0].codes[start : start + 600]
    seq = decode_to_ascii(frag).decode()
    (tmp_path / "lr.fastq").write_text(f"@lr\n{seq}\n+\n{'E' * len(seq)}\n")
    batch = read_fastq(tmp_path / "lr.fastq")
    pipe = BucketMapPipeline(index, align=True, batch_size=16, pair_batch=16)
    pipe.map_reads(batch, tmp_path / "lr.sam")
    recs = list(read_sam(tmp_path / "lr.sam"))
    assert recs, "long read unmapped in align mode"
    # the full 600bp read aligns against a ~615bp window; CIGAR consumes
    # the whole query
    import re
    for r in recs:
        consumed = sum(int(n) for n, op in re.findall(r"(\d+)([MIDX=])", r["cigar"])
                       if op in "MI=X")
        assert consumed == 600, r["cigar"]


def test_fine_index_artifact_roundtrip(world, tmp_path):
    d, genome, index, paths = world
    import copy

    idx2 = copy.copy(index)
    builder.build_fine_index(idx2)
    builder.save_index(idx2, tmp_path, "f")
    idx3 = builder.load_index(tmp_path, "f")
    # default build keeps only the packed fused-slot encoding
    assert idx3.fine_packed is not None and idx3.fine_ptab is not None
    np.testing.assert_array_equal(idx3.fine_packed, idx2.fine_packed)
    # mapping through the loaded fine index works
    batch = read_fastq(paths["fastq"])
    stats = BucketMapPipeline(idx3, batch_size=64, pair_batch=64).map_reads(
        batch, tmp_path / "f.sam")
    assert stats.mapped_locations >= 140
