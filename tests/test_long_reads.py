"""Long-read (ONT-like) end-to-end accuracy through the segmentation
path, with the reference's long-read parameterization
(benchmark/long_read/benchmark_map.sh:25: -s 30 -e 0.9 -n 0.1 -l 12
-p 20 -u 5): reads > 2*read_len decompose into num_segment_samples
read_len-windows (q_gram_mapper.h:510-516), each segment maps
independently, segment offsets fold back to read coordinates and
cross-segment votes merge in filter_best_locations."""

import numpy as np

from bucketmap_tpu.config import MapperConfig
from bucketmap_tpu.index.builder import build_fine_index, build_index
from bucketmap_tpu.io.fastq import read_fastq
from bucketmap_tpu.io.sam import read_sam
from bucketmap_tpu.mapper.pipeline import BucketMapPipeline
from bucketmap_tpu.sim.simulator import LongReadSimulator, repeat_genome


def _long_read_cfg():
    # reference long-read flags: -s 30 -e 0.9 -n 0.1 -l 12 -p 20 -u 5
    return MapperConfig(bucket_len=16384, read_len=300, query_seed=12,
                        mapper_samples=30, seed_miss_rate=0.9,
                        indel_rate=0.1, locator_samples=20,
                        quality_threshold=5)


def test_long_reads_end_to_end(tmp_path):
    cfg = _long_read_cfg()
    genome = repeat_genome(600_000, seed=61, n_refs=2)
    index = build_index(genome, cfg)
    build_fine_index(index)

    sim = LongReadSimulator(genome, mean_len=5000, sd_len=1200,
                            min_len=2000, substitution_rate=0.02,
                            insertion_rate=0.02, deletion_rate=0.02,
                            seed=62)
    paths = sim.generate(tmp_path, "long", 60)
    batch = read_fastq(paths["fastq"])
    assert (batch.lengths > 2 * cfg.read_len).all()

    pipe = BucketMapPipeline(index, batch_size=64, pair_batch=64)
    sam = str(tmp_path / "long.sam")
    stats = pipe.map_reads(batch, sam)
    assert stats.num_reads == 60

    gt = [l.split() for l in open(paths["position_gt"])]
    recs = {}
    for r in read_sam(sam):
        recs.setdefault(r["qname"], []).append(r)
    ref_short = [n.split(" ")[0] for n in index.ref_names]
    mapped = correct = 0
    for i, (rid, pos, rc, _c) in enumerate(gt):
        rl = recs.get(str(i), [])
        if rl:
            mapped += 1
        # position tolerance scales with read length at 10% indel rate:
        # a segment's fold-back subtracts the UNGAPPED segment offset, so
        # drift up to ~indel_rate * seg_offset is expected
        tol = 0.1 * 5000
        for r in rl:
            if (r["rname"] == ref_short[int(rid)]
                    and (r["flag"] & 16 == 16) == bool(int(rc))
                    and abs(r["pos"] - int(pos)) <= tol):
                correct += 1
                break
    # pbsim3-grade accuracy isn't expected from 6% uniform errors on a
    # repeat-structured genome, but the overwhelming majority must land
    assert mapped >= 55, f"only {mapped}/60 long reads mapped"
    assert correct >= 50, f"only {correct}/60 correct positions"


def test_long_read_segments_fold_back_exact():
    """Error-free long reads must locate to the exact position (all
    segments vote for the same fold-back start)."""
    cfg = _long_read_cfg()
    genome = repeat_genome(300_000, seed=63, n_refs=1)
    index = build_index(genome, cfg)
    build_fine_index(index)
    sim = LongReadSimulator(genome, mean_len=3000, sd_len=0, min_len=3000,
                            substitution_rate=0.0, insertion_rate=0.0,
                            deletion_rate=0.0, seed=64)
    from bucketmap_tpu.io.fastq import ReadBatch

    n = 20
    rows = [sim.sample() for _ in range(n)]
    L = max(len(r[0]) for r in rows)
    codes = np.zeros((n, L), np.uint8)
    quals = np.full((n, L), 36, np.uint8)
    lengths = np.zeros(n, np.int32)
    for i, (c, *_rest) in enumerate(rows):
        codes[i, : len(c)] = c
        lengths[i] = len(c)
    batch = ReadBatch.from_arrays([str(i) for i in range(n)], codes, quals,
                                  lengths)
    pipe = BucketMapPipeline(index, batch_size=64, pair_batch=64)
    per_read, _ = pipe.locate_batch(batch)
    bl = cfg.bucket_len
    exact = 0
    for i, (c, ref_id, off, rc, _cig) in enumerate(rows):
        want = off
        for loc in per_read[i]:
            pos = index.bucket_ordinal[loc.bucket] * bl + loc.offset
            if pos == want and loc.is_orig != rc:
                exact += 1
                break
    assert exact >= 18, f"only {exact}/20 exact error-free long-read starts"

def test_long_read_align_mode(tmp_path):
    """Segment-stitched align mode (pipeline._align_long_emit): refined
    +-5 read starts on BOTH strands, full-length CIGARs, identity-margin
    MAPQ in [0, 60] (no size_t-wrap flood — the round-3 whole-read
    banded DP scored every ONT read below -60 and emitted garbage)."""
    import re

    cfg = _long_read_cfg()
    genome = repeat_genome(600_000, seed=61, n_refs=2)
    index = build_index(genome, cfg)
    build_fine_index(index)
    sim = LongReadSimulator(genome, mean_len=4000, sd_len=600, min_len=2500,
                            substitution_rate=0.02, insertion_rate=0.02,
                            deletion_rate=0.02, seed=62)
    sim.generate(tmp_path, "ont", 50)
    batch = read_fastq(tmp_path / "ont.fastq")
    pipe = BucketMapPipeline(index, batch_size=256, pair_batch=256,
                             align=True)
    pipe.map_reads(batch, tmp_path / "out.sam")

    gt = {}  # read index (= line number) -> (pos, rc)
    with open(tmp_path / "ont.position_ground_truth") as f:
        for i, line in enumerate(f):
            _origin, b, c, _ = line.split(maxsplit=3)
            gt[i] = (int(b), int(c) == 1)
    n_rec = n_pos5 = n_strand_pos5 = 0
    with open(tmp_path / "out.sam") as f:
        for line in f:
            if line[0] == "@":
                continue
            c = line.split("\t")
            rid, flag, pos, mapq, cig, seq = (int(c[0]), int(c[1]),
                                              int(c[3]), int(c[4]), c[5],
                                              c[9])
            n_rec += 1
            assert 0 <= mapq <= 60, mapq     # no wrap values
            consumed = sum(int(x) for x, op in
                           re.findall(r"(\d+)([MIDNSHP=X])", cig)
                           if op in "MIS=X")
            assert consumed == len(seq), (consumed, len(seq))
            tpos, trc = gt[rid]
            if abs(pos - tpos) <= 5:
                n_pos5 += 1
                if ((flag & 16) == 16) == trc:
                    n_strand_pos5 += 1
    assert n_rec >= 45                         # nearly all reads mapped
    assert n_strand_pos5 >= 0.85 * len(gt), (n_strand_pos5, len(gt))
