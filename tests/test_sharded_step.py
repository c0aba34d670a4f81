"""The bucket-sharded mesh step must equal the single-device step —
through the raw DeviceMapper step AND the full pipeline (where the
per-shard lane budget can overflow and the split-retry path engages)."""

import numpy as np
import jax
import pytest

from bucketmap_tpu.config import MapperConfig
from bucketmap_tpu.index.builder import build_fine_index, build_index
from bucketmap_tpu.mapper.device_pipeline import DeviceMapper
from bucketmap_tpu.mapper.pipeline import BucketMapPipeline
from bucketmap_tpu.parallel.sharding import make_mesh
from bucketmap_tpu.sim.simulator import ShortReadSimulator, random_genome


def _world(fine=True):
    cfg = MapperConfig(bucket_len=1024, read_len=100, index_seed=7,
                       query_seed=10, mapper_samples=8, locator_samples=6,
                       max_candidate_buckets=6)
    genome = random_genome(60_000, seed=11, n_refs=2)
    index = build_index(genome, cfg)
    if fine:
        build_fine_index(index)
    sim = ShortReadSimulator(cfg, substitution_rate=0.01, seed=12)
    sim.read(genome)
    return cfg, index, sim


def _reads(sim, cfg, n):
    codes = np.zeros((n, cfg.read_len), np.uint8)
    quals = np.full((n, cfg.read_len), 36, np.uint8)
    lengths = np.zeros(n, np.int32)
    rows = []
    for i in range(n):
        c, bucket, off, rc, cig = sim.sample()
        c = c[: cfg.read_len]
        codes[i, : len(c)] = c
        lengths[i] = len(c)
        rows.append((bucket, off, rc))
    return codes, quals, lengths, rows


def _accepted(h):
    return set(zip(np.asarray(h["lane_read"]).tolist(),
                   np.asarray(h["lane_bucket"]).tolist(),
                   np.asarray(h["lane_rc"]).tolist(),
                   np.asarray(h["offset"]).tolist(),
                   np.asarray(h["votes"]).tolist()))


@pytest.mark.parametrize("fine", [True, False])
def test_sharded_step_equals_single_device(fine):
    cfg, index, sim = _world(fine)
    mesh = make_mesh(8)  # (2, 4): data x bucket
    B = 16
    codes, quals, lengths, _ = _reads(sim, cfg, B)
    m = DeviceMapper(index, batch_size=B, pairs_per_read=16, vote_chunk=B,
                     mesh=mesh)
    s = DeviceMapper(index, batch_size=B, pairs_per_read=16, vote_chunk=B)
    hm = m.decode_out(np.asarray(jax.device_get(m.step(codes, quals, lengths))))
    hs = s.decode_out(np.asarray(jax.device_get(s.step(codes, quals, lengths))))
    assert int(hm["local_valid"].max()) <= m.lane_budget
    assert _accepted(hm) == _accepted(hs)
    np.testing.assert_array_equal(hm["counts"], hs["counts"])
    assert int(hm["total_valid"]) == int(hs["total_valid"])
    assert len(_accepted(hm)) >= B * 0.8


def test_sharded_pipeline_with_overflow_split():
    """Tiny per-shard lane budget forces the overflow split-retry path;
    end-to-end SAM records must still match the single-device pipeline."""
    cfg, index, sim = _world()
    mesh = make_mesh(8)
    n = 64
    codes, quals, lengths, _ = _reads(sim, cfg, n)

    from bucketmap_tpu.io.fastq import ReadBatch

    def mk_batch():
        return ReadBatch.from_arrays(
            [str(i) for i in range(n)], codes, quals, lengths)

    # pairs_per_read=1 -> per-shard budget ~ B/Db: overflows on real data
    pm = BucketMapPipeline(index, batch_size=16, pair_batch=16,
                           pairs_per_read=1, mesh=mesh)
    ps = BucketMapPipeline(index, batch_size=16, pair_batch=16,
                           pairs_per_read=16)
    (r1, b1, o1, v1, s1, _), st1 = pm.locate_arrays(mk_batch())
    (r2, b2, o2, v2, s2, _), st2 = ps.locate_arrays(mk_batch())
    set1 = set(zip(r1.tolist(), b1.tolist(), o1.tolist(), v1.tolist(),
                   s1.tolist()))
    set2 = set(zip(r2.tolist(), b2.tolist(), o2.tolist(), v2.tolist(),
                   s2.tolist()))
    assert set1 == set2
    assert st1.candidate_pairs >= n  # candidates were actually produced
    assert len(set1) >= n * 0.8

def test_sharded_pipeline_align_mode(tmp_path):
    """Align mode under the mesh: the aligner gets its own single-device
    copy of the packed genome (the fine stage's is bucket-sharded), and
    the mesh pipeline's SAM must equal the single-device pipeline's."""
    cfg, index, sim = _world()
    mesh = make_mesh(8)
    n = 48
    codes, quals, lengths, _ = _reads(sim, cfg, n)

    from bucketmap_tpu.io.fastq import ReadBatch

    def mk_batch():
        return ReadBatch.from_arrays(
            [str(i) for i in range(n)], codes, quals, lengths)

    pm = BucketMapPipeline(index, batch_size=16, pair_batch=16,
                           pairs_per_read=16, mesh=mesh, align=True)
    ps = BucketMapPipeline(index, batch_size=16, pair_batch=16,
                           pairs_per_read=16, align=True)
    pm.map_reads(mk_batch(), tmp_path / "mesh.sam")
    ps.map_reads(mk_batch(), tmp_path / "single.sam")

    def recs(p):
        return [line for line in open(p) if line[0] != "@"]

    mesh_recs, single_recs = recs(tmp_path / "mesh.sam"), \
        recs(tmp_path / "single.sam")
    assert mesh_recs == single_recs
    assert len(mesh_recs) >= n * 0.8
    assert all("\t*\t" not in r.split("\t", 6)[5] for r in mesh_recs)
