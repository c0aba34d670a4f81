"""Accuracy harness for the research-tree bucket classifiers (SURVEY §2.4)."""

import numpy as np
import pytest

from bucketmap_tpu.config import MapperConfig
from bucketmap_tpu.sim.simulator import ShortReadSimulator, random_genome
from research.classifiers import (GappedKMerFrequency, KMerExistence,
                                  KMerFrequency, MarkovChain)

CFG = MapperConfig(bucket_len=4096, read_len=150)


@pytest.fixture(scope="module")
def world():
    genome = random_genome(60_000, seed=51, n_refs=1)
    sim = ShortReadSimulator(CFG, substitution_rate=0.005, seed=52)
    sim.read(genome)
    reads = []
    for _ in range(60):
        c, bucket, _start, rc, _ = sim.sample()
        if rc:
            continue  # classifiers are strand-naive prototypes
        reads.append((c[: CFG.read_len], bucket))
    return genome, reads


@pytest.mark.parametrize("cls,k", [(KMerExistence, 9), (KMerFrequency, 7),
                                   (MarkovChain, 5)])
def test_classifier_accuracy(world, cls, k):
    genome, reads = world
    model = cls(CFG, k=k)
    model.read(genome)
    assert model.n_buckets > 5
    correct = sum(1 for codes, bucket in reads if model.query(codes) == bucket)
    # prototypes: expect strong but not perfect bucket classification
    assert correct >= 0.8 * len(reads), f"{correct}/{len(reads)}"


def test_gapped_kmer_frequency(world):
    """GappedKMerFrequency (kmer_frequency.py:162-256): gapped-seed
    variant classifies buckets accurately, degenerates to the ungapped
    model when the shape is contiguous, and rejects malformed shapes."""
    genome, reads = world
    model = GappedKMerFrequency(CFG, k=7, gap=5, seed=3)
    assert model.span > 7  # a real gapped shape was drawn
    model.read(genome)
    assert model.n_buckets > 5
    correct = sum(1 for codes, bucket in reads if model.query(codes) == bucket)
    assert correct >= 0.8 * len(reads), f"{correct}/{len(reads)}"

    # contiguous shape == ungapped model, bit for bit
    flat = GappedKMerFrequency(CFG, k=7, shape=list(range(7)))
    flat.read(genome)
    ungapped = KMerFrequency(CFG, k=7)
    ungapped.read(genome)
    np.testing.assert_array_equal(flat.matrix, ungapped.matrix)

    with pytest.raises(ValueError):
        GappedKMerFrequency(CFG, k=7, shape=[0, 1, 1, 2, 3, 4, 5])
    with pytest.raises(ValueError):
        GappedKMerFrequency(CFG, k=7, shape=[0, 1, 2])


# ---------------------------------------------------------------------------
# Neural / RL components (P5 + P7, research/neural.py)
# ---------------------------------------------------------------------------

def test_canonical_kmer_table():
    from research.neural import canonical_kmer_table
    table, n_can = canonical_kmer_table(3)
    # 4^3 = 64 kmers -> 32 revcomp classes (no palindromes at odd k)
    assert n_can == 32
    from bucketmap_tpu.ops.encoding import revcomp_hash
    h = np.arange(64, dtype=np.uint32)
    rc = revcomp_hash(h, 3, xp=np)
    assert (table[h] == table[rc]).all()


def test_mlp_bucket_classifier_learns():
    from research.neural import MLPBucketClassifier, ReadDataset
    from bucketmap_tpu.sim.simulator import random_genome

    cfg = MapperConfig(bucket_len=2048, read_len=100)
    genome = random_genome(16 * 2048, seed=11, n_refs=1)
    ds = ReadDataset(genome, cfg, substitution_rate=0.01, seed=12)
    clf = MLPBucketClassifier(k=6, d_model=256, seed=13)
    clf.fit(ds, steps=150, batch_size=64)
    acc = clf.accuracy(ds, n=256)
    assert acc > 0.9, f"classifier accuracy {acc}"


def test_repetitive_region_filter_detects_duplicates():
    from research.neural import RepetitiveRegionFilter
    from bucketmap_tpu.sim.simulator import random_genome

    cfg = MapperConfig(bucket_len=1024, read_len=64)
    rng = np.random.default_rng(14)
    seg = rng.integers(0, 4, 1024 + 64).astype(np.uint8)
    other = rng.integers(0, 4, 2 * 1024).astype(np.uint8)
    codes = np.concatenate([seg[:1024], other, seg[:1024],
                            rng.integers(0, 4, 1024 + 64).astype(np.uint8)])
    from bucketmap_tpu.io.fasta import FastaRecord
    recs = [FastaRecord("chr", codes)]
    filt = RepetitiveRegionFilter(cfg, k=9)
    prof = filt.read(recs)
    ji = filt.ji_matrix(prof)
    assert ji.shape[0] >= 5
    assert np.allclose(ji, ji.T)
    assert np.allclose(np.diag(ji), 0.0)
    # buckets 0 and 3 share the duplicated segment -> near-1 JI,
    # far above any random pair
    dup = ji[0, 3]
    rand_max = ji[np.triu_indices_from(ji, k=1)]
    rand_max = np.sort(rand_max)[-2]  # second largest (largest is dup pair)
    assert dup > 0.8 and dup > rand_max + 0.3


def test_rl_env_and_dqn():
    from research.neural import DQNAgent, ReferenceGenomeEnv
    from bucketmap_tpu.sim.simulator import random_genome

    genome = random_genome(8 * 1024, seed=15, n_refs=1)
    env = ReferenceGenomeEnv(genome, bucket_length=1024, read_length=80,
                             substitution_rate=0.0, seed=16)
    assert env.num_chunks == 8
    obs = env.reset()
    assert obs.shape == (80,) and env.last_observation_bucket in range(8)
    _obs2, r, done, _ = env.step(env.last_observation_bucket)
    assert r == 1 and done
    agent = DQNAgent(env, k=5, d_model=128, lr=3e-3, eps=0.3, seed=17)
    avg = agent.learn(total_timesteps=800, batch_size=32)
    assert avg > 0.4, f"DQN final avg reward {avg} (random = 1/8)"
