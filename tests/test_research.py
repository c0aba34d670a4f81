"""Accuracy harness for the research-tree bucket classifiers (SURVEY §2.4)."""

import numpy as np
import pytest

from bucketmap_tpu.config import MapperConfig
from bucketmap_tpu.sim.simulator import ShortReadSimulator, random_genome
from research.classifiers import KMerExistence, KMerFrequency, MarkovChain

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
