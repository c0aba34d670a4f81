"""P6 theoretical correctness model (research/theory.py) — reproduces
the reference's simulate_kmer_frequency.py semantics."""

import numpy as np

from research.theory import KmerFrequencyModel


def test_reference_parameterization_is_correct():
    # the reference's __main__ run: 7 Mbp, 700 buckets, 50 samples, k=7
    m = KmerFrequencyModel(7_000_000, 700, 50, 7, 11)
    assert abs(m.mu - (m.bucket_size - 11) / 4**7) < 1e-12
    assert abs(m.hit_mu - (1 + (m.bucket_size - 100) / 4**7)) < 1e-12
    res = m.correctness(n_sim=300, seed=0)
    assert res["simulated_correctness"] > 0.99
    assert res["worst_case_correctness"] > 0.9
    assert res["lower_bound"] < res["expectation"]


def test_small_k_loses_distinguishability():
    """With k too small, background buckets match as often as the true
    one — the model must show the correctness collapse that motivates
    the reference's k >= 9 choice."""
    weak = KmerFrequencyModel(7_000_000, 700, 20, 4, 11)
    strong = KmerFrequencyModel(7_000_000, 700, 20, 8, 11)
    rw = weak.correctness(n_sim=150, seed=1)
    rs = strong.correctness(n_sim=150, seed=1)
    assert rs["simulated_correctness"] > rw["simulated_correctness"]
    assert rw["simulated_correctness"] < 0.5


def test_sweep_shapes():
    m = KmerFrequencyModel(1_000_000, 100, 10, 6, 9)
    rows = m.sweep([5, 7], [5, 20], n_sim=50)
    assert len(rows) == 4
    assert {(r["k"], r["sample_num"]) for r in rows} == \
        {(5, 5), (5, 20), (7, 5), (7, 20)}
