"""Research-tree bucket classifiers (reference mcomp_project/, SURVEY §2.4).

Compact reimplementations of the exploratory models that preceded the
shipping bit-parallel index — useful for studying the design space:

  * KMerExistence  (P4, kmer_existence.py): boolean k-mer-presence matrix;
    query = count of present sampled k-mers per bucket, argmax.
  * KMerFrequency  (P2, kmer_frequency.py): per-bucket k-mer log-frequency
    matrix; query = argmax of summed log-probabilities.
  * MarkovChain    (P3, markov_chain.py): order-q Markov chain per bucket
    (initial + transition log-probs); query by log-likelihood.

All vectorized numpy (jnp-compatible shapes); buckets follow the same
decomposition as the production index.
"""

from __future__ import annotations

import numpy as np

from bucketmap_tpu.config import MapperConfig
from bucketmap_tpu.index.builder import iterate_buckets
from bucketmap_tpu.ops.encoding import kmer_hashes


class _BucketModel:
    def __init__(self, cfg: MapperConfig, k: int):
        self.cfg = cfg
        self.k = k
        self.n_buckets = 0

    def _buckets(self, records):
        for _rid, _start, codes in iterate_buckets(records, self.cfg):
            yield codes


class KMerExistence(_BucketModel):
    def read(self, records) -> None:
        rows = []
        for codes in self._buckets(records):
            present = np.zeros(4**self.k, dtype=bool)
            if len(codes) >= self.k:
                present[np.unique(kmer_hashes(codes, self.k))] = True
            rows.append(present)
        self.matrix = np.stack(rows)          # (N, 4^k) bool
        self.n_buckets = len(rows)

    def query(self, codes: np.ndarray, num_samples: int = 15) -> int:
        h = kmer_hashes(codes, self.k)
        sel = np.linspace(0, len(h) - 1, num_samples).astype(int)
        scores = self.matrix[:, h[sel]].sum(axis=1)
        return int(np.argmax(scores))


class KMerFrequency(_BucketModel):
    """Log-frequency model with add-one smoothing (kmer_frequency.py:9-160)."""

    def read(self, records) -> None:
        rows = []
        for codes in self._buckets(records):
            counts = np.ones(4**self.k, dtype=np.float64)  # +1 smoothing
            if len(codes) >= self.k:
                np.add.at(counts, kmer_hashes(codes, self.k), 1.0)
            rows.append(np.log(counts / counts.sum()))
        self.matrix = np.stack(rows)          # (N, 4^k) float
        self.n_buckets = len(rows)

    def query(self, codes: np.ndarray, num_samples: int = 15) -> int:
        h = kmer_hashes(codes, self.k)
        sel = np.linspace(0, len(h) - 1, num_samples).astype(int)
        scores = self.matrix[:, h[sel]].sum(axis=1)
        return int(np.argmax(scores))


class MarkovChain(_BucketModel):
    """Order-(k-1) Markov chain per bucket (markov_chain.py:7-200):
    transition probability from the (k-1)-mer prefix to the last base."""

    def read(self, records) -> None:
        k = self.k
        trans = []
        for codes in self._buckets(records):
            counts = np.ones((4 ** (k - 1), 4), dtype=np.float64)
            if len(codes) >= k:
                h = kmer_hashes(codes, k)
                prefix = h >> 2
                last = h & 3
                np.add.at(counts, (prefix, last), 1.0)
            trans.append(np.log(counts / counts.sum(axis=1, keepdims=True)))
        self.trans = np.stack(trans)          # (N, 4^(k-1), 4)
        self.n_buckets = len(trans)

    def query(self, codes: np.ndarray) -> int:
        h = kmer_hashes(codes, self.k)
        prefix = h >> 2
        last = h & 3
        scores = self.trans[:, prefix, last].sum(axis=1)
        return int(np.argmax(scores))
