"""Fully-fused device map step: coarse scoring + fine voting in ONE jit.

Unlike the host-orchestrated pipeline (mapper/pipeline.py) this keeps
the candidate->pair expansion on device with fixed shapes: every
(read, strand, candidate-slot) triple becomes a (masked) voting lane.
That makes the whole per-batch mapping a single XLA program — the shape
the multi-chip SPMD path wants: shard reads over the "data" mesh axis
and the q-gram occupancy matrix over the "bucket" axis, and XLA inserts
the collectives (the hit-count max/top_k reduce over the sharded bucket
axis) automatically.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from bucketmap_tpu.index.builder import BucketIndex
from bucketmap_tpu.ops.coarse import CoarseMapper
from bucketmap_tpu.ops.vote import FineLocator


class FusedMapper:
    """One-jit map step over a read batch.

    Optionally SPMD over a jax Mesh: pass mesh + axis names, and the
    index/compute arrays get NamedShardings (index sharded by bucket
    words, reads by data).
    """

    def __init__(self, index: BucketIndex, mesh: jax.sharding.Mesh | None = None,
                 data_axis: str = "data", bucket_axis: str = "bucket"):
        self.index = index
        self.cfg = index.config
        self.coarse = CoarseMapper(index)
        self.fine = FineLocator(index)
        self.mesh = mesh

        if mesh is not None:
            P = jax.sharding.PartitionSpec
            ns = lambda *spec: jax.sharding.NamedSharding(mesh, P(*spec))
            # index sharded along the bucket-word axis; reads along data
            self.coarse.qgram_words = jax.device_put(
                self.coarse.qgram_words, ns(None, bucket_axis))
            self.coarse.kmer_to_row = jax.device_put(self.coarse.kmer_to_row, ns(None))
            self.coarse.zeros = jax.device_put(self.coarse.zeros, ns(None))
            self.fine.buckets_packed = jax.device_put(
                self.fine.buckets_packed, ns(None, None))
            self.fine.bucket_lengths = jax.device_put(self.fine.bucket_lengths, ns(None))
            self._in_sharding = ns(data_axis, None)
            self._in_sharding1 = ns(data_axis)
        else:
            self._in_sharding = None

        self._step = jax.jit(self._step_impl)

    def _step_impl(self, codes, quals, lengths):
        """codes/quals (B, L) uint8, lengths (B,).

        Returns dict of per-(read, strand, cand-slot) results:
          cand (B,2,C), counts (B,2), offsets (B,2,C), votes (B,2,C),
          accept (B,2,C).
        """
        cfg = self.cfg
        B = codes.shape[0]
        C = cfg.max_candidate_buckets
        cand, counts, _ = self.coarse._query_impl(
            *self.coarse._index_args(), codes, quals, lengths)
        samp_hash, samp_idx = self.fine._prepare_impl(
            self.fine.sample_tab, codes, quals, lengths)

        # expand to voting lanes: (B, 2, C) -> (B*2*C,)
        flat_bucket = jnp.clip(cand.reshape(-1), 0, None).astype(jnp.int32)
        lane_read = jnp.repeat(jnp.arange(B, dtype=jnp.int32), 2 * C)
        lane_rc = jnp.tile(jnp.repeat(jnp.arange(2, dtype=jnp.int32), C), B).astype(bool)
        off, votes, acc = self.fine._vote_impl(
            self.fine.buckets_packed, self.fine.bucket_lengths,
            flat_bucket, lane_rc,
            samp_hash[lane_read], samp_idx[lane_read], lengths[lane_read])
        valid = cand.reshape(-1) >= 0
        acc = acc & valid
        return {
            "cand": cand, "counts": counts,
            "offsets": off.reshape(B, 2, C),
            "votes": votes.reshape(B, 2, C),
            "accept": acc.reshape(B, 2, C),
        }

    def step(self, codes: np.ndarray, quals: np.ndarray, lengths: np.ndarray):
        codes = jnp.asarray(codes)
        quals = jnp.asarray(quals)
        lengths = jnp.asarray(lengths, dtype=jnp.int32)
        if self._in_sharding is not None:
            codes = jax.device_put(codes, self._in_sharding)
            quals = jax.device_put(quals, self._in_sharding)
            lengths = jax.device_put(lengths, self._in_sharding1)
        return self._step(codes, quals, lengths)
