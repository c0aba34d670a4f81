"""Coarse stage: score every bucket against every read's sampled k-mers.

TPU-native reformulation of the reference's fault_tolerate_filter cascade
(q_gram_mapper.h:27-136). The cascade
    filters[i] &= filters[i+1] | input ;  filters[last] &= input
followed by best_results() (highest non-empty level) is equivalent to:

    hits[b]  = #{samples s : bucket b contains ALL q-grams of s}
    answer   = { b : hits[b] == max_hits }   if max_hits >= m - fault + 1
             = {}                            otherwise

so instead of maintaining `fault` cascaded bitsets per read we compute the
per-bucket hit *count* with dense word-parallel AND + bit-unpack + add —
the TPU scale-up of std::bitset word-parallelism. Everything is
fixed-shape: candidate lists are padded to max_candidate_buckets with -1.

Per-read flow (query_sequence, q_gram_mapper.h:414-480):
  1. k-mer hashes + rolling quality sums over the segment,
  2. keep k-mers that are highly distinguishable (any contained q-gram
     with zeros >= d*N, :189-196) AND pass the quality gate,
  3. give up if fewer than 0.2*num_samples remain (strict double
     compare, replicated via math.ceil of the python-float product),
  4. deterministically sample num_samples of them,
  5. score buckets for the samples and their reverse complements,
  6. drop a strand's list if it exceeds max_candidate_buckets.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from bucketmap_tpu.config import MapperConfig
from bucketmap_tpu.index.builder import BucketIndex
from bucketmap_tpu.ops.encoding import kmer_hashes, revcomp_hash, window_quality_sums
from bucketmap_tpu.ops.sampler import sample_table


def min_good_kmers(cfg: MapperConfig) -> int:
    """Smallest good-k-mer count that is NOT skipped: the reference compares
    size < 0.2*num_samples in double (q_gram_mapper.h:445); python floats
    are IEEE doubles so math.ceil of the float product is exact."""
    return math.ceil(0.2 * cfg.mapper_samples)


class CoarseMapper:
    """Holds the coarse index on device and a jitted batch query."""

    def __init__(self, index: BucketIndex, interpret: bool = False):
        cfg = index.config
        cfg.validate()
        self.cfg = cfg
        self.n_buckets = index.n_buckets
        g = index.qgram_words.shape[0] - 1  # sentinel row index
        # lazy device transfer: a mesh owner installs the bucket-sharded
        # version before first use (device_pipeline.DeviceMapper)
        self._qgram_host = index.qgram_words
        self._qgram_dev = None
        # -1 (unsampled q-gram) -> sentinel all-ones row / zeros==-1
        k2r = index.kmer_to_row.astype(np.int32)
        self.kmer_to_row = jnp.asarray(np.where(k2r < 0, g, k2r))
        self.zeros = jnp.asarray(index.zeros)
        # distinguishability threshold: (unsigned)(d * N) (q_gram_mapper.h:163)
        self.dist_threshold = int(cfg.distinguishability * self.n_buckets)
        # Precompute is_highly_distinguishable per whole k-mer (one uint8
        # gather at query time instead of 2 gathers x (k-q+1) shifts).
        # 4^k entries; for k <= 13 that is <= 64 MB.
        if 4**cfg.query_seed <= (1 << 26):
            qb = np.uint32(4**cfg.index_seed - 1)
            per_gram = index.zeros[np.where(k2r < 0, g, k2r)] >= self.dist_threshold
            h = np.arange(4**cfg.query_seed, dtype=np.uint32)
            dist = np.zeros(4**cfg.query_seed, dtype=bool)
            for i in range(cfg.qgrams_per_kmer):
                dist |= per_gram[(h >> np.uint32(2 * i)) & qb]
            self.dist_by_kmer = jnp.asarray(dist.astype(np.uint8))
        else:
            self.dist_by_kmer = None
            self.zeros_ge = jnp.asarray(
                (index.zeros[np.where(k2r < 0, g, k2r)] >= self.dist_threshold
                 ).astype(np.uint8))
        self.sample_tab = jnp.asarray(
            sample_table(cfg.mapper_samples, cfg.read_len))
        # index arrays are passed as jit ARGUMENTS (not closure captures):
        # captured arrays become HLO constants, which recompile on every
        # index change and blow up remote-compile payloads.
        self._query = jax.jit(self._query_from_quals_impl)

    @property
    def qgram_words(self):
        if self._qgram_dev is None:
            self._qgram_dev = jnp.asarray(self._qgram_host)
        return self._qgram_dev

    @qgram_words.setter
    def qgram_words(self, v):
        self._qgram_dev = v

    def _index_args(self):
        dist_tab = self.dist_by_kmer if self.dist_by_kmer is not None else self.zeros_ge
        return (self.qgram_words, self.kmer_to_row, dist_tab, self.sample_tab)

    # -------------------------------------------------------------------
    def _query_from_quals_impl(self, qgram_words, kmer_to_row, dist_tab,
                               sample_tab, codes, quals, lengths):
        """Compatibility wrapper: derive the quality-gate mask from raw
        phred ranks on device, then run the mask-based query."""
        qual_ok = window_quality_sums(quals, self.cfg.query_seed, xp=jnp) \
            >= self.cfg.mapper_min_kmer_quality
        return self._query_impl(qgram_words, kmer_to_row, dist_tab,
                                sample_tab, codes, qual_ok, lengths)

    def _hits_impl(self, qgram_words, kmer_to_row, dist_tab, sample_tab,
                   codes: jax.Array, qual_ok: jax.Array, lengths: jax.Array):
        """Per-bucket hit counts for a batch — the word-parallel part of
        the query, valid on a bucket-range SHARD of the index (pass the
        local word columns; the candidate policy in _select_impl then
        needs the global view). Returns (hits (B, 2, w*32) int8,
        num_good (B,) int32, give_up (B,) bool)."""
        cfg = self.cfg
        k, q = cfg.query_seed, cfg.index_seed
        s = cfg.mapper_samples
        B, L = codes.shape
        K = L - k + 1  # k-mer positions (padded tail masked below)
        w = qgram_words.shape[1]
        qbits = jnp.uint32(4**q - 1)

        kmers = kmer_hashes(codes, k, xp=jnp)                       # (B, K)
        pos = jnp.arange(K, dtype=jnp.int32)
        valid = pos[None, :] < (lengths[:, None] - (k - 1))

        # distinguishability: any contained q-gram with zeros >= threshold,
        # precomputed per k-mer (or per q-gram for very large k)
        if self.dist_by_kmer is not None:
            disting = dist_tab[kmers] > 0
        else:
            disting = jnp.zeros((B, K), dtype=bool)
            for i in range(k - q + 1):
                gram = (kmers >> jnp.uint32(2 * i)) & qbits
                disting = disting | (dist_tab[gram] > 0)

        good = valid & disting & qual_ok
        num_good = good.sum(axis=1).astype(jnp.int32)
        give_up = num_good < min_good_kmers(cfg)

        # stable extraction of good positions in increasing order
        sort_key = jnp.where(good, pos[None, :], K + pos[None, :])
        order = jnp.argsort(sort_key, axis=1)                       # (B, K)
        ub = jnp.clip(num_good - 1, 0, sample_tab.shape[0] - 1)
        sel = sample_tab[ub]                                   # (B, s)
        samp_pos = jnp.take_along_axis(order, sel, axis=1)          # (B, s)
        samp_hash = jnp.take_along_axis(kmers, samp_pos, axis=1)    # (B, s)

        both = jnp.stack([samp_hash, revcomp_hash(samp_hash, k, xp=jnp)], axis=1)
        # AND the q-gram occupancy rows per sample, then count hits per
        # bucket with BIT-SLICED counters: per-bucket counts live as
        # ceil(log2(s+1)) uint32 bit-planes, added with a word-parallel
        # carry chain — the per-sample presence never expands to bytes
        # (32x less traffic than unpacking every sample's bits).
        n_planes = s.bit_length()  # counters hold up to 2^n_planes - 1 >= s
        planes = [jnp.zeros((B, 2, w), dtype=jnp.uint32) for _ in range(n_planes)]
        for s_i in range(s):
            h = both[:, :, s_i]                                      # (B, 2)
            presence = jnp.full((B, 2, w), 0xFFFFFFFF, dtype=jnp.uint32)
            for i in range(k - q + 1):
                gram = (h >> jnp.uint32(2 * i)) & qbits
                presence = presence & qgram_words[kmer_to_row[gram]]
            carry = presence
            for j in range(n_planes):
                t = planes[j] & carry
                planes[j] = planes[j] ^ carry
                carry = t
        # expand plane words to per-bucket counts via BYTES (bitcast u32 ->
        # 4x u8) so the intermediates stay 1 byte/bucket — the direct u32
        # shift would materialize 4 bytes/bucket/plane (OOMs at Gbp scale)
        shifts8 = jnp.arange(8, dtype=jnp.uint8)
        hits = jnp.zeros((B, 2, w, 4, 8), dtype=jnp.int8)
        for j in range(n_planes):
            by = jax.lax.bitcast_convert_type(planes[j], jnp.uint8)  # (B,2,w,4) LE
            bit = ((by[..., None] >> shifts8) & jnp.uint8(1)).astype(jnp.int8)
            hits = hits + (bit << j)
        hits = hits.reshape(B, 2, w * 32)
        return hits, num_good, give_up

    # -------------------------------------------------------------------
    CAND_CHUNK = 64  # bucket-chunk width for two-level candidate extraction

    def _chunk_stats(self, hits, n, col0: int = 0):
        """Mask out-of-range buckets and reduce per bucket-chunk.

        Returns (hc (B,2,nc,cs) int8 masked hits, chunk_max (B,2,nc) int8,
        local_max (B,2) int32)."""
        B = hits.shape[0]
        n_local = hits.shape[2]
        cs = self.CAND_CHUNK
        if n_local % cs:  # tiny worlds: pad to a whole chunk with -1
            pad = cs - n_local % cs
            hits = jnp.pad(hits, ((0, 0), (0, 0), (0, pad)),
                           constant_values=-1)
            n_local += pad
        col = col0 + jnp.arange(n_local, dtype=jnp.int32)
        in_range = col[None, None, :] < n
        hits = jnp.where(in_range, hits, jnp.int8(-1))
        hc = hits.reshape(B, 2, n_local // cs, cs)
        chunk_max = hc.max(axis=3)
        return hc, chunk_max, chunk_max.max(axis=2).astype(jnp.int32)

    def _extract_at_max(self, hc, chunk_max, max_hits, live, n, col0: int = 0):
        """Bucket ids at the (global) max hit count — two-level extraction.

        A direct top_k over the (B, 2, n_pad) hits tensor dominates the
        whole map step (measured 457 ms/batch at 26k buckets vs 76 ms
        for the scoring itself): XLA's TopK over 52k-wide rows is ~100x
        off bandwidth. Since live reads have <= C at-max buckets (more
        clears the read, q_gram_mapper.h:471-476), the at-max buckets
        occupy <= C of the 64-bucket chunks: find those chunks with a
        narrow top_k over the chunk-max reduction, gather only their hit
        values, and extract positions with a local top_k over C*64
        elements. Results identical to the direct extraction.

        Returns cand (B,2,C) int32 — ascending global ids, -1 padded."""
        C = self.cfg.max_candidate_buckets
        B, _, nc, cs = hc.shape
        at_max8 = max_hits[..., None].astype(jnp.int8)

        # level 1: chunks containing an at-max bucket, smallest first
        chunk_has = (chunk_max == at_max8) & live[..., None]
        ckey = jnp.where(chunk_has,
                         nc - jnp.arange(nc, dtype=jnp.int32)[None, None, :], 0)
        kc = min(C, nc)
        cvals, cidx = jax.lax.top_k(ckey, kc)                     # (B,2,kc)
        cvalid = cvals > 0
        cidx = jnp.where(cvalid, cidx, 0)

        # level 2: gather those chunks' hits, extract at-max positions
        sub = jnp.take_along_axis(hc, cidx[..., None], axis=2)    # (B,2,kc,cs)
        sub_col = col0 + (cidx[..., None] * cs
                          + jnp.arange(cs, dtype=jnp.int32))      # global ids
        sub_at = (sub == at_max8[..., None]) & cvalid[..., None]
        n_pad = col0 + nc * cs  # exclusive upper bound on this range's ids
        skey = jnp.where(sub_at, n_pad - sub_col, 0).reshape(B, 2, -1)
        vals, _ = jax.lax.top_k(skey, C)
        return jnp.where(vals > 0, n_pad - vals, -1).astype(jnp.int32)

    def _query_impl(self, qgram_words, kmer_to_row, dist_tab, sample_tab,
                    codes: jax.Array, qual_ok: jax.Array, lengths: jax.Array):
        """codes: (B, L) uint8; qual_ok: (B, L-k+1) bool (the quality gate
        sum(qual ranks over k) >= mapper_min_kmer_quality, precomputable
        host-side — see encoding.pack_reads); lengths: (B,) int32.

        Returns (candidates (B, 2, C) int32 -1-padded ascending,
                 counts (B, 2) int32, num_good (B,) int32).
        Axis 1 is strand: 0 = original, 1 = reverse complement.
        """
        cfg = self.cfg
        n = self.n_buckets
        hits, num_good, give_up = self._hits_impl(
            qgram_words, kmer_to_row, dist_tab, sample_tab, codes, qual_ok,
            lengths)

        hc, chunk_max, max_hits = self._chunk_stats(hits, n)
        ok = (max_hits >= cfg.min_coarse_hits) & ~give_up[:, None]
        counts = ((hc == max_hits[:, :, None, None].astype(jnp.int8))
                  & ok[..., None, None]).sum(axis=(2, 3)).astype(jnp.int32)
        over = counts > cfg.max_candidate_buckets                   # clear (:471-476)
        counts = jnp.where(over, 0, counts)
        cand = self._extract_at_max(hc, chunk_max, max_hits, ok & ~over, n)
        return cand, counts, num_good

    # -------------------------------------------------------------------
    def query_batch(self, codes: np.ndarray, quals: np.ndarray,
                    lengths: np.ndarray):
        cand, counts, num_good = self._query(
            *self._index_args(), jnp.asarray(codes), jnp.asarray(quals),
            jnp.asarray(lengths, dtype=jnp.int32))
        return np.asarray(cand), np.asarray(counts), np.asarray(num_good)
