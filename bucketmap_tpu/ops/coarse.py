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
import os

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


def _popcount32(x, xp=jnp):
    """SWAR popcount of a uint32 array (Mosaic has no population_count)."""
    x = x - ((x >> xp.uint32(1)) & xp.uint32(0x55555555))
    x = (x & xp.uint32(0x33333333)) + ((x >> xp.uint32(2)) & xp.uint32(0x33333333))
    x = (x + (x >> xp.uint32(4))) & xp.uint32(0x0F0F0F0F)
    return ((x * xp.uint32(0x01010101)) >> xp.uint32(24)).astype(xp.int32)


def _word_max_cnt(planes, vmask, xp=jnp):
    """Per-word max + at-max count of 32 bit-plane-packed counters.

    planes[j] bit b = bit j of bucket b's hit count; vmask = valid-bucket
    bits. Bitwise max: scan planes high->low keeping the candidate set —
    cand starts as vmask; at each plane, if any candidate has the bit
    set, the max has it and candidates narrow to those. O(n_planes) word
    ops instead of expanding 32 per-bucket counts (the VPU-bound 32x
    inner loop this replaces). Fully-masked words read max -1, count 32
    (the tile-padding convention downstream relies on).

    Returns (cm int32, cc int32) with planes' shape."""
    cand = vmask
    m = jnp.zeros(vmask.shape, jnp.int32) if xp is jnp else \
        np.zeros(vmask.shape, np.int32)
    for j in range(len(planes) - 1, -1, -1):
        t = cand & planes[j]
        nz = t != xp.uint32(0)
        cand = xp.where(nz, t, cand)
        m = m * 2 + nz.astype(xp.int32)
    empty = vmask == xp.uint32(0)
    cm = xp.where(empty, -1, m)
    cc = xp.where(empty, 32, _popcount32(cand, xp=xp))
    return cm, cc


def _valid_word_mask(colbase, bound, xp=jnp):
    """uint32 word of valid-bucket bits for words whose first bucket is
    colbase: all-ones below the boundary word, partial at it, 0 past."""
    rem = bound - colbase
    shift = xp.clip(rem, 0, 31).astype(xp.uint32)
    part = (xp.uint32(1) << shift) - xp.uint32(1)
    return xp.where(rem >= 32, xp.uint32(0xFFFFFFFF),
                    xp.where(rem <= 0, xp.uint32(0), part))


def _chunk_scan_pallas(presence, bound, block_rows: int = 256,
                       interpret: bool = False):
    """Fused bit-sliced counting + per-word-chunk reduction as one Pallas
    kernel.

    presence: (B, 2, s, w) uint32 — per-sample bucket-presence words (the
    AND of each sample's q-gram occupancy rows). bound: int32 scalar, the
    first out-of-range bucket column (masked out — required because the
    all-ones sentinel row sets phantom bits beyond the last real bucket).

    Per (row-block, word-tile) program: run the s-step carry chain into
    bit-plane registers, then reduce each word's 32 packed counters to
    chunk max + at-max count with the bitwise plane scan (_word_max_cnt)
    — all in VMEM, no per-bucket expansion. The (B, 2, n) per-bucket hit
    tensor (425 MB/batch at production scale, the round-1 design) never
    exists in HBM: traffic is one presence read + two (B, 2, w) writes.

    Returns (chunk_max (B, 2, w_pad) i32, chunk_cnt (B, 2, w_pad) i32,
    planes (B, 2, n_planes, w_pad) uint32 packed per-bucket counters)
    where w_pad rounds w up to the tile width (padded chunks read as
    fully masked: max -1, count 32).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, two, s, w = presence.shape
    B2 = B * two
    n_planes = s.bit_length()
    pres = presence.reshape(B2, s, w)
    Tw = 128 if w >= 128 else -(-w // 8) * 8
    wp = -(-w // Tw) * Tw
    if wp != w:
        pres = jnp.pad(pres, ((0, 0), (0, 0), (0, wp - w)))
    BR = min(block_rows, B2)
    assert B2 % BR == 0, (B2, BR)
    nt = wp // Tw

    def kernel(bound_ref, p_ref, cm_ref, cc_ref, pl_ref):
        t = pl.program_id(1)
        bnd = bound_ref[0]
        planes = [jnp.zeros((BR, Tw), jnp.uint32) for _ in range(n_planes)]
        for i in range(s):
            carry = p_ref[:, i, :]
            for j in range(n_planes):
                tmp = planes[j] & carry
                planes[j] = planes[j] ^ carry
                carry = tmp
        wit = jax.lax.broadcasted_iota(jnp.int32, (BR, Tw), 1)
        colbase = (t * Tw + wit) * 32
        cm, cc = _word_max_cnt(planes, _valid_word_mask(colbase, bnd))
        cm_ref[:] = cm
        cc_ref[:] = cc
        for j in range(n_planes):
            pl_ref[:, j] = planes[j]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B2 // BR, nt),
        in_specs=[
            pl.BlockSpec((BR, s, Tw), lambda i, t, _b: (i, 0, t),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((BR, Tw), lambda i, t, _b: (i, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BR, Tw), lambda i, t, _b: (i, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BR, n_planes, Tw), lambda i, t, _b: (i, 0, t),
                         memory_space=pltpu.VMEM),
        ],
    )
    cm, cc, planes = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((B2, wp), jnp.int32),
            jax.ShapeDtypeStruct((B2, wp), jnp.int32),
            jax.ShapeDtypeStruct((B2, n_planes, wp), jnp.uint32),
        ],
        interpret=interpret,
    )(jnp.asarray(bound, jnp.int32).reshape(1), pres)
    return (cm.reshape(B, two, wp), cc.reshape(B, two, wp),
            planes.reshape(B, two, n_planes, wp))


def _presence_gather_pallas(qgram_words, rows, block_samples: int = 240,
                            n_slots: int = 8, interpret: bool = False):
    """Presence row-gather + AND as one Pallas kernel with a manual DMA
    ring.

    qgram_words: (G1, wq) uint32 occupancy table, wq % 128 == 0 (lane-
    aligned rows), resident in HBM (pltpu.ANY). rows: (R, 4) int32 — per
    sample row, the table rows of its 4 contained q-grams (kmer_to_row
    applied). Returns presence (R, wq) uint32 = AND of the 4 rows.

    XLA lowers the equivalent take() to a scattered row gather measured
    at ~51 GB/s (8% of HBM); here each grid program owns `block_samples`
    samples and streams their 4-row sets through an n_slots-deep ring of
    async HBM->VMEM copies (4 DMAs in flight per slot), so row fetch
    latency overlaps the AND of earlier slots.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    R, nq = rows.shape
    G1, S8, L = qgram_words.shape             # row = (S8, 128) sub-tiles
    assert L == 128 and S8 % 8 == 0, (S8, L)  # HBM slices must tile-align
    T = min(block_samples, R)
    while R % T:                               # largest divisor <= block
        T -= 1
    NS = n_slots

    def kernel(rows_ref, tab_ref, out_ref):
        def body(scratch, sems):
            def dma(t, slot, i):
                return pltpu.make_async_copy(
                    tab_ref.at[rows_ref[t, i]],
                    scratch.at[slot, i],
                    sems.at[slot, i])

            for t in range(min(NS, T)):        # warmup: fill the ring
                for i in range(nq):
                    dma(t, t % NS, i).start()

            def step(t, _):
                slot = jax.lax.rem(t, NS)
                for i in range(nq):
                    dma(t, slot, i).wait()
                acc = scratch[slot, 0]
                for i in range(1, nq):
                    acc = acc & scratch[slot, i]
                out_ref[pl.ds(t, 1)] = acc[None]

                @pl.when(t + NS < T)
                def _():
                    for i in range(nq):
                        dma(t + NS, slot, i).start()
                return 0

            jax.lax.fori_loop(0, T, step, 0)

        pl.run_scoped(
            body,
            scratch=pltpu.VMEM((NS, nq, S8, L), jnp.uint32),
            sems=pltpu.SemaphoreType.DMA((NS, nq)),
        )

    out = pl.pallas_call(
        kernel,
        grid=(R // T,),
        in_specs=[
            pl.BlockSpec((T, nq), lambda i: (i, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((T, S8, L), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((R, S8, L), jnp.uint32),
        interpret=interpret,
    )(rows, qgram_words)
    return out.reshape(R, S8 * L)


def _coarse_score_pallas(qgram_words3, rows, bound, s: int,
                         block_rows: int = 32, n_slots: int = 16,
                         interpret: bool = False):
    """The WHOLE coarse scoring as one Pallas kernel: row gather (manual
    DMA ring), per-sample AND, bit-plane ripple-carry counting, and the
    per-word max / at-max-count reduction — presence never exists in HBM.

    qgram_words3: (G1, S8, 128) uint32 occupancy table (row = S8*128
    words, S8 % 8 == 0 so a row slice covers whole (8,128) tiles).
    rows: (B2*s, nq) int32 — table rows of each sample's nq contained
    q-grams, s samples per read-strand, sample-minor. bound: int32 (1,)
    — first out-of-range bucket column.

    Returns (chunk_max (B2, S8*128) i32, chunk_cnt (B2, S8*128) i32,
    planes (B2, n_planes, S8*128) uint32) — cm/cc exactly as
    _chunk_scan_jnp(presence) would give, planes carrying the packed
    per-bucket hit counters for downstream at-max extraction.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    R, nq = rows.shape
    assert R % s == 0
    B2 = R // s
    G1, S8, L = qgram_words3.shape
    assert L == 128 and S8 % 8 == 0, (S8, L)
    n_planes = s.bit_length()
    BR = min(block_rows, B2)
    while B2 % BR:
        BR -= 1
    T = BR * s
    NS = n_slots

    def kernel(bound_ref, rows_ref, tab_ref, cm_ref, cc_ref, planes_ref):
        def body(scratch, sems):
            def dma(t, slot, i):
                return pltpu.make_async_copy(
                    tab_ref.at[rows_ref[t, i]],
                    scratch.at[slot, i],
                    sems.at[slot, i])

            planes_ref[:] = jnp.zeros((BR, n_planes, S8, L), jnp.uint32)

            for t in range(min(NS, T)):        # warmup: fill the ring
                for i in range(nq):
                    dma(t, t % NS, i).start()

            def step(t, _):
                slot = jax.lax.rem(t, NS)
                r = jax.lax.div(t, s)
                for i in range(nq):
                    dma(t, slot, i).wait()
                carry = scratch[slot, 0]
                for i in range(1, nq):
                    carry = carry & scratch[slot, i]
                # ripple the sample's presence bits into the read's
                # packed counters (commutative, so sample order is free)
                for j in range(n_planes):
                    pj = planes_ref[r, j]
                    planes_ref[r, j] = pj ^ carry
                    carry = pj & carry

                @pl.when(t + NS < T)
                def _():
                    for i in range(nq):
                        dma(t + NS, slot, i).start()
                return 0

            jax.lax.fori_loop(0, T, step, 0)

            sub = jax.lax.broadcasted_iota(jnp.int32, (S8, L), 0)
            lane = jax.lax.broadcasted_iota(jnp.int32, (S8, L), 1)
            vmask = _valid_word_mask((sub * L + lane) * 32, bound_ref[0])
            planes = [planes_ref[:, j] for j in range(n_planes)]
            cm, cc = _word_max_cnt(planes, vmask[None])
            cm_ref[:] = cm
            cc_ref[:] = cc

        pl.run_scoped(
            body,
            scratch=pltpu.VMEM((NS, nq, S8, L), jnp.uint32),
            sems=pltpu.SemaphoreType.DMA((NS, nq)),
        )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B2 // BR,),
        in_specs=[
            pl.BlockSpec((T, nq), lambda i, _b: (i, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=[
            pl.BlockSpec((BR, S8, L), lambda i, _b: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BR, S8, L), lambda i, _b: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BR, n_planes, S8, L), lambda i, _b: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
    )
    cm, cc, planes = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((B2, S8, L), jnp.int32),
            jax.ShapeDtypeStruct((B2, S8, L), jnp.int32),
            jax.ShapeDtypeStruct((B2, n_planes, S8, L), jnp.uint32),
        ],
        interpret=interpret,
    )(jnp.asarray(bound, jnp.int32).reshape(1), rows, qgram_words3)
    wq = S8 * L
    return (cm.reshape(B2, wq), cc.reshape(B2, wq),
            planes.reshape(B2, n_planes, wq))


def _first_set_indices(mask, C: int):
    """Indices of the first C set lanes along the last axis — exact capped
    compaction via cumsum ranks + a fused rank-match reduction.

    XLA's TopK lowers to a full sort-network pass on TPU: measured
    ~35 ms per call on (8192, 2, 896) int32 keys — 2x the entire fine
    stage. A binary search over the rank vector is better but its
    take_along_axis probes are ~10M scalar gathers per call (~75 ms
    measured at production shape). Gather-free instead: the j-th set
    bit is the unique position whose masked running rank equals j+1, so
    one broadcast compare against the C target ranks and a sum over the
    position axis extracts all C indices in a single streaming pass
    (XLA fuses the (..., n, C) indicator into the reduction — it never
    exists in HBM).

    mask: (..., n) bool. Returns (idx (..., C) int32 ascending, valid
    (..., C) bool); idx is 0 where invalid.

    Shape note: the single broadcast compare (..., n, C) puts C in the
    minor axis — 30/128 lanes used, measured ~45 ms at production shape.
    Looping the C targets instead keeps n in the (padded) lane axis, so
    every pass is a full-lane fused compare+select+reduce over an int8
    rank vector: measured ~6 ms for the same work."""
    n = mask.shape[-1]
    rank = jnp.cumsum(mask.astype(jnp.int32), axis=-1)       # (..., n)
    total = rank[..., -1:]
    tgt = jnp.arange(1, C + 1, dtype=jnp.int32)              # (C,)
    valid = tgt <= total
    # ranks beyond C can never match a target — clip into int8
    rt = jnp.int8 if C + 1 <= 127 else jnp.int32
    r8 = jnp.where(mask, jnp.minimum(rank, C + 1), 0).astype(rt)
    pos = jnp.arange(n, dtype=jnp.int32)
    cols = [jnp.sum(jnp.where(r8 == rt(c), pos, 0), axis=-1)
            for c in range(1, C + 1)]
    idx = jnp.stack(cols, axis=-1)                           # (..., C)
    return jnp.where(valid, idx, 0), valid


def _chunk_scan_jnp(presence, bound):
    """Reference implementation of _chunk_scan_pallas in plain jnp (used
    on CPU: tests, dryruns). Identical outputs, including the w -> w_pad
    tile padding, so the two backends are interchangeable."""
    B, two, s, w = presence.shape
    n_planes = s.bit_length()
    planes = [jnp.zeros((B, two, w), jnp.uint32) for _ in range(n_planes)]
    for i in range(s):
        carry = presence[:, :, i, :]
        for j in range(n_planes):
            tmp = planes[j] & carry
            planes[j] = planes[j] ^ carry
            carry = tmp
    colbase = jnp.arange(w, dtype=jnp.int32) * 32
    vmask = _valid_word_mask(colbase[None, None, :], bound)
    cm, cc = _word_max_cnt(planes, vmask)
    planes = jnp.stack(planes, axis=2)                  # (B, 2, n_planes, w)
    Tw = 128 if w >= 128 else -(-w // 8) * 8
    wp = -(-w // Tw) * Tw
    if wp != w:
        cm = jnp.pad(cm, ((0, 0), (0, 0), (0, wp - w)), constant_values=-1)
        cc = jnp.pad(cc, ((0, 0), (0, 0), (0, wp - w)), constant_values=32)
        planes = jnp.pad(planes, ((0, 0), (0, 0), (0, 0), (0, wp - w)))
    return cm, cc, planes


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
        self._index = index      # for the on-device occupancy build
        # -1 (unsampled q-gram) -> sentinel all-ones row / zeros==-1
        k2r = index.kmer_to_row.astype(np.int32)
        self.kmer_to_row = jnp.asarray(np.where(k2r < 0, g, k2r))
        # FracMinHash f=1.0 keeps every q-gram in hash order, so the
        # row map is the identity — the (B,2,s,nq) row gather (3.9M
        # elements/batch, ~15 ms measured) can be skipped entirely
        self.k2r_identity = bool(
            k2r.shape[0] == g and np.array_equal(k2r, np.arange(g)))
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
        # chunk-scan backend: the fused Pallas kernel on TPU, plain jnp
        # elsewhere (tests/dryruns run on CPU). BMTPU_COARSE=pallas|jnp
        # overrides; BMTPU_PALLAS_INTERPRET=1 interprets the kernel.
        env = os.environ.get("BMTPU_COARSE", "auto")
        self._scan_interpret = \
            os.environ.get("BMTPU_PALLAS_INTERPRET", "0") == "1"
        if env in ("pallas", "jnp"):
            self._scan_mode = env
        else:
            self._scan_mode = ("jnp" if jax.default_backend() == "cpu"
                               else "pallas")
        # index arrays are passed as jit ARGUMENTS (not closure captures):
        # captured arrays become HLO constants, which recompile on every
        # index change and blow up remote-compile payloads.
        self._query = jax.jit(self._query_from_quals_impl)

    @property
    def qgram_words(self):
        if self._qgram_dev is None:
            import jax as _jax

            from bucketmap_tpu.index.builder import slab_upload
            qw = self._qgram_host
            w = qw.shape[1]
            if self._scan_mode == "pallas":
                # tile-align rows for the manual-DMA presence gather (an
                # HBM row slice must cover whole (8, 128) tiles); padded
                # columns are past `bound` and mask to -1 downstream.
                # Padding happens ON DEVICE (slab_upload): the old host
                # np.pad + whole-table jnp.asarray cost ~2.1 GB of
                # transient+retained host RSS at genome scale
                wq = -(-w // 1024) * 1024
            else:
                wq = w
            # BMTPU_DEVICE_OCC=1|auto: rebuild the occupancy table ON
            # the chip from buckets_packed (bit-identical, verified)
            # instead of uploading it — the remote client permanently
            # retains every uploaded byte (~0.85 GB here), and the
            # device build rides the genome upload the fine stage
            # needs anyway
            env = os.environ.get("BMTPU_DEVICE_OCC", "auto")
            want = env == "1" or (env == "auto"
                                  and _jax.default_backend() != "cpu")
            if want:
                from bucketmap_tpu.index.device_build import \
                    build_occupancy_on_device
                self._qgram_dev = build_occupancy_on_device(
                    self._index, width=wq,
                    bp_dev=getattr(self, "_bp_dev", None))
            if self._qgram_dev is None:
                self._qgram_dev = slab_upload(qw, width=wq)
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

    def _sample_hashes_impl(self, kmer_to_row, dist_tab, sample_tab,
                            codes: jax.Array, qual_ok: jax.Array,
                            lengths: jax.Array):
        """Distinguishability/quality gating + deterministic sampling:
        the shared front half of the coarse query (q_gram_mapper.h:
        414-460). Returns (both (B, 2, s) uint32 sampled k-mer hashes
        with axis 1 = strand, num_good (B,) int32, give_up (B,) bool)."""
        cfg = self.cfg
        k, q = cfg.query_seed, cfg.index_seed
        B, L = codes.shape
        K = L - k + 1  # k-mer positions (padded tail masked below)
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

        # deterministic sampling of good positions in increasing order:
        # the sel[j]-th good position is the unique one whose masked
        # running rank equals sel[j]+1, so a compare + sum extracts each
        # sample in one full-lane streaming pass — no argsort (XLA's
        # sort over (B, K) keys measured ~10x this; a single broadcast
        # compare with s in the minor axis wastes 113/128 lanes and
        # measured ~2.5x these s passes)
        ub = jnp.clip(num_good - 1, 0, sample_tab.shape[0] - 1)
        sel = sample_tab[ub]                                   # (B, s)
        rank = jnp.cumsum(good.astype(jnp.int32), axis=1)
        r16 = jnp.where(good, rank, 0).astype(jnp.int16)       # K < 2^15
        pos16 = pos.astype(jnp.int16)
        samp_pos = jnp.stack(
            [jnp.sum(jnp.where(r16 == (sel[:, j:j + 1] + 1)
                               .astype(jnp.int16), pos16, jnp.int16(0)),
                     axis=1, dtype=jnp.int32)
             for j in range(sel.shape[1])], axis=1)            # (B, s)
        samp_hash = jnp.take_along_axis(kmers, samp_pos, axis=1)    # (B, s)

        both = jnp.stack([samp_hash, revcomp_hash(samp_hash, k, xp=jnp)],
                         axis=1)
        return both, num_good, give_up

    def _gram_rows(self, kmer_to_row, grams, nq: int):
        """Occupancy-table row of each contained q-gram; the gather is
        skipped when the FracMinHash row map is the identity (f=1.0)."""
        if self.k2r_identity:
            return grams.astype(jnp.int32).reshape(-1, nq)
        return kmer_to_row[grams].reshape(-1, nq)

    def _presence_impl(self, qgram_words, kmer_to_row, dist_tab, sample_tab,
                       codes: jax.Array, qual_ok: jax.Array,
                       lengths: jax.Array):
        """Per-sample bucket presence for a batch — the gather half of the
        query, valid on a bucket-range SHARD of the index (pass the local
        word columns). Each sample's presence word vector is the AND of
        its k-q+1 q-gram occupancy rows (query, q_gram_mapper.h:398-407).
        Returns (presence (B, 2, s, w) uint32, num_good (B,) int32,
        give_up (B,) bool)."""
        cfg = self.cfg
        k, q = cfg.query_seed, cfg.index_seed
        s = cfg.mapper_samples
        B = codes.shape[0]
        w = qgram_words.shape[1]
        qbits = jnp.uint32(4**q - 1)
        both, num_good, give_up = self._sample_hashes_impl(
            kmer_to_row, dist_tab, sample_tab, codes, qual_ok, lengths)
        nq = k - q + 1
        if self._scan_mode == "pallas" and w % 1024 == 0:
            # manual-DMA gather kernel (see _presence_gather_pallas); the
            # table was tile-padded at upload (qgram_words property) so
            # each row views as DMA-able (w/128, 128) sub-tiles
            shifts = 2 * jnp.arange(nq, dtype=jnp.uint32)
            grams = (both[..., None] >> shifts) & qbits         # (B,2,s,nq)
            rows = self._gram_rows(kmer_to_row, grams, nq)
            tab3 = qgram_words.reshape(qgram_words.shape[0], w // 128, 128)
            pres = _presence_gather_pallas(tab3, rows,
                                           interpret=self._scan_interpret)
            return pres.reshape(B, 2, s, w), num_good, give_up
        pres = []
        for s_i in range(s):
            h = both[:, :, s_i]                                      # (B, 2)
            presence = jnp.full((B, 2, w), 0xFFFFFFFF, dtype=jnp.uint32)
            for i in range(nq):
                gram = (h >> jnp.uint32(2 * i)) & qbits
                presence = presence & qgram_words[kmer_to_row[gram]]
            pres.append(presence)
        return jnp.stack(pres, axis=2), num_good, give_up

    # -------------------------------------------------------------------
    CAND_CHUNK = 32  # bucket-chunk width (one u32 word) for extraction

    def _chunk_scan(self, presence, bound):
        """Counting + per-word chunk reduction (see _chunk_scan_pallas)."""
        if self._scan_mode == "pallas":
            return _chunk_scan_pallas(presence, bound,
                                      interpret=self._scan_interpret)
        return _chunk_scan_jnp(presence, bound)

    def _extract_at_max2(self, planes, chunk_max, max_hits, live, n,
                         col0: int = 0):
        """Bucket ids at the (global) max hit count — word-rank extraction.

        A direct top_k over a (B, 2, n_pad) hit tensor dominates the
        whole map step (measured 457 ms/batch at 26k buckets vs 76 ms
        for the scoring itself): XLA's TopK over 52k-wide rows is ~100x
        off bandwidth; gather-based two-level chunk extraction measured
        ~57 ms (element gathers + a (C,32)->C*32 relayout). Gather-free
        instead: dense per-bucket "count == gmax" flag WORDS (XNOR-AND
        over the packed plane counters), then popcount + word-rank
        cumsum locate the word holding the c-th set bit with one
        full-lane crossing-match reduction per target, and a 5-step
        halving ladder selects the bit by local rank inside that word.
        Live reads have <= C at-max buckets (more clears the read,
        q_gram_mapper.h:471-476), so C targets extract everything.
        Results identical to a dense extraction: ascending global ids.

        planes: (B, 2, n_planes, nc) uint32 packed per-bucket counters
        (from _chunk_scan / _coarse_score_pallas).
        Returns cand (B,2,C) int32 — ascending global ids, -1 padded."""
        C = self.cfg.max_candidate_buckets
        B, _, n_planes, nc = planes.shape

        # dense per-bucket "count == gmax" flags, ONE u32 word per
        # 32-bucket chunk: bucket bit set iff every plane bit matches
        # gmax's bit (counts fit n_planes bits, n_planes = s.bit_length())
        eq = None
        for j in range(n_planes):
            gb = ((max_hits >> j) & 1)[..., None]                 # (B,2,1)
            pj = planes[:, :, j]
            term = jnp.where(gb == 1, pj, ~pj)
            eq = term if eq is None else (eq & term)
        colbase = jnp.arange(nc, dtype=jnp.int32) * 32
        vmask = _valid_word_mask(colbase, n - col0)               # (nc,) u32
        eq = jnp.where(live[..., None], eq & vmask, jnp.uint32(0))

        pop = jax.lax.population_count(eq).astype(jnp.int32)      # (B,2,nc)
        wrank = jnp.cumsum(pop, axis=-1)                          # inclusive
        total = wrank[..., -1:]
        # ranks clip into int8 (live reads never exceed C+1 <= 127)
        rt = jnp.int8 if C + 1 <= 127 else jnp.int32
        wr = jnp.minimum(wrank, C + 1).astype(rt)
        wx = jnp.minimum(wrank - pop, C + 1).astype(rt)
        eqi = jax.lax.bitcast_convert_type(eq, jnp.int32)
        lanes = jnp.arange(nc, dtype=jnp.int32)

        cols = []
        for c in range(1, C + 1):
            m = (wr >= rt(c)) & (wx < rt(c))      # the ONE crossing word
            wval = jnp.sum(jnp.where(m, eqi, 0), axis=-1)         # (B,2)
            base = jnp.sum(jnp.where(m, wx.astype(jnp.int32), 0), axis=-1)
            lane = jnp.sum(jnp.where(m, lanes, 0), axis=-1)
            # bit of local rank r inside wval: halving ladder
            r = c - 1 - base
            w32 = jax.lax.bitcast_convert_type(wval, jnp.uint32)
            pos = jnp.zeros_like(r)
            for width in (16, 8, 4, 2, 1):
                lowc = jax.lax.population_count(
                    w32 & jnp.uint32((1 << width) - 1)).astype(jnp.int32)
                hi = r >= lowc
                r = jnp.where(hi, r - lowc, r)
                pos = pos + jnp.where(hi, width, 0)
                w32 = jnp.where(hi, w32 >> width, w32)
            cols.append(lane * 32 + pos)
        cand_local = jnp.stack(cols, axis=-1)                     # (B,2,C)
        tgt = jnp.arange(1, C + 1, dtype=jnp.int32)
        valid = tgt <= total
        return jnp.where(valid, col0 + cand_local, -1).astype(jnp.int32)

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
        w = qgram_words.shape[1]
        if self._scan_mode == "pallas" and w % 1024 == 0:
            # fully fused scoring: row DMA + AND + counting + word
            # reduction in one kernel; presence never touches HBM
            B = codes.shape[0]
            both, num_good, give_up = self._sample_hashes_impl(
                kmer_to_row, dist_tab, sample_tab, codes, qual_ok, lengths)
            nq = cfg.qgrams_per_kmer
            qbits = jnp.uint32(4**cfg.index_seed - 1)
            shifts = 2 * jnp.arange(nq, dtype=jnp.uint32)
            grams = (both[..., None] >> shifts) & qbits         # (B,2,s,nq)
            rows = self._gram_rows(kmer_to_row, grams, nq)
            tab3 = qgram_words.reshape(qgram_words.shape[0], w // 128, 128)
            cm, cc, pls = _coarse_score_pallas(
                tab3, rows, jnp.int32(n), cfg.mapper_samples,
                interpret=self._scan_interpret)
            chunk_max = cm.reshape(B, 2, w)
            chunk_cnt = cc.reshape(B, 2, w)
            planes = pls.reshape(B, 2, -1, w)
        else:
            presence, num_good, give_up = self._presence_impl(
                qgram_words, kmer_to_row, dist_tab, sample_tab, codes,
                qual_ok, lengths)
            chunk_max, chunk_cnt, planes = self._chunk_scan(
                presence, jnp.int32(n))
        max_hits = chunk_max.max(axis=2)                         # (B,2) i32
        ok = (max_hits >= cfg.min_coarse_hits) & ~give_up[:, None]
        counts = jnp.where((chunk_max == max_hits[:, :, None])
                           & ok[..., None], chunk_cnt, 0).sum(axis=2)
        over = counts > cfg.max_candidate_buckets                # clear (:471-476)
        counts = jnp.where(over, 0, counts)
        cand = self._extract_at_max2(planes, chunk_max, max_hits,
                                     ok & ~over, n)
        return cand, counts, num_good

    # -------------------------------------------------------------------
    def query_batch(self, codes: np.ndarray, quals: np.ndarray,
                    lengths: np.ndarray):
        cand, counts, num_good = self._query(
            *self._index_args(), jnp.asarray(codes), jnp.asarray(quals),
            jnp.asarray(lengths, dtype=jnp.int32))
        return np.asarray(cand), np.asarray(counts), np.asarray(num_good)
