"""Verification stage: banded semi-global alignment with CIGAR traceback.

Equivalent of the reference's SeqAn3 align_pairwise call
(bucket_locator.h:520-589): global alignment with free leading/trailing
gaps on sequence1 (the reference-window text) only, edit scheme
(match 0 / mismatch -1 / gap -1), outputs score, begin position in the
text, and a CIGAR (M/I/D, as seqan3::cigar_from_alignment emits).

TPU-native formulation: batched banded DP over pairs. Rows = query
positions (sequential scan), band = 128 diagonals (j - i in [-32, 96)),
all pairs advance together on the VPU. The intra-row dependency of the
left (text-gap) move is solved in closed form with a cummax transform:

    new[d] = max(base[d], new[d-1] - 1)
           = cummax(base[d] + d) - d          (max-plus prefix scan)

Direction codes are stored per cell (uint8, 2 bits used) and traced
back on device; the host only run-length-encodes the op strings.

Window semantics match the reference: text = bucket[offset : offset +
min(qlen + 1 + trunc(indel_rate*qlen), blen - offset)]; for reverse-
strand hits the *window* is reverse-complemented and aligned against
the original read, and the begin position is reported in the
reverse-complemented window's coordinates (reference behavior — its
reverse-strand POS is systematically ~(width-qlen) high, within the
analyzer's tolerance; we reproduce it for agreement).

MAPQ = 60 + score as size_t: scores below -60 wrap (bucket_locator.h:571)
and bypass the quality threshold; we reproduce the wrap mod 256.

Divergence note: co-optimal tracebacks are canonicalized diagonal-first
(then up), which may pick a different CIGAR than seqan3 among
equal-score alignments; scores and positions agree.
"""

from __future__ import annotations

import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np

from bucketmap_tpu.config import MapperConfig
from bucketmap_tpu.index.builder import BucketIndex

NEG = -(10**8)
BAND = 128
LO = 32          # j - i >= -LO
_OP_CHARS = {1: "M", 2: "I", 3: "D"}


def _dp_fwd_pallas(textp_t, qcodes_t, qlen_row, width_row,
                   interpret: bool = False):
    """Forward banded DP as a Pallas TPU kernel.

    The XLA scan formulation pays ~0.67 ms/row at (8192, 128): every
    step round-trips the (P, BAND) wavefront carry and its temporaries
    through HBM. Here the whole recurrence runs VMEM-resident per block
    of PB=128 pairs, with the band on sublanes and pairs on lanes
    (one (128, 128) i32 tile per wavefront); only the direction rows
    stream out. Semantics identical to the scan path (same cummax
    max-plus transform, validity masking, and dir codes).

    textp_t (W, P) i32 LO-left-padded window text (sentinel 4);
    qcodes_t (Q, P) i32; qlen_row/width_row (1, P) i32.
    Returns dirs_t (Q+1, BAND, P) uint8, final_t (BAND, P) int32.
    """
    from jax.experimental import pallas as pl

    W, P = textp_t.shape
    Q = qcodes_t.shape[0]
    PB = 128
    assert P % PB == 0, (P, PB)

    def kernel(textp_ref, qcodes_ref, qlen_ref, width_ref,
               dirs_ref, final_ref):
        width = width_ref[0][None, :]                     # (1, PB)
        qlen = qlen_ref[0][None, :]
        d_col = jax.lax.broadcasted_iota(jnp.int32, (BAND, PB), 0)
        j0 = d_col - LO
        row0 = jnp.where((j0 >= 0) & (j0 <= width), 0, NEG)
        dirs_ref[0] = jnp.zeros((BAND, PB), jnp.uint8)    # row 0 all stop
        negrow = jnp.full((1, PB), NEG, jnp.int32)
        init_final = jnp.where(qlen == 0, row0,
                               jnp.full((BAND, PB), NEG, jnp.int32))

        def step(i, carry):
            prev, final = carry
            qchar = qcodes_ref[pl.ds(i - 1, 1), :]        # (1, PB)
            trow = textp_ref[pl.ds(i - 1, BAND), :]       # (BAND, PB)
            sub = jnp.where(trow == qchar, 0, -1)
            diag = prev + sub
            up = jnp.concatenate([prev[1:], negrow], axis=0) - 1
            base = jnp.maximum(diag, up)
            m = base + d_col
            for k in (1, 2, 4, 8, 16, 32, 64):            # cummax over d
                m = jnp.maximum(m, jnp.concatenate(
                    [jnp.full((k, PB), NEG, jnp.int32), m[:BAND - k]],
                    axis=0))
            m = m - d_col
            j = i + d_col - LO
            valid = (j >= 0) & (j <= width)
            m = jnp.where(valid, m, NEG)
            dirs = jnp.where(m == diag, 1, jnp.where(m == up, 2, 3))
            dirs = jnp.where(valid & (m > NEG // 2), dirs, 0)
            dirs_ref[pl.ds(i, 1)] = dirs.astype(jnp.uint8)[None]
            final = jnp.where(i == qlen, m, final)
            return (m, final)

        _, final = jax.lax.fori_loop(1, Q + 1, step, (row0, init_final))
        final_ref[:] = final

    return pl.pallas_call(
        kernel,
        grid=(P // PB,),
        in_specs=[
            pl.BlockSpec((W, PB), lambda b: (0, b)),
            pl.BlockSpec((Q, PB), lambda b: (0, b)),
            pl.BlockSpec((1, PB), lambda b: (0, b)),
            pl.BlockSpec((1, PB), lambda b: (0, b)),
        ],
        out_specs=[
            pl.BlockSpec((Q + 1, BAND, PB), lambda b: (0, 0, b)),
            pl.BlockSpec((BAND, PB), lambda b: (0, b)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Q + 1, BAND, P), jnp.uint8),
            jax.ShapeDtypeStruct((BAND, P), jnp.int32),
        ],
        interpret=interpret,
    )(textp_t, qcodes_t, qlen_row, width_row)


class BandedAligner:
    def __init__(self, index: BucketIndex, pair_batch: int = 512):
        self.index = index
        self.cfg = index.config
        self.pair_batch = pair_batch
        # lazy device transfer: the pipeline installs the fine stage's
        # device-resident copy instead (a second upload would duplicate
        # 0.4+ GB of HBM at genome scale)
        self._bp_host = index.buckets_packed
        self._bp_dev = None
        self.bucket_lengths = jnp.asarray(index.bucket_lengths)
        # forward-DP backend: the VMEM-resident Pallas kernel on TPU,
        # the lax.scan twin elsewhere (tests/dryruns run on CPU).
        # BMTPU_ALIGN_DP=pallas|scan overrides; BMTPU_PALLAS_INTERPRET=1
        # interprets the kernel.
        env = os.environ.get("BMTPU_ALIGN_DP", "auto")
        self._dp_interpret = \
            os.environ.get("BMTPU_PALLAS_INTERPRET", "0") == "1"
        if env in ("pallas", "scan"):
            self._dp_mode = env
        else:
            self._dp_mode = ("scan" if jax.default_backend() == "cpu"
                             else "pallas")
        self._align = jax.jit(self._align_impl)

    @property
    def buckets_packed(self):
        if self._bp_dev is None:
            self._bp_dev = jnp.asarray(self._bp_host)
        return self._bp_dev

    @buckets_packed.setter
    def buckets_packed(self, v):
        self._bp_dev = v

    # ------------------------------------------------------------------
    def _extract_windows(self, buckets_packed, bucket_ids, offsets, wmax: int):
        """Gather text windows (P, wmax) of base codes from packed buckets.

        Only the needed word range is sliced per pair (not the whole
        bucket). Positions beyond the bucket read as code 0; callers mask
        by width.
        """
        words_needed = wmax // 16 + 2
        wb = buckets_packed.shape[1]
        word0 = jnp.clip(jnp.clip(offsets, 0, None) // 16, 0, wb - words_needed)
        # direct (P, words_needed) gather — a whole-bucket row gather
        # followed by per-row dynamic_slice would move ~16 KB/pair of
        # HBM for ~440 B of window
        cols = word0[:, None] + jnp.arange(words_needed, dtype=jnp.int32)[None, :]
        win_words = buckets_packed[bucket_ids[:, None], cols]
        shifts = jnp.arange(16, dtype=jnp.uint32) * 2
        bases = (win_words[:, :, None] >> shifts[None, None, :]) & jnp.uint32(3)
        flat = bases.reshape(bases.shape[0], -1)             # (P, 16*words_needed)
        start = jnp.clip(offsets, 0, None) - word0 * 16      # in [0, 16)

        def shift_row(row, s):
            return jax.lax.dynamic_slice(row, (s,), (wmax,))
        return jax.vmap(shift_row)(flat, start)

    # ------------------------------------------------------------------
    def _align_impl(self, buckets_packed, qcodes, qlen, bucket_ids, offsets,
                    is_rc, width):
        """qcodes (P, Q) uint8; qlen/offsets/width (P,) int32; is_rc (P,) bool.

        Returns score (P,) int32, begin (P,) int32 (text begin position),
        ops (P, Q + 2*LO) uint8 reversed traceback codes (0 = unused).
        """
        P, Q = qcodes.shape
        wmax = Q + BAND  # static upper bound on window length
        text = self._extract_windows(buckets_packed, bucket_ids, offsets,
                                     wmax).astype(jnp.int32)
        jcol = jnp.arange(wmax, dtype=jnp.int32)
        in_win = jcol[None, :] < width[:, None]
        # reverse-complement the *window* for reverse-strand pairs
        rc_idx = jnp.clip(width[:, None] - 1 - jcol[None, :], 0, wmax - 1)
        text_rc = 3 - jnp.take_along_axis(text, rc_idx, axis=1)
        text = jnp.where(is_rc[:, None], text_rc, text)
        text = jnp.where(in_win, text, 4)                    # sentinel: never matches

        # left-pad by LO so row i reads text[(i-1) + d - LO] as a slice at i-1
        textp = jnp.pad(text, ((0, 0), (LO, 0)), constant_values=4)

        d_idx = jnp.arange(BAND, dtype=jnp.int32)
        # row 0: M[0][j] = 0 for 0 <= j <= width else NEG ; j = d - LO
        j0 = d_idx[None, :] - LO
        row0 = jnp.where((j0 >= 0) & (j0 <= width[:, None]), 0, NEG)

        def step(carry, i):
            prev, final_row = carry
            qchar = qcodes[:, i - 1].astype(jnp.int32)       # (P,)
            trow = jax.lax.dynamic_slice_in_dim(textp, i - 1, BAND, axis=1)
            sub = jnp.where(trow == qchar[:, None], 0, -1)
            diag = prev + sub
            up = jnp.concatenate([prev[:, 1:], jnp.full((P, 1), NEG, jnp.int32)],
                                 axis=1) - 1
            base = jnp.maximum(diag, up)
            m = jax.lax.cummax(base + d_idx[None, :], axis=1) - d_idx[None, :]
            # cell validity: j = i + d - LO within [0, width]
            j = i + d_idx[None, :] - LO
            valid = (j >= 0) & (j <= width[:, None])
            m = jnp.where(valid, m, NEG)
            dirs = jnp.where(m == diag, 1, jnp.where(m == up, 2, 3)).astype(jnp.uint8)
            dirs = jnp.where(valid & (m > NEG // 2), dirs, 0)
            final_row = jnp.where((i == qlen)[:, None], m, final_row)
            return (m, final_row), dirs

        if self._dp_mode == "pallas":
            Pp = -(-P // 128) * 128                          # pad to block
            pad = ((0, 0), (0, Pp - P))
            dirs_t, final_t = _dp_fwd_pallas(
                jnp.pad(textp.T, ((0, 0), (0, Pp - P)), constant_values=4),
                jnp.pad(qcodes.astype(jnp.int32).T, pad),
                jnp.pad(qlen[None, :], pad, constant_values=1),
                jnp.pad(width[None, :], pad, constant_values=1),
                interpret=self._dp_interpret)
            final_row = final_t[:, :P].T                     # (P, BAND)
            def get_dir(i, d):
                return dirs_t[i, jnp.clip(d, 0, BAND - 1), jnp.arange(P)]
        else:
            init_final = jnp.where((qlen == 0)[:, None], row0,
                                   jnp.full((P, BAND), NEG))
            (_, final_row), dirs = jax.lax.scan(
                step, (row0, init_final), jnp.arange(1, Q + 1))
            dirs = jnp.concatenate(
                [jnp.zeros((1, P, BAND), jnp.uint8), dirs])  # row 0 all stop
            def get_dir(i, d):
                return dirs[i, jnp.arange(P), jnp.clip(d, 0, BAND - 1)]

        score = final_row.max(axis=1)
        # smallest j among co-optimal ends
        end_d = jnp.argmax(final_row, axis=1).astype(jnp.int32)

        # traceback (device): build reversed op list
        max_ops = Q + 2 * LO

        def tb_step(state, t):
            i, d, ops = state
            cur = get_dir(i, d)
            active = (i > 0)
            op = jnp.where(active, cur, 0).astype(jnp.uint8)
            ops = ops.at[:, t].set(op)
            i = jnp.where(active & (op != 3), i - 1, i)
            d = jnp.where(op == 2, d + 1, jnp.where(op == 3, d - 1, d))
            return (i, d, ops), None

        ops0 = jnp.zeros((P, max_ops), dtype=jnp.uint8)
        (fin_i, fin_d, ops), _ = jax.lax.scan(
            tb_step, (qlen, end_d, ops0), jnp.arange(max_ops))
        begin = fin_d - LO                                   # j at i == 0
        # op codes are 2 bits; pack 16/word so the download is 1/4 the
        # bytes (the host link runs at ~14 MB/s)
        ow = -(-max_ops // 16)
        opsp = jnp.pad(ops, ((0, 0), (0, ow * 16 - max_ops)))
        opsp = opsp.reshape(P, ow, 16).astype(jnp.uint32)
        shifts = jnp.arange(16, dtype=jnp.uint32) * 2
        packed = (opsp << shifts[None, None, :]).sum(axis=2).astype(jnp.uint32)
        return score, begin, packed

    # ------------------------------------------------------------------
    def _run_batched(self, qcodes, qlen, bucket_ids, offsets, is_rc, consume):
        """Sliding-window sub-batch driver: dispatches pb-row jobs, keeps
        two in flight (device compute of batch i+1 overlaps batch i's
        download AND the host-side `consume(s, e, sc, bg, packed)` work).
        Fully eager dispatch of a 1.5M-location workload exhausts HBM
        with ~95 live input/workspace buffers; the DP's direction tensor
        is (Q+1, pb, BAND) uint8 — ~40 KB per pair — so pb caps at 8192."""
        cfg = self.cfg
        n = len(bucket_ids)
        width = np.minimum(
            qlen + 1 + (cfg.indel_rate * qlen).astype(np.int64),
            np.asarray(self.index.bucket_lengths)[bucket_ids] - offsets,
        ).astype(np.int32)
        pb = min(self.pair_batch, 8192)
        bounds = [(s, min(s + pb, n)) for s in range(0, n, pb)]
        pending: list = []
        next_b = 0

        def _dispatch_one():
            nonlocal next_b
            s, e = bounds[next_b]
            next_b += 1
            pad = pb - (e - s)
            def _p(a, fill=0):
                a = np.asarray(a[s:e])
                return np.concatenate([a, np.full((pad,) + a.shape[1:], fill, a.dtype)]) if pad else a
            pending.append((s, e, self._align(
                self.buckets_packed,
                jnp.asarray(_p(qcodes)), jnp.asarray(_p(qlen, 1), dtype=jnp.int32),
                jnp.asarray(_p(bucket_ids)), jnp.asarray(_p(offsets)),
                jnp.asarray(_p(is_rc)), jnp.asarray(_p(width, 1)))))

        while next_b < len(bounds) and len(pending) < 2:
            _dispatch_one()
        while pending:
            s, e, (sc, bg, packed) = pending.pop(0)
            if next_b < len(bounds):
                _dispatch_one()
            consume(s, e, np.asarray(sc)[: e - s], np.asarray(bg)[: e - s],
                    np.asarray(packed)[: e - s])

    def align_batch(self, qcodes: np.ndarray, qlen, bucket_ids, offsets, is_rc):
        """Batched with host padding; returns (score, begin, ops) numpy."""
        n = len(bucket_ids)
        q = qcodes.shape[1]
        max_ops = q + 2 * LO
        ow = -(-max_ops // 16)
        out_s = np.zeros(n, np.int32)
        out_b = np.zeros(n, np.int32)
        out_ops = np.zeros((n, max_ops), np.uint8)
        shifts = (np.arange(16, dtype=np.uint32) * 2)[None, None, :]

        def consume(s, e, sc, bg, pk):
            out_s[s:e] = sc
            out_b[s:e] = bg
            ops = ((pk[:, :, None] >> shifts) & 3).astype(np.uint8)
            out_ops[s:e] = ops.reshape(e - s, ow * 16)[:, :max_ops]

        self._run_batched(qcodes, qlen, bucket_ids, offsets, is_rc, consume)
        return out_s, out_b, out_ops

    def align_batch_stream(self, qcodes, qlen, bucket_ids, offsets, is_rc,
                           emit):
        """Streaming alignment: as each sub-batch lands, its tracebacks
        are run-length-encoded to CIGAR bytes (native C when available)
        and handed to `emit(s, e, scores, begins, cigar_buf, offs)` —
        scores/begins/buf cover rows [s, e) only, offs is (e-s+1,). The
        (n, max_ops) uint8 ops matrix (568 MB at 1.5M locations) never
        exists."""
        from bucketmap_tpu.io import native

        q = qcodes.shape[1]
        max_ops = q + 2 * LO
        ow = -(-max_ops // 16)
        use_native = native.available()
        shifts = (np.arange(16, dtype=np.uint32) * 2)[None, None, :]

        def consume(s, e, sc, bg, pk):
            res = native.cigar_rle(pk, max_ops) if use_native else None
            if res is not None:
                buf, offs = res
            else:
                ops = ((pk[:, :, None] >> shifts) & 3).astype(np.uint8)
                ops = ops.reshape(e - s, ow * 16)[:, :max_ops]
                parts = []
                offs = np.zeros(e - s + 1, np.int64)
                for i in range(e - s):
                    c = ops_to_cigar(ops[i])
                    parts.append(b"" if c == "*" else c.encode())
                    offs[i + 1] = offs[i] + len(parts[-1])
                buf = b"".join(parts)
            emit(s, e, sc, bg, buf, offs)

        self._run_batched(qcodes, qlen, bucket_ids, offsets, is_rc, consume)

    def align_batch_cigars(self, qcodes, qlen, bucket_ids, offsets, is_rc):
        """Collected variant of align_batch_stream: returns
        (score, begin, cigar_buf bytes, offsets (n+1,))."""
        n = len(bucket_ids)
        out_s = np.zeros(n, np.int32)
        out_b = np.zeros(n, np.int32)
        bufs: list[bytes] = []
        lens = np.zeros(n, np.int64)

        def emit(s, e, sc, bg, buf, offs):
            out_s[s:e] = sc
            out_b[s:e] = bg
            bufs.append(buf)
            lens[s:e] = np.diff(offs)

        self.align_batch_stream(qcodes, qlen, bucket_ids, offsets, is_rc, emit)
        offsets_out = np.zeros(n + 1, np.int64)
        np.cumsum(lens, out=offsets_out[1:])
        return out_s, out_b, b"".join(bufs), offsets_out


def ops_to_cigar(ops_row: np.ndarray) -> str:
    """Reversed op codes -> CIGAR string (run-length encoded)."""
    codes = ops_row[ops_row != 0][::-1]
    if len(codes) == 0:
        return "*"
    # vectorized RLE
    change = np.nonzero(np.diff(codes))[0]
    starts = np.concatenate([[0], change + 1])
    ends = np.concatenate([change + 1, [len(codes)]])
    return "".join(f"{e - s}{_OP_CHARS[int(codes[s])]}" for s, e in zip(starts, ends))
