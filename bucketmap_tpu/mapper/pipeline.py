"""End-to-end mapping pipeline: FASTQ -> coarse -> fine -> [align] -> SAM.

Orchestrates the device stages over fixed-shape batches. Long reads
(> 2*read_len) are decomposed into num_segment_samples read_len-windows
(q_gram_mapper.h:510-516); each segment is an independent batch row, and
segment results fold back to read coordinates (bucket_locator.h:671-693).
Reads of length (read_len, 2*read_len] are queried on their first
read_len bases only, like the reference (q_gram_mapper.h:521).
"""

from __future__ import annotations

import dataclasses
import time

import jax
import numpy as np

from bucketmap_tpu.config import MapperConfig
from bucketmap_tpu.index.builder import BucketIndex
from bucketmap_tpu.io.fastq import ReadBatch, read_fastq
from bucketmap_tpu.io.sam import SamWriter
from bucketmap_tpu.ops.coarse import CoarseMapper
from bucketmap_tpu.ops.sampler import sample_deterministic
from bucketmap_tpu.ops.vote import FineLocator


@dataclasses.dataclass
class Location:
    bucket: int
    offset: int          # read start within the bucket
    seg_offset: int
    votes: int
    is_orig: bool


def filter_best_locations(locs: list[Location], read_length: int,
                          indel_rate: float) -> list[Location]:
    """Literal port of _filter_best_locations (bucket_locator.h:350-405):
    merge votes onto ALL earlier proposals with the same (bucket, strand)
    within +-read_len*indel_rate (std::map iteration = sorted key order),
    then keep every location with the max total votes."""
    loc_votes: dict[tuple[int, int, bool], int] = {}
    for loc in locs:
        key = (loc.bucket, loc.offset, loc.is_orig)
        if not loc_votes:
            loc_votes[key] = loc.votes
        else:
            lo = int(loc.offset - read_length * indel_rate)
            hi = int(loc.offset + read_length * indel_rate)
            found = False
            for k in sorted(loc_votes):
                if k[0] == loc.bucket and lo <= k[1] <= hi and k[2] == loc.is_orig:
                    loc_votes[k] += loc.votes
                    found = True
            if not found:
                loc_votes[key] = loc.votes
    best: list[Location] = []
    max_votes = 0
    for k in sorted(loc_votes):
        v = loc_votes[k]
        if v > max_votes:
            best, max_votes = [], v
        if v == max_votes:
            best.append(Location(k[0], k[1], 0, v, k[2]))
    return best


@dataclasses.dataclass
class MapStats:
    num_reads: int = 0
    reads_with_candidates: int = 0
    candidate_pairs: int = 0
    mapped_locations: int = 0
    coarse_seconds: float = 0.0
    fine_seconds: float = 0.0
    output_seconds: float = 0.0


class BucketMapPipeline:
    def __init__(self, index: BucketIndex, align: bool = False,
                 batch_size: int = 512, pair_batch: int = 256,
                 pairs_per_read: int = 4, mesh=None):
        self.index = index
        self.cfg = index.config
        self.align = align
        self.batch_size = batch_size
        from bucketmap_tpu.mapper.device_pipeline import DeviceMapper
        self.device = DeviceMapper(index, batch_size=batch_size,
                                   pairs_per_read=pairs_per_read,
                                   vote_chunk=min(pair_batch, batch_size),
                                   mesh=mesh)
        self.coarse = self.device.coarse
        self.fine = self.device.fine
        self.fine.pair_batch = pair_batch
        if align:
            from bucketmap_tpu.ops.align import BandedAligner
            self.aligner = BandedAligner(index, pair_batch=pair_batch)
        self._bucket_sam_offset = index.ref_offset_of_bucket()

    # ------------------------------------------------------------------
    def _all_segments(self, batch: ReadBatch):
        """Fixed-shape segment arrays for ALL reads: codes/quals
        (S, read_len), seg_len, seg_read, seg_off. Short reads (<=
        2*read_len) are a vectorized copy; long reads expand to
        num_segment_samples windows (q_gram_mapper.h:510-516)."""
        cfg = self.cfg
        rl = cfg.read_len
        lengths = batch.lengths
        n = batch.num_reads
        long_mask = lengths > 2 * rl

        if not long_mask.any():
            # fast path (typical short-read workloads): segment = row prefix
            seg_read = np.arange(n, dtype=np.int32)
            seg_off = np.zeros(n, dtype=np.int32)
            seg_len = np.minimum(lengths, rl).astype(np.int32)
            if batch.codes.shape[1] == rl:
                codes, quals = batch.codes, batch.quals
            else:
                width = min(batch.codes.shape[1], rl)
                codes = np.zeros((n, rl), np.uint8)
                quals = np.zeros((n, rl), np.uint8)
                codes[:, :width] = batch.codes[:, :width]
                quals[:, :width] = batch.quals[:, :width]
            # zero any tail beyond rl in rows longer than rl (reads in
            # (rl, 2rl] are queried on their first rl bases only)
            return codes, quals, seg_len, seg_read, seg_off

        short_idx = np.nonzero(~long_mask)[0]
        rows = [short_idx]
        offs = [np.zeros(len(short_idx), np.int64)]
        for r in np.nonzero(long_mask)[0]:
            starts = sample_deterministic(cfg.num_segment_samples,
                                          int(lengths[r]) - rl - 1)
            rows.append(np.full(len(starts), r, np.int64))
            offs.append(starts.astype(np.int64))
        seg_read = np.concatenate(rows)
        seg_off = np.concatenate(offs)

        seg_len = np.minimum(lengths[seg_read] - seg_off, rl).astype(np.int32)
        col = np.arange(rl)
        src = seg_off[:, None] + col[None, :]
        mask = col[None, :] < seg_len[:, None]
        src = np.where(mask, src, 0)
        codes = np.where(mask, batch.codes[seg_read[:, None], src], 0).astype(np.uint8)
        quals = np.where(mask, batch.quals[seg_read[:, None], src], 0).astype(np.uint8)
        return (codes, quals, seg_len, seg_read.astype(np.int32),
                seg_off.astype(np.int32))

    # ------------------------------------------------------------------
    def locate_batch(self, batch: ReadBatch, stats: MapStats | None = None):
        """Map every read; returns per-read list[Location] (pre-filter).

        All device batches are dispatched asynchronously up front (one
        fused program per batch), then results are collected — transfer
        and compute of consecutive batches overlap, hiding the remote
        dispatch latency.
        """
        cfg = self.cfg
        stats = stats if stats is not None else MapStats()
        n = batch.num_reads
        per_read: list[list[Location]] = [[] for _ in range(n)]

        t0 = time.perf_counter()
        codes, quals, seg_len, seg_read, seg_off = self._all_segments(batch)
        S = len(seg_read)
        bs = self.batch_size

        dispatches = []
        for s in range(0, S, bs):
            e = min(s + bs, S)
            pad = bs - (e - s)
            c, q, sl = codes[s:e], quals[s:e], seg_len[s:e]
            if pad:
                c = np.pad(c, ((0, pad), (0, 0)))
                q = np.pad(q, ((0, pad), (0, 0)))
                sl = np.pad(sl, (0, pad))
            dispatches.append((s, e, self.device.step(c, q, sl)))
        stats.coarse_seconds += time.perf_counter() - t0

        t0 = time.perf_counter()
        reads_with_cand: set[int] = set()
        for s, e, out in dispatches:
            host = jax.device_get(out)
            total_valid = int(host["total_valid"])
            stats.candidate_pairs += total_valid
            counts = host["counts"][: e - s]
            for srow_local in np.nonzero(counts.sum(axis=1) > 0)[0]:
                reads_with_cand.add(int(seg_read[s + srow_local]))

            if total_valid > self.device.pair_budget:
                # pair-budget overflow: redo this batch through the
                # unfused path (rare; heavily repetitive genomes)
                self._locate_unfused(batch, per_read, seg_read, seg_off,
                                     seg_len, codes, quals, s, e)
                continue

            acc_idx = np.nonzero(host["accept"])[0]
            srow = s + host["lane_read"][acc_idx]
            keep = srow < e  # drop padded segment rows
            acc_idx, srow = acc_idx[keep], srow[keep]
            r = seg_read[srow]
            so = seg_off[srow]
            sl = seg_len[srow]
            x = host["offset"][acc_idx]
            rc = host["lane_rc"][acc_idx]
            read_off = np.where(rc, x - (batch.lengths[r] - so - sl), x - so)
            for tup in zip(r.tolist(), host["lane_bucket"][acc_idx].tolist(),
                           read_off.tolist(), so.tolist(),
                           host["votes"][acc_idx].tolist(), (~rc).tolist()):
                per_read[tup[0]].append(Location(*tup[1:]))
        stats.fine_seconds += time.perf_counter() - t0
        stats.reads_with_candidates += len(reads_with_cand)
        stats.num_reads += n
        # reference ordering: bucket ascending; same bucket: orig before rc
        for locs in per_read:
            locs.sort(key=lambda l: (l.bucket, not l.is_orig))
        return per_read, stats

    # ------------------------------------------------------------------
    def _locate_unfused(self, batch, per_read, seg_read, seg_off, seg_len,
                        codes, quals, s, e):
        """Fallback when a batch exceeds the on-device pair budget."""
        cand, counts, _ = self.coarse.query_batch(codes[s:e], quals[s:e],
                                                  seg_len[s:e])
        samp_hash, samp_idx = self.fine.prepare(codes[s:e], quals[s:e],
                                                seg_len[s:e])
        rows, strands, slots = np.nonzero(cand >= 0)
        pb = cand[rows, strands, slots]
        is_rc = strands.astype(bool)
        if not len(rows):
            return
        off, votes, acc = self.fine.vote(pb.astype(np.int32), is_rc,
                                         samp_hash[rows], samp_idx[rows],
                                         seg_len[s:e][rows])
        for i in np.nonzero(acc)[0]:
            srow = s + int(rows[i])
            r = int(seg_read[srow])
            so = int(seg_off[srow])
            sl = int(seg_len[srow])
            x = int(off[i])
            if is_rc[i]:
                read_off = x - (int(batch.lengths[r]) - so - sl)
            else:
                read_off = x - so
            per_read[r].append(Location(int(pb[i]), read_off, so,
                                        int(votes[i]), not bool(is_rc[i])))

    # ------------------------------------------------------------------
    def map_fastq(self, fastq_path, sam_path, quality_threshold: int | None = None):
        batch = read_fastq(fastq_path)
        return self.map_reads(batch, sam_path, quality_threshold)

    def map_reads(self, batch: ReadBatch, sam_path,
                  quality_threshold: int | None = None) -> MapStats:
        cfg = self.cfg
        stats = MapStats()
        per_read, stats = self.locate_batch(batch, stats)

        t0 = time.perf_counter()
        writer = SamWriter(sam_path, [n for n in self.index.ref_names],
                           self.index.sam_ref_lengths())
        bucket_names = self.index.bucket_names
        bucket_sam_off = self._bucket_sam_offset
        qt = cfg.quality_threshold if quality_threshold is None else quality_threshold

        align_results = None
        if self.align:
            # batch every accepted location through the banded aligner
            loc_read, loc_bucket, loc_off, loc_rc = [], [], [], []
            for r in range(batch.num_reads):
                for loc in per_read[r]:
                    loc_read.append(r)
                    loc_bucket.append(loc.bucket)
                    loc_off.append(loc.offset)
                    loc_rc.append(not loc.is_orig)
            if loc_read:
                loc_read = np.asarray(loc_read, np.int32)
                scores, begins, ops = self.aligner.align_batch(
                    batch.codes[loc_read], batch.lengths[loc_read],
                    np.asarray(loc_bucket, np.int32),
                    np.asarray(loc_off, np.int32),
                    np.asarray(loc_rc, bool))
                align_results = (scores, begins, ops)
            idx = 0

        from bucketmap_tpu.ops.align import ops_to_cigar

        # collect record fields, then emit (native batch formatter when
        # available, python writer otherwise)
        rec_read, rec_flag, rec_bucket, rec_pos0, rec_mapq, rec_cigar = \
            [], [], [], [], [], []
        for r in range(batch.num_reads):
            locs = per_read[r]
            if not self.align:
                locs = filter_best_locations(locs, int(batch.lengths[r]), cfg.indel_rate)
                for loc in locs:
                    rec_read.append(r)
                    rec_flag.append(0 if loc.is_orig else 16)
                    rec_bucket.append(loc.bucket)
                    rec_pos0.append(int(bucket_sam_off[loc.bucket]) + loc.offset)
                    rec_mapq.append(min(60, 6 * loc.votes))
                    rec_cigar.append(b"")
            else:
                for loc in locs:
                    score = int(align_results[0][idx])
                    begin = int(align_results[1][idx])
                    ops_row = align_results[2][idx]
                    idx += 1
                    # size_t wrap: scores below -60 bypass the threshold
                    # (bucket_locator.h:571); seqan3 then truncates to uint8
                    mapq = 60 + score
                    if mapq < 0:
                        mapq &= 0xFF
                    elif mapq < qt:
                        continue
                    rec_read.append(r)
                    rec_flag.append(0 if loc.is_orig else 16)
                    rec_bucket.append(loc.bucket)
                    rec_pos0.append(int(bucket_sam_off[loc.bucket]) + begin + loc.offset)
                    rec_mapq.append(mapq)
                    rec_cigar.append(ops_to_cigar(ops_row).encode())
        stats.mapped_locations += len(rec_read)

        self._emit_records(writer, batch, rec_read, rec_flag, rec_bucket,
                           rec_pos0, rec_mapq, rec_cigar)
        writer.close()
        stats.output_seconds = time.perf_counter() - t0
        return stats

    # ------------------------------------------------------------------
    def _emit_records(self, writer, batch, rec_read, rec_flag, rec_bucket,
                      rec_pos0, rec_mapq, rec_cigar):
        from bucketmap_tpu.io import native

        bucket_names = self.index.bucket_names
        if native.available() and rec_read:
            ids_buf = "".join(batch.ids).encode()
            id_offsets = np.zeros(len(batch.ids) + 1, np.int64)
            np.cumsum([len(i.encode()) for i in batch.ids], out=id_offsets[1:])
            # rname per bucket -> its reference's (truncated) name
            ref_short = [n.split(" ")[0].encode() for n in self.index.ref_names]
            rnames_buf = b"".join(ref_short)
            rname_offsets = np.zeros(len(ref_short) + 1, np.int64)
            np.cumsum([len(x) for x in ref_short], out=rname_offsets[1:])
            rid = self.index.bucket_ref[np.asarray(rec_bucket, np.int64)]
            cigar_buf = b"".join(rec_cigar)
            cigar_offsets = np.zeros(len(rec_cigar) + 1, np.int64)
            np.cumsum([len(c) for c in rec_cigar], out=cigar_offsets[1:])
            rr = np.asarray(rec_read, np.int32)
            out = native.format_sam_records(
                rr, id_offsets, np.frombuffer(ids_buf, np.uint8),
                np.asarray(rec_flag, np.int32), rid.astype(np.int32),
                rname_offsets, np.frombuffer(rnames_buf, np.uint8),
                np.asarray(rec_pos0, np.int64), np.asarray(rec_mapq, np.int32),
                cigar_offsets, np.frombuffer(cigar_buf, np.uint8),
                rr, batch.lengths[rr].astype(np.int32),
                batch.seq_ascii, batch.qual_ascii)
            if out is not None:
                writer._f.flush()
                writer._f.buffer.write(out) if hasattr(writer._f, "buffer") \
                    else writer._f.write(out.decode())
                return
        for i in range(len(rec_read)):
            r = rec_read[i]
            seq = batch.seq_ascii[r, : batch.lengths[r]].tobytes().decode()
            qual = batch.qual_ascii[r, : batch.lengths[r]].tobytes().decode()
            writer.write(batch.ids[r], rec_flag[i], bucket_names[rec_bucket[i]],
                         rec_pos0[i], rec_mapq[i], seq, qual,
                         rec_cigar[i].decode() or "*")
