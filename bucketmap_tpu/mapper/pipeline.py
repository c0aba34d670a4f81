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
                 batch_size: int = 512, pair_batch: int = 256):
        self.index = index
        self.cfg = index.config
        self.align = align
        self.batch_size = batch_size
        self.coarse = CoarseMapper(index)
        self.fine = FineLocator(index, pair_batch=pair_batch)
        if align:
            from bucketmap_tpu.ops.align import BandedAligner
            self.aligner = BandedAligner(index, pair_batch=pair_batch)
        self._bucket_sam_offset = index.ref_offset_of_bucket()

    # ------------------------------------------------------------------
    def _segments_of_batch(self, batch: ReadBatch, start: int, end: int):
        """Build fixed-shape segment arrays for reads [start, end).

        Returns codes/quals (S, read_len), seg_len (S,), seg_read (S,),
        seg_off (S,).
        """
        cfg = self.cfg
        rl = cfg.read_len
        rows, offs = [], []
        for r in range(start, end):
            L = int(batch.lengths[r])
            if L > 2 * rl:
                ub = L - rl - 1
                starts = sample_deterministic(cfg.num_segment_samples, ub)
                for o in starts:
                    rows.append(r)
                    offs.append(int(o))
            else:
                rows.append(r)
                offs.append(0)
        S = len(rows)
        codes = np.zeros((S, rl), dtype=np.uint8)
        quals = np.zeros((S, rl), dtype=np.uint8)
        seg_len = np.zeros(S, dtype=np.int32)
        for i, (r, o) in enumerate(zip(rows, offs)):
            L = int(batch.lengths[r])
            e = min(o + rl, L)
            codes[i, : e - o] = batch.codes[r, o:e]
            quals[i, : e - o] = batch.quals[r, o:e]
            seg_len[i] = e - o
        return codes, quals, seg_len, np.asarray(rows, np.int32), np.asarray(offs, np.int32)

    # ------------------------------------------------------------------
    def locate_batch(self, batch: ReadBatch, stats: MapStats | None = None):
        """Map every read; returns per-read list[Location] (pre-filter)."""
        cfg = self.cfg
        stats = stats if stats is not None else MapStats()
        n = batch.num_reads
        per_read: list[list[Location]] = [[] for _ in range(n)]

        for s in range(0, n, self.batch_size):
            e = min(s + self.batch_size, n)
            codes, quals, seg_len, seg_read, seg_off = self._segments_of_batch(batch, s, e)
            # pad segment count to the batch size for stable jit shapes
            S = len(seg_read)
            pad = (-S) % self.batch_size
            if pad:
                codes = np.pad(codes, ((0, pad), (0, 0)))
                quals = np.pad(quals, ((0, pad), (0, 0)))
                seg_len = np.pad(seg_len, (0, pad))

            t0 = time.perf_counter()
            cand, counts, _ = self.coarse.query_batch(codes, quals, seg_len)
            samp_hash, samp_idx = self.fine.prepare(codes, quals, seg_len)
            stats.coarse_seconds += time.perf_counter() - t0

            # pair list (host): strand-0 = original, strand-1 = revcomp
            t0 = time.perf_counter()
            rows, strands, buckets = np.nonzero(cand[:S] >= 0)
            pb = cand[:S][rows, strands, buckets]
            is_rc = strands.astype(bool)
            if len(rows):
                off, votes, acc = self.fine.vote(
                    pb.astype(np.int32), is_rc,
                    samp_hash[rows], samp_idx[rows], seg_len[rows])
            else:
                off = votes = np.zeros(0, np.int32)
                acc = np.zeros(0, bool)
            stats.fine_seconds += time.perf_counter() - t0
            stats.candidate_pairs += len(rows)

            had = np.zeros(S, dtype=bool)
            had[rows] = True
            # count reads with >=1 candidate (any of their segments)
            seen_reads = set(seg_read[np.unique(rows)].tolist())
            stats.reads_with_candidates += len(seen_reads)

            for i in np.nonzero(acc)[0]:
                srow = rows[i]
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
        stats.num_reads += n
        # reference ordering: bucket ascending; same bucket: orig before rc
        for locs in per_read:
            locs.sort(key=lambda l: (l.bucket, not l.is_orig))
        return per_read, stats

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

        for r in range(batch.num_reads):
            locs = per_read[r]
            seq = batch.seq_ascii[r, : batch.lengths[r]].tobytes().decode()
            qual = batch.qual_ascii[r, : batch.lengths[r]].tobytes().decode()
            if not self.align:
                locs = filter_best_locations(locs, int(batch.lengths[r]), cfg.indel_rate)
                for loc in locs:
                    mapq = min(60, 6 * loc.votes)
                    flag = 0 if loc.is_orig else 16
                    pos0 = int(bucket_sam_off[loc.bucket]) + loc.offset
                    writer.write(batch.ids[r], flag, bucket_names[loc.bucket],
                                 pos0, mapq, seq, qual)
                    stats.mapped_locations += 1
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
                    flag = 0 if loc.is_orig else 16
                    pos0 = int(bucket_sam_off[loc.bucket]) + begin + loc.offset
                    writer.write(batch.ids[r], flag, bucket_names[loc.bucket],
                                 pos0, mapq, seq, qual, ops_to_cigar(ops_row))
                    stats.mapped_locations += 1
        writer.close()
        stats.output_seconds = time.perf_counter() - t0
        return stats
