"""Attribute the end-to-end bench time at exact bench shapes.

Decomposes one locate_chunks dispatch cycle into
  pack+dispatch / device compute / device->host transfer / host extract
  / SAM merge+format+write
so the BENCH stage split (coarse/fine/out seconds) can be explained and
optimized where it is measured. Run after bench.py populated
.bench_cache:  python experiments/profile_driver.py [n_batches] [batch]
"""

import os
import sys
import time

import jax
import numpy as np

sys.path.insert(0, ".")

NB = int(sys.argv[1]) if len(sys.argv) > 1 else 12
B = int(sys.argv[2]) if len(sys.argv) > 2 else 8192
CACHE = ".bench_cache"
jax.config.update("jax_compilation_cache_dir", os.path.join(CACHE, "xla_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

from bucketmap_tpu.index import builder
from bucketmap_tpu.io import native
from bucketmap_tpu.io.fastq import read_fastq
from bucketmap_tpu.mapper.pipeline import BucketMapPipeline, MapStats

print(f"native IO: {'ENGAGED' if native.available() else 'python fallback'}")
t0 = time.perf_counter()
index = builder.load_index(CACHE, "idx_1700rep2")
print(f"index loaded {time.perf_counter()-t0:.1f}s ({index.n_buckets} buckets)")

t0 = time.perf_counter()
batch = read_fastq(f"{CACHE}/reads_g1700rep2m_r1000000.fastq")
print(f"fastq parsed {time.perf_counter()-t0:.1f}s")

t0 = time.perf_counter()
pipe = BucketMapPipeline(index, batch_size=B, pair_batch=B)
print(f"pipeline init {time.perf_counter()-t0:.1f}s "
      f"(lane_budget {pipe.device.lane_budget}, "
      f"vote_chunk {pipe.device.vote_chunk}, path {pipe.device._vote_path})")

# warmup/compile (persistent cache should make this fast on rerun)
t0 = time.perf_counter()
stats = pipe.map_reads(batch.head(B), f"{CACHE}/warmup.sam")
print(f"warmup (compile) {time.perf_counter()-t0:.1f}s")

# ---- phase A: single-dispatch decomposition ------------------------------
sub = batch.head(NB * B)
stats = MapStats()
codes, quals, seg_len, seg_read, seg_off = pipe._all_segments(sub)

t_dispatch, t_wait, t_get, t_extract, t_emit = 0.0, 0.0, 0.0, 0.0, 0.0
n_bytes = 0
outs = []
t0 = time.perf_counter()
for i in range(NB):
    outs.append(pipe._dispatch(codes, quals, seg_len, i * B, (i + 1) * B))
t_dispatch = time.perf_counter() - t0

from bucketmap_tpu.io.sam import SamWriter
writer = SamWriter(f"{CACHE}/profile.sam", list(index.ref_names),
                   index.sam_ref_lengths())
qt = pipe.cfg.quality_threshold
for i, out in enumerate(outs):
    t0 = time.perf_counter()
    jax.block_until_ready(out)
    t_wait += time.perf_counter() - t0
    t0 = time.perf_counter()
    vec = np.asarray(jax.device_get(out))
    t_get += time.perf_counter() - t0
    n_bytes += vec.nbytes
    t0 = time.perf_counter()
    host = pipe.device.decode_out(vec)
    chunk = pipe._extract_chunk(host, i * B, (i + 1) * B, sub, seg_read,
                                seg_off, seg_len)
    r, bk, off, votes, orig, so = (np.asarray(c) for c in chunk)
    order = np.lexsort((~orig, bk, r))
    chunk = (r[order].astype(np.int64), bk[order].astype(np.int64),
             off[order].astype(np.int64), votes[order].astype(np.int64),
             orig[order], so[order].astype(np.int64))
    t_extract += time.perf_counter() - t0
    t0 = time.perf_counter()
    pipe._emit_locations(writer, sub, chunk, qt, stats)
    t_emit += time.perf_counter() - t0
writer.close()

n = NB * B
print(f"\n== sequential decomposition ({NB} batches x {B}) ==")
print(f"pack+dispatch : {t_dispatch:.2f}s  ({t_dispatch/NB*1000:.0f} ms/batch)")
print(f"device wait   : {t_wait:.2f}s  ({t_wait/NB*1000:.0f} ms/batch)"
      f"  <- device compute (dispatches were async)")
print(f"device_get    : {t_get:.2f}s  ({t_get/NB*1000:.0f} ms/batch, "
      f"{n_bytes/NB/1e6:.2f} MB/batch, "
      f"{n_bytes/max(t_get,1e-9)/1e6:.0f} MB/s)")
print(f"host extract  : {t_extract:.2f}s  ({t_extract/NB*1000:.0f} ms/batch)")
print(f"SAM emit      : {t_emit:.2f}s  ({t_emit/NB*1000:.0f} ms/batch)")
tot = t_dispatch + t_wait + t_get + t_extract + t_emit
print(f"total         : {tot:.2f}s -> {n/tot:,.0f} reads/s sequential")

# ---- phase B: the real streamed map_reads --------------------------------
stats = MapStats()
t0 = time.perf_counter()
pipe.map_reads(sub, f"{CACHE}/profile2.sam")
dt = time.perf_counter() - t0
print(f"\n== streamed map_reads ==")
print(f"{n} reads in {dt:.2f}s -> {n/dt:,.0f} reads/s")
