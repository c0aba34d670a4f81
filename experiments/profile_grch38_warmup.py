"""Split the GRCh38-scale (3.1 Gbp, f=0.25) warmup into its parts.

VERDICT r3 #2: the grch38_scale bench recorded warmup_seconds=1175.7 —
total job time LOSES to the reference's 711.5 s end-to-end despite a
9.1x steady-state win. This measures where the warmup goes:
  init (index upload tables lazily? device fine build skipped?),
  first-batch compile+execute, second-batch steady state.
Run:  python experiments/profile_grch38_warmup.py  (needs the
.bench_cache/idx_3100rep2_f0.25 world from bench.py / the cache script)
"""

import dataclasses
import os
import sys
import time

sys.path.insert(0, ".")
import jax
import numpy as np

CACHE = ".bench_cache"
jax.config.update("jax_compilation_cache_dir", os.path.join(CACHE, "xla_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
jax.config.update("jax_log_compiles", True)

from bucketmap_tpu.config import MapperConfig
from bucketmap_tpu.index import builder
from bucketmap_tpu.io.fastq import read_fastq
from bucketmap_tpu.mapper.pipeline import BucketMapPipeline

t0 = time.perf_counter()
index = builder.load_index(CACHE, "idx_3100rep2_f0.25")
cfg = MapperConfig(bucket_len=65536, read_len=300, kmer_fraction=0.25)
index.config = dataclasses.replace(
    index.config, mapper_samples=cfg.mapper_samples,
    seed_miss_rate=cfg.seed_miss_rate, indel_rate=cfg.indel_rate,
    locator_samples=cfg.locator_samples,
    quality_threshold=cfg.quality_threshold)
print(f"[prof] index load {time.perf_counter()-t0:.1f}s "
      f"({index.n_buckets} buckets)", flush=True)

BATCH = int(os.environ.get("BMTPU_BENCH_BATCH", "16384"))
fine_gb = 4 * index.n_buckets * index.buckets_packed.shape[1] * 16 / (1 << 30)
pair_batch = int(os.environ.get("BMTPU_BENCH_PAIR_BATCH",
                                str(BATCH if fine_gb <= 8 else 1024)))
print(f"[prof] fine_gb={fine_gb:.1f} -> pair_batch={pair_batch}", flush=True)

t0 = time.perf_counter()
batch = read_fastq(os.path.join(CACHE, "reads_g3100rep2_f0.25m_r1000000.fastq"))
print(f"[prof] fastq parse {time.perf_counter()-t0:.1f}s", flush=True)

t0 = time.perf_counter()
pipe = BucketMapPipeline(index, batch_size=BATCH, pair_batch=pair_batch)
print(f"[prof] pipeline init {time.perf_counter()-t0:.1f}s "
      f"(vote path: {pipe.device._vote_path})", flush=True)

for label, n in (("first batch (compile+upload+exec)", BATCH),
                 ("second batch (steady)", BATCH),
                 ("third batch (steady)", BATCH)):
    t0 = time.perf_counter()
    pipe.map_reads(batch.head(n), os.path.join(CACHE, "warmup.sam"))
    print(f"[prof] {label}: {time.perf_counter()-t0:.1f}s", flush=True)

t0 = time.perf_counter()
stats = pipe.map_reads(batch.head(10 * BATCH), os.path.join(CACHE, "w10.sam"))
dt = time.perf_counter() - t0
print(f"[prof] 10-batch run: {dt:.1f}s = {10*BATCH/dt:.0f} reads/s", flush=True)
