"""Error-rate x read-length sweep on the PRODUCTION bench world
(BASELINE config 5: substitutions 0.2-1%, indels 0.025-0.1%, read
lengths 100/150/300 — the reference's experiments/ discipline of
committed sweep logs).

Maps 50k simulated reads per configuration against the cached 1.7 Gbp
repeat-structured index on the real chip (one pipeline, one compiled
program set — read lengths <= read_len=300 share shapes). Emits one
JSON line per config to stdout; redirect to experiments/results/.

Run after bench.py populated .bench_cache:
  python experiments/error_sweep_production.py [reads_per_config]
"""

import dataclasses
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, ".")

N = int(sys.argv[1]) if len(sys.argv) > 1 else 50000
CACHE = ".bench_cache"

import jax

jax.config.update("jax_compilation_cache_dir", os.path.join(CACHE, "xla_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

from bench import score_sam
from bucketmap_tpu.index import builder
from bucketmap_tpu.io.fastq import read_fastq
from bucketmap_tpu.mapper.pipeline import BucketMapPipeline
from bucketmap_tpu.sim.simulator import ShortReadSimulator, repeat_genome

index = builder.load_index(CACHE, "idx_1700rep2")
print(f"[sweep] index: {index.n_buckets} buckets", file=sys.stderr, flush=True)
t0 = time.time()
genome = repeat_genome(int(1700e6), seed=1, n_refs=4)
print(f"[sweep] genome regenerated in {time.time()-t0:.0f}s",
      file=sys.stderr, flush=True)

pipe = BucketMapPipeline(index, batch_size=16384, pair_batch=16384)
os.makedirs("experiments/results", exist_ok=True)

READ_LENS = (100, 150, 300)
SUB_RATES = (0.002, 0.005, 0.01)
INDEL_RATES = (0.00025, 0.0005, 0.001)

warmed = False
for rl in READ_LENS:
    sim_cfg = dataclasses.replace(index.config, read_len=rl)
    for sub in SUB_RATES:
        for indel in INDEL_RATES:
            tag = f"sweep_rl{rl}_s{sub:g}_i{indel:g}"
            fq = os.path.join(CACHE, f"{tag}.fastq")
            gt = os.path.join(CACHE, f"{tag}.position_ground_truth")
            if not os.path.exists(fq):
                sim = ShortReadSimulator(sim_cfg, substitution_rate=sub,
                                         insertion_rate=indel,
                                         deletion_rate=indel, seed=11)
                sim.read(genome)
                sim.generate(CACHE, tag, N)
            sam = os.path.join(CACHE, f"{tag}.sam")
            if not warmed:
                batch = read_fastq(fq)
                pipe.map_reads(batch.head(16384),
                               os.path.join(CACHE, "sweep_warm.sam"))
                del batch
                warmed = True
            t0 = time.time()
            stats = pipe.map_fastq(fq, sam)
            dt = time.time() - t0
            mapped, correct = score_sam(sam, gt, index)
            _, tol5 = score_sam(sam, gt, index, tol=5)
            row = {"read_len": rl, "sub_rate": sub, "indel_rate": indel,
                   "reads": stats.num_reads,
                   "reads_per_sec": round(stats.num_reads / dt, 1),
                   "pct_mapped": round(mapped, 2),
                   "pct_correct_position": round(correct, 2),
                   "pct_correct_position_tol5": round(tol5, 2),
                   "locations_per_read": round(
                       stats.mapped_locations / max(1, stats.num_reads), 4)}
            print(json.dumps(row), flush=True)
            os.remove(sam)
