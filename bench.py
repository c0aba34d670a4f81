"""Throughput benchmark: end-to-end read mapping on one TPU chip.

Prints ONE JSON line on stdout:
  {"metric": ..., "value": N, "unit": "reads/s", "vs_baseline": N}

Baseline: the reference C++ BucketMap maps 1M x 300bp simulated reads
against the 1.7 Gbp Egu.v3 genome in 320.95 s single-threaded in
alignment-free mode (bucket_map/benchmark/README.md:169) = 3116 reads/s.
vs_baseline = our reads/s / 3116.

No egress: the genome is synthetic but carries repeat structure
(segmental duplications + mobile elements + tandem arrays,
sim/simulator.py:repeat_genome) so candidate lists behave like real
genomes (the reference sees 1.14-2.7 locations/read on Egu.v3/GRCh38,
benchmark/README.md:178; a uniform-random genome gives 1.00006).
Error rates are dwgsim-like. Env-tunable:
  BMTPU_BENCH_GENOME_MBP (default 1700), BMTPU_BENCH_READS (default 1000000),
  BMTPU_BENCH_BATCH (default 8192), BMTPU_BENCH_CACHE (default .bench_cache),
  BMTPU_BENCH_ALIGN=1 (align mode), BMTPU_BENCH_UNIFORM=1 (the old
  repeat-free genome, for comparison)
The workload (index + reads + ground truth) is cached on disk so repeated
runs measure mapping only, like the reference's map stage.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

GENOME_MBP = float(os.environ.get("BMTPU_BENCH_GENOME_MBP", "1700"))
NUM_READS = int(os.environ.get("BMTPU_BENCH_READS", "1000000"))
BATCH = int(os.environ.get("BMTPU_BENCH_BATCH", "8192"))
ALIGN = os.environ.get("BMTPU_BENCH_ALIGN", "0") == "1"
UNIFORM = os.environ.get("BMTPU_BENCH_UNIFORM", "0") == "1"
CACHE = os.environ.get("BMTPU_BENCH_CACHE", os.path.join(
    os.path.dirname(os.path.abspath(__file__)), ".bench_cache"))
# align-free: 1M reads / 320.95 s; align: 1M / 426.78 s (benchmark/README.md:168-169)
BASELINE_READS_PER_SEC_NOALIGN = 3116.0
BASELINE_READS_PER_SEC_ALIGN = 2343.1

def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    from bucketmap_tpu.config import MapperConfig
    from bucketmap_tpu.index import builder
    from bucketmap_tpu.io.fastq import read_fastq
    from bucketmap_tpu.mapper.pipeline import BucketMapPipeline
    from bucketmap_tpu.sim.simulator import (ShortReadSimulator, random_genome,
                                             repeat_genome)

    def make_genome():
        if UNIFORM:
            return random_genome(int(GENOME_MBP * 1e6), seed=1, n_refs=4)
        return repeat_genome(int(GENOME_MBP * 1e6), seed=1, n_refs=4)

    cfg = MapperConfig(bucket_len=65536, read_len=300)
    gtag = f"{GENOME_MBP:g}{'u' if UNIFORM else 'rep'}"
    tag = f"g{gtag}m_r{NUM_READS}"
    os.makedirs(CACHE, exist_ok=True)
    idx_path = os.path.join(CACHE, f"idx_{gtag}.bmtpu.json")
    fastq_path = os.path.join(CACHE, f"reads_{tag}.fastq")

    t0 = time.time()
    if not os.path.exists(idx_path):
        log(f"[bench] building index for {GENOME_MBP} Mbp synthetic "
            f"{'uniform' if UNIFORM else 'repeat-structured'} genome...")
        genome = make_genome()
        index = builder.build_index(genome, cfg)
        builder.build_fine_index(index)
        builder.save_index(index, CACHE, f"idx_{gtag}")
        log(f"[bench] index built in {time.time()-t0:.1f}s "
            f"({index.n_buckets} buckets)")
    else:
        index = builder.load_index(CACHE, f"idx_{gtag}")
        genome = None
        log(f"[bench] index loaded in {time.time()-t0:.1f}s")

    if not os.path.exists(fastq_path):
        if genome is None:
            genome = make_genome()
        log(f"[bench] simulating {NUM_READS} reads...")
        sim = ShortReadSimulator(cfg, substitution_rate=0.002,
                                 insertion_rate=0.00025, deletion_rate=0.00025,
                                 seed=2)
        sim.read(genome)
        sim.generate(CACHE, f"reads_{tag}", NUM_READS)

    import jax
    # persistent XLA compilation cache: the fused map step takes minutes
    # to compile for the remote backend; cache it across runs
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(CACHE, "xla_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
    log(f"[bench] devices: {jax.devices()}")
    t0 = time.time()
    batch = read_fastq(fastq_path)
    log(f"[bench] fastq parsed in {time.time()-t0:.2f}s ({batch.num_reads} reads)")

    pipe = BucketMapPipeline(index, batch_size=BATCH, pair_batch=BATCH, align=ALIGN)
    # warmup: compile all jit programs on a small prefix
    t0 = time.time()
    pipe.map_reads(batch.head(BATCH), os.path.join(CACHE, "warmup.sam"))
    log(f"[bench] warmup (compile) {time.time()-t0:.1f}s")

    sam_path = os.path.join(CACHE, f"out_{tag}{'_al' if ALIGN else ''}.sam")
    t0 = time.time()
    stats = pipe.map_reads(batch, sam_path)
    dt = time.time() - t0
    rps = stats.num_reads / dt
    log(f"[bench] mapped {stats.num_reads} reads in {dt:.1f}s: "
        f"{rps:.0f} reads/s  (coarse {stats.coarse_seconds:.1f}s, "
        f"fine {stats.fine_seconds:.1f}s, out {stats.output_seconds:.1f}s, "
        f"pairs {stats.candidate_pairs}, locations {stats.mapped_locations})")

    # accuracy vs ground truth
    gt_path = os.path.join(CACHE, f"reads_{tag}.position_ground_truth")
    from bucketmap_tpu.io.sam import read_sam
    gt = [l.split() for l in open(gt_path)]
    recs = {}
    for r in read_sam(sam_path):
        recs.setdefault(r["qname"], []).append(r)
    correct = mapped = 0
    ref_short = [n.split(" ")[0] for n in index.ref_names]
    for i, (rid, pos, rc, _c) in enumerate(gt):
        rl = recs.get(str(i), [])
        if rl:
            mapped += 1
        for r in rl:
            if (r["rname"] == ref_short[int(rid)]
                    and (r["flag"] & 16 == 16) == bool(int(rc))
                    and abs(r["pos"] - int(pos)) <= 10):
                correct += 1
                break
    log(f"[bench] %mapped={mapped/len(gt)*100:.2f} "
        f"%correct-position={correct/len(gt)*100:.2f}")

    print(json.dumps({
        "metric": f"reads_per_sec_per_chip ({NUM_READS} x 300bp sim reads, "
                  f"{GENOME_MBP:g} Mbp "
                  f"{'uniform' if UNIFORM else 'repeat-structured'} genome, "
                  f"{'align' if ALIGN else 'align-free'})",
        "value": round(rps, 1),
        "unit": "reads/s",
        "vs_baseline": round(rps / (BASELINE_READS_PER_SEC_ALIGN if ALIGN
                                    else BASELINE_READS_PER_SEC_NOALIGN), 3),
        "pct_mapped": round(mapped / len(gt) * 100, 2),
        "pct_correct_position": round(correct / len(gt) * 100, 2),
        "locations_per_read": round(stats.mapped_locations / stats.num_reads, 4),
    }))


if __name__ == "__main__":
    main()
