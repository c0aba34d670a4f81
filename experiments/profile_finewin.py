"""A/B the fine-stage window backends at production shapes.

Times _vote_packed_impl (pallas window kernel vs XLA gather) on real
pairs: reads from the cached bench FASTQ, bucket ids from the bucket
ground truth (realistic occurrence statistics — random buckets would
miss every segment). Run after bench.py populated .bench_cache:
  python experiments/profile_finewin.py [n_pairs] [chunk]
"""

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

NP_ = int(sys.argv[1]) if len(sys.argv) > 1 else 40960
CH = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
CACHE = ".bench_cache"
jax.config.update("jax_compilation_cache_dir", os.path.join(CACHE, "xla_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

from bucketmap_tpu.index import builder
from bucketmap_tpu.index.device_build import build_fine_index_on_device
from bucketmap_tpu.io.fastq import read_fastq
from bucketmap_tpu.ops.vote import FineLocator

index = builder.load_index(CACHE, "idx_1700rep2")
cfg = index.config

batch = read_fastq(f"{CACHE}/reads_g1700rep2m_r1000000.fastq")
gt_bucket, gt_rc = [], []
with open(f"{CACHE}/reads_g1700rep2m_r1000000.bucket_ground_truth") as f:
    for line in f:                       # `bucket offset revcomp cigar`
        parts = line.split()
        gt_bucket.append(int(parts[0]))
        gt_rc.append(parts[2] == "1")
gt_bucket = np.asarray(gt_bucket, np.int32)
gt_rc = np.asarray(gt_rc, bool)

n = NP_
codes = batch.codes[:n]
quals = batch.quals[:n]
lengths = np.minimum(batch.lengths[:n], cfg.read_len).astype(np.int32)
bucket_ids = gt_bucket[:n]
is_rc = gt_rc[:n]

fl = FineLocator(index)
built = build_fine_index_on_device(index)
fp, pt, steps, low_bits = built
fl.fine_packed = fp
fl.fine_ptab = pt
fl.fine_low = None
fl.fine_pos = None
fl.search_steps = steps
fl.low_bits = low_bits
print(f"fine_packed {fp.shape} steps={steps} low_bits={low_bits}")

samp_hash, samp_idx = fl.prepare(codes, quals, lengths)
jb = jnp.asarray(bucket_ids)
jrc = jnp.asarray(is_rc)
jh = jnp.asarray(samp_hash)
ji = jnp.asarray(samp_idx)
jl = jnp.asarray(lengths)


def _force(out):
    leaves = jax.tree_util.tree_leaves(out)
    jax.device_get([l[(0,) * l.ndim] for l in leaves])
    return out


def run(mode):
    fl._finewin_mode = mode
    fn = jax.jit(fl._vote_packed_impl)

    def call():
        outs = []
        for s in range(0, n, CH):
            outs.append(fn(fl.fine_ptab, fl.fine_packed, jb[s : s + CH],
                           jrc[s : s + CH], jh[s : s + CH], ji[s : s + CH],
                           jl[s : s + CH]))
        return outs

    out = _force(call())
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        _force(call())
        ts.append(time.perf_counter() - t0)
    acc = int(sum(np.asarray(o[2]).sum() for o in out))
    print(f"{mode:7s}: min {min(ts)*1000:.1f} ms / {n} pairs "
          f"({min(ts)/n*1e6:.2f} us/pair), accepted {acc}")
    return out


# latency floor
_x = jnp.zeros(8)
_force(_x + 1)
t0 = time.perf_counter()
_force(_x + 1)
print(f"floor: {(time.perf_counter()-t0)*1000:.1f} ms")

o1 = run("jnp")
o2 = run("pallas")
for a, b, w in zip(o1[0], o2[0], ("offset", "votes", "accept")):
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                  err_msg=w)
print("parity: identical")
