"""Align-stage micro-benchmark on the real chip.

Measures the device-RLE align cycle (score+traceback+RLE+download) per
8192-pair sub-batch against the cached 1.7 Gbp bench world, plus a
score-only variant to split DP vs traceback cost. Run after bench.py
populated .bench_cache:
  python experiments/profile_align.py [n_pairs] [pair_batch]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, ".")

N = int(sys.argv[1]) if len(sys.argv) > 1 else 32768
PB = int(sys.argv[2]) if len(sys.argv) > 2 else 8192
CACHE = ".bench_cache"

import jax

jax.config.update("jax_compilation_cache_dir", os.path.join(CACHE, "xla_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

from bucketmap_tpu.index import builder
from bucketmap_tpu.ops.align import BandedAligner, band_geometry

index = builder.load_index(CACHE, "idx_1700rep2")
cfg = index.config
rng = np.random.default_rng(3)

# synthetic but realistic pairs: windows at random in-bounds offsets,
# queries = the window bases with ~0.2% substitutions (like the bench sim)
blen = np.asarray(index.bucket_lengths)
bids = rng.integers(0, index.n_buckets, N).astype(np.int32)
Q = 304
qlen = np.full(N, 300, np.int32)
offs = (rng.random(N) * (blen[bids] - 400)).astype(np.int32)
# decode window bases from the packed genome (host)
bp = np.asarray(index.buckets_packed)
qcodes = np.zeros((N, Q), np.uint8)
for i in range(N):
    w0 = offs[i] // 16
    words = bp[bids[i], w0: w0 + 20]
    bases = ((words[:, None] >> (2 * np.arange(16, dtype=np.uint32))) & 3
             ).reshape(-1).astype(np.uint8)
    s = offs[i] - w0 * 16
    qcodes[i, :300] = bases[s: s + 300]
sub = rng.random((N, Q)) < 0.002
qcodes = np.where(sub, (qcodes + 1 + (rng.random((N, Q)) * 3).astype(np.uint8)) % 4,
                  qcodes).astype(np.uint8)
is_rc = np.zeros(N, bool)

al = BandedAligner(index, pair_batch=PB)
print(f"band geometry for Q={Q}, indel_rate={cfg.indel_rate}: "
      f"{band_geometry(Q, cfg.indel_rate)}", flush=True)

t0 = time.perf_counter()
got = {"n": 0}


def emit(s, e, sc, bg, nr, runs, row_off):
    got["n"] += e - s


# warmup (compile)
al.align_batch_runs_stream(qcodes[:PB], qlen[:PB], bids[:PB], offs[:PB],
                           is_rc[:PB], emit)
print(f"warmup {time.perf_counter()-t0:.1f}s", flush=True)

for trial in range(3):
    got["n"] = 0
    t0 = time.perf_counter()
    al.align_batch_runs_stream(qcodes, qlen, bids, offs, is_rc, emit)
    dt = time.perf_counter() - t0
    print(f"runs-mode: {N / dt:.0f} pairs/s ({dt*1000*PB/N:.1f} ms per "
          f"{PB}-pair sub-batch, {got['n']} consumed)", flush=True)

# ---- decomposition: DP-only / +traceback / +runs / +download ----------
import jax
import jax.numpy as jnp
from bucketmap_tpu.ops.align import pack_qcodes

blen2 = np.asarray(index.bucket_lengths)
width = np.minimum(qlen + 1 + (cfg.indel_rate * qlen).astype(np.int64),
                   blen2[bids] - offs).astype(np.int32)
P = PB
a_np = (qcodes[:P], qlen[:P].astype(np.int32), bids[:P], offs[:P],
        np.zeros(P, bool), width[:P])
jargs = tuple(jnp.asarray(a) for a in a_np)
qp = jnp.asarray(pack_qcodes(a_np[0]))
rcap = -(-8 * P // 2) * 2


def dp_only(bp, qc, ql, bi, of, rc, wd):
    sc, bg, ops = al._align_core(bp, qc, ql, bi, of, rc, wd)
    return sc                 # XLA prunes the unused traceback scan


def dp_tb(bp, qc, ql, bi, of, rc, wd):
    sc, bg, ops = al._align_core(bp, qc, ql, bi, of, rc, wd)
    return sc, bg, ops.sum(dtype=jnp.int32)


jdp = jax.jit(dp_only)
jtb = jax.jit(dp_tb)
variants = (
    ("dp-only", lambda: jdp(al.buckets_packed, *jargs)),
    ("dp+traceback", lambda: jtb(al.buckets_packed, *jargs)),
    ("runs vec (no download)", lambda: al._align_runs(
        al.buckets_packed, qp, *jargs[1:], run_cap=rcap)),
)
for name, fn in variants:
    jax.block_until_ready(fn())           # compile
    t0 = time.perf_counter()
    for _ in range(4):
        jax.block_until_ready(fn())
    print(f"{name}: {(time.perf_counter()-t0)/4*1000:.1f} ms / {P} pairs",
          flush=True)
out = al._align_runs(al.buckets_packed, qp, *jargs[1:], run_cap=rcap)
jax.block_until_ready(out)
t0 = time.perf_counter()
for _ in range(4):
    np.asarray(jax.device_get(al._align_runs(
        al.buckets_packed, qp, *jargs[1:], run_cap=rcap)))
print(f"runs vec + download: {(time.perf_counter()-t0)/4*1000:.1f} ms",
      flush=True)
