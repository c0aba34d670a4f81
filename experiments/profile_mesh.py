"""Mesh-step vs single-chip parity on REAL hardware.

VERDICT r3 #1's done-criterion: a real-chip run of the bucket-sharded
mesh step on a 1x1 mesh must land within ~10% of the non-mesh path —
proving the mesh codepath (fused Pallas coarse kernel + sharded device
fine build + collective candidate policy) costs nothing when the mesh
is trivial, so multi-chip scaling starts from the full single-chip
throughput. Run after bench.py populated .bench_cache:
  python experiments/profile_mesh.py [n_batches] [batch]
"""

import os
import sys
import time

import jax
import numpy as np

sys.path.insert(0, ".")

NB = int(sys.argv[1]) if len(sys.argv) > 1 else 8
B = int(sys.argv[2]) if len(sys.argv) > 2 else 16384
CACHE = ".bench_cache"
jax.config.update("jax_compilation_cache_dir", os.path.join(CACHE, "xla_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

from jax.sharding import Mesh

from bucketmap_tpu.index import builder
from bucketmap_tpu.io import native
from bucketmap_tpu.io.fastq import read_fastq
from bucketmap_tpu.mapper.device_pipeline import DeviceMapper

index = builder.load_index(CACHE, "idx_1700rep2")
print(f"index: {index.n_buckets} buckets")
batch = read_fastq(f"{CACHE}/reads_g1700rep2m_r1000000.fastq")
codes = batch.codes[: NB * B]
quals = batch.quals[: NB * B]
lengths = np.minimum(batch.lengths[: NB * B],
                     index.config.read_len).astype(np.int32)
assert native.available()


def run(dm, label):
    # warmup + compile
    out = dm.step(codes[:B], quals[:B], lengths[:B])
    dm.decode_out(np.asarray(jax.device_get(out)))
    t0 = time.perf_counter()
    outs = [dm.step(codes[i * B : (i + 1) * B], quals[i * B : (i + 1) * B],
                    lengths[i * B : (i + 1) * B]) for i in range(NB)]
    acc = 0
    for out in outs:
        host = dm.decode_out(np.asarray(jax.device_get(out)))
        acc += int(host["n_accept"].sum())
    dt = time.perf_counter() - t0
    print(f"{label}: {NB * B / dt:.0f} reads/s ({dt:.2f}s, "
          f"{acc} accepted, path {dm._vote_path})")
    return NB * B / dt, host


# one mode per process: the two mappers' device tables cannot coexist
# (6.8 GB fine x2 on a 16 GB chip) and the remote backend frees a dying
# process's HBM asynchronously — run `single` then `mesh` separately
mode = sys.argv[3] if len(sys.argv) > 3 else "single"
if mode == "single":
    t0 = time.perf_counter()
    dm = DeviceMapper(index, batch_size=B, pairs_per_read=4,
                      vote_chunk=1024)
    print(f"single init {time.perf_counter()-t0:.1f}s", flush=True)
    run(dm, "single-chip (no mesh)")
else:
    t0 = time.perf_counter()
    mesh = Mesh(np.asarray(jax.devices()[:1]).reshape(1, 1),
                ("data", "bucket"))
    dm = DeviceMapper(index, batch_size=B, pairs_per_read=4,
                      vote_chunk=1024, mesh=mesh)
    print(f"mesh 1x1 init {time.perf_counter()-t0:.1f}s", flush=True)
    run(dm, "mesh 1x1 (sharded step)")
