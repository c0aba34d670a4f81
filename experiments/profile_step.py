"""Decompose the fused device step at production scale.

Loads the cached 1.7 Gbp bench index and times each sub-stage of
DeviceMapper._step_impl separately. Run after bench.py has populated
.bench_cache: python experiments/profile_step.py [batch]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from bucketmap_tpu.index import builder
from bucketmap_tpu.io.fastq import read_fastq
from bucketmap_tpu.mapper.device_pipeline import DeviceMapper

B = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
CACHE = ".bench_cache"
index = builder.load_index(CACHE, "idx_1700")
print(f"index: {index.n_buckets} buckets, fine_pos "
      f"{None if index.fine_pos is None else index.fine_pos.shape}")

batch = read_fastq(f"{CACHE}/reads_g1700m_r1000000.fastq")
codes = batch.codes[:B]
quals = batch.quals[:B]
lengths = np.minimum(batch.lengths[:B], index.config.read_len).astype(np.int32)

dm = DeviceMapper(index, batch_size=B, pairs_per_read=4, vote_chunk=B)
co, fi = dm.coarse, dm.fine
cfg = dm.cfg
C = cfg.max_candidate_buckets
P = dm.lane_budget

jcodes, jquals, jlens = jnp.asarray(codes), jnp.asarray(quals), jnp.asarray(lengths)


def timeit(name, f, *args, n=3):
    out = jax.block_until_ready(f(*args))
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        jax.block_until_ready(f(*args))
        ts.append(time.perf_counter() - t0)
    print(f"{name}: {min(ts)*1000:.1f} ms")
    return out


coarse_fn = jax.jit(co._query_impl)
cand, counts, _ = timeit("1 coarse query     ", coarse_fn, *co._index_args(),
                         jcodes, jquals, jlens)

prep_fn = jax.jit(fi._prepare_impl)
samp_hash, samp_idx = timeit("2 locator prepare  ", prep_fn, fi.sample_tab,
                             jcodes, jquals, jlens)


@jax.jit
def compact(cand):
    flat = cand.reshape(-1)
    nl = flat.shape[0]
    lane = jnp.arange(nl, dtype=jnp.int32)
    key = jnp.where(flat >= 0, lane, nl)
    order = jnp.argsort(key)
    sel = order[:P]
    total_valid = (flat >= 0).sum().astype(jnp.int32)
    lane_read = sel // (2 * C)
    lane_rc = ((sel // C) % 2).astype(bool)
    lane_bucket = jnp.clip(flat[sel], 0, None).astype(jnp.int32)
    return lane_read, lane_rc, lane_bucket, total_valid


lane_read, lane_rc, lane_bucket, total_valid = timeit(
    "3 pair compaction  ", compact, cand)
print(f"   total_valid={int(total_valid)} of budget {P}")

vote_fn = jax.jit(fi._vote_sorted_impl)
out = timeit("4 fine vote (sorted)", vote_fn, fi.fine_pos, fi.buckets_packed,
             lane_bucket, lane_rc, samp_hash[lane_read], samp_idx[lane_read],
             jlens[lane_read])

full = timeit("5 FUSED step       ", dm.step, codes, quals, lengths)

t0 = time.perf_counter()
host = jax.device_get(full)
print(f"6 download          : {(time.perf_counter()-t0)*1000:.1f} ms "
      f"({sum(np.asarray(v).nbytes for v in host.values())/1e6:.1f} MB)")
