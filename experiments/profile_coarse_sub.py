"""Decompose the fused coarse scoring: sampling / row map / DMA kernel.

python experiments/profile_coarse_sub.py [batch]
"""

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

B = int(sys.argv[1]) if len(sys.argv) > 1 else 16384
CACHE = ".bench_cache"
jax.config.update("jax_compilation_cache_dir", os.path.join(CACHE, "xla_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

from bucketmap_tpu.index import builder
from bucketmap_tpu.io.fastq import read_fastq
from bucketmap_tpu.mapper.device_pipeline import DeviceMapper
from bucketmap_tpu.ops.coarse import _coarse_score_pallas
from bucketmap_tpu.ops.encoding import pack_reads, unpack_reads

index = builder.load_index(CACHE, "idx_1700rep2")
batch = read_fastq(f"{CACHE}/reads_g1700rep2m_r1000000.fastq")
codes = batch.codes[:B]
quals = batch.quals[:B]
lengths = np.minimum(batch.lengths[:B], index.config.read_len).astype(np.int32)

dm = DeviceMapper(index, batch_size=B, pairs_per_read=4, vote_chunk=B)
co = dm.coarse
cfg = dm.cfg

packed = pack_reads(codes, quals, lengths, cfg.query_seed,
                    cfg.mapper_min_kmer_quality)
jcodes, jqual_ok, jlens = jax.jit(
    lambda p: unpack_reads(p, cfg.read_len, cfg.query_seed, xp=jnp))(
        jnp.asarray(packed))


def _force(out):
    leaves = jax.tree_util.tree_leaves(out)
    jax.device_get([l[(0,) * getattr(l, "ndim", 0)] for l in leaves])
    return out


def timeit(name, f, *args, n=3):
    out = _force(f(*args))
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        _force(f(*args))
        ts.append(time.perf_counter() - t0)
    print(f"{name}: {min(ts)*1000:.1f} ms", flush=True)
    return out


_x = jnp.zeros(8)
timeit("0 floor      ", lambda v: v + 1, _x)

samp = jax.jit(co._sample_hashes_impl)
both, num_good, give_up = timeit(
    "1 sampling   ", samp, co.kmer_to_row, co._index_args()[2],
    co._index_args()[3], jcodes, jqual_ok, jlens)

nq = cfg.qgrams_per_kmer


def rowmap(kmer_to_row, both):
    qbits = jnp.uint32(4**cfg.index_seed - 1)
    shifts = 2 * jnp.arange(nq, dtype=jnp.uint32)
    grams = (both[..., None] >> shifts) & qbits
    return kmer_to_row[grams].reshape(-1, nq)


rows = timeit("2 row map    ", jax.jit(rowmap), co.kmer_to_row, both)

w = co.qgram_words.shape[1]
tab3 = co.qgram_words.reshape(co.qgram_words.shape[0], w // 128, 128)


def kern(tab3, rows):
    return _coarse_score_pallas(tab3, rows, jnp.int32(co.n_buckets),
                                cfg.mapper_samples)


cm, cc, pls = timeit("3 DMA kernel ", jax.jit(kern), tab3, rows)
gb = rows.shape[0] * nq * w * 4 / 1e9
print(f"   kernel traffic {gb:.1f} GB ({rows.shape[0] * nq} row DMAs of "
      f"{w*4/1024:.0f} KB)")
