"""Decompose _extract_at_max2 (candidate select) at production shape.

python experiments/profile_select.py [batch]
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
from bucketmap_tpu.ops.coarse import _first_set_indices
from bucketmap_tpu.ops.encoding import pack_reads, unpack_reads

index = builder.load_index(CACHE, "idx_1700rep2")
batch = read_fastq(f"{CACHE}/reads_g1700rep2m_r1000000.fastq")
codes = batch.codes[:B]
quals = batch.quals[:B]
lengths = np.minimum(batch.lengths[:B], index.config.read_len).astype(np.int32)

dm = DeviceMapper(index, batch_size=B, pairs_per_read=4, vote_chunk=B)
co = dm.coarse
cfg = dm.cfg
C = cfg.max_candidate_buckets

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
timeit("0 floor            ", lambda v: v + 1, _x)

from bucketmap_tpu.ops.coarse import _coarse_score_pallas


def scored(qgram_words, kmer_to_row, dist_tab, sample_tab, codes, qual_ok,
           lengths):
    both, num_good, give_up = co._sample_hashes_impl(
        kmer_to_row, dist_tab, sample_tab, codes, qual_ok, lengths)
    nq = cfg.qgrams_per_kmer
    qbits = jnp.uint32(4**cfg.index_seed - 1)
    shifts = 2 * jnp.arange(nq, dtype=jnp.uint32)
    grams = (both[..., None] >> shifts) & qbits
    rows = kmer_to_row[grams].reshape(-1, nq)
    w = qgram_words.shape[1]
    tab3 = qgram_words.reshape(qgram_words.shape[0], w // 128, 128)
    cm, cc, pls = _coarse_score_pallas(tab3, rows, jnp.int32(co.n_buckets),
                                       cfg.mapper_samples)
    Bl = codes.shape[0]
    return (cm.reshape(Bl, 2, w), cc.reshape(Bl, 2, w),
            pls.reshape(Bl, 2, -1, w), give_up)


chunk_max, chunk_cnt, planes, give_up = _force(
    jax.jit(scored)(*co._index_args(), jcodes, jqual_ok, jlens))
n = co.n_buckets
n_planes = planes.shape[2]


def policy(chunk_max, chunk_cnt, give_up):
    max_hits = chunk_max.max(axis=2)
    ok = (max_hits >= cfg.min_coarse_hits) & ~give_up[:, None]
    counts = jnp.where((chunk_max == max_hits[:, :, None]) & ok[..., None],
                       chunk_cnt, 0).sum(axis=2)
    over = counts > C
    return max_hits, ok & ~over


max_hits, live = _force(jax.jit(policy)(chunk_max, chunk_cnt, give_up))


def eq_only(planes, max_hits):
    eq = None
    for j in range(n_planes):
        gb = ((max_hits >> j) & 1)[..., None]
        pj = planes[:, :, j]
        term = jnp.where(gb == 1, pj, ~pj)
        eq = term if eq is None else (eq & term)
    return eq


def lvl1(chunk_max, max_hits, live):
    chunk_has = (chunk_max == max_hits[..., None]) & live[..., None]
    return _first_set_indices(chunk_has, min(C, chunk_max.shape[-1]))


def lvl2(eq, cidx, cvalid):
    Bl = eq.shape[0]
    w = jnp.take_along_axis(eq, cidx, axis=2)
    shifts = jnp.arange(32, dtype=jnp.uint32)
    bits = ((w[..., None] >> shifts) & jnp.uint32(1)) != 0
    cs = co.CAND_CHUNK
    sub_col = (cidx[..., None] * cs + jnp.arange(cs, dtype=jnp.int32))
    sub_at = bits & cvalid[..., None] & (sub_col < n)
    pos, pvalid = _first_set_indices(sub_at.reshape(Bl, 2, -1), C)
    cand = jnp.take_along_axis(sub_col.reshape(Bl, 2, -1), pos, axis=-1)
    return jnp.where(pvalid, cand, -1).astype(jnp.int32)


eq = timeit("1 eq flags         ", jax.jit(eq_only), planes, max_hits)
cidx, cvalid = timeit("2 level1 first_set ", jax.jit(lvl1), chunk_max,
                      max_hits, live)
cand = timeit("3 level2           ", jax.jit(lvl2), eq, cidx, cvalid)
timeit("4 full select      ",
       jax.jit(lambda p, cm, mh, lv: co._extract_at_max2(p, cm, mh, lv, n)),
       planes, chunk_max, max_hits, live)
print("cands/readstrand:",
      float((np.asarray(cand) >= 0).sum()) / (B * 2))
