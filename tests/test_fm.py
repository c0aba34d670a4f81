"""FM-index family tests (SURVEY §2 rows C4/C5/C14/C15) vs naive oracles."""

import numpy as np
import pytest

from bucketmap_tpu.config import MapperConfig
from bucketmap_tpu.index.fm import (BiFMIndex, BucketFMIndexer, FMIndex,
                                    FMIndexer, FMIndexLocator, FMIndexMapper,
                                    exact_search_batch, semiglobal_edit,
                                    suffix_array)
from bucketmap_tpu.io.fasta import FastaRecord


def _rand_text(n, seed=0):
    return np.random.default_rng(seed).integers(0, 4, n).astype(np.uint8)


def _naive_find(text, pat):
    t = text.tobytes()
    p = pat.tobytes()
    out, i = [], t.find(p)
    while i != -1:
        out.append(i)
        i = t.find(p, i + 1)
    return np.array(out, dtype=np.int64)


def test_suffix_array_matches_naive():
    text = _rand_text(300, seed=1)
    sa = suffix_array(text)
    suffixes = [text[i:].tobytes() for i in range(len(text))] + [b""]
    naive = sorted(range(len(text) + 1), key=lambda i: suffixes[i] if i < len(text) else b"")
    # sentinel is smallest: empty suffix first; bytes compare gives same
    # order for 0..3 codes since sentinel < all
    naive = sorted(range(len(text) + 1),
                   key=lambda i: text[i:].tobytes())
    naive.remove(len(text))
    naive = [len(text)] + naive
    assert list(sa) == naive


def test_backward_search_and_locate_match_naive():
    text = _rand_text(2000, seed=2)
    idx = FMIndex.build([FastaRecord("r", text)])
    rng = np.random.default_rng(3)
    for plen in (4, 9, 15):
        for _ in range(10):
            s = int(rng.integers(0, len(text) - plen))
            pat = text[s:s + plen]
            got = idx.find_all(pat)
            np.testing.assert_array_equal(got, _naive_find(text, pat))
    # absent pattern
    pat = np.array([0, 1, 2, 3, 0, 1, 2, 3, 3, 3, 3, 2, 1, 0, 2, 2, 0, 1],
                   np.uint8)
    if len(_naive_find(text, pat)) == 0:
        assert len(idx.find_all(pat)) == 0


def test_exact_search_batch_matches_scalar():
    text = _rand_text(1500, seed=4)
    idx = FMIndex.build([FastaRecord("r", text)])
    rng = np.random.default_rng(5)
    B, m = 16, 12
    pats = np.zeros((B, m), np.uint8)
    lens = np.zeros(B, np.int64)
    for i in range(B):
        ln = int(rng.integers(5, m + 1))
        s = int(rng.integers(0, len(text) - ln))
        pats[i, :ln] = text[s:s + ln]
        lens[i] = ln
    lo, hi = exact_search_batch(idx, pats, lens)
    for i in range(B):
        slo, shi = idx.backward_search(pats[i, : lens[i]])
        assert (lo[i], hi[i]) == (slo, shi)


def test_fm_save_load_roundtrip(tmp_path):
    text = _rand_text(500, seed=6)
    recs = [FastaRecord("chr1 desc", text[:300]), FastaRecord("chr2", text[300:])]
    FMIndexer(bidirectional=False).index(recs, tmp_path, "g")
    idx = FMIndex.load(tmp_path, "g")
    pat = text[50:62]
    np.testing.assert_array_equal(idx.find_all(pat),
                                  _naive_find(text, pat))
    rid, rpos = idx.pos_to_ref(np.array([10, 310]))
    assert list(rid) == [0, 1] and list(rpos) == [10, 10]


def test_bidirectional_extensions():
    text = _rand_text(800, seed=7)
    bi = BiFMIndex.build([FastaRecord("r", text)])
    pat = text[100:110]
    # extend left over the reversed pattern = plain backward search
    st = bi.init_range()
    for c in pat[::-1]:
        st = bi.extend_left(st, int(c))
    lo, hi, rlo, rhi = st
    assert hi - lo == len(_naive_find(text, pat))
    assert rhi - rlo == hi - lo
    # extend right from scratch must find the same count
    st = bi.init_range()
    for c in pat:
        st = bi.extend_right(st, int(c))
    lo2, hi2, _, _ = st
    assert hi2 - lo2 == hi - lo
    # mixed: grow outward from the middle
    st = bi.init_range()
    mid = 5
    st = bi.extend_left(st, int(pat[mid]))
    for c in pat[mid + 1:]:
        st = bi.extend_right(st, int(c))
    for c in pat[:mid][::-1]:
        st = bi.extend_left(st, int(c))
    lo3, hi3, _, _ = st
    assert hi3 - lo3 == hi - lo


def test_semiglobal_edit():
    w = np.array([0, 1, 2, 3, 0, 1, 2, 3], np.uint8)
    assert semiglobal_edit(np.array([2, 3, 0], np.uint8), w)[0] == 0
    assert semiglobal_edit(np.array([2, 3, 1], np.uint8), w)[0] == 1
    d, end = semiglobal_edit(np.array([1, 2, 3], np.uint8), w)
    assert d == 0 and end in (4, 8)


def test_fm_mapper_finds_errored_reads():
    rng = np.random.default_rng(8)
    text = _rand_text(5000, seed=8)
    idx = FMIndex.build([FastaRecord("chr", text)])
    mapper = FMIndexMapper(idx, max_errors=1)
    mapper.text = text
    B, L = 12, 60
    codes = np.zeros((B, L), np.uint8)
    lens = np.full(B, L, np.int64)
    truth = np.zeros(B, np.int64)
    for i in range(B):
        s = int(rng.integers(0, len(text) - L))
        read = text[s:s + L].copy()
        if i % 2 == 1:  # one substitution
            p = int(rng.integers(0, L))
            read[p] = (read[p] + 1) % 4
        codes[i] = read
        truth[i] = s
    hits = mapper.map_reads(codes, lens)
    found = sum(any(abs(h.position - truth[i]) <= 1 for h in hits[i])
                for i in range(B))
    assert found == B


def test_bucket_fm_indexer_roundtrip(tmp_path):
    cfg = MapperConfig(bucket_len=256, read_len=40)
    text = _rand_text(1000, seed=9)
    recs = [FastaRecord("chr", text)]
    bi = BucketFMIndexer(cfg)
    n = bi.index(recs, tmp_path, "g")
    assert n == len(bi.buckets) and n >= 3
    loaded = BucketFMIndexer.load(cfg, tmp_path, "g")
    assert len(loaded.buckets) == n
    # search a pattern from bucket 1 inside that bucket's index
    pat = text[300:315]
    got = loaded.buckets[1].find_all(pat)
    assert 300 - 256 in list(got)


def test_fm_locator_end_to_end(tmp_path):
    text = _rand_text(3000, seed=10)
    loc = FMIndexLocator(max_errors=1)
    loc.initialize([FastaRecord("chrA", text)], tmp_path, "g")
    codes = text[1200:1260][None, :].copy()
    hits = loc.locate(codes, np.array([60]))
    assert any(h.ref_id == 0 and h.position == 1200 for h in hits[0])
