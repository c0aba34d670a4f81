import numpy as np
import pytest

from bucketmap_tpu.config import MapperConfig
from bucketmap_tpu.index import builder
from bucketmap_tpu.io.fasta import FastaRecord, read_fasta, write_fasta
from bucketmap_tpu.io.fastq import read_fastq
from bucketmap_tpu.ops.encoding import decode_to_ascii, encode_ascii, kmer_hashes, unpack_2bit
from bucketmap_tpu.sim.simulator import ShortReadSimulator, random_genome

CFG = MapperConfig(bucket_len=2048, read_len=100, index_seed=5, query_seed=8,
                   kmer_fraction=1.0)


def _toy_records(seed=0, n_refs=2, length=9000):
    return random_genome(length, seed=seed, n_refs=n_refs, name_prefix="ref")


def test_bucket_decomposition():
    # utils.h:60-102: ceil(len/L) buckets of [iL, iL+L+rl), drop <= rl residuals
    recs = [FastaRecord("a", np.zeros(5000, np.uint8)),
            FastaRecord("b", np.zeros(2100, np.uint8))]
    buckets = list(builder.iterate_buckets(recs, CFG))
    # a: ceil(5000/2048)=3 buckets: [0,2148),[2048,4196),[4096,5000)
    # b: ceil(2100/2048)=2: [0,2148)->2100, [2048,2100) len 52 <= 100 dropped
    assert len(buckets) == 4
    assert [len(b[2]) for b in buckets] == [2148, 2148, 904, 2100]
    assert [b[0] for b in buckets] == ["a", "a", "a", "b"]


def test_frac_min_hash_fraction():
    cfg = MapperConfig(index_seed=7, kmer_fraction=0.25)
    table = builder.frac_min_hash_table(cfg)
    frac = (table >= 0).mean()
    assert 0.2 < frac < 0.3
    # row ids are dense 0..K-1 in hash order
    rows = table[table >= 0]
    np.testing.assert_array_equal(np.sort(rows), np.arange(len(rows)))


def test_index_occupancy_matches_bruteforce():
    recs = _toy_records()
    idx = builder.build_index(recs, CFG)
    n = idx.n_buckets
    q = CFG.index_seed
    # brute force: q-gram g present in bucket b?
    buckets = list(builder.iterate_buckets(recs, CFG))
    for b in [0, 1, n - 1]:
        codes = buckets[b][2]
        present = set(kmer_hashes(codes, q).tolist())
        for g in list(present)[:50]:
            row = idx.kmer_to_row[g]
            assert row >= 0
            word = idx.qgram_words[row, b >> 5]
            assert (word >> (b & 31)) & 1 == 1
        # absent q-grams
        absent = set(range(100)) - present
        for g in list(absent)[:20]:
            row = idx.kmer_to_row[g]
            word = idx.qgram_words[row, b >> 5]
            assert (word >> (b & 31)) & 1 == 0


def test_index_zeros_and_packed_seq():
    recs = _toy_records()
    idx = builder.build_index(recs, CFG)
    g_rows = idx.qgram_words.shape[0] - 1
    pop = np.bitwise_count(idx.qgram_words[:g_rows]).sum(axis=1)
    np.testing.assert_array_equal(idx.zeros[:g_rows], idx.n_buckets - pop)
    assert idx.zeros[-1] == -1
    # packed bucket sequences decode to the original codes
    buckets = list(builder.iterate_buckets(recs, CFG))
    for b in [0, 2, idx.n_buckets - 1]:
        n = idx.bucket_lengths[b]
        got = unpack_2bit(idx.buckets_packed[b], int(n))
        np.testing.assert_array_equal(got, buckets[b][2])


def test_index_save_load_roundtrip(tmp_path):
    recs = _toy_records()
    idx = builder.build_index(recs, CFG)
    builder.save_index(idx, tmp_path, "toy")
    idx2 = builder.load_index(tmp_path, "toy")
    assert idx2.config == CFG
    np.testing.assert_array_equal(idx2.qgram_words, idx.qgram_words)
    np.testing.assert_array_equal(idx2.buckets_packed, idx.buckets_packed)
    assert idx2.bucket_names == idx.bucket_names


def test_reference_format_roundtrip(tmp_path):
    recs = _toy_records()
    idx = builder.build_index(recs, CFG)
    builder.export_reference_format(idx, tmp_path, "toy")
    # .qgram rows are (N+7)//8 bytes each, one per sampled q-gram
    g_rows = idx.qgram_words.shape[0] - 1
    size = (idx.n_buckets + 7) // 8 * g_rows
    assert (tmp_path / "toy.qgram").stat().st_size == size
    fasta = tmp_path / "toy.fasta"
    write_fasta(fasta, [(r.id, decode_to_ascii(r.codes)) for r in recs])
    idx2 = builder.import_reference_format(tmp_path, "toy", CFG, fasta)
    np.testing.assert_array_equal(idx2.qgram_words, idx.qgram_words)
    np.testing.assert_array_equal(idx2.kmer_to_row, idx.kmer_to_row)
    np.testing.assert_array_equal(idx2.zeros, idx.zeros)
    np.testing.assert_array_equal(idx2.buckets_packed, idx.buckets_packed)
    assert idx2.bucket_names == idx.bucket_names
    assert idx2.ref_names == idx.ref_names


def test_fasta_io_roundtrip(tmp_path):
    path = tmp_path / "x.fasta"
    write_fasta(path, [("chr1 extra info", b"ACGT" * 50), ("chr2", b"TTTT" * 10)])
    recs = read_fasta(path)
    assert recs[0].id == "chr1 extra info"
    assert decode_to_ascii(recs[0].codes) == b"ACGT" * 50
    assert decode_to_ascii(recs[1].codes) == b"TTTT" * 10


def test_simulator_and_fastq_io(tmp_path):
    recs = _toy_records()
    sim = ShortReadSimulator(CFG, substitution_rate=0.01, insertion_rate=0.002,
                             deletion_rate=0.002, seed=7)
    sim.read(recs)
    paths = sim.generate(tmp_path, "sim", 200)
    batch = read_fastq(paths["fastq"])
    assert batch.num_reads == 200
    assert batch.ids[0] == "0"
    assert batch.lengths.max() <= CFG.read_len + 10  # insertions can lengthen
    # quality is constant 'E' = rank 36
    assert batch.quals[0, : batch.lengths[0]].min() == 36
    # ground truth lines parse and agree between the two files
    bgt = [line.split() for line in open(paths["bucket_gt"])]
    pgt = [line.split() for line in open(paths["position_gt"])]
    assert len(bgt) == len(pgt) == 200
    for (b, off, rc, cg), (rid, pos, rc2, cg2) in zip(bgt[:20], pgt[:20]):
        ref_id, ordinal = sim.bucket_ids[int(b)]
        assert int(rid) == ref_id
        assert int(pos) == ordinal * CFG.bucket_len + int(off) + 1
        assert rc == rc2 and cg == cg2


def test_simulator_errorfree_reads_match_genome(tmp_path):
    recs = _toy_records()
    sim = ShortReadSimulator(CFG, seed=3)
    sim.read(recs)
    from bucketmap_tpu.ops.encoding import revcomp_codes

    for _ in range(50):
        codes, bucket, start, rc, cigar = sim.sample(simulate_error=False)
        truth = sim.bucket_codes[bucket][start : start + CFG.read_len]
        if rc:
            codes = revcomp_codes(codes)
        np.testing.assert_array_equal(codes, truth)
        assert cigar == f"{len(truth)}="

def test_native_index_build_matches_numpy(monkeypatch):
    """csrc/bmtpu_index.cpp (threaded rolling-hash occupancy scatter +
    LSD-radix fine build) is bit-identical to the numpy builder on a
    genome with uneven record lengths (residual-drop + tail words)."""
    import pytest

    from bucketmap_tpu.io import native
    from bucketmap_tpu.sim.simulator import repeat_genome

    if not native.available():
        pytest.skip("native library unavailable")
    cfg = MapperConfig(bucket_len=65536, read_len=300)
    genome = repeat_genome(3_000_000, seed=3, n_refs=3)
    # uneven tails: one record mid-bucket, one ending exactly at a
    # residual <= read_len (dropped bucket)
    genome[1].codes = genome[1].codes[: len(genome[1].codes) - 65536 + 123]
    genome[2].codes = genome[2].codes[: (len(genome[2].codes) // 65536) * 65536 + 200]

    monkeypatch.setenv("BMTPU_HOST_BUILD_NATIVE", "0")
    a = builder.build_index(genome, cfg)
    builder.build_fine_index(a)
    monkeypatch.setenv("BMTPU_HOST_BUILD_NATIVE", "1")
    b = builder.build_index(genome, cfg)
    builder.build_fine_index(b)

    assert a.n_buckets == b.n_buckets
    np.testing.assert_array_equal(a.qgram_words, b.qgram_words)
    np.testing.assert_array_equal(a.buckets_packed, b.buckets_packed)
    np.testing.assert_array_equal(a.zeros, b.zeros)
    np.testing.assert_array_equal(a.fine_packed, b.fine_packed)
    np.testing.assert_array_equal(a.fine_ptab, b.fine_ptab)
    assert a.fine_search_steps == b.fine_search_steps
    assert a.fine_low_bits == b.fine_low_bits
