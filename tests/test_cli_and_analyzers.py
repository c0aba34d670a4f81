import numpy as np
import pytest

from bucketmap_tpu.cli import main as cli_main
from bucketmap_tpu.io.fasta import write_fasta
from bucketmap_tpu.ops.encoding import decode_to_ascii
from bucketmap_tpu.sim.simulator import random_genome


# q=8 keeps per-bucket q-gram density low like the real q=9/65536 regime,
# so the distinguishability filter retains enough k-mers on toy buckets
ARGS = ["--bucket-len", "4096", "-r", "150", "-k", "8", "-l", "11", "-s", "8"]


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    d = tmp_path_factory.mktemp("cli")
    recs = random_genome(300_000, seed=9, n_refs=2, name_prefix="chr")
    write_fasta(d / "g.fasta", [(r.id, decode_to_ascii(r.codes)) for r in recs])
    assert cli_main(["index", "-g", str(d / "g.fasta"), "-i", "t",
                     "--index-dir", str(d), "--export-reference-format"] + ARGS) == 0
    assert cli_main(["simulate", "-g", str(d / "g.fasta"), "-o", str(d),
                     "--name", "rd", "-c", "300", "--seed", "3"] + ARGS) == 0
    return d


def test_cli_index_map_analyze(workdir, capsys):
    d = workdir
    assert (d / "t.qgram").exists() and (d / "t.bmtpu.qgram_words.npy").exists()
    assert cli_main(["map", "-i", "t", "-q", str(d / "rd.fastq"),
                     "-o", str(d / "out.sam"), "--index-dir", str(d),
                     "--batch-size", "128"] + ARGS) == 0
    assert cli_main(["analyze-sam", str(d / "out.sam"),
                     "--fastq", str(d / "rd.fastq"),
                     "--ground-truth", str(d / "rd.position_ground_truth"),
                     "--tolerance", "10"]) == 0
    out = capsys.readouterr().out
    assert "sensitivity" in out

    from bucketmap_tpu.bench.sam_analyzer import SamAnalyzer
    an = SamAnalyzer(error_tolerance=10)
    an.read_sequence_file(d / "rd.fastq")
    an.read_ground_truth_file(d / "rd.position_ground_truth")
    res = an.benchmark(d / "out.sam", quiet=True)
    assert res.sensitivity_pct >= 90
    assert res.precision_pct >= 90


def test_cli_align_mode_and_reference_index_load(workdir):
    d = workdir
    # load via the reference-format files (exercise import path + align)
    import os
    os.rename(d / "t.bmtpu.json", d / "t_hidden.json")
    try:
        assert cli_main(["map", "-i", "t", "-q", str(d / "rd.fastq"),
                         "-o", str(d / "out_al.sam"), "--index-dir", str(d),
                         "-g", str(d / "g.fasta"), "--align",
                         "--batch-size", "128"] + ARGS) == 0
    finally:
        os.rename(d / "t_hidden.json", d / "t.bmtpu.json")
    from bucketmap_tpu.io.sam import read_sam
    recs = list(read_sam(d / "out_al.sam"))
    assert len(recs) >= 250
    assert all(r["cigar"] != "*" for r in recs)


def test_analyze_fastq(workdir, capsys):
    assert cli_main(["analyze-fastq", str(workdir / "rd.fastq")]) == 0
    assert "Estimated error rate" in capsys.readouterr().out


def test_best_alignment_pseudo_truth(workdir):
    # our own SAM as pseudo-truth scores itself at 100%
    from bucketmap_tpu.bench.sam_analyzer import SamAnalyzer
    d = workdir
    an = SamAnalyzer(error_tolerance=5)
    an.read_sequence_file(d / "rd.fastq")
    an.read_best_alignment_file(d / "out.sam")
    res = an.benchmark(d / "out.sam", quiet=True)
    assert res.precision_pct == 100.0
