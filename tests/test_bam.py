"""Native BAM reader tests: filter semantics of reference
convert_tools.py:73-105 verified against hand-computed expectations."""

import numpy as np
import pytest

from bamtools import bam_record, write_bam
from wisecondorx_tpu.io.bam import ConvertError, convert_reads

PAIRED = 0x1
PROPER = 0x2
UNMAPPED = 0x4

REFS = [
    ("chr1", 10000),
    ("chr2", 5000),
    ("chrX", 3000),
    ("chrY", 2000),
    ("chrM", 1000),  # skipped contig
    ("GL000220.1", 500),  # skipped contig
]


def _records():
    return [
        # chr1: proper pair kept -> bin 0
        bam_record(0, 100, 60, PAIRED | PROPER, 0, 300),
        # exact consecutive-start duplicate (same pos & pnext) -> rmdup
        bam_record(0, 100, 60, PAIRED | PROPER, 0, 300),
        # same pos, different pnext -> kept -> bin 0
        bam_record(0, 100, 60, PAIRED | PROPER, 0, 500),
        # paired but not proper -> pair_fail (larp untouched)
        bam_record(0, 150, 60, PAIRED, 0, 400),
        # proper pair with mapq 0 -> mapq filtered (larp updated)
        bam_record(0, 1500, 0, PAIRED | PROPER, 0, 1800),
        # single-end kept -> bin 2
        bam_record(0, 2500, 60, 0),
        # single-end duplicate (same start) -> rmdup
        bam_record(0, 2500, 60, 0),
        # unmapped-but-placed, mapq 0 -> counted unmapped + mapq filtered
        bam_record(0, 3000, 0, UNMAPPED),
        # chr2 single-end kept -> bin 0
        bam_record(1, 0, 60, 0),
        # chrX single-end kept -> bin 2
        bam_record(2, 2999, 60, 0),
        # chrY single-end kept (mapq 10) -> bin 0
        bam_record(3, 0, 10, 0),
        # skipped contigs: no state change, no counting
        bam_record(4, 10, 60, 0),
        bam_record(5, 10, 60, 0),
    ]


@pytest.fixture()
def bam_path(tmp_path):
    path = tmp_path / "test.bam"
    write_bam(path, REFS, _records())
    return str(path)


def test_convert_counts_and_qc(bam_path):
    bins, qc = convert_reads(bam_path, binsize=1000)

    assert len(bins["1"]) == 11  # int(10000/1000 + 1)
    np.testing.assert_array_equal(
        bins["1"], [2, 0, 1, 0, 0, 0, 0, 0, 0, 0, 0]
    )
    np.testing.assert_array_equal(bins["2"], [1, 0, 0, 0, 0, 0])
    np.testing.assert_array_equal(bins["23"], [0, 0, 1, 0])
    np.testing.assert_array_equal(bins["24"], [1, 0, 0])
    assert bins["5"] is None  # contig absent from the file
    assert all(bins[k].dtype == np.int32 for k in ("1", "2", "23", "24"))

    assert qc["pair_fail"] == 1
    assert qc["filter_rmdup"] == 2
    assert qc["filter_mapq"] == 2
    assert qc["pre_retro"] == 10
    assert qc["post_retro"] == 6
    assert qc["unmapped"] == 1
    assert qc["mapped"] == 12


def test_convert_normdup(bam_path):
    bins, qc = convert_reads(bam_path, binsize=1000, normdup=True)
    np.testing.assert_array_equal(
        bins["1"], [3, 0, 2, 0, 0, 0, 0, 0, 0, 0, 0]
    )
    assert qc["filter_rmdup"] == 0
    assert qc["post_retro"] == 8


def test_convert_single_block(tmp_path):
    """All records in one BGZF block exercises intra-block parsing."""
    path = tmp_path / "one.bam"
    write_bam(path, REFS, _records(), records_per_block=1000)
    bins, qc = convert_reads(str(path), binsize=1000)
    assert qc["post_retro"] == 6


def test_unknown_extension_rejected(tmp_path):
    with pytest.raises(ConvertError, match="extension"):
        convert_reads(str(tmp_path / "x.sam"), binsize=1000)


def test_bad_file(tmp_path):
    path = tmp_path / "junk.bam"
    path.write_bytes(b"not a bam at all")
    with pytest.raises(ConvertError):
        convert_reads(str(path), binsize=1000)


def test_bam_reader_mutation_fuzz(tmp_path):
    """Seeded mutation fuzz of a valid BAM through convert_reads: byte
    flips, truncations, and garbage splices must yield clean errors or
    valid counts — never a native crash."""
    rng = np.random.default_rng(4321)
    path = str(tmp_path / "f.bam")
    write_bam(path, REFS, _records())
    good = open(path, "rb").read()
    for trial in range(150):
        raw = bytearray(good)
        kind = trial % 3
        if kind == 0:
            for _ in range(int(rng.integers(1, 5))):
                raw[int(rng.integers(0, len(raw)))] ^= int(
                    rng.integers(1, 256)
                )
        elif kind == 1:
            raw = raw[: int(rng.integers(1, len(raw)))]
        else:
            at = int(rng.integers(0, len(raw)))
            raw = (
                raw[:at]
                + bytes(rng.integers(0, 256, int(rng.integers(1, 64)))
                        .astype(np.uint8))
                + raw[at:]
            )
        p = str(tmp_path / "mut.bam")
        open(p, "wb").write(bytes(raw))
        try:
            convert_reads(p, BINSIZE)
        except Exception:
            pass
