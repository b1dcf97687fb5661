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


def _bam_payload(refs, records):
    """The raw (uncompressed) BAM byte stream: header + records."""
    import bamtools

    return bamtools.bam_payload_header(refs) + b"".join(records)


def test_records_straddling_bgzf_blocks(tmp_path):
    """htslib packs the BAM byte stream into BGZF blocks at arbitrary
    offsets — records routinely straddle block boundaries.  The repo's
    writer always block-aligns whole records, so this builds blocks cut
    at every awkward offset (mid-length-field, mid-record, 1-byte
    blocks, an empty block) and demands counts identical to the aligned
    layout.  Reference surface: convert_tools.py:22-33 via htslib."""
    import bamtools

    recs = _records()
    aligned = str(tmp_path / "aligned.bam")
    write_bam(aligned, REFS, recs)
    want, wq = convert_reads(aligned, 1000.0)

    payload = _bam_payload(REFS, recs)
    for cuts in (
        [1, 2, 3, 7],              # tiny leading blocks, then the rest
        [37],                      # cut inside the header
        [len(payload) // 2 - 1],   # cut mid-record
        list(range(50, len(payload), 61)),  # many odd-size blocks
    ):
        blocks = []
        prev = 0
        for c in cuts + [len(payload)]:
            if c <= prev or c > len(payload):
                continue
            blocks.append(bamtools.bgzf_block(payload[prev:c]))
            prev = c
        blocks.insert(1, bamtools.bgzf_block(b""))  # empty mid-block
        blocks.append(bamtools.bgzf_block(b""))     # EOF marker
        p = str(tmp_path / "split.bam")
        open(p, "wb").write(b"".join(blocks))
        got, gq = convert_reads(p, 1000.0)
        for k in want:
            if want[k] is None:
                assert got[k] is None, k
            else:
                np.testing.assert_array_equal(want[k], got[k], err_msg=k)
        assert wq == gq


def test_bgzf_structural_corruption_clean(tmp_path):
    """Structural BGZF damage — truncated final block, corrupt payload
    CRC, corrupt BSIZE — must raise a clean ConvertError (or, for a
    clean truncation at a record boundary, yield valid partial counts),
    never crash."""
    import struct

    import bamtools

    recs = _records()
    payload = _bam_payload(REFS, recs)
    good_blocks = [
        bamtools.bgzf_block(payload[i : i + 100])
        for i in range(0, len(payload), 100)
    ]
    raw = b"".join(good_blocks) + bamtools.bgzf_block(b"")

    cases = {
        "truncate-mid-block": raw[: len(raw) - len(raw) // 3],
        "garbage-tail": raw + b"\x99" * 37,
    }
    # Corrupt the first block's payload CRC (last 8 bytes of the block
    # are crc32 + isize).
    b0 = bytearray(good_blocks[0])
    b0[-5] ^= 0xFF
    cases["bad-crc"] = bytes(b0) + b"".join(good_blocks[1:])
    # Corrupt BSIZE of the second block (offset 16-17 within the block).
    b1 = bytearray(good_blocks[1])
    struct.pack_into("<H", b1, 16, 7)
    cases["bad-bsize"] = good_blocks[0] + bytes(b1) + b"".join(
        good_blocks[2:]
    )

    for name, blob in cases.items():
        p = str(tmp_path / "bad.bam")
        open(p, "wb").write(blob)
        try:
            counts, _ = convert_reads(p, 1000.0)
            assert isinstance(counts, dict), name
        except ConvertError:
            pass  # the clean-error contract; a native crash would kill
            # the test process instead
