"""Native CRAM reader tests: a hand-built CRAM must convert to the exact
same binned counts + QC counters as the equivalent BAM (reference parity
surface: convert_tools.py:22-33 accepts .cram via pysam/htslib)."""

import numpy as np
import pytest

import bamtools
import cramtools
from wisecondorx_tpu.io.bam import convert_reads

REFS = [("chr1", 2_000_000), ("chrX", 1_500_000), ("Y", 1_000_000),
        ("MT", 16_000)]  # MT must be skipped by contig normalization
BINSIZE = 5000.0


def _records():
    """A record mix exercising every filter branch.

    Each entry: (ref_slot, pos, mapq, flag, pnext, mate_kind)
    mate_kind: None (unpaired), "detached", ("nf", k).
    """
    P = 0x1  # paired
    PP = 0x3  # paired + proper
    recs = []
    # chr1: proper pairs, one downstream-mate pair, duplicates, low mapq
    recs.append((0, 1000, 60, PP, 5000, "detached"))
    recs.append((0, 1000, 60, PP, 5000, "detached"))  # dup (same pos+pnext)
    recs.append((0, 1000, 60, PP, 7000, "detached"))  # same pos, diff pnext
    recs.append((0, 2000, 0, PP, 6000, "detached"))   # mapq fail
    recs.append((0, 2500, 60, P, 6500, "detached"))   # not proper pair
    # downstream-mate pair: rec at 3000 mates with rec at 9000 (1 apart)
    recs.append((0, 3000, 60, PP, 9000, ("nf", 0)))
    recs.append((0, 9000, 60, PP, 3000, None))  # resolved by partner's NF
    # unpaired reads incl. consecutive-position duplicate
    recs.append((0, 12000, 60, 0, -1, None))
    recs.append((0, 12000, 60, 0, -1, None))  # unpaired dup
    # unmapped-but-placed; mapq 0 (CRAM stores no MQ for unmapped records,
    # so a nonzero mapq here would be unrepresentable — htslib is equally
    # lossy)
    recs.append((0, 15000, 0, 0x4, -1, None))
    # chrX + Y
    recs.append((1, 800_000, 60, 0, -1, None))
    recs.append((2, 123_000, 60, 0, -1, None))
    # MT: skipped contig, still counted in QC totals
    recs.append((3, 100, 60, 0, -1, None))
    return recs


def _write_pair(tmp_path, *, method="raw", ap_delta=True, bf_huffman=False,
                mq_beta=False, multiref=False):
    recs = _records()
    bam_path = str(tmp_path / "a.bam")
    cram_path = str(tmp_path / "a.cram")

    bam_records = [
        bamtools.bam_record(
            slot, pos, mapq=mapq, flag=flag,
            next_refid=slot if pnext >= 0 else -1, next_pos=pnext,
        )
        for slot, pos, mapq, flag, pnext, _ in recs
    ]
    bamtools.write_bam(bam_path, REFS, bam_records)

    def cram_rec(slot, pos, mapq, flag, pnext, mate):
        r = {"flag": flag, "pos": pos, "mapq": mapq}
        if multiref:
            r["ref_id"] = slot
        if mate == "detached":
            r["pnext"] = pnext
        elif isinstance(mate, tuple):
            r["nf"] = mate[1]
        return r

    if multiref:
        slices = [{
            "ref_id": -2,
            "records": [cram_rec(*r) for r in recs],
        }]
    else:
        # one slice per contiguous same-ref run (records are ref-sorted)
        slices = []
        for slot, pos, mapq, flag, pnext, mate in recs:
            if not slices or slices[-1]["ref_id"] != slot:
                slices.append({"ref_id": slot, "records": []})
            slices[-1]["records"].append(
                cram_rec(slot, pos, mapq, flag, pnext, mate)
            )
    cramtools.write_cram(
        cram_path, REFS, slices, method=method, ap_delta=ap_delta,
        bf_huffman=bf_huffman, mq_beta=mq_beta,
    )
    return bam_path, cram_path


def _assert_equal_outputs(bam_path, cram_path):
    bins_b, qc_b = convert_reads(bam_path, BINSIZE)
    bins_c, qc_c = convert_reads(cram_path, BINSIZE)
    assert qc_b == qc_c
    for key in bins_b:
        if bins_b[key] is None:
            assert bins_c[key] is None, key
        else:
            np.testing.assert_array_equal(bins_b[key], bins_c[key], err_msg=key)
    # sanity: the fixture actually exercises the filters
    assert qc_b["filter_rmdup"] == 2
    assert qc_b["filter_mapq"] == 2
    assert qc_b["pair_fail"] == 1
    assert qc_b["unmapped"] == 1


@pytest.mark.parametrize(
    "method", ["raw", "gzip", "bzip2", "lzma", "rans0", "rans1"]
)
def test_cram_matches_bam_codecs(tmp_path, method):
    _assert_equal_outputs(*_write_pair(tmp_path, method=method))


@pytest.mark.parametrize("ap_delta", [True, False])
def test_cram_ap_delta(tmp_path, ap_delta):
    _assert_equal_outputs(*_write_pair(tmp_path, ap_delta=ap_delta))


def test_cram_core_encodings(tmp_path):
    """BF via canonical Huffman bits + MQ via BETA, both in the core
    block."""
    _assert_equal_outputs(
        *_write_pair(tmp_path, bf_huffman=True, mq_beta=True, method="gzip")
    )


def test_cram_multiref_slice(tmp_path):
    _assert_equal_outputs(*_write_pair(tmp_path, multiref=True))


def test_rans_roundtrip_direct():
    """The rANS encoder/decoder pair round-trips via an actual CRAM block
    (heavier-tailed data than the record streams)."""
    rng = np.random.default_rng(0)
    data = rng.choice(
        np.arange(256), p=np.random.default_rng(1).dirichlet(
            np.full(256, 0.05)
        ), size=100_000,
    ).astype(np.uint8).tobytes()
    for method in ("rans0", "rans1"):
        comp = cramtools.compress(data, method)
        assert len(comp) < len(data)  # actually compresses


def test_cram_rejects_bad_magic(tmp_path):
    p = tmp_path / "x.cram"
    p.write_bytes(b"NOPE" + b"\x00" * 40)
    with pytest.raises(Exception, match="not a CRAM|Failed to open"):
        convert_reads(str(p), BINSIZE)


# ------------------------------------------------- CRAM 3.1 / rANS Nx16

NX16_METHODS = [
    "rans0_16", "rans1_16", "rans0_16_x32", "rans1_16_x32",
    "rans_16_pack", "rans_16_rle", "rans_16_rle_zmeta",
    "rans_16_stripe", "rans_16_cat", "rans1_16_ztab",
]


@pytest.mark.parametrize("method", NX16_METHODS)
def test_cram31_matches_bam_nx16_codecs(tmp_path, method):
    """CRAM 3.1 files whose series blocks use every supported rANS-Nx16
    variant decode to counts identical to the equivalent BAM."""
    recs = _records()
    bam_path = str(tmp_path / "a.bam")
    cram_path = str(tmp_path / "a.cram")
    bamtools.write_bam(bam_path, REFS, [
        bamtools.bam_record(
            slot, pos, mapq=mapq, flag=flag,
            next_refid=slot if pnext >= 0 else -1, next_pos=pnext,
        )
        for slot, pos, mapq, flag, pnext, _ in recs
    ])
    slices = []
    for slot, pos, mapq, flag, pnext, mate in recs:
        if not slices or slices[-1]["ref_id"] != slot:
            slices.append({"ref_id": slot, "records": []})
        r = {"flag": flag, "pos": pos, "mapq": mapq}
        if mate == "detached":
            r["pnext"] = pnext
        elif isinstance(mate, tuple):
            r["nf"] = mate[1]
        slices[-1]["records"].append(r)
    cramtools.write_cram(
        cram_path, REFS, slices, method=method, version=(3, 1)
    )
    _assert_equal_outputs(bam_path, cram_path)


def _nx16_decode_native(stream: bytes, out_len: int) -> bytes:
    """Call the C++ decoder's test export directly."""
    import ctypes

    from wisecondorx_tpu.io.bam import _load_library

    lib = _load_library()
    lib.wcx_rans_nx16_test.restype = ctypes.c_int
    lib.wcx_rans_nx16_test.argtypes = [
        ctypes.c_char_p, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
    ]
    out = (ctypes.c_uint8 * max(out_len, 1))()
    rc = lib.wcx_rans_nx16_test(stream, len(stream), out, out_len)
    assert rc == 0, "native rANS-Nx16 decode failed"
    return bytes(out[:out_len])


def _torture_streams():
    """Byte streams hitting codec edges: empty, tiny, single-symbol,
    two-symbol, dense alphabets, runs, sizes straddling the N-way
    interleave boundaries."""
    rng = np.random.default_rng(42)
    streams = [
        b"",
        b"A",
        b"AB",
        b"A" * 1000,                      # single symbol
        bytes(rng.integers(0, 2, 997)),   # 2 symbols, odd length
        bytes(rng.integers(0, 2, 997)) * 3,
        bytes([0, 1] * 50),               # symbol 0 in alphabet
        bytes(rng.integers(0, 256, 4096)),  # full alphabet
        bytes(rng.integers(250, 256, 10_000)),  # top-of-range symbols
        bytes(np.repeat(rng.integers(0, 16, 200), rng.integers(1, 40, 200))
              .astype(np.uint8)),         # heavy runs, <=16 symbols
    ]
    for n in (31, 32, 33, 127, 128, 129):  # interleave boundary sizes
        streams.append(bytes(rng.integers(0, 7, n)))
    return streams


@pytest.mark.parametrize("kwargs", [
    dict(order=0),
    dict(order=1),
    dict(order=0, x32=True),
    dict(order=1, x32=True),
    dict(order=1, compress_table=True),
    dict(rle=True),
    dict(rle=True, rle_compress_meta=True),
    dict(rle=True, order=1),
    dict(stripe=4),
    dict(stripe=3, order=1),
    dict(cat=True),
])
def test_rans_nx16_cross_language_roundtrip(kwargs):
    """Every rANS-Nx16 variant round-trips through the independent
    Python encoder and the native C++ decoder for a battery of
    edge-shaped streams (the two implementations were written separately
    from the published CRAMcodecs spec; agreement is the cross-check the
    image's missing htslib would otherwise provide)."""
    for data in _torture_streams():
        stream = cramtools.rans_nx16_compress(data, **kwargs)
        got = _nx16_decode_native(stream, len(data))
        assert got == data, (kwargs, len(data))


def test_rans_nx16_pack_roundtrip():
    rng = np.random.default_rng(7)
    for nsym in (1, 2, 3, 4, 5, 16):
        data = bytes(rng.choice(
            np.arange(40, 40 + nsym), size=777).astype(np.uint8))
        stream = cramtools.rans_nx16_compress(data, pack=True)
        assert _nx16_decode_native(stream, len(data)) == data


def test_cram31_unsupported_codec_errors_precisely(tmp_path):
    """A needed series block using the (unimplemented) adaptive
    arithmetic codec fails with a codec-naming error, not a crash."""
    recs = _records()
    cram_path = str(tmp_path / "a.cram")
    slices = [{"ref_id": 0, "records": [
        {"flag": 0, "pos": 1000, "mapq": 60}]}]
    cramtools.write_cram(cram_path, REFS, slices, version=(3, 1))
    # Patch the first external block's method byte to 6 (arith).
    raw = bytearray(open(cram_path, "rb").read())
    # find a block header whose method byte is 0 (raw) and content type 4
    # (external) after the SAM header; method byte directly precedes the
    # content-type byte in our writer's block layout.
    idx = raw.find(bytes([0, 4]), 200)
    assert idx > 0
    raw[idx] = 6
    open(cram_path, "wb").write(raw)
    with pytest.raises(Exception, match="arithmetic"):
        convert_reads(cram_path, BINSIZE)


def test_rans_nx16_malformed_alphabet_rejected():
    """A crafted alphabet whose RLE run walks past symbol 255 must fail
    cleanly (order-0 and order-1 frequency builders previously wrote out
    of bounds on such input)."""
    import struct

    # flags=0 (order-0, 4-way), uint7 len=16, alphabet [254, 255(run)... ]
    # with run byte 100 -> symbols up to 355.
    stream = bytes([0x00, 16, 254, 255, 100, 0]) + bytes(64)
    out = bytearray(16)
    import ctypes

    from wisecondorx_tpu.io.bam import _load_library

    lib = _load_library()
    lib.wcx_rans_nx16_test.restype = ctypes.c_int
    rc = lib.wcx_rans_nx16_test(
        bytes(stream), len(stream),
        (ctypes.c_uint8 * 16).from_buffer(out), 16,
    )
    assert rc == -1  # clean error, no crash


@pytest.mark.parametrize(
    "method", ["gzip", "rans0", "rans1", "rans0_16", "rans1_16"]
)
def test_cram_reader_mutation_fuzz(tmp_path, method):
    """Seeded mutation fuzz: random byte flips/truncations of a valid
    CRAM must produce clean errors or valid counts — never a crash (a
    native segfault would kill the test process).  Parametrized over the
    block codecs so every decode path sees hostile bytes."""
    rng = np.random.default_rng(1234)
    recs = _records()
    cram_path = str(tmp_path / "f.cram")
    slices = []
    for slot, pos, mapq, flag, pnext, mate in recs:
        if not slices or slices[-1]["ref_id"] != slot:
            slices.append({"ref_id": slot, "records": []})
        r = {"flag": flag, "pos": pos, "mapq": mapq}
        if mate == "detached":
            r["pnext"] = pnext
        elif isinstance(mate, tuple):
            r["nf"] = mate[1]
        slices[-1]["records"].append(r)
    cramtools.write_cram(
        cram_path, REFS, slices, method=method, version=(3, 1)
    )
    good = open(cram_path, "rb").read()

    for trial in range(100):
        raw = bytearray(good)
        kind = trial % 3
        if kind == 0:  # flip 1-4 bytes anywhere
            for _ in range(int(rng.integers(1, 5))):
                raw[int(rng.integers(0, len(raw)))] ^= int(
                    rng.integers(1, 256)
                )
        elif kind == 1:  # truncate
            raw = raw[: int(rng.integers(1, len(raw)))]
        else:  # splice random garbage into the middle
            at = int(rng.integers(0, len(raw)))
            raw = (
                raw[:at]
                + bytes(rng.integers(0, 256, int(rng.integers(1, 64)))
                        .astype(np.uint8))
                + raw[at:]
            )
        p = str(tmp_path / "mut.cram")
        open(p, "wb").write(bytes(raw))
        try:
            convert_reads(p, BINSIZE)
        except Exception:
            pass  # clean Python-level error is the contract


def test_rans_nx16_decoder_mutation_fuzz():
    """Mutated rANS-Nx16 streams must decode or fail cleanly (rc -1),
    never read out of bounds (the decoder bounds every cursor access)."""
    import ctypes

    from wisecondorx_tpu.io.bam import _load_library

    lib = _load_library()
    lib.wcx_rans_nx16_test.restype = ctypes.c_int
    rng = np.random.default_rng(77)
    data = bytes(
        np.repeat(rng.integers(0, 9, 120), rng.integers(1, 9, 120))
        .astype(np.uint8)
    )
    for kwargs in (dict(order=0), dict(order=1), dict(rle=True),
                   dict(pack=True), dict(stripe=4)):
        stream = bytearray(cramtools.rans_nx16_compress(data, **kwargs))
        for _ in range(80):
            mut = bytearray(stream)
            for _ in range(int(rng.integers(1, 4))):
                mut[int(rng.integers(0, len(mut)))] ^= int(
                    rng.integers(1, 256)
                )
            out = (ctypes.c_uint8 * len(data))()
            rc = lib.wcx_rans_nx16_test(
                bytes(mut), len(mut), out, len(data)
            )
            assert rc in (0, -1)


def _nx16_decode_rc(stream: bytes, out_len: int) -> int:
    """rc of the native decoder on a possibly-hostile stream."""
    import ctypes

    from wisecondorx_tpu.io.bam import _load_library

    lib = _load_library()
    lib.wcx_rans_nx16_test.restype = ctypes.c_int
    out = (ctypes.c_uint8 * max(out_len, 1))()
    return lib.wcx_rans_nx16_test(bytes(stream), len(stream), out, out_len)


def test_rans_nx16_short_pack_rejected():
    """PACK whose stored pack_len is shorter than ceil(len/per) must be
    rejected: the unpack loop indexes data[i // per] for i in [0, len),
    so a short payload previously read past the heap allocation (advisor
    round-4 high finding).  Exact-length payloads still decode."""
    # flags = PACK|CAT, len = 16, alphabet {A, B} -> 1 bit/symbol,
    # 8 symbols/byte, so exactly 2 packed bytes are valid.
    head = bytes([0x80 | 0x20]) + cramtools.uint7(16) + bytes([2, 65, 66])
    bad = head + cramtools.uint7(1) + b"\xaa"          # one byte short
    assert _nx16_decode_rc(bad, 16) == -1
    # Over-long payloads are equally malformed.
    long = head + cramtools.uint7(3) + b"\xaa\xbb\xcc"
    assert _nx16_decode_rc(long, 16) == -1

    import ctypes

    from wisecondorx_tpu.io.bam import _load_library

    lib = _load_library()
    good = head + cramtools.uint7(2) + b"\xaa\xbb"
    out = (ctypes.c_uint8 * 16)()
    assert lib.wcx_rans_nx16_test(good, len(good), out, 16) == 0
    # 0xAA unpacks LSB-first to ABABABAB, 0xBB to BBABBBAB.
    assert bytes(out[:16]) == b"ABABABAB" + b"BBABBBAB"


def test_rans_nx16_shrunk_pack_len_fuzz():
    """Shrink the encoder's real pack_len field byte-exactly and assert a
    clean rejection for every shorter value (the advisor's prescribed
    fuzz case)."""
    rng = np.random.default_rng(11)
    data = bytes(rng.choice([3, 7, 9], size=333).astype(np.uint8))
    # Re-assemble the stream around a corrupted pack_len rather than
    # patching bytes: CAT keeps the payload literal so every field is
    # at a known offset.
    packed = bytearray()
    syms = sorted(set(data))
    lut = {s: i for i, s in enumerate(syms)}
    for i, b in enumerate(data):  # 2 bits/symbol, 4 per byte
        if i % 4 == 0:
            packed.append(0)
        packed[-1] |= lut[b] << ((i % 4) * 2)
    true_len = len(packed)
    assert true_len == (len(data) + 3) // 4
    for claimed in (0, 1, true_len - 1, true_len, true_len + 1):
        stream = (
            bytes([0x80 | 0x20]) + cramtools.uint7(len(data))
            + bytes([len(syms), *syms]) + cramtools.uint7(claimed)
            + bytes(packed[:claimed])
        )
        rc = _nx16_decode_rc(stream, len(data))
        assert rc == (0 if claimed == true_len else -1), claimed
        if claimed == true_len:
            import ctypes

            from wisecondorx_tpu.io.bam import _load_library

            lib = _load_library()
            out = (ctypes.c_uint8 * len(data))()
            lib.wcx_rans_nx16_test(stream, len(stream), out, len(data))
            assert bytes(out[:len(data)]) == data


def test_rans_nx16_nested_stripe_depth_capped():
    """STRIPE recurses into its sub-streams; a crafted STRIPE-in-STRIPE
    chain (~6 bytes per level) could previously drive recursion depth to
    ~n/6 and overflow the C++ stack.  Two stripe levels (one more than
    real emitters use) decode; three or more are rejected cleanly
    (advisor round-4 low finding)."""
    cat = bytes([0x20 | 0x10]) + b"WXYZ"  # NOSZ|CAT leaf, 4 bytes

    def wrap_nosz(payload: bytes) -> bytes:
        return (bytes([0x08 | 0x10, 1]) + cramtools.uint7(len(payload))
                + payload)

    def top(payload: bytes) -> bytes:
        return (bytes([0x08]) + cramtools.uint7(4) + bytes([1])
                + cramtools.uint7(len(payload)) + payload)

    import ctypes

    from wisecondorx_tpu.io.bam import _load_library

    lib = _load_library()
    two_levels = top(wrap_nosz(cat))
    out = (ctypes.c_uint8 * 4)()
    assert lib.wcx_rans_nx16_test(two_levels, len(two_levels), out, 4) == 0
    assert bytes(out[:4]) == b"WXYZ"

    three = top(wrap_nosz(wrap_nosz(cat)))
    assert _nx16_decode_rc(three, 4) == -1
    bomb = cat
    for _ in range(5000):  # would previously recurse 5000 frames deep
        bomb = wrap_nosz(bomb)
    assert _nx16_decode_rc(top(bomb), 4) == -1
