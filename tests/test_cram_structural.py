"""Structure-aware CRAM tests (VERDICT r4 next-step #4).

Round 4's byte-mutation fuzz exercised hostile BYTES; these tests
exercise hostile (and merely unusual-but-legal) STRUCTURE: multi-slice
containers, embedded-reference block layouts, and surgical mutations at
container boundaries — layouts the repo's writers never emitted before
and real htslib emitters do.  Reference parity surface:
convert_tools.py:22-33 (pysam/htslib accepts all of these).
"""

import struct

import numpy as np
import pytest

import bamtools
import cramtools
from wisecondorx_tpu.io.bam import convert_reads

REFS = [("chr1", 2_000_000), ("chrX", 1_500_000), ("Y", 1_000_000)]
BINSIZE = 5000.0


def _records(n_slices=6, per_slice=40, seed=5):
    """Deterministic multi-slice record layout across all contigs,
    with proper pairs, dups, low-mapq and unpaired records mixed in."""
    rng = np.random.default_rng(seed)
    slices = []
    for s in range(n_slices):
        ref = s % len(REFS)
        recs = []
        pos = int(rng.integers(0, 1000))
        for i in range(per_slice):
            pos += int(rng.integers(0, 4000))
            kind = int(rng.integers(0, 4))
            if kind == 0:  # proper pair, detached mate
                recs.append({"flag": 0x3, "pos": pos,
                             "mapq": int(rng.integers(0, 61)),
                             "pnext": pos + 5000})
            elif kind == 1:  # unpaired
                recs.append({"flag": 0, "pos": pos,
                             "mapq": int(rng.integers(0, 61))})
            elif kind == 2:  # paired not proper
                recs.append({"flag": 0x1, "pos": pos, "mapq": 60,
                             "pnext": pos + 100})
            else:  # duplicate of the previous start
                recs.append({"flag": 0, "pos": pos, "mapq": 60})
                recs.append({"flag": 0, "pos": pos, "mapq": 60})
        slices.append({"ref_id": ref, "records": recs})
    return slices


def _equivalent_bam(tmp_path, slices):
    bam = str(tmp_path / "ref.bam")
    recs = []
    for sl in slices:
        for r in sl["records"]:
            slot = r["ref_id"] if sl["ref_id"] == -2 else sl["ref_id"]
            pnext = r.get("pnext", -1)
            recs.append(
                bamtools.bam_record(
                    slot, r["pos"], mapq=r.get("mapq", 0),
                    flag=r["flag"],
                    next_refid=slot if pnext >= 0 else -1,
                    next_pos=pnext,
                )
            )
    bamtools.write_bam(bam, REFS, recs)
    return bam


def _assert_same(bam, cram):
    want, wq = convert_reads(bam, BINSIZE)
    got, gq = convert_reads(cram, BINSIZE)
    assert set(want) == set(got)
    for k in want:
        np.testing.assert_array_equal(want[k], got[k], err_msg=k)
    assert wq == gq


@pytest.mark.parametrize("method", ["raw", "gzip", "rans1", "rans1_16"])
@pytest.mark.parametrize("per_container", [2, 3, 6])
def test_multi_slice_containers(tmp_path, method, per_container):
    """N slices under one container with a single shared compression
    header — the layout real emitters produce (htslib default packs
    multiple slices per container); the repo's writer previously only
    emitted one slice per container."""
    slices = _records()
    bam = _equivalent_bam(tmp_path, slices)
    cram = str(tmp_path / f"m{per_container}.cram")
    cramtools.write_cram(
        cram, REFS, slices, method=method,
        slices_per_container=per_container,
        version=(3, 1) if method.endswith("_16") else (3, 0),
    )
    _assert_same(bam, cram)


def test_multi_slice_with_multiref_member(tmp_path):
    """A container mixing a multi-ref slice (RI series) with single-ref
    slices under one shared compression header."""
    slices = _records(n_slices=4)
    mr = {"ref_id": -2, "records": []}
    pos = 100
    for i in range(12):
        pos += 900
        mr["records"].append(
            {"ref_id": i % len(REFS), "flag": 0, "pos": pos, "mapq": 60}
        )
    slices.insert(2, mr)
    bam = _equivalent_bam(tmp_path, slices)
    cram = str(tmp_path / "mixed.cram")
    cramtools.write_cram(cram, REFS, slices, method="gzip",
                         slices_per_container=3)
    _assert_same(bam, cram)


@pytest.mark.parametrize("per_container", [1, 3])
def test_embedded_reference_blocks_skipped(tmp_path, per_container):
    """A slice carrying an embedded-reference external block (referenced
    by the slice header's embedded-ref block id) must bin identically —
    the binner never needs sequence data."""
    slices = _records(n_slices=3)
    bam = _equivalent_bam(tmp_path, slices)
    cram = str(tmp_path / "embed.cram")
    cramtools.write_cram(
        cram, REFS, slices, method="rans0", embedded_ref=True,
        slices_per_container=per_container,
    )
    _assert_same(bam, cram)


# ---------------------------------------------------------------- surgery

def _read_itf8(buf, o):
    b0 = buf[o]
    n_extra = (0, 0, 0, 0, 0, 0, 0, 0, 1, 1, 1, 1, 2, 2, 3, 4)[b0 >> 4]
    o += 1 + n_extra
    return o


def _read_ltf8(buf, o):
    b0 = buf[o]
    extra = 0
    while extra < 8 and (b0 << extra) & 0x80:
        extra += 1
    return o + 1 + extra


def _container_spans(raw):
    """[(hdr_start, body_start, body_end)] for every container."""
    spans = []
    o = 26  # magic + version + file id
    while o < len(raw):
        hdr = o
        length = struct.unpack_from("<i", raw, o)[0]
        o += 4
        for _ in range(4):  # ref, start, span, n_records
            o = _read_itf8(raw, o)
        o = _read_ltf8(raw, o)  # counter
        o = _read_ltf8(raw, o)  # bases
        o = _read_itf8(raw, o)  # n_blocks
        nl0 = o
        o = _read_itf8(raw, o)  # n_landmarks
        n_land = raw[nl0]  # writer emits small counts (single byte)
        for _ in range(n_land):
            o = _read_itf8(raw, o)
        o += 4  # crc
        spans.append((hdr, o, o + length))
        o += length
    return spans


def _counts_or_error(path):
    try:
        counts, qc = convert_reads(path, BINSIZE)
        return counts, qc
    except Exception:
        return None, None  # clean Python-level error is the contract


def _structural_cases(raw):
    spans = _container_spans(raw)
    assert len(spans) >= 4  # header + >=2 data + EOF
    header = raw[: spans[1][0]]
    data = [raw[a:c] for a, _, c in spans[1:-1]]
    eof = raw[spans[-1][0]:]

    yield "truncate-at-boundary", header + b"".join(data[:1])
    yield "drop-eof", header + b"".join(data)
    yield "duplicate-container", header + data[0] + data[0] + b"".join(
        data[1:]
    ) + eof
    yield "swap-containers", header + b"".join(
        [data[1], data[0]] + data[2:]
    ) + eof
    yield "truncate-mid-container", raw[: (spans[2][1] + spans[2][2]) // 2]

    # Negative container length: previously walked container_end
    # BEFORE the current offset and re-parsed the same bytes forever.
    neg = bytearray(header + b"".join(data) + eof)
    a = spans[1][0]
    struct.pack_into("<i", neg, a, -12345)
    yield "negative-length", bytes(neg)

    # Zero-length body with untouched blocks following.
    zero = bytearray(header + b"".join(data) + eof)
    struct.pack_into("<i", zero, a, 0)
    yield "zero-length", bytes(zero)

    # Implausible landmark count (would drive a multi-GB allocation
    # without the bounded-header guard).
    big = bytearray(header + b"".join(data) + eof)
    o = a + 4
    for _ in range(4):
        o = _read_itf8(big, o)
    o = _read_ltf8(big, o)
    o = _read_ltf8(big, o)
    o = _read_itf8(big, o)  # n_blocks
    big[o] = 0xEF  # itf8 prefix: 3 extra bytes follow
    big[o + 1:o + 1] = b"\xff\xff\xff"  # n_land ~= 2^28
    yield "huge-landmarks", bytes(big)


@pytest.mark.parametrize("method", ["raw", "gzip", "rans1", "rans0_16"])
def test_container_boundary_surgery(tmp_path, method):
    """Surgical structure mutations must produce clean errors or valid
    counts — never a crash, hang, or giant allocation."""
    slices = _records(n_slices=4, per_slice=25)
    cram = str(tmp_path / "base.cram")
    cramtools.write_cram(
        cram, REFS, slices, method=method, slices_per_container=2,
        version=(3, 1) if method.endswith("_16") else (3, 0),
    )
    raw = open(cram, "rb").read()

    base_counts, base_qc = convert_reads(cram, BINSIZE)
    for name, mutated in _structural_cases(raw):
        p = str(tmp_path / "mut.cram")
        open(p, "wb").write(mutated)
        counts, qc = _counts_or_error(p)
        if name == "drop-eof":
            # Complete containers, all records present: bit-identical.
            assert counts is not None, name
            for k in base_counts:
                if base_counts[k] is None:
                    assert counts[k] is None, (name, k)
                    continue
                np.testing.assert_array_equal(
                    base_counts[k], counts[k], err_msg=name
                )
        elif name == "swap-containers":
            # All records still decode; only the consecutive-start
            # dup-filter state crossing the swapped boundary may differ,
            # so demand identical record totals and binned sums within
            # that boundary-effect budget (at most a few reads).
            assert counts is not None, name
            n_rec = qc["mapped"] + qc["unmapped"]
            base_rec = base_qc["mapped"] + base_qc["unmapped"]
            assert n_rec == base_rec, name
            total = sum(
                int(v.sum()) for v in counts.values() if v is not None
            )
            base_total = sum(
                int(v.sum()) for v in base_counts.values() if v is not None
            )
            assert abs(total - base_total) <= 4, (name, total, base_total)
        elif name == "truncate-at-boundary":
            # A clean prefix decodes the contained slices only.
            assert counts is not None, name
            total = sum(
                int(v.sum()) for v in counts.values() if v is not None
            )
            base_total = sum(
                int(v.sum()) for v in base_counts.values() if v is not None
            )
            assert 0 < total < base_total, name
        else:
            # Hostile structure: clean error, or (duplicate) valid
            # counts; hangs/crashes would fail the run itself.
            assert counts is None or isinstance(counts, dict), name


def test_cli_convert_cram(tmp_path):
    """The convert CLI end-to-end on a CRAM input: npz output equals the
    equivalent BAM's npz byte-for-byte in content (reference main.py:29-37
    accepts .cram through the same command)."""
    from wisecondorx_tpu.cli import main as cli_main

    slices = _records(n_slices=3, per_slice=20)
    bam = _equivalent_bam(tmp_path, slices)
    cram = str(tmp_path / "in.cram")
    cramtools.write_cram(cram, REFS, slices, method="gzip",
                         slices_per_container=2)

    out_bam = str(tmp_path / "from_bam.npz")
    out_cram = str(tmp_path / "from_cram.npz")
    cli_main(["convert", bam, out_bam, "--binsize", "5000"])
    cli_main(["convert", cram, out_cram, "--binsize", "5000"])

    a = np.load(out_bam, allow_pickle=True, encoding="latin1")
    b = np.load(out_cram, allow_pickle=True, encoding="latin1")
    assert set(a.keys()) == set(b.keys())
    sa, sb = a["sample"].item(), b["sample"].item()
    assert set(sa) == set(sb)
    for kk in sa:
        if sa[kk] is None:
            assert sb[kk] is None, kk
        else:
            np.testing.assert_array_equal(sa[kk], sb[kk], err_msg=kk)
    assert a["quality"].item() == b["quality"].item()
    assert int(a["binsize"]) == int(b["binsize"]) == 5000
