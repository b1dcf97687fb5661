"""Minimal BAM/BGZF writer for testing the native reader."""

import struct
import zlib


def bam_payload_header(refs, header_text: bytes = b"") -> bytes:
    """The raw (uncompressed) BAM header bytes: magic, SAM text, and the
    reference dictionary — the one layout shared by write_bam, the
    straddling/corruption tests, and bench.py's convert benchmark."""
    payload = b"BAM\1" + struct.pack("<i", len(header_text)) + header_text
    payload += struct.pack("<i", len(refs))
    for name, length in refs:
        nm = name.encode() + b"\0"
        payload += struct.pack("<i", len(nm)) + nm
        payload += struct.pack("<i", length)
    return payload


def bgzf_block(payload: bytes) -> bytes:
    co = zlib.compressobj(6, zlib.DEFLATED, -15)
    cdata = co.compress(payload) + co.flush()
    total = 12 + 6 + len(cdata) + 8
    header = struct.pack(
        "<BBBBIBBH BBH H",
        31, 139, 8, 4,  # gzip magic, deflate, FEXTRA
        0, 0, 255,  # mtime, xfl, os
        6,  # xlen
        66, 67, 2,  # BC subfield
        total - 1,  # BSIZE
    )
    return header + cdata + struct.pack(
        "<II", zlib.crc32(payload), len(payload) & 0xFFFFFFFF
    )


def bam_record(
    refid, pos, mapq=60, flag=0, next_refid=-1, next_pos=-1, name="r"
) -> bytes:
    rn = name.encode() + b"\0"
    body = struct.pack(
        "<iiBBHHHiiii",
        refid, pos,
        len(rn), mapq, 0,  # l_read_name, mapq, bin
        0, flag,  # n_cigar_op, flag
        0,  # l_seq
        next_refid, next_pos, 0,  # next_refID, next_pos, tlen
    ) + rn
    return struct.pack("<i", len(body)) + body


def write_bam(path, refs, records, records_per_block=3):
    """refs: list of (name, length); records: list of encoded records."""
    blocks = [bgzf_block(bam_payload_header(refs))]
    for i in range(0, len(records), records_per_block):
        blocks.append(
            bgzf_block(b"".join(records[i : i + records_per_block]))
        )
    blocks.append(bgzf_block(b""))  # BGZF EOF marker
    with open(path, "wb") as f:
        f.write(b"".join(blocks))
