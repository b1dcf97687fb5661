"""Minimal CRAM 3.0 writer for testing the native reader.

Emits structurally valid CRAM 3.0: file definition, SAM-header container,
data containers with compression header + slices, and an EOF container.
Data series use EXTERNAL/HUFFMAN/BETA encodings; blocks can be stored raw,
gzip, or rANS-4x8 (order 0/1 — encoder implemented here, mirroring the
spec/htslib byte format that native/cramreader.cpp decodes).
"""

import struct
import zlib


# ---------------------------------------------------------------- varints

def itf8(v: int) -> bytes:
    v &= 0xFFFFFFFF
    if v < 0x80:
        return bytes([v])
    if v < 0x4000:
        return bytes([0x80 | (v >> 8), v & 0xFF])
    if v < 0x200000:
        return bytes([0xC0 | (v >> 16), (v >> 8) & 0xFF, v & 0xFF])
    if v < 0x10000000:
        return bytes(
            [0xE0 | (v >> 24), (v >> 16) & 0xFF, (v >> 8) & 0xFF, v & 0xFF]
        )
    return bytes(
        [
            0xF0 | (v >> 28),
            (v >> 20) & 0xFF,
            (v >> 12) & 0xFF,
            (v >> 4) & 0xFF,
            v & 0x0F,
        ]
    )


def ltf8(v: int) -> bytes:
    v &= (1 << 64) - 1
    if v < 0x80:
        return bytes([v])
    if v < 0x4000:
        return bytes([0x80 | (v >> 8), v & 0xFF])
    if v < 0x200000:
        return bytes([0xC0 | (v >> 16), (v >> 8) & 0xFF, v & 0xFF])
    # larger values unused by the fixtures
    out = bytes([0xFF]) + v.to_bytes(8, "big")
    return out


# ---------------------------------------------------------------- rANS 4x8

RANS_LOW = 1 << 23
TOT = 1 << 12


def _norm_freqs(counts):
    total = sum(counts.values())
    items = sorted(counts.items())
    freqs = {s: max(1, round(c * TOT / total)) for s, c in items}
    acc = sum(freqs.values())
    # Fix the sum to exactly TOT, spreading over the largest frequencies
    # and never driving any below 1 (a single-symbol correction can go
    # negative for dense alphabets of near-uniform tiny counts).
    for s in sorted(freqs, key=lambda s: -freqs[s]):
        if acc == TOT:
            break
        if acc < TOT:
            freqs[s] += TOT - acc
            acc = TOT
        else:
            take = min(freqs[s] - 1, acc - TOT)
            freqs[s] -= take
            acc -= take
    assert acc == TOT, "cannot normalize: alphabet larger than TOT"
    return freqs


def _freq_bytes(f: int) -> bytes:
    if f < 0x80:
        return bytes([f])
    return bytes([0x80 | (f >> 8), f & 0xFF])


def _write_freq_table(freqs) -> bytes:
    """RLE symbol table (ascending symbols; run-of-consecutive shortcut)."""
    syms = sorted(freqs)
    out = bytearray()
    i = 0
    while i < len(syms):
        s = syms[i]
        run = 0
        while i + 1 + run < len(syms) and syms[i + 1 + run] == s + 1 + run:
            run += 1
        out.append(s)
        out += _freq_bytes(freqs[s])
        if run > 0:
            out.append(s + 1)
            out.append(run - 1)
            for k in range(run):
                out += _freq_bytes(freqs[syms[i + 1 + k]])
        i += 1 + run
    out.append(0)
    return bytes(out)


def _cum(freqs):
    c = {}
    acc = 0
    for s in sorted(freqs):
        c[s] = acc
        acc += freqs[s]
    return c


def rans0_compress(data: bytes) -> bytes:
    if len(data) == 0:
        body = _write_freq_table({0: TOT}) + b"".join(
            struct.pack("<I", RANS_LOW) for _ in range(4)
        )
        return bytes([0]) + struct.pack("<II", len(body), 0) + body
    counts = {}
    for b in data:
        counts[b] = counts.get(b, 0) + 1
    F = _norm_freqs(counts)
    C = _cum(F)
    states = [RANS_LOW] * 4
    emitted = bytearray()
    for i in reversed(range(len(data))):
        s = data[i]
        j = i & 3
        x = states[j]
        x_max = (1 << 19) * F[s]
        while x >= x_max:
            emitted.append(x & 0xFF)
            x >>= 8
        states[j] = ((x // F[s]) << 12) + (x % F[s]) + C[s]
    body = (
        _write_freq_table(F)
        + b"".join(struct.pack("<I", states[j]) for j in range(4))
        + bytes(reversed(emitted))
    )
    return bytes([0]) + struct.pack("<II", len(body), len(data)) + body


def rans1_compress(data: bytes) -> bytes:
    n = len(data)
    if n < 8:
        return rans0_compress(data)  # order-1 quarters need data
    q = n >> 2
    # Transition counts; each quarter starts from context 0, the tail is
    # contiguous with quarter 3.
    counts = {}

    def bump(ctx, sym):
        counts.setdefault(ctx, {})
        counts[ctx][sym] = counts[ctx].get(sym, 0) + 1

    segs = [
        (0, q),
        (q, 2 * q),
        (2 * q, 3 * q),
        (3 * q, n),  # includes the tail
    ]
    for a, b in segs:
        bump(0, data[a])
        for p in range(a + 1, b):
            bump(data[p - 1], data[p])
    F = {ctx: _norm_freqs(c) for ctx, c in counts.items()}
    C = {ctx: _cum(f) for ctx, f in F.items()}

    states = [RANS_LOW] * 4
    emitted = bytearray()

    def enc(j, ctx, sym):
        x = states[j]
        f = F[ctx][sym]
        x_max = (1 << 19) * f
        while x >= x_max:
            emitted.append(x & 0xFF)
            x >>= 8
        states[j] = ((x // f) << 12) + (x % f) + C[ctx][sym]

    # Reverse of the decoder: tail (state 3) first, then the main loop
    # from the last row up, states 3..0 within a row.
    for p in reversed(range(4 * q, n)):
        enc(3, data[p - 1], data[p])
    for i in reversed(range(q)):
        for j in (3, 2, 1, 0):
            p = j * q + i
            ctx = 0 if i == 0 else data[p - 1]
            enc(j, ctx, data[p])

    table = bytearray()
    ctxs = sorted(F)
    i = 0
    while i < len(ctxs):
        s = ctxs[i]
        run = 0
        while i + 1 + run < len(ctxs) and ctxs[i + 1 + run] == s + 1 + run:
            run += 1
        table.append(s)
        table += _write_freq_table(F[s])
        if run > 0:
            table.append(s + 1)
            table.append(run - 1)
            for k in range(run):
                table += _write_freq_table(F[ctxs[i + 1 + k]])
        i += 1 + run
    table.append(0)

    body = (
        bytes(table)
        + b"".join(struct.pack("<I", states[j]) for j in range(4))
        + bytes(reversed(emitted))
    )
    return bytes([1]) + struct.pack("<II", len(body), n) + body




# ------------------------------------------------- rANS Nx16 (CRAM 3.1)
#
# Independent encoder for the CRAM 3.1 "rANS Nx16" codec (CRAMcodecs
# section 3): 16-bit-renormalizing rANS with 4 or 32 interleaved states,
# order-0/1, and the PACK / RLE / STRIPE / CAT transforms.  Written from
# the published specification separately from the C++ decoder
# (native/cramreader.cpp) so the two implementations cross-check each
# other -- the image has no htslib to emit golden bytes.

NX_LOW = 1 << 15
NX_TOT = 1 << 12  # order-0 normalization (shift 12)


def uint7(v: int) -> bytes:
    """Big-endian 7-bit-group varint (continuation in the top bit)."""
    out = [v & 0x7F]
    v >>= 7
    while v:
        out.append(0x80 | (v & 0x7F))
        v >>= 7
    return bytes(reversed(out))


def _nx_alphabet(syms) -> bytes:
    """Used-symbol list: ascending, 0-terminated; x followed by x+1
    starts a run whose length byte counts further implicit symbols."""
    syms = sorted(syms)
    out = bytearray()
    i = 0
    while i < len(syms):
        s = syms[i]
        run = 0
        while i + 1 + run < len(syms) and syms[i + 1 + run] == s + 1 + run:
            run += 1
        out.append(s)
        if run > 0:
            out.append(s + 1)
            out.append(run - 1)
        i += 1 + run
    out.append(0)
    return bytes(out)


def _nx_entropy0(data: bytes, N: int) -> bytes:
    """Raw order-0 Nx16 entropy payload: freq table + N states + words."""
    if len(data) == 0:
        return b""  # the decoder reads nothing for an empty stream
    counts = {}
    for b in data:
        counts[b] = counts.get(b, 0) + 1
    F = _norm_freqs(counts)
    C = _cum(F)
    states = [NX_LOW] * N
    words = []
    for i in reversed(range(len(data))):
        s = data[i]
        j = i % N
        x = states[j]
        f = F[s]
        x_max = ((NX_LOW >> 12) << 16) * f
        while x >= x_max:
            words.append(struct.pack("<H", x & 0xFFFF))
            x >>= 16
        states[j] = ((x // f) << 12) + (x % f) + C[s]
    table = _nx_alphabet(F) + b"".join(uint7(F[s]) for s in sorted(F))
    return (
        table
        + b"".join(struct.pack("<I", states[j]) for j in range(N))
        + b"".join(reversed(words))
    )


def _nx_entropy1(data: bytes, N: int, compress_table=False) -> bytes:
    """Raw order-1 Nx16 payload: table flags + freq table + states + words.

    Streams: state j decodes the contiguous fragment [j*q, (j+1)*q)
    (q = len // N) with state N-1 continuing through the tail; each
    fragment starts from context 0.
    """
    n = len(data)
    if n == 0:
        return b""
    shift = 12
    q = n // N

    counts = {}

    def bump(ctx, sym):
        counts.setdefault(ctx, {})
        counts[ctx][sym] = counts[ctx].get(sym, 0) + 1

    for j in range(N):
        a = j * q
        b = (j + 1) * q if j < N - 1 else n
        if a < b:
            bump(0, data[a])
            for p in range(a + 1, b):
                bump(data[p - 1], data[p])

    F = {ctx: _norm_freqs(c) for ctx, c in counts.items()}
    C = {ctx: _cum(f) for ctx, f in F.items()}

    states = [NX_LOW] * N
    words = []

    def enc(j, ctx, sym):
        x = states[j]
        f = F[ctx][sym]
        x_max = ((NX_LOW >> shift) << 16) * f
        while x >= x_max:
            words.append(struct.pack("<H", x & 0xFFFF))
            x >>= 16
        states[j] = ((x // f) << shift) + (x % f) + C[ctx][sym]

    # Reverse of the decoder: tail (state N-1) first, then the main loop
    # from the last row up, states N-1..0 within a row.
    for p in reversed(range(N * q, n)):
        ctx = 0 if p == (N - 1) * q else data[p - 1]
        enc(N - 1, ctx, data[p])
    for i in reversed(range(q)):
        for j in reversed(range(N)):
            p = j * q + i
            ctx = 0 if i == 0 else data[p - 1]
            enc(j, ctx, data[p])

    # Frequency table: one shared alphabet (symbols + used contexts),
    # then per-context rows over the alphabet with zero-run shortening.
    A = sorted(set(data) | set(F))
    rows = bytearray()
    rows += _nx_alphabet(A)
    for i in A:
        row = [F.get(i, {}).get(j, 0) for j in A]
        k = 0
        while k < len(row):
            rows += uint7(row[k])
            if row[k] == 0:
                z = 0
                while k + 1 + z < len(row) and row[k + 1 + z] == 0 and z < 255:
                    z += 1
                rows.append(z)
                k += z
            k += 1

    if compress_table:
        comp = _nx_entropy0(bytes(rows), 4)
        table = (
            bytes([(shift << 4) | 1])
            + uint7(len(rows))
            + uint7(len(comp))
            + comp
        )
    else:
        table = bytes([shift << 4]) + bytes(rows)

    return (
        table
        + b"".join(struct.pack("<I", states[j]) for j in range(N))
        + b"".join(reversed(words))
    )


def rans_nx16_compress(
    data: bytes,
    *,
    order: int = 0,
    x32: bool = False,
    pack: bool = False,
    rle: bool = False,
    stripe: int = 0,
    cat: bool = False,
    nosz: bool = False,
    compress_table: bool = False,
    rle_compress_meta: bool = False,
) -> bytes:
    """Full rANS-Nx16 stream (flag byte + transforms + entropy payload)."""
    flags = (
        (0x01 if order else 0)
        | (0x04 if x32 else 0)
        | (0x08 if stripe else 0)
        | (0x10 if nosz else 0)
        | (0x20 if cat else 0)
        | (0x40 if rle else 0)
        | (0x80 if pack else 0)
    )
    out = bytearray([flags])
    if not nosz:
        out += uint7(len(data))

    if stripe:
        N = stripe
        subs = [
            rans_nx16_compress(
                data[j::N], order=order, x32=x32, nosz=True
            )
            for j in range(N)
        ]
        out.append(N)
        for s in subs:
            out += uint7(len(s))
        for s in subs:
            out += s
        return bytes(out)

    d = data
    if pack and len(set(d)) > 16:
        # htslib's encoder is adaptive too: PACK only applies to
        # small-alphabet streams.
        return rans_nx16_compress(
            data, order=order, x32=x32, rle=rle, cat=cat, nosz=nosz,
            compress_table=compress_table,
            rle_compress_meta=rle_compress_meta,
        )
    if pack:
        syms = sorted(set(d)) or [0]
        out.append(len(syms))
        out += bytes(syms)
        if len(syms) <= 1:
            packed = b""
        else:
            bits = 1 if len(syms) <= 2 else 2 if len(syms) <= 4 else 4
            per = 8 // bits
            idx = {s: i for i, s in enumerate(syms)}
            packed = bytearray((len(d) + per - 1) // per)
            for i, b in enumerate(d):
                packed[i // per] |= idx[b] << ((i % per) * bits)
            packed = bytes(packed)
        out += uint7(len(packed))
        d = packed

    if rle:
        # All 256 symbols are run symbols (nrun byte 0 => 256).
        lits = bytearray()
        runs = bytearray()
        i = 0
        while i < len(d):
            j = i
            while j < len(d) and d[j] == d[i]:
                j += 1
            lits.append(d[i])
            runs += uint7(j - i - 1)
            i = j
        meta = bytes([0]) + bytes(range(256)) + bytes(runs)
        if rle_compress_meta:
            comp = _nx_entropy0(meta, 4)
            out += uint7(len(comp) << 1)  # bit 0 clear: compressed
            out += uint7(len(lits))
            out += uint7(len(meta))
            out += comp
        else:
            out += uint7((len(meta) << 1) | 1)  # bit 0 set: raw meta
            out += uint7(len(lits))
            out += meta
        d = bytes(lits)

    if cat:
        out += d
    elif order:
        out += _nx_entropy1(d, 32 if x32 else 4,
                            compress_table=compress_table)
    else:
        out += _nx_entropy0(d, 32 if x32 else 4)
    return bytes(out)


# ---------------------------------------------------------------- blocks

METHOD = {"raw": 0, "gzip": 1, "bzip2": 2, "lzma": 3, "rans0": 4,
          "rans1": 4, "rans0_16": 5, "rans1_16": 5, "rans0_16_x32": 5,
          "rans1_16_x32": 5, "rans_16_pack": 5, "rans_16_rle": 5,
          "rans_16_rle_zmeta": 5, "rans_16_stripe": 5, "rans_16_cat": 5,
          "rans1_16_ztab": 5}


def compress(data: bytes, method: str) -> bytes:
    if method == "raw":
        return data
    if method == "gzip":
        return zlib.compress(data, 6, wbits=31)
    if method == "bzip2":
        import bz2

        return bz2.compress(data)
    if method == "lzma":
        import lzma

        # .xz container (liblzma stream format, what htslib writes)
        return lzma.compress(data, format=lzma.FORMAT_XZ)
    if method == "rans0":
        return rans0_compress(data)
    if method == "rans1":
        return rans1_compress(data)
    if method == "rans0_16":
        return rans_nx16_compress(data)
    if method == "rans1_16":
        return rans_nx16_compress(data, order=1)
    if method == "rans0_16_x32":
        return rans_nx16_compress(data, x32=True)
    if method == "rans1_16_x32":
        return rans_nx16_compress(data, order=1, x32=True)
    if method == "rans_16_pack":
        return rans_nx16_compress(data, pack=True)
    if method == "rans_16_rle":
        return rans_nx16_compress(data, rle=True)
    if method == "rans_16_rle_zmeta":
        return rans_nx16_compress(data, rle=True, rle_compress_meta=True)
    if method == "rans_16_stripe":
        return rans_nx16_compress(data, stripe=4)
    if method == "rans_16_cat":
        return rans_nx16_compress(data, cat=True)
    if method == "rans1_16_ztab":
        return rans_nx16_compress(data, order=1, compress_table=True)
    raise ValueError(method)


def block(content_type: int, content_id: int, data: bytes,
          method: str = "raw") -> bytes:
    payload = compress(data, method)
    out = bytes([METHOD[method], content_type])
    out += itf8(content_id) + itf8(len(payload)) + itf8(len(data))
    out += payload
    out += struct.pack("<I", zlib.crc32(payload))
    return out


def container(blocks: list, ref_seq_id=0, start=0, span=0, n_records=0,
              record_counter=0, bases=0) -> bytes:
    body = b"".join(blocks)
    hdr = struct.pack("<i", len(body))
    hdr += itf8(ref_seq_id) + itf8(start) + itf8(span) + itf8(n_records)
    hdr += ltf8(record_counter) + ltf8(bases)
    hdr += itf8(len(blocks))
    hdr += itf8(len(blocks))  # landmark count
    for _ in blocks:
        hdr += itf8(0)  # landmark offsets (unused by the reader)
    hdr += struct.pack("<I", 0)  # header crc (unchecked)
    return hdr + body


# ---------------------------------------------------------------- encodings

def enc_external(content_id: int) -> bytes:
    params = itf8(content_id)
    return itf8(1) + itf8(len(params)) + params


def enc_huffman(alphabet, lengths) -> bytes:
    params = itf8(len(alphabet))
    for a in alphabet:
        params += itf8(a)
    params += itf8(len(lengths))
    for l in lengths:  # noqa: E741
        params += itf8(l)
    return itf8(3) + itf8(len(params)) + params


def enc_beta(offset, nbits) -> bytes:
    params = itf8(offset) + itf8(nbits)
    return itf8(6) + itf8(len(params)) + params


def compression_header(series: dict, ap_delta: bool) -> bytes:
    """series: {'BF': encoding bytes, ...}

    Layout per spec: each of the three maps is (byte size, entry count,
    entries...)."""
    pres_entries = b"RN" + bytes([1]) + b"AP" + bytes(
        [1 if ap_delta else 0]
    ) + b"TD" + itf8(1) + b"\x00"
    pres_map = itf8(len(pres_entries) + len(itf8(3))) + itf8(3) + pres_entries

    ds_entries = b""
    for key, enc in series.items():
        ds_entries += key.encode() + enc
    ds_map = (
        itf8(len(ds_entries) + len(itf8(len(series))))
        + itf8(len(series))
        + ds_entries
    )

    tag_map = itf8(len(itf8(0))) + itf8(0)
    return pres_map + ds_map + tag_map


# ---------------------------------------------------------------- huffman

def canonical_codes(alphabet, lengths):
    order = sorted(range(len(alphabet)), key=lambda i: lengths[i])
    codes = [0] * len(alphabet)
    code = 0
    prev = lengths[order[0]]
    for k, i in enumerate(order):
        code <<= lengths[i] - prev
        codes[i] = code
        prev = lengths[i]
        code += 1
    return codes


class BitWriter:
    def __init__(self):
        self.bits = []

    def write(self, value, nbits):
        for b in range(nbits - 1, -1, -1):
            self.bits.append((value >> b) & 1)

    def bytes(self):
        out = bytearray()
        for i in range(0, len(self.bits), 8):
            byte = 0
            chunk = self.bits[i : i + 8]
            for b in chunk:
                byte = (byte << 1) | b
            byte <<= 8 - len(chunk)
            out.append(byte)
        return bytes(out)


# ---------------------------------------------------------------- writer

def write_cram(
    path,
    refs,
    slices,
    *,
    method="raw",
    ap_delta=True,
    bf_huffman=False,
    mq_beta=False,
    version=(3, 0),
    slices_per_container=1,
    embedded_ref=False,
):
    """Write a CRAM 3.x file.

    refs: list of (name, length).
    slices: list of slices; each slice is a dict with
        'ref_id': int (-2 for multi-ref),
        'records': list of dicts with keys flag, pos (0-based), mapq,
            and one of: {} (no mate), {'pnext': int} (detached mate),
            {'nf': int} (mate nf records downstream).

    ``slices_per_container`` groups that many slices under ONE container
    with a single shared compression header (the spec's normal layout for
    real emitters; requires ``bf_huffman=False`` since a shared header
    cannot carry per-slice alphabets).  ``embedded_ref`` attaches an
    extra external block per slice, referenced as the slice header's
    embedded-reference block id — binning must skip it.
    """
    if slices_per_container > 1 and bf_huffman:
        raise ValueError("multi-slice containers need slice-independent "
                         "series encodings (bf_huffman=False)")
    out = bytearray()
    out += b"CRAM" + bytes(version) + b"\x00" * 20

    sam = "@HD\tVN:1.6\n"
    for name, length in refs:
        sam += f"@SQ\tSN:{name}\tLN:{length}\n"
    sam_b = sam.encode()
    hdr_payload = struct.pack("<i", len(sam_b)) + sam_b
    out += container([block(0, 0, hdr_payload, "raw")])

    EMBED_ID = 99  # content id for the embedded-reference decoy block

    def build_slice(sl, series_multiref):
        """One slice's (slice-header block, data blocks, start_pos).

        ``series_multiref``: the container's shared compression header
        carries an RI encoding (a non-multiref slice then simply never
        consumes it)."""
        recs = sl["records"]
        multiref = sl["ref_id"] == -2
        streams = {k: bytearray() for k in
                   ("BF", "CF", "AP", "MQ", "NF", "NP", "RI", "RL")}
        core = BitWriter()

        bf_alpha = sorted({r["flag"] for r in recs}) or [0]
        if bf_huffman:
            if len(bf_alpha) == 1:
                bf_lengths = [0]
            else:
                # flat code lengths (ceil log2 n, adjusted to be a valid
                # canonical set)
                import math

                n = len(bf_alpha)
                L = math.ceil(math.log2(n))
                # use lengths L except give the first 2^L - n symbols L-1
                short = (1 << L) - n
                bf_lengths = [L - 1] * short + [L] * (n - short)
            bf_codes = canonical_codes(bf_alpha, bf_lengths)

        start_pos = min((r["pos"] for r in recs), default=0) + 1
        last_ap = start_pos
        for r in recs:
            flag, pos1 = r["flag"], r["pos"] + 1
            if bf_huffman:
                i = bf_alpha.index(flag)
                if bf_lengths[i]:
                    core.write(bf_codes[i], bf_lengths[i])
            else:
                streams["BF"] += itf8(flag)
            cf = 0
            if "pnext" in r:
                cf |= 0x2
            elif "nf" in r:
                cf |= 0x4
            streams["CF"] += itf8(cf)
            if multiref:
                streams["RI"] += itf8(r["ref_id"])
            if ap_delta:
                streams["AP"] += itf8(pos1 - last_ap)
                last_ap = pos1
            else:
                streams["AP"] += itf8(pos1)
            streams["RL"] += itf8(36)  # decoy series the reader must skip
            if "pnext" in r:
                streams["NP"] += itf8(r["pnext"] + 1)
            if "nf" in r:
                streams["NF"] += itf8(r["nf"])
            if not (flag & 0x4):
                if mq_beta:
                    core.write(r.get("mapq", 0), 8)
                else:
                    streams["MQ"] += itf8(r.get("mapq", 0))

        ids = {"BF": 1, "CF": 2, "AP": 3, "MQ": 4, "NF": 5, "NP": 6,
               "RI": 7, "RL": 8}
        series = {}
        if bf_huffman:
            series["BF"] = enc_huffman(bf_alpha, bf_lengths)
        else:
            series["BF"] = enc_external(ids["BF"])
        series["CF"] = enc_external(ids["CF"])
        series["AP"] = enc_external(ids["AP"])
        series["MQ"] = (
            enc_beta(0, 8) if mq_beta else enc_external(ids["MQ"])
        )
        series["NF"] = enc_external(ids["NF"])
        series["NP"] = enc_external(ids["NP"])
        series["RL"] = enc_external(ids["RL"])
        if series_multiref:
            series["RI"] = enc_external(ids["RI"])

        slice_hdr = itf8(sl["ref_id"] & 0xFFFFFFFF)
        slice_hdr += itf8(start_pos) + itf8(10**6) + itf8(len(recs))
        slice_hdr += ltf8(0)
        data_blocks = [block(5, 0, core.bytes(), method)]  # core first
        block_ids = []
        for key, cid in ids.items():
            if key == "RI" and not multiref:
                continue
            data_blocks.append(block(4, cid, bytes(streams[key]), method))
            block_ids.append(cid)
        if embedded_ref:
            data_blocks.append(
                block(4, EMBED_ID, b"ACGT" * 64, method)
            )
            block_ids.append(EMBED_ID)
        slice_hdr += itf8(len(data_blocks))
        slice_hdr += itf8(len(data_blocks))  # content-id array length
        for cid in block_ids:
            slice_hdr += itf8(cid)
        slice_hdr += itf8(0)  # pad the id array entry for the core block
        slice_hdr += itf8(
            EMBED_ID if embedded_ref else 0xFFFFFFFF & -1
        )  # embedded ref block id
        slice_hdr += b"\x00" * 16  # md5

        sh_block = block(2, 0, bytes(slice_hdr), method)
        return sh_block, data_blocks, series, start_pos

    for g0 in range(0, len(slices), slices_per_container):
        group_slices = slices[g0 : g0 + slices_per_container]
        group_multiref = any(s["ref_id"] == -2 for s in group_slices)
        built = [build_slice(sl, group_multiref) for sl in group_slices]
        # One compression header for the whole container.  All slices
        # share the same series schema by construction (only bf_huffman
        # per-slice alphabets would differ, rejected above); RI is
        # present iff any slice in the group is multi-ref.
        ch_block = block(
            1, 0, compression_header(built[0][2], ap_delta), method
        )
        body = [ch_block]
        for sh_block, data_blocks, _, _ in built:
            body.append(sh_block)
            body.extend(data_blocks)
        first = group_slices[0]
        rid = first["ref_id"] if len(group_slices) == 1 else -2
        out += container(
            body,
            ref_seq_id=rid & 0xFFFFFFFF if rid < 0 else rid,
            start=built[0][3],
            n_records=sum(len(s["records"]) for s in group_slices),
        )

    # EOF container (ref -1, no records, one empty block)
    out += container(
        [block(1, 0, b"", "raw")],
        ref_seq_id=0xFFFFFFFF,
        n_records=0,
    )
    with open(path, "wb") as f:
        f.write(out)
