"""BAM conversion: aligned reads -> per-chromosome binned counts.

Drives the native C++ reader (native/bamreader.cpp) through ctypes — the
image has no pysam, and the reference's per-read Python loop
(convert_tools.py:15-120) is its second hottest path anyway.  The native
pass streams the whole coordinate-sorted BAM once, binning all selected
contigs simultaneously (the reference re-fetches per contig through the
index; a single sequential pass visits reads in the same order, so the
larp/larp2 duplicate-removal state machine behaves identically).

Contig-name semantics mirror convert_tools.py:50-71: a leading "chr" is
stripped case-insensitively, X -> "23", Y -> "24", anything not in 1..24
is skipped; per-contig count arrays are sized ``int(length/binsize + 1)``.

CRAM input is not supported natively (it requires htslib's full codec
stack); a clear error is raised.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
from pathlib import Path

import numpy as np


class ConvertError(RuntimeError):
    pass


_NATIVE_DIR = Path(__file__).resolve().parents[2] / "native"
_LIB = None

_QC_KEYS = (
    "mapped",
    "unmapped",
    "no_coordinate",
    "filter_rmdup",
    "filter_mapq",
    "pre_retro",
    "pair_fail",
    "total",
)


def _build_library() -> Path:
    so = _NATIVE_DIR / "libwcxbam.so"
    src = _NATIVE_DIR / "bamreader.cpp"
    if not src.exists():
        raise ConvertError(f"native source missing: {src}")
    if not so.exists() or so.stat().st_mtime < src.stat().st_mtime:
        logging.info("Building native BAM reader ...")
        subprocess.check_call(
            [
                os.environ.get("CXX", "g++"),
                "-O3", "-std=c++17", "-fPIC", "-shared", "-Wall",
                "-o", str(so), str(src), "-lz",
            ]
        )
    return so


def _load_library():
    global _LIB
    if _LIB is not None:
        return _LIB
    override = os.environ.get("WCX_TPU_NATIVE_LIB")
    so = Path(override) if override else _build_library()
    lib = ctypes.CDLL(str(so))
    lib.wcx_bam_open.restype = ctypes.c_void_p
    lib.wcx_bam_open.argtypes = [ctypes.c_char_p]
    lib.wcx_bam_error.restype = ctypes.c_char_p
    lib.wcx_bam_error.argtypes = [ctypes.c_void_p]
    lib.wcx_bam_nref.restype = ctypes.c_int
    lib.wcx_bam_nref.argtypes = [ctypes.c_void_p]
    lib.wcx_bam_ref_name.restype = ctypes.c_char_p
    lib.wcx_bam_ref_name.argtypes = [ctypes.c_void_p, ctypes.c_int]
    lib.wcx_bam_ref_len.restype = ctypes.c_int64
    lib.wcx_bam_ref_len.argtypes = [ctypes.c_void_p, ctypes.c_int]
    lib.wcx_bam_count.restype = ctypes.c_int
    lib.wcx_bam_count.argtypes = [
        ctypes.c_void_p,
        ctypes.c_double,
        ctypes.c_int,
        ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.POINTER(ctypes.c_int32)),
        ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int64),
    ]
    lib.wcx_bam_close.argtypes = [ctypes.c_void_p]
    _LIB = lib
    return lib


def _normalize_contig(name: str) -> str | None:
    """Map a contig name to the internal "1".."24" keys, or None to skip."""
    if name[:3].lower() == "chr":
        name = name[3:]
    if name == "X":
        return "23"
    if name == "Y":
        return "24"
    if name in {str(c) for c in range(1, 25)}:
        return name
    return None


def convert_reads(
    infile: str,
    binsize: float,
    reference_fasta: str | None = None,
    normdup: bool = False,
):
    """Convert a BAM file to (bins dict chr->int32 counts, quality dict).

    Matches the reference's output contract (convert_tools.py:107-120).
    """
    if infile.endswith(".cram"):
        raise ConvertError(
            "CRAM input is not supported by the native reader; convert to "
            "BAM (samtools view -b) first."
        )
    if not infile.endswith(".bam"):
        raise ConvertError(
            "Unsupported input file type. Make sure your input filename "
            "has a correct extension (bam)"
        )

    lib = _load_library()
    handle = lib.wcx_bam_open(infile.encode())
    try:
        n_ref = lib.wcx_bam_nref(handle)
        if n_ref < 0:
            raise ConvertError(
                f"Failed to open {infile}: "
                f"{lib.wcx_bam_error(handle).decode()}"
            )

        bins_per_chr: dict = {str(c): None for c in range(1, 25)}
        slot_of_ref = np.full(n_ref, -1, dtype=np.int32)
        buffers: list[np.ndarray] = []
        buffer_keys: list[str] = []
        for i in range(n_ref):
            raw_name = lib.wcx_bam_ref_name(handle, i).decode()
            length = lib.wcx_bam_ref_len(handle, i)
            key = _normalize_contig(raw_name)
            if key is None:
                continue
            n_bins = int(length / float(binsize) + 1)
            logging.info(
                "Working at %s; processing %d bins", raw_name, n_bins
            )
            arr = np.zeros(n_bins, dtype=np.int32)
            slot_of_ref[i] = len(buffers)
            buffers.append(arr)
            buffer_keys.append(key)

        ptr_type = ctypes.POINTER(ctypes.c_int32)
        counts_ptrs = (ptr_type * max(len(buffers), 1))(
            *[b.ctypes.data_as(ptr_type) for b in buffers]
        )
        counts_len = (ctypes.c_int64 * max(len(buffers), 1))(
            *[len(b) for b in buffers]
        )
        qc = (ctypes.c_int64 * 8)()

        logging.info(
            "Converting aligned reads ... This might take a while ..."
        )
        rc = lib.wcx_bam_count(
            handle,
            float(binsize),
            1 if normdup else 0,
            slot_of_ref.ctypes.data_as(ptr_type),
            counts_ptrs,
            counts_len,
            qc,
        )
        if rc != 0:
            raise ConvertError(
                f"BAM parsing failed: {lib.wcx_bam_error(handle).decode()}"
            )
    finally:
        lib.wcx_bam_close(handle)

    for key, arr in zip(buffer_keys, buffers):
        bins_per_chr[key] = arr

    reads_kept = int(sum(int(b.sum()) for b in buffers))
    qc_vals = dict(zip(_QC_KEYS, [int(x) for x in qc]))
    qual_info = {
        "mapped": qc_vals["mapped"],
        "unmapped": qc_vals["unmapped"],
        "no_coordinate": qc_vals["no_coordinate"],
        "filter_rmdup": qc_vals["filter_rmdup"],
        "filter_mapq": qc_vals["filter_mapq"],
        "pre_retro": qc_vals["pre_retro"],
        "post_retro": reads_kept,
        "pair_fail": qc_vals["pair_fail"],
    }
    return bins_per_chr, qual_info
