"""Fused Pallas KNN kernel: distance matmul + in-VMEM bucketed top-k.

This is the TPU speed-of-light path for the within-sample reference search
(reference newref_tools.py:255-278, the O(bins^2 x samples) wall).  The XLA
pipeline in :mod:`wisecondorx_tpu.ops.knn` materializes every [rows, cols]
distance block in HBM and pays a second full O(N^2 S) pass for count
verification; here the block never leaves VMEM and verification is free:

* grid = (row_tiles, col_blocks); col_blocks is the innermost (sequential)
  axis, so the output refs — revisited across col blocks — act as VMEM
  accumulators that flush to HBM once per row tile;
* each step computes the [RT, L] squared-distance block as one MXU matmul
  (``||t||^2 + ||c||^2 - 2 t c^T``) and bubbles it into a per-row bucketed
  structure: bucket = global column mod L (L = lane count of the block, so
  the bucket axis aligns elementwise with the distance block), each bucket
  keeping its M smallest (value, index) pairs via an M-step compare-swap
  cascade on the VPU;
* every value that falls out of the cascade's bottom is folded into a
  per-bucket ``min_drop``; after finalization a row provably contains its
  exact top-k iff ``min(min_drop) > max(kept)`` — rows failing the check
  (a bucket held > M true winners; probability ~1e-5 per row at the default
  L=1024, M=6 geometry for k=300) are re-run through an exact dense path.

The kernel works on centered + rescaled float32 data: depth-normalized bin
profiles live at ~5e-6 with pairwise distances ~1e-12, where the norm-trick
matmul cancels catastrophically in f32.  Distances are translation
invariant, so the wrapper subtracts the per-sample mean profile and scales
by the global RMS, turning working values O(1); reported distances are
un-scaled afterwards.  See tests/test_knn_f32.py for the measured effect.
"""

from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from wisecondorx_tpu.ops.knn import SENTINEL_DISTANCE

# Default geometry: buckets per row = lane width of one column block;
# bucket depth M.  Candidate pool per row = L * M.
LANES = 1024
DEPTH = 6
ROW_TILE = 256
#: Rows per kernel launch; bounds the [chunk, L*M] HBM candidate buffers.
ROW_CHUNK = 32768


def _knn_bucket_kernel(nvalid_ref, sent_ref,
                       rows_ref, rnorm_ref, rchr_ref, rstart_ref, rsize_ref,
                       data_ref, cnorm_ref, cchr_ref,
                       vals_ref, idx_ref, drop_ref,
                       *, lanes: int, depth: int):
    """One (row-tile, col-block) grid step of the fused search."""
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        vals_ref[:] = jnp.full_like(vals_ref, jnp.inf)
        idx_ref[:] = jnp.full_like(idx_ref, -1)
        drop_ref[:] = jnp.full_like(drop_ref, jnp.inf)

    rt = rows_ref.shape[0]
    # [RT, L] distance block on the MXU.
    d = (
        rnorm_ref[:]
        + cnorm_ref[:]
        - 2.0
        * jax.lax.dot_general(
            rows_ref[:], data_ref[:],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
    )
    g = j * lanes + jax.lax.broadcasted_iota(jnp.int32, (rt, lanes), 1)
    invalid = (
        (rchr_ref[:] == cchr_ref[:])
        | (g >= nvalid_ref[0, 0])
        | (d >= sent_ref[0, 0])
    )
    d = jnp.where(invalid, jnp.inf, d)
    # Own-chromosome-excluded candidate index (reference coordinate space).
    excl = g - jnp.where(g >= rstart_ref[:], rsize_ref[:], 0)

    # Bubble the incoming element through the sorted-M cascade; whatever
    # exits the bottom is the dropped value for this bucket.
    cur_v, cur_i = d, excl
    for m in range(depth):
        sl = slice(m * lanes, (m + 1) * lanes)
        v_m = vals_ref[:, sl]
        i_m = idx_ref[:, sl]
        take = cur_v < v_m
        vals_ref[:, sl] = jnp.where(take, cur_v, v_m)
        idx_ref[:, sl] = jnp.where(take, cur_i, i_m)
        cur_v = jnp.where(take, v_m, cur_v)
        cur_i = jnp.where(take, i_m, cur_i)
    drop_ref[:] = jnp.minimum(drop_ref[:], cur_v)


@functools.partial(
    jax.jit,
    static_argnames=("r_pad", "lanes", "depth", "row_tile", "interpret"),
)
def _bucket_scan_chunk(data, cnorm, cchr, starts_tab, sizes_tab, offset,
                       n_valid, sentinel,
                       *, r_pad: int, lanes: int, depth: int,
                       row_tile: int, interpret: bool = False):
    """One row chunk of the fused search, fully device-derived.

    The chunk's target rows, norms, chromosome ids, and exclusion tables
    are all slices/lookups of the resident candidate arrays at ``offset``
    — a single dispatch per chunk with no host staging (uploads over the
    tunnel cost more than the kernel itself).
    """
    rows = jax.lax.dynamic_slice_in_dim(data, offset, r_pad, axis=0)
    rnorm = jax.lax.dynamic_slice_in_dim(
        cnorm, offset, r_pad, axis=1
    ).reshape(-1, 1)
    rchr = jax.lax.dynamic_slice_in_dim(
        cchr, offset, r_pad, axis=1
    ).reshape(-1, 1)
    safe = jnp.clip(rchr, 0, starts_tab.shape[0] - 1)
    rstart = jnp.where(rchr >= 0, starts_tab[safe[:, 0]][:, None], 0)
    rsize = jnp.where(rchr >= 0, sizes_tab[safe[:, 0]][:, None], 0)
    return _bucket_scan(
        rows, rnorm, rchr.astype(jnp.int32),
        rstart.astype(jnp.int32), rsize.astype(jnp.int32),
        data, cnorm, cchr, n_valid, sentinel,
        lanes=lanes, depth=depth, row_tile=row_tile, interpret=interpret,
    )


@functools.partial(
    jax.jit,
    static_argnames=("lanes", "depth", "row_tile", "interpret"),
)
def _bucket_scan(rows, rnorm, rchr, rstart, rsize,
                 data, cnorm, cchr, n_valid, sentinel,
                 *, lanes: int, depth: int, row_tile: int,
                 interpret: bool = False):
    """Launch the fused kernel over one row chunk.

    rows: [R_pad, S_pad] f32 target vectors (R_pad % row_tile == 0).
    data: [N_pad, S_pad] f32 candidates (N_pad % lanes == 0).
    Returns (vals [R_pad, L*M], idx int32 [R_pad, L*M], drop [R_pad, L]).
    """
    r_pad, s_pad = rows.shape
    n_pad = data.shape[0]
    grid = (r_pad // row_tile, n_pad // lanes)

    kernel = functools.partial(_knn_bucket_kernel, lanes=lanes, depth=depth)
    out_shape = (
        jax.ShapeDtypeStruct((r_pad, lanes * depth), jnp.float32),
        jax.ShapeDtypeStruct((r_pad, lanes * depth), jnp.int32),
        jax.ShapeDtypeStruct((r_pad, lanes), jnp.float32),
    )
    flops = 2 * r_pad * n_pad * s_pad
    vals, idx, drop = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # n_valid (1,)
            pl.BlockSpec(memory_space=pltpu.SMEM),  # sentinel (1,)
            pl.BlockSpec((row_tile, s_pad), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((row_tile, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((row_tile, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((row_tile, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((row_tile, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((lanes, s_pad), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lanes), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lanes), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((row_tile, lanes * depth), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((row_tile, lanes * depth), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((row_tile, lanes), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=out_shape,
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=int(
                grid[0] * n_pad * s_pad * 4 + r_pad * s_pad * 4
                + r_pad * lanes * depth * 8
            ),
            transcendentals=0,
        ),
        # v5e's default scoped-VMEM budget (16 MB) is below this kernel's
        # working set (accumulator blocks + double-buffered data blocks);
        # the physical VMEM is far larger, so raise the cap to fit.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(
                min(
                    110 * 2**20,
                    2.0
                    * (
                        row_tile * lanes * depth * 8  # vals+idx blocks
                        + row_tile * lanes * 4  # drop block
                        + 2 * lanes * s_pad * 4  # data double-buffer
                        + 2 * row_tile * s_pad * 4
                        + 8 * row_tile * lanes * 4  # d/temp registers
                    )
                    + 2**21,
                )
            ),
        ),
        interpret=interpret,
    )(n_valid, sentinel, rows, rnorm, rchr, rstart, rsize, data, cnorm, cchr)
    return vals, idx, drop


def _extract_topk_kernel(vals_ref, idx_ref, out_v_ref, out_i_ref,
                         *, ref_size: int):
    """Sequential min-extraction top-k over the bucketed candidate pool.

    Replaces ``jax.lax.approx_max_k`` on the [rows, lanes*depth] pool —
    whose TPU lowering takes ~44 s to compile at production shapes through
    the axon remote-compile path — with a simple VPU loop that compiles in
    seconds and runs in milliseconds per tile.  Extracted values collect
    into 128-lane register blocks (Mosaic cannot store to a dynamic
    single-lane offset) that flush at static offsets.
    """
    rt, p = vals_ref.shape
    gi = jax.lax.broadcasted_iota(jnp.int32, (rt, p), 1)
    lane = jax.lax.broadcasted_iota(jnp.int32, (rt, 128), 1)
    big = jnp.int32(2**30)
    cur = vals_ref[:]
    iv = idx_ref[:]

    for k0 in range(0, out_v_ref.shape[1], 128):
        n_here = min(128, ref_size - k0)

        def body(j, carry):
            cur, bv, bi = carry
            v = jnp.min(cur, axis=1, keepdims=True)  # [RT, 1]
            hit = cur == v
            sel = jnp.min(jnp.where(hit, gi, big), axis=1, keepdims=True)
            chosen = gi == sel  # exactly one lane per row
            # That lane's index value via a masked min-reduce (works for
            # the -1 sentinel too: exactly one lane survives the mask).
            ival = jnp.min(
                jnp.where(chosen, iv, big), axis=1, keepdims=True
            )
            bv = jnp.where(lane == j, v, bv)
            bi = jnp.where(lane == j, ival, bi)
            return jnp.where(chosen, jnp.inf, cur), bv, bi

        bv0 = jnp.full((rt, 128), jnp.inf, jnp.float32)
        bi0 = jnp.full((rt, 128), -1, jnp.int32)
        if n_here > 0:
            cur, bv, bi = jax.lax.fori_loop(
                0, n_here, body, (cur, bv0, bi0)
            )
        else:
            bv, bi = bv0, bi0
        out_v_ref[:, k0 : k0 + 128] = bv
        out_i_ref[:, k0 : k0 + 128] = bi


@functools.partial(
    jax.jit, static_argnames=("ref_size", "row_tile", "interpret")
)
def _finalize(vals, idx, drop, *, ref_size: int, row_tile: int = 256,
              interpret: bool = False):
    """Exact top-k over the candidate pool + per-row exactness certificate.

    flagged[r] is True when a bucket of row r may have dropped a true
    top-k member: the smallest value ever dropped is <= the worst kept
    distance (ties included, to stay conservative).
    """
    r_pad, p = vals.shape
    row_tile = min(row_tile, r_pad)
    grid = (r_pad // row_tile,)
    k_pad = _round_up(ref_size, 128)
    top_vals, top_idx = pl.pallas_call(
        functools.partial(_extract_topk_kernel, ref_size=ref_size),
        grid=grid,
        in_specs=[
            pl.BlockSpec((row_tile, p), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((row_tile, p), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((row_tile, k_pad), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((row_tile, k_pad), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((r_pad, k_pad), jnp.float32),
            jax.ShapeDtypeStruct((r_pad, k_pad), jnp.int32),
        ),
        # Flat generous cap (v5e has 128 MB physical VMEM; the scoped
        # default of 16 MB is far below this kernel's working set).
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 2**20,
        ),
        interpret=interpret,
    )(vals, idx)
    top_vals = top_vals[:, :ref_size]
    top_idx = top_idx[:, :ref_size]
    finite = jnp.isfinite(top_vals)
    tau = jnp.max(jnp.where(finite, top_vals, -jnp.inf), axis=1)
    min_drop = jnp.min(drop, axis=1)
    flagged = jnp.isfinite(min_drop) & (min_drop <= tau)
    return top_vals, top_idx, flagged


@jax.jit
def _pack_result_idx(tv, ti):
    """3-byte little-endian pack of (index + 1) for the d2h fetch, with
    unfilled slots (non-finite value) pre-folded to -1 -> 0.

    Excluded-space candidate indexes are bounded by the masked-bin count
    (< 2^24 at any real bin size), so 3 of the int32's 4 bytes carry the
    full value losslessly — 25% fewer bytes on the index stream of the
    ~half-GB newref result download (the fetch is the newref wall on
    degraded tunnel links; see ROADMAP round-5 notes).

    Encoding contract (value+1, little-endian low 3 bytes, -1 -> 0) is
    shared with the mirror-direction pair in models/ref_loader.py
    (_pack_sentinel host-side / _decode_sentinel device-side); a change
    here must change there."""
    v = jnp.where(jnp.isfinite(tv), ti, -1) + 1
    return jnp.stack(
        [
            (v & 0xFF).astype(jnp.uint8),
            ((v >> 8) & 0xFF).astype(jnp.uint8),
            ((v >> 16) & 0xFF).astype(jnp.uint8),
        ],
        axis=-1,
    )


def _unpack_result_idx(packed: np.ndarray) -> np.ndarray:
    """Host inverse of :func:`_pack_result_idx` (little-endian view)."""
    r, k, _ = packed.shape
    out4 = np.zeros((r, k, 4), dtype=np.uint8)
    out4[..., :3] = packed
    return out4.view("<i4")[..., 0] - 1


@jax.jit
def _exact_row_distances(rows, rnorm, rchr, data, cnorm, cchr, n_valid,
                         sentinel):
    """Dense masked distances for verification-flagged rows.

    Top-k selection happens on host (numpy argpartition over the
    downloaded [tile, n_pad] block): a device top-k over the full
    candidate axis would re-pay the multi-minute approx_max_k/sort
    remote-compile for a path that handles a handful of rows.
    """
    d = (
        rnorm[:, None]
        + cnorm[None, :]
        - 2.0
        * jnp.dot(
            rows, data.T,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
    )
    n_pad = data.shape[0]
    g = jax.lax.broadcasted_iota(jnp.int32, (1, n_pad), 1)
    invalid = (rchr[:, None] == cchr[None, :]) | (g >= n_valid) | (d >= sentinel)
    return jnp.where(invalid, jnp.inf, d)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _chunk_plan(n_rows, r0, n_pad, row_tile, row_chunk, row_pad=None):
    """Row-chunk schedule: list of (cs, ce, offset, r_pad, skip).

    Output rows [cs, ce) come from kernel rows [skip, skip + ce - cs) of a
    chunk whose targets are ``data[offset : offset + r_pad]``.

    Every multi-chunk schedule uses ONE kernel shape (r_pad == row_chunk):
    the final chunk re-covers the tail from ``n_rows - row_chunk`` instead
    of compiling a second, tail-sized program — on the axon TPU path a
    distinct Mosaic shape costs a ~20 s remote compile, while re-searching
    the overlap costs milliseconds.  Short searches (< row_chunk rows, e.g.
    the gonosomal passes) use a single row_tile-rounded chunk, window-
    clamped into [0, n_pad] so the dynamic slice never goes out of range.
    """
    if n_rows <= 0:
        return []
    if n_rows >= row_chunk:
        plan = []
        prev_end = 0
        while prev_end < n_rows:
            start = (
                prev_end
                if prev_end + row_chunk <= n_rows
                else n_rows - row_chunk
            )
            plan.append(
                (prev_end, start + row_chunk, r0 + start, row_chunk,
                 prev_end - start)
            )
            prev_end = start + row_chunk
        return plan
    r_pad = max(row_pad or 0, _round_up(n_rows, row_tile))
    r_pad = min(r_pad, _round_up(n_pad, row_tile))
    offset = min(r0, max(0, n_pad - r_pad))
    return [(0, n_rows, offset, r_pad, r0 - offset)]


@jax.jit
def _prep_rms(data):
    work = data - jnp.mean(data, axis=0)
    return jnp.sqrt(jnp.mean(work * work))


@functools.partial(jax.jit, static_argnames=("n_pad", "s_pad"))
def _prep_candidates(data, scale, *, n_pad: int, s_pad: int):
    n, s = data.shape
    work = (data - jnp.mean(data, axis=0)) * scale
    cand = jnp.pad(
        work.astype(jnp.float32), ((0, n_pad - n), (0, s_pad - s))
    )
    return cand, jnp.sum(cand * cand, axis=1).reshape(1, -1)


def knn_search_pallas(
    data: np.ndarray,
    chr_of_bin: np.ndarray,
    masked_chr_starts: np.ndarray,
    masked_bins_per_chr: np.ndarray,
    ref_size: int = 300,
    row_range: tuple[int, int] | None = None,
    *,
    lanes: int = LANES,
    depth: int = DEPTH,
    row_tile: int = ROW_TILE,
    row_chunk: int = ROW_CHUNK,
    n_pad: int | None = None,
    row_pad: int | None = None,
    interpret: bool = False,
    _stats: dict | None = None,
    _device_out: dict | None = None,
    _warm_only: bool = False,
    _pre_fetch_hook=None,
):
    """Exact per-bin KNN via the fused Pallas kernel (f32, TPU-first).

    Same contract as :func:`wisecondorx_tpu.ops.knn.knn_search`: returns
    (indexes int32[rows, ref_size], distances f32[rows, ref_size]) with
    indexes in the reference's own-chromosome-excluded coordinate space,
    unfilled slots as -1 / 1e10, and candidates at distance >= 1e10 never
    selected.  Tie order at the k boundary is unspecified (the XLA "sort"
    path provides bisect-order parity when needed).

    ``_stats`` (optional dict) receives diagnostics: number of
    verification-flagged rows, the scale factor, etc.

    ``data`` may be a numpy array or a device (jnp) array; passing a device
    array skips the cohort upload entirely — on the tunneled TPU (~46 MB/s
    host-to-device) that transfer, not compute, dominates the wall-clock.
    All staging (centering, padding, norms, row slicing) happens on device;
    the only downloads are the [rows, ref_size] results.

    ``n_pad`` optionally pins the padded candidate-axis size (a multiple of
    ``lanes``, >= the natural padding).  Passing the pre-filter padded size
    keeps the compiled programs identical before and after the PCA-distance
    bin filter drops bins, so a warmed compile survives the filter.

    ``_device_out`` (optional dict) receives ``{"indexes": ...}`` — the
    result index table as a device-resident int32 array (rerun corrections
    included), so downstream device consumers (the null-ratio gather) skip
    re-uploading ~230 MB over the tunnel.

    ``_pre_fetch_hook`` (optional callable) receives ``_device_out`` after
    the rerun-corrected device index table is assembled but *before* the
    big [rows, ref_size] result fetch; it should dispatch downstream
    device work (the null-ratio table) and return a list of device arrays,
    which are fetched alongside the results over the same parallel pool
    and handed back as ``_device_out["prefetched"]`` — overlapping the two
    longest phases of a newref pass.

    ``_warm_only=True`` runs the search for its compilation side effects:
    every program is built and dispatched but the [rows, ref_size] results
    are never fetched (returns (None, None)).  Used by
    :mod:`wisecondorx_tpu.utils.warmup` to hide the cold-process compile
    tax behind host-side input work.
    """
    if row_tile > lanes or lanes % row_tile:
        raise ValueError(
            f"row_tile ({row_tile}) must divide lanes ({lanes}) so row "
            "chunks can be sliced from the device-resident candidate matrix"
        )
    n, s = data.shape
    r0, r1 = row_range if row_range is not None else (0, n)
    n_rows = r1 - r0
    if n_rows <= 0:
        return (
            np.zeros((0, ref_size), dtype=np.int32),
            np.zeros((0, ref_size), dtype=np.float32),
        )

    s_pad = _round_up(s, 128)
    n_pad_min = _round_up(n, lanes)
    if n_pad is None:
        n_pad = n_pad_min
    elif n_pad < n_pad_min or n_pad % lanes:
        raise ValueError(
            f"n_pad ({n_pad}) must be a multiple of lanes ({lanes}) and "
            f">= {n_pad_min}"
        )

    # Center (distance-invariant) and rescale so f32 working values are
    # O(1): kills the ||a||^2+||b||^2-2ab cancellation at the ~1e-12
    # distance scale of depth-normalized profiles.  Two fused device
    # programs + one tiny readback (the RMS scalar) — eager per-op
    # dispatches are expensive over the tunneled link.
    data_j = jnp.asarray(data)
    rms = float(_prep_rms(data_j))
    if not np.isfinite(rms) or rms == 0.0:
        rms = 1.0
    scale = 1.0 / rms
    sent_scaled = SENTINEL_DISTANCE * scale * scale
    # Keep the sentinel representable with headroom below f32 inf.
    sent_scaled = min(sent_scaled, 1e30)

    cand_j, cnorm_j = _prep_candidates(
        data_j, jnp.asarray(scale, data_j.dtype), n_pad=n_pad, s_pad=s_pad
    )

    col_chr = np.full(n_pad, -2, dtype=np.int32)
    col_chr[:n] = chr_of_bin
    cchr_j = jnp.asarray(col_chr.reshape(1, -1))
    nvalid_j = jnp.asarray([[n]], dtype=jnp.int32)
    sent_j = jnp.asarray([[sent_scaled]], dtype=jnp.float32)

    starts = np.asarray(masked_chr_starts, dtype=np.int64)
    sizes = np.asarray(masked_bins_per_chr, dtype=np.int64)
    # Per-row exclusion tables (chromosome id -> start/size).
    all_chr = col_chr[r0:r1]
    row_start_all = np.where(
        all_chr >= 0, starts[np.clip(all_chr, 0, len(starts) - 1)], 0
    ).astype(np.int32)
    row_size_all = np.where(
        all_chr >= 0, sizes[np.clip(all_chr, 0, len(sizes) - 1)], 0
    ).astype(np.int32)

    if _warm_only:
        indexes = distances = None
    else:
        indexes = np.empty((n_rows, ref_size), dtype=np.int32)
        distances = np.empty((n_rows, ref_size), dtype=np.float32)
    flagged_global: list[np.ndarray] = []

    row_chunk = max(row_tile, _round_up(row_chunk, row_tile))
    pending = []
    t_disp = time.perf_counter()
    starts_j = jnp.asarray(starts.astype(np.int32))
    sizes_j = jnp.asarray(sizes.astype(np.int32))
    plan = _chunk_plan(n_rows, r0, n_pad, row_tile, row_chunk, row_pad)
    for cs, ce, offset, r_pad, skip in plan:
        # Target rows + all their metadata are device-side slices/lookups
        # of the candidate arrays at this offset (the plan keeps
        # offset + r_pad <= n_pad); chunk rows outside [skip, skip+ce-cs)
        # are real candidates whose results are discarded.
        vals, idx, drop = _bucket_scan_chunk(
            cand_j, cnorm_j, cchr_j, starts_j, sizes_j,
            jnp.int32(offset), nvalid_j, sent_j,
            r_pad=r_pad, lanes=lanes, depth=depth, row_tile=row_tile,
            interpret=interpret,
        )
        top_vals, top_idx, flg = _finalize(
            vals, idx, drop, ref_size=ref_size, row_tile=row_tile,
            interpret=interpret,
        )
        # Async dispatch: results fetched after all chunks are queued.
        pending.append((cs, ce, skip, top_vals, top_idx, flg))

    if _stats is not None:
        _stats["dispatch_s"] = round(time.perf_counter() - t_disp, 2)
    from concurrent.futures import ThreadPoolExecutor

    # Phase 1: fetch ONLY the tiny per-chunk drop-certificate flag
    # vectors, so the exact-rerun correction and the device-resident index
    # table are final *before* the ~hundreds-of-MB result fetch — letting
    # downstream device consumers (``_pre_fetch_hook``, i.e. the
    # null-ratio table) dispatch now and ride along the big fetch instead
    # of serializing after it (VERDICT r2 weakness #2).
    t_flags = time.perf_counter()
    with ThreadPoolExecutor(max_workers=8) as pool:
        flags = list(
            pool.map(
                lambda a: np.asarray(a),
                [fl for _, _, _, _, _, fl in pending],
            )
        )
    for k, (cs, ce, skip, _, _, _) in enumerate(pending):
        span = slice(skip, skip + ce - cs)
        flagged_global.append(np.nonzero(flags[k][span])[0] + cs)
    if _stats is not None:
        _stats["flags_s"] = round(time.perf_counter() - t_flags, 2)

    flagged = (
        np.concatenate(flagged_global)
        if flagged_global
        else np.zeros(0, np.int64)
    )
    if _stats is not None:
        _stats["flagged_rows"] = int(flagged.size)
        _stats["scale"] = scale
        _stats["n_rows"] = n_rows

    if _device_out is not None:
        # Device-resident result indexes (unfilled slots forced to -1, as
        # on the host side), assembled from the still-alive chunk buffers.
        parts = [
            jnp.where(
                jnp.isfinite(tv[skip : skip + ce - cs, :ref_size]),
                ti[skip : skip + ce - cs, :ref_size],
                -1,
            )
            for cs, ce, skip, tv, ti, _ in pending
        ]
        _device_out["indexes"] = (
            jnp.concatenate(parts, axis=0) if len(parts) > 1 else parts[0]
        )

    if _warm_only:
        # Compile the re-run path too (one tile), then hand back nothing.
        # Also the packed-index fetch program, per distinct chunk shape,
        # so its first compile never lands inside the production fetch.
        if (n_pad + 1) < (1 << 24):
            warmed_shapes = set()
            for _, _, _, tv, ti, _ in pending:
                if tv.shape not in warmed_shapes:
                    warmed_shapes.add(tv.shape)
                    _pack_result_idx(tv, ti)
        flagged = flagged[:8]
        if _device_out is not None:
            rows8 = jnp.zeros(8, jnp.int32)
            vals8 = jnp.zeros((8, ref_size), jnp.int32)
            _device_out["indexes"] = (
                _device_out["indexes"].at[rows8].set(vals8)
            )
    rerun_fix: dict[int, tuple[np.ndarray, np.ndarray]] = {}
    if flagged.size:
        t_rr = time.perf_counter()
        tile = 8
        for fs in range(0, int(flagged.size), tile):
            rows_f = flagged[fs : fs + tile]
            pad_n = tile - rows_f.size
            # Device gather of the flagged rows (index upload only); dense
            # masked distances come back and the top-k runs on host.
            gidx = np.concatenate(
                [r0 + rows_f, np.zeros(pad_n, np.int64)]
            ).astype(np.int32)
            gidx_j = jnp.asarray(gidx)
            frows_j = jnp.take(cand_j, gidx_j, axis=0)
            fnorm_j = jnp.take(cnorm_j[0], gidx_j)
            fchr = np.concatenate(
                [all_chr[rows_f], np.full(pad_n, -2, np.int32)]
            )
            d = np.asarray(
                _exact_row_distances(
                    frows_j, fnorm_j, jnp.asarray(fchr),
                    cand_j, cnorm_j[0], cchr_j[0],
                    jnp.int32(n), jnp.float32(sent_scaled),
                )
            )
            if _warm_only:
                break
            for k_i, ri in enumerate(rows_f):
                row = d[k_i]
                kk = min(ref_size, row.shape[0])
                part = np.argpartition(row, kk - 1)[:kk]
                order = part[np.argsort(row[part], kind="stable")]
                vals = row[order]
                excl = order - np.where(
                    order >= row_start_all[ri], row_size_all[ri], 0
                )
                out_v = np.full(ref_size, SENTINEL_DISTANCE, np.float32)
                out_i = np.full(ref_size, -1, np.int32)
                finite = np.isfinite(vals)
                out_v[:kk][finite] = vals[finite]
                out_i[:kk][finite] = excl[finite]
                # Applied to the host arrays after the big fetch (which
                # would otherwise overwrite them).
                rerun_fix[int(ri)] = (out_v, out_i)
        if _stats is not None:
            _stats["rerun_s"] = round(time.perf_counter() - t_rr, 2)
        if _device_out is not None and not _warm_only:
            # Patch the corrected rows into the device-resident copy
            # (padded to a fixed scatter width; duplicate writes carry
            # identical values, so write order is irrelevant).
            f_pad = _round_up(int(flagged.size), 8)
            rows = np.concatenate(
                [flagged, np.repeat(flagged[:1], f_pad - flagged.size)]
            ).astype(np.int32)
            fixed = np.stack([rerun_fix[int(r)][1] for r in rows])
            _device_out["indexes"] = (
                _device_out["indexes"]
                .at[jnp.asarray(rows)]
                .set(jnp.asarray(fixed))
            )

    if _warm_only:
        return None, None

    # Downstream device work that consumes the (rerun-corrected) index
    # table dispatches here, before the big fetch, and its results are
    # pulled over the same parallel pool below.
    prefetched = []
    if _pre_fetch_hook is not None:
        prefetched = list(_pre_fetch_hook(_device_out))

    # Phase 2: the big [rows, ref_size] result fetch.  The tunneled d2h
    # link is single-stream slow but multiplexes well (~30 MB/s per
    # stream, ~70 MB/s with 4+); fetch all chunk results (and the hook's
    # arrays) over parallel streams.
    t_fetch = time.perf_counter()
    # Indexes travel 3-byte packed (lossless, -25% of the index stream;
    # the -1 unfilled fold moves on device); distances stay f32 — the
    # npz stores them faithfully.  The packed form is possible whenever
    # candidate indexes fit 24 bits, i.e. always for real genomes.
    pack_ok = (n_pad + 1) < (1 << 24)
    fetch_list = [
        x
        for _, _, _, tv, ti, _ in pending
        for x in (tv, _pack_result_idx(tv, ti) if pack_ok else ti)
    ] + prefetched
    with ThreadPoolExecutor(max_workers=8) as pool:
        fetched = list(pool.map(lambda a: np.asarray(a), fetch_list))
    for k, (cs, ce, skip, _, _, _) in enumerate(pending):
        span = slice(skip, skip + ce - cs)
        tv = fetched[2 * k][span]
        ti = (
            _unpack_result_idx(fetched[2 * k + 1][span])
            if pack_ok
            else fetched[2 * k + 1][span]
        )
        unfilled = ~np.isfinite(tv)
        distances[cs:ce] = np.where(unfilled, SENTINEL_DISTANCE, tv)
        indexes[cs:ce] = np.where(unfilled, -1, ti)
    for ri, (out_v, out_i) in rerun_fix.items():
        distances[ri] = out_v
        indexes[ri] = out_i
    if prefetched and _device_out is not None:
        _device_out["prefetched"] = fetched[2 * len(pending):]
    if _stats is not None:
        _stats["fetch_s"] = round(time.perf_counter() - t_fetch, 2)

    # Un-scale finite distances back to the data's own units.
    finite = distances < SENTINEL_DISTANCE
    distances = np.where(
        finite, distances / np.float32(scale * scale), distances
    ).astype(np.float32)
    return indexes, distances
