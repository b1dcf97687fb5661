"""Within-sample reference search: per-bin K nearest neighbours.

This replaces the reference's O(bins^2 x samples) pure-Python bisect
insertion loop (newref_tools.py:255-278) — the documented scaling wall at
small bin sizes (reference README.md:10-11) — with a tiled kernel:

* squared distances arrive as one MXU matmul per (row-block, column-block):
  ``D = ||t||^2 + ||c||^2 - 2 t @ c^T``;
* a running per-row top-k (smallest distance) is merged block-by-block with
  a stable ``lax.top_k``, which reproduces the reference's tie behavior
  exactly: the bisect insertion keeps equal-distance candidates ordered by
  scan position, and stable top-k over [running | new-block] does the same
  because every new block's excluded-space indexes are strictly larger than
  anything already held;
* candidates on the target's own chromosome are excluded with an +inf mask
  instead of the reference's per-chromosome array concatenation
  (newref_tools.py:192-199), but reported neighbour indexes remain in the
  reference's own-chromosome-excluded coordinate space so the npz artifacts
  stay interchangeable.

Reference-parity details preserved: candidates with distance >= 1e10 are
never selected (the reference's ``cur_max`` starts at 1e10); unfilled slots
report index -1 / distance 1e10 (the reference's initial list contents).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from wisecondorx_tpu.ops.common import MATMUL_PRECISION

#: The reference's initial "infinite" distance (newref_tools.py:262,267).
SENTINEL_DISTANCE = 1e10


@functools.partial(
    jax.jit,
    static_argnames=("ref_size", "col_tile", "merge_method"),
)
def _knn_kernel(
    rows,  # [R, S] target-bin vectors
    data,  # [N_pad, S] all candidate vectors (zero-padded to col_tile)
    row_chr,  # int32[R] chromosome id per target row
    col_chr,  # int32[N_pad] chromosome id per candidate (-2 for padding)
    chr_starts,  # int32[n_chr] first masked index of each chromosome
    chr_sizes,  # int32[n_chr] masked bins per chromosome
    n_valid,  # scalar int32: true candidate count
    ref_size: int,
    col_tile: int,
    merge_method: str = "sort",
):
    dtype = rows.dtype
    R = rows.shape[0]
    n_blocks = data.shape[0] // col_tile

    row_norms = jnp.sum(rows * rows, axis=1)  # [R]
    col_norms = jnp.sum(data * data, axis=1)  # [N_pad]
    row_start = chr_starts[row_chr]  # [R]
    row_size = chr_sizes[row_chr]  # [R]

    data_blocks = data.reshape(n_blocks, col_tile, -1)
    norm_blocks = col_norms.reshape(n_blocks, col_tile)
    chr_blocks = col_chr.reshape(n_blocks, col_tile)

    init_vals = jnp.full((R, ref_size), jnp.inf, dtype=dtype)
    init_idx = jnp.full((R, ref_size), -1, dtype=jnp.int32)

    def body(carry, block):
        run_vals, run_idx = carry
        blk_data, blk_norms, blk_chr, blk_id = block
        g0 = blk_id * col_tile
        g = g0 + jax.lax.broadcasted_iota(jnp.int32, (1, col_tile), 1)  # [1,C]

        # [R, C] distances via MXU.
        d = (
            row_norms[:, None]
            + blk_norms[None, :]
            - 2.0
            * jnp.dot(rows, blk_data.T, preferred_element_type=dtype,
                      precision=MATMUL_PRECISION)
        )
        same_chr = row_chr[:, None] == blk_chr[None, :]
        invalid = (
            same_chr
            | (g >= n_valid)
            | (d >= SENTINEL_DISTANCE)
        )
        d = jnp.where(invalid, jnp.inf, d)

        # Excluded-space index of each candidate for each row.
        excl = g - jnp.where(g >= row_start[:, None], row_size[:, None], 0)
        excl = excl.astype(jnp.int32)

        merged_vals = jnp.concatenate([run_vals, d], axis=1)
        merged_idx = jnp.concatenate([run_idx, excl], axis=1)
        # Top-k of the smallest distances.  "sort" (lax.top_k) is stable —
        # exact bisect tie-order parity — but its TPU sort lowering takes
        # minutes to compile through the axon remote-compile path.
        # "partial" (approx_max_k at recall_target=1.0, XLA's PartialReduce)
        # returns the exact value set with unspecified tie order and
        # compiles ~100x faster; tie order only matters for degenerate
        # equal-distance candidates at the k-boundary.
        if merge_method == "partial":
            neg_top, arg = jax.lax.approx_max_k(
                -merged_vals, ref_size, recall_target=1.0
            )
        else:
            neg_top, arg = jax.lax.top_k(-merged_vals, ref_size)
        new_idx = jnp.take_along_axis(merged_idx, arg, axis=1)
        return (-neg_top, new_idx), None

    (vals, idx), _ = jax.lax.scan(
        body,
        (init_vals, init_idx),
        (
            data_blocks,
            norm_blocks,
            chr_blocks,
            jnp.arange(n_blocks, dtype=jnp.int32),
        ),
    )

    unfilled = jnp.isinf(vals)
    distances = jnp.where(unfilled, jnp.asarray(SENTINEL_DISTANCE, dtype), vals)
    indexes = jnp.where(unfilled, -1, idx)
    return indexes, distances


def _pad_cols(data, col_tile):
    n = data.shape[0]
    n_pad = -(-n // col_tile) * col_tile
    if n_pad == n:
        return data
    pad = np.zeros((n_pad - n, data.shape[1]), dtype=data.dtype)
    return np.concatenate([data, pad], axis=0)


def knn_search(
    data: np.ndarray,
    chr_of_bin: np.ndarray,
    masked_chr_starts: np.ndarray,
    masked_bins_per_chr: np.ndarray,
    ref_size: int = 300,
    row_range: tuple[int, int] | None = None,
    col_tile: int = 1024,
    row_tile: int | None = None,
    merge_method: str | None = None,
    n_pad: int | None = None,
    row_pad: int | None = None,
    device_out: dict | None = None,
    pre_fetch_hook=None,
    stats: dict | None = None,
):
    """Exact per-bin K nearest neighbours over other-chromosome bins.

    Parameters
    ----------
    data : [n_masked, n_samples] PCA-corrected bin vectors.
    chr_of_bin : int[n_masked] chromosome id per masked bin.
    masked_chr_starts, masked_bins_per_chr : per-chromosome layout tables.
    row_range : optional (start, end) restricting which target rows are
        searched (used by the gonosomal passes and by sharding).

    Returns (indexes int32[rows, ref_size], distances [rows, ref_size]) with
    indexes in own-chromosome-excluded space.

    ``merge_method``: None selects the fused Pallas kernel on TPU
    (ops/knn_pallas.py — the production path) and "sort" elsewhere
    (bisect tie-order parity).  "partial" is the direct approx_max_k
    merge (exact values, unspecified tie order, fast TPU compiles).

    ``n_pad`` / ``row_pad`` (planned compile-stable paddings, see
    utils/warmup.py) and ``device_out`` (device-resident index output for
    the null-ratio stage) apply to the Pallas path only and are ignored by
    the XLA merge paths.
    """
    if merge_method is None:
        merge_method = (
            "pallas" if jax.default_backend() == "tpu" else "sort"
        )
    if merge_method == "pallas":
        from wisecondorx_tpu.ops.knn_pallas import knn_search_pallas

        return knn_search_pallas(
            data,
            chr_of_bin,
            masked_chr_starts,
            masked_bins_per_chr,
            ref_size=ref_size,
            row_range=row_range,
            n_pad=n_pad,
            row_pad=row_pad,
            _device_out=device_out,
            _pre_fetch_hook=pre_fetch_hook,
            _stats=stats,
        )
    n = data.shape[0]
    r0, r1 = row_range if row_range is not None else (0, n)
    n_rows = r1 - r0

    data_p = _pad_cols(np.asarray(data), col_tile)
    col_chr = np.full(data_p.shape[0], -2, dtype=np.int32)
    col_chr[:n] = chr_of_bin
    starts = jnp.asarray(masked_chr_starts, dtype=jnp.int32)
    sizes = jnp.asarray(masked_bins_per_chr, dtype=jnp.int32)
    data_j = jnp.asarray(data_p)
    col_chr_j = jnp.asarray(col_chr)

    if n_rows == 0:
        return (
            np.zeros((0, ref_size), dtype=np.int32),
            np.zeros((0, ref_size), dtype=data.dtype),
        )
    row_tile = min(row_tile or n_rows, n_rows)
    # Pad target rows to a whole number of tiles: every kernel call then
    # shares one compiled shape (a partial final tile would trigger a
    # second multi-minute XLA compile for one-off shapes).
    rows_pad = -(-n_rows // row_tile) * row_tile
    rows = np.zeros((rows_pad, data_p.shape[1]), dtype=data_p.dtype)
    rows[:n_rows] = data_p[r0:r1]
    rows_chr = np.full(rows_pad, -2, dtype=np.int32)
    rows_chr[:n_rows] = col_chr[r0:r1]
    rows_j = jnp.asarray(rows)
    rows_chr_j = jnp.asarray(rows_chr)

    # Dispatch every row tile before fetching any result: JAX dispatch is
    # async, so the device streams through all tiles back-to-back while the
    # host readback (expensive over the tunneled axon link) overlaps the
    # remaining tiles' compute instead of serializing with it.
    pending = []
    for s in range(0, rows_pad, row_tile):
        pending.append(
            _knn_kernel(
                rows_j[s : s + row_tile],
                data_j,
                rows_chr_j[s : s + row_tile],
                col_chr_j,
                starts,
                sizes,
                jnp.int32(n),
                ref_size=ref_size,
                col_tile=col_tile,
                merge_method=merge_method,
            )
        )
    indexes = np.concatenate([np.asarray(i) for i, _ in pending])[:n_rows]
    distances = np.concatenate([np.asarray(d) for _, d in pending])[:n_rows]
    return indexes, distances


@functools.partial(jax.jit, static_argnames=())
def _null_ratio_kernel(sub, idx_block, own_block):
    gathered = sub[idx_block]  # [c, k, chosen]
    medians = jnp.median(gathered, axis=1)
    return jnp.log2(own_block / medians)


@functools.partial(jax.jit, static_argnames=("chunk",))
def _null_ratio_chunk_dev(sub_pad, idx_pad, offset, n, *, chunk: int):
    """One row chunk of the all-device null table.

    ``offset`` and ``n`` are traced scalars, so every chunk of a pass —
    and the same pass before/after the PCA-distance filter — shares one
    compiled program.  ``idx % n`` reproduces the reference's numpy -1
    wraparound (SURVEY.md 2.12).
    """
    idx = jax.lax.dynamic_slice_in_dim(idx_pad, offset, chunk, axis=0) % n
    own = jax.lax.dynamic_slice_in_dim(sub_pad, offset, chunk, axis=0)
    gathered = sub_pad[idx]  # [chunk, k, chosen]
    medians = jnp.median(gathered, axis=1)
    return jnp.log2(own / medians)


def null_ratio_chunk(k: int, chosen: int) -> int:
    """Row-chunk height of the device null-ratio programs — exposed so
    callers can plan a compile-stable ``rows_pad`` (a multiple of this)
    before the row count is final (utils/warmup.py)."""
    chunk = max(256, int(2**28 // (k * max(chosen, 1) * 4)))
    return -(-chunk // 256) * 256


def compute_null_ratios_device(
    data_dev,
    indexes_dev,
    sample_ids: np.ndarray,
    placeholder_rows: int = 0,
    rows_pad: int | None = None,
    fetch: bool = True,
):
    """Null log2 ratios with data AND indexes resident on device.

    The host-array path (:func:`compute_null_ratios`) re-uploads the
    [rows, k] index table (~230 MB at production scale) over the tunneled
    host link; here the table is the device output of
    :func:`wisecondorx_tpu.ops.knn_pallas.knn_search_pallas` and only the
    [rows, chosen] result ever crosses the link.

    ``placeholder_rows`` prepends that many zero-index rows (the gonosomal
    passes' autosome placeholders, reference newref_tools.py:186-191).
    ``rows_pad`` optionally pins the padded row count so a pre-warmed
    compile survives the PCA-distance filter changing the row count.
    With ``fetch=False`` the chunk results are returned as a list of
    device arrays (warm-up / overlap use).
    """
    n = int(data_dev.shape[0])
    ids = jnp.asarray(np.asarray(sample_ids, dtype=np.int32))
    chosen = int(ids.shape[0])
    k = int(indexes_dev.shape[1])
    sub = jnp.take(data_dev, ids, axis=1)  # [n, chosen]
    if placeholder_rows:
        indexes_dev = jnp.concatenate(
            [jnp.zeros((placeholder_rows, k), jnp.int32), indexes_dev]
        )
    n_rows = int(indexes_dev.shape[0])

    chunk = null_ratio_chunk(k, chosen)
    pad_min = -(-n_rows // chunk) * chunk
    if rows_pad is None:
        rows_pad = pad_min
    elif rows_pad < pad_min or rows_pad % chunk:
        raise ValueError(
            f"rows_pad ({rows_pad}) must be a multiple of {chunk} and "
            f">= {pad_min}"
        )
    idx_pad = jnp.pad(indexes_dev, ((0, rows_pad - n_rows), (0, 0)))
    # Pad rows carry 1.0 so the (discarded) tail never divides by zero.
    sub_pad = jnp.pad(
        sub, ((0, rows_pad - n), (0, 0)), constant_values=1.0
    )

    n_j = jnp.int32(n)
    pending = [
        _null_ratio_chunk_dev(
            sub_pad, idx_pad, jnp.int32(s), n_j, chunk=chunk
        )
        for s in range(0, rows_pad, chunk)
    ]
    if not fetch:
        return pending
    out = np.empty((n_rows, chosen), dtype=np.dtype(str(sub.dtype)))
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=8) as pool:
        parts = list(pool.map(lambda a: np.asarray(a), pending))
    for i, part in enumerate(parts):
        s = i * chunk
        if s >= n_rows:
            break
        e = min(s + chunk, n_rows)
        out[s:e] = part[: e - s]
    return out


def assemble_null_ratio_rows(parts: list, n_rows: int) -> np.ndarray:
    """Stitch prefetched null-ratio chunk arrays (host numpy, from
    :func:`compute_null_ratios_device` ``fetch=False`` results downloaded
    by the KNN search's overlap pool) into the final [n_rows, chosen]
    table, dropping the padding tail."""
    parts = [np.asarray(p) for p in parts]
    chunk = parts[0].shape[0]
    out = np.empty((n_rows, parts[0].shape[1]), dtype=parts[0].dtype)
    for i, part in enumerate(parts):
        s = i * chunk
        if s >= n_rows:
            break
        e = min(s + chunk, n_rows)
        out[s:e] = part[: e - s]
    return out


def compute_null_ratios(
    data: np.ndarray,
    indexes: np.ndarray,
    sample_ids: np.ndarray,
    backend: str = "auto",
) -> np.ndarray:
    """Null log2 ratios for the chosen reference samples.

    Reference newref_tools.py:210-224: for each chosen sample s and each bin
    b, ``r = log2(data[b, s] / median(data[indexes[b], s]))``.

    Parity quirk reproduced deliberately (SURVEY.md 2.12): ``indexes`` are in
    own-chromosome-excluded space but are applied directly to the full
    masked-space sample vector, including the reference's numpy behavior of
    index -1 wrapping to the last bin.

    ``data`` may be numpy or device-resident (jnp); a device array forces
    the jax backend and skips the cohort re-upload.
    """
    if isinstance(data, jnp.ndarray) and backend != "numpy":
        backend = "jax"
        sub_dev = jnp.take(
            data, jnp.asarray(np.asarray(sample_ids, dtype=np.int32)), axis=1
        )
        data = None
    else:
        sub_dev = None
        data = np.asarray(data)
    indexes = np.asarray(indexes)
    if sub_dev is not None:
        n = sub_dev.shape[0]
        sub = None
    else:
        n = data.shape[0]
        sub = data[:, sample_ids]  # [bins, chosen]
    n_rows, k = indexes.shape
    chosen = len(sample_ids)
    out_dtype = sub.dtype if sub is not None else np.dtype(str(sub_dev.dtype))
    out = np.empty((n_rows, chosen), dtype=out_dtype)

    total_gathered = n_rows * k * max(chosen, 1)
    use_jax = backend == "jax" or (backend == "auto" and total_gathered > 5e7)

    if use_jax:
        # Device path: gather + median over the neighbour axis in chunks.
        sub_j = sub_dev if sub_dev is not None else jnp.asarray(sub)
        chunk = max(256, int(2**28 // (k * max(chosen, 1) * 4)))
        chunk = -(-chunk // 256) * 256
        pending = []
        for s in range(0, n_rows, chunk):
            e = min(s + chunk, n_rows)
            idx = (indexes[s:e] % n).astype(np.int32)
            # Own values sliced on device; shapes padded so every chunk
            # shares one compiled program (pad rows use 1.0 — discarded).
            own = jax.lax.slice(sub_j, (s, 0), (e, chosen))
            if e - s < chunk:
                pad = chunk - (e - s)
                idx = np.concatenate([idx, np.zeros((pad, k), np.int32)])
                own = jnp.pad(
                    own, ((0, pad), (0, 0)), constant_values=1.0
                )
            res = _null_ratio_kernel(
                sub_j, jnp.asarray(idx), own.astype(sub_j.dtype)
            )
            pending.append((s, e, res))
        for s, e, res in pending:
            out[s:e] = np.asarray(res)[: e - s]
        return out

    chunk = max(1, 2**28 // (k * max(chosen, 1) * 8))
    for s in range(0, n_rows, chunk):
        e = min(s + chunk, n_rows)
        # numpy negative-index wraparound for the -1 sentinel slots.
        gathered = sub[indexes[s:e] % n]  # [c, k, chosen]
        medians = np.median(gathered, axis=1)  # [c, chosen]
        with np.errstate(divide="ignore", invalid="ignore"):
            out[s:e] = np.log2(sub[s:e] / medians)
    return out


def choose_null_samples(n_samples: int, rng: np.random.Generator) -> np.ndarray:
    """Pick min(n_samples, 100) sample columns for the null-ratio table.

    The reference draws them with unseeded ``random.sample``
    (newref_tools.py:214-218) making builds non-reproducible; we take a
    seeded Generator.  Column order is irrelevant downstream (segment
    z-scores aggregate over the chosen-sample axis symmetrically).
    """
    return rng.choice(n_samples, size=min(n_samples, 100), replace=False)
