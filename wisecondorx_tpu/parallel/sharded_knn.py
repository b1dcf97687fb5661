"""Multi-chip KNN reference search.

Target rows are sharded over the mesh's "bins" axis; the candidate matrix
is replicated (SURVEY.md section 7 step 6: each chip owns disjoint target
rows and scans all column blocks, so no cross-chip merge is needed and no
collective appears in the hot loop).  XLA's GSPMD partitioner derives the
per-chip program from the sharding annotations on the jitted kernel.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from wisecondorx_tpu.ops.knn import _knn_kernel, _pad_cols


def knn_search_sharded(
    data: np.ndarray,
    chr_of_bin: np.ndarray,
    masked_chr_starts: np.ndarray,
    masked_bins_per_chr: np.ndarray,
    mesh,
    ref_size: int = 300,
    row_range: tuple[int, int] | None = None,
    col_tile: int = 2048,
    merge_method: str | None = None,
):
    """Sharded variant of :func:`wisecondorx_tpu.ops.knn.knn_search`.

    Rows are padded to a multiple of the mesh size and split across the
    "bins" axis; results match the single-device kernel exactly (verified
    by the sharding-equivalence tests).
    """
    n = data.shape[0]
    r0, r1 = row_range if row_range is not None else (0, n)
    n_rows = r1 - r0
    n_dev = mesh.devices.size

    data_p = _pad_cols(np.asarray(data), col_tile)
    col_chr = np.full(data_p.shape[0], -2, dtype=np.int32)
    col_chr[:n] = chr_of_bin

    # Pad target rows to a device multiple; padding rows use chr -2 (no
    # valid candidates; output rows are dropped below).
    rows_pad = -(-n_rows // n_dev) * n_dev
    rows = np.zeros((rows_pad, data_p.shape[1]), dtype=data_p.dtype)
    rows[:n_rows] = data_p[r0:r1]
    row_chr = np.full(rows_pad, -2, dtype=np.int32)
    row_chr[:n_rows] = col_chr[r0:r1]

    shard = NamedSharding(mesh, P("bins"))
    repl = NamedSharding(mesh, P())
    rows_d = jax.device_put(jnp.asarray(rows), shard)
    row_chr_d = jax.device_put(jnp.asarray(row_chr), shard)
    data_d = jax.device_put(jnp.asarray(data_p), repl)
    col_chr_d = jax.device_put(jnp.asarray(col_chr), repl)
    starts_d = jax.device_put(
        jnp.asarray(masked_chr_starts, dtype=jnp.int32), repl
    )
    sizes_d = jax.device_put(
        jnp.asarray(masked_bins_per_chr, dtype=jnp.int32), repl
    )

    idx, dist = _knn_kernel(
        rows_d,
        data_d,
        row_chr_d,
        col_chr_d,
        starts_d,
        sizes_d,
        jnp.int32(n),
        ref_size=ref_size,
        col_tile=col_tile,
        merge_method=merge_method
        or ("partial" if jax.default_backend() == "tpu" else "sort"),
    )
    return np.asarray(idx)[:n_rows], np.asarray(dist)[:n_rows]
