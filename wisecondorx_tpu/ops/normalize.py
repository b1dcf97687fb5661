"""Predict-stage normalization kernels.

Replaces the reference's per-bin Python loops (predict_tools.py:94-142) with
fixed-shape JAX kernels:

* coverage normalization + masking of the test sample;
* the iterative within-sample normalization: per target bin, statistics over
  its precomputed neighbour set, with aberrant bins (|z| above the 99th
  normal percentile) progressively removed from *serving* as references via
  the reference's ``-1`` sentinel (predict_tools.py:104);
* the distance-derived "optimal cutoff" and per-bin weights.

The neighbour gather uses *global* masked indexes precomputed once from the
reference's own-chromosome-excluded index space
(:meth:`wisecondorx_tpu.genome.MaskedLayout.neighbour_to_global`), removing
the per-chromosome array concatenation of predict_tools.py:125-130 from the
hot path entirely.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from wisecondorx_tpu.ops.common import masked_mean, masked_median, masked_std

#: scipy.stats.norm.ppf(0.99) — the reference's aberrant-bin z threshold
#: (predict_tools.py:104).
Z_MASK_THRESHOLD = 2.3263478740408408


def coverage_normalize_and_mask(
    sample: dict, bins_per_chr: np.ndarray, mask: np.ndarray
) -> np.ndarray:
    """Pad/truncate each chromosome to the reference layout, depth-normalize
    over the pass's chromosome range, apply the mask
    (reference predict_tools.py:32-48)."""
    parts = []
    for c, n_bins in enumerate(np.asarray(bins_per_chr)):
        arr = np.zeros(int(n_bins), dtype=np.float64)
        chr_data = np.asarray(sample[str(c + 1)])
        m = min(int(n_bins), len(chr_data))
        arr[:m] = chr_data[:m]
        parts.append(arr)
    all_data = np.concatenate(parts)
    all_data = all_data / np.sum(all_data)
    return all_data[np.asarray(mask, dtype=bool)]


@functools.partial(jax.jit, static_argnames=("repeats",))
def _optimal_cutoff_kernel(distances, repeats: int):
    cutoff = jnp.inf
    flat = distances.ravel()
    for _ in range(repeats):
        valid = flat < cutoff
        avg = masked_mean(flat, valid, axis=0)
        std = masked_std(flat, valid, axis=0)
        cutoff = avg + 3 * std
    return cutoff


def get_optimal_cutoff(distances: np.ndarray, repeats: int) -> float:
    """Iterative mean+3*std over reference distances
    (reference predict_tools.py:74-82)."""
    return float(_optimal_cutoff_kernel(jnp.asarray(distances), repeats))


@jax.jit
def _weights_kernel(distances):
    return 1.0 / jnp.mean(jnp.sqrt(distances), axis=1)


def get_weights(distances: np.ndarray) -> np.ndarray:
    """weight_i = 1 / mean(sqrt(distances_i)) (reference
    predict_tools.py:152-155)."""
    return np.asarray(_weights_kernel(jnp.asarray(distances)))


#: Target rows processed per gather block — bounds peak memory of the
#: [block, k] neighbour gather + sort (and its vmapped [batch, block, k]
#: counterpart) so XLA never materializes the full [targets, k] tensor in
#: an unfavourable layout.
NORMALIZE_BLOCK = 16384


@functools.partial(jax.jit, static_argnames=("rounds", "ct"))
def _normalize_repeat_kernel(
    test_data,  # [n] masked pass-space sample values
    global_idx,  # int32[n - ct, k] neighbour indexes into [n]
    dist_ok,  # bool[n - ct, k] distance < optimal cutoff
    ct: int,
    rounds: int = 3,
):
    """The reference's three-round z-masked normalization
    (predict_tools.py:94-142), fully vectorized over target bins.

    ``test_copy`` starts as the sample and accumulates -1 sentinels at bins
    whose |z| crossed the threshold in any earlier round, so that they stop
    serving as references; statistics always use the *original* values
    (``test_data``) for the targets themselves.  The neighbour gather +
    masked statistics run as a sequential map over fixed-size row blocks.
    """
    targets = test_data[ct:]
    m, k = global_idx.shape
    block = min(NORMALIZE_BLOCK, max(8, m))
    n_blocks = -(-m // block)
    pad = n_blocks * block - m
    gi = jnp.pad(global_idx, ((0, pad), (0, 0))).reshape(n_blocks, block, k)
    ok = jnp.pad(dist_ok, ((0, pad), (0, 0))).reshape(n_blocks, block, k)

    def one_round(test_copy):
        def per_block(args):
            gi_b, ok_b = args
            neigh = test_copy[gi_b]  # [block, k]
            valid = ok_b & (neigh >= 0)
            return (
                masked_mean(neigh, valid),
                masked_std(neigh, valid),
                masked_median(neigh, valid),
                jnp.sum(valid, axis=1),
            )

        mean, std, med, sizes = jax.lax.map(per_block, (gi, ok))
        mean = mean.reshape(-1)[:m]
        std = std.reshape(-1)[:m]
        med = med.reshape(-1)[:m]
        ref_sizes = sizes.reshape(-1)[:m]
        z = (targets - mean) / std
        r = targets / med
        return z, r, ref_sizes

    test_copy = test_data
    z = r = ref_sizes = None
    for _ in range(rounds):
        z, r, ref_sizes = one_round(test_copy)
        aberrant = jnp.abs(z) >= Z_MASK_THRESHOLD  # NaN -> False, as in numpy
        test_copy = test_copy.at[ct:].set(
            jnp.where(aberrant, -1.0, test_copy[ct:])
        )

    log_r = jnp.log2(r)
    m_lr = jnp.nanmedian(log_r)
    m_z = jnp.nanmedian(z)
    return z, r, ref_sizes, m_lr, m_z


def normalize_repeat(
    test_data: np.ndarray,
    global_idx: np.ndarray,
    distances: np.ndarray,
    optimal_cutoff: float,
    ct: int = 0,
    rounds: int = 3,
):
    """Run the within-sample normalization for one pass.

    Parameters
    ----------
    test_data : [n] masked, coverage-normalized, PCA-projected sample.
    global_idx : int[n - ct, k] global-space neighbour indexes for the
        target rows (``ct`` is the first target row: 0 for the autosomal
        pass, the pre-gonosomal bin count for F/M passes —
        reference predict_control.py:22-29).
    distances : [n - ct, k] neighbour distances for the target rows.

    Returns (z, r, ref_sizes, m_lr, m_z) over the target rows.
    """
    dist_ok = np.asarray(distances) < optimal_cutoff
    z, r, ref_sizes, m_lr, m_z = _normalize_repeat_kernel(
        jnp.asarray(test_data),
        jnp.asarray(global_idx, dtype=jnp.int32),
        jnp.asarray(dist_ok),
        ct=int(ct),
        rounds=rounds,
    )
    return (
        np.asarray(z),
        np.asarray(r),
        np.asarray(ref_sizes, dtype=np.float64),
        float(m_lr),
        float(m_z),
    )
