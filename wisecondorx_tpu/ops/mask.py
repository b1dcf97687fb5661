"""Usability-mask construction (reference newref_tools.py:77-102).

A bin is usable when, after per-sample depth normalization, the summed
coverage across samples exceeds 5% of the median nonzero per-bin coverage
(the 5%-floor is a reference-fork addition on top of the upstream
zero-coverage mask; SURVEY.md 2.6).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from wisecondorx_tpu.ops.common import masked_median


@jax.jit
def _mask_kernel(all_data):
    sum_per_sample = jnp.sum(all_data, axis=0)
    normed = all_data / sum_per_sample
    sum_per_bin = jnp.sum(normed, axis=1)
    median_cov = masked_median(sum_per_bin, sum_per_bin > 0, axis=0)
    return sum_per_bin > (0.05 * median_cov)


def get_mask(matrix: np.ndarray) -> np.ndarray:
    """Compute the usability mask for a dense [total_bins, n_samples] matrix.

    Returns bool[total_bins].
    """
    return np.asarray(_mask_kernel(jnp.asarray(matrix)))


@jax.jit
def depth_normalize(matrix):
    """Per-sample depth normalization: each column / its total.

    Matches reference newref_tools.py:124-125 / predict_tools.py:44-45.
    """
    return matrix / jnp.sum(matrix, axis=0)
