"""Masked reductions used across the pipeline.

The reference repeatedly takes mean / std / median over *variable-size*
subsets selected by boolean conditions inside Python loops (e.g.
predict_tools.py:132-140).  On TPU, dynamic shapes are not jittable, so each
reduction here works on fixed-shape arrays plus a validity mask; the invalid
lanes are neutralized and empty selections yield NaN exactly like numpy's
reductions over empty arrays do.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

#: Explicit matmul precision for every device matmul in the pipeline.  On
#: TPU the default f32 "matmul" truncates inputs to bf16 (8 mantissa bits)
#: on the MXU — catastrophic for squared-distance and Gram computations
#: whose answers live many decades below the operand norms.  HIGHEST selects
#: the multi-pass f32 emulation; on CPU (the f64 parity path) it is a no-op.
MATMUL_PRECISION = jax.lax.Precision.HIGHEST


def masked_mean(x, valid, axis=-1):
    """Mean over ``valid`` lanes; NaN where no lane is valid (np.mean([]))."""
    n = jnp.sum(valid, axis=axis)
    s = jnp.sum(jnp.where(valid, x, 0.0), axis=axis)
    return s / n  # 0/0 -> NaN, matching np.mean of an empty slice


def masked_std(x, valid, axis=-1):
    """Population std (ddof=0, np.std default) over valid lanes; NaN if empty."""
    n = jnp.sum(valid, axis=axis)
    mean = masked_mean(x, valid, axis=axis)
    d = jnp.where(valid, x - jnp.expand_dims(mean, axis), 0.0)
    return jnp.sqrt(jnp.sum(d * d, axis=axis) / n)


def masked_median(x, valid, axis=-1):
    """Median over valid lanes (np.median semantics); NaN if empty.

    Sorts with invalid lanes pushed to +inf, then averages the two middle
    order statistics of the valid prefix.
    """
    x = jnp.asarray(x)
    big = jnp.where(valid, x, jnp.inf)
    s = jnp.sort(big, axis=axis)
    n = jnp.sum(valid, axis=axis)
    k = x.shape[axis]
    lo_idx = jnp.clip((n - 1) // 2, 0, k - 1)
    hi_idx = jnp.clip(n // 2, 0, k - 1)
    lo = jnp.take_along_axis(s, jnp.expand_dims(lo_idx, axis), axis=axis)
    hi = jnp.take_along_axis(s, jnp.expand_dims(hi_idx, axis), axis=axis)
    med = jnp.squeeze((lo + hi) * 0.5, axis=axis)
    return jnp.where(n > 0, med, jnp.nan)


def median_1d(x):
    """Plain median of a 1-D array (all lanes valid)."""
    return masked_median(x, jnp.ones(x.shape, dtype=bool))
