"""Batched, data-parallel prediction.

The reference predicts one sample per process invocation; production NIPT
runs score plates of samples against one reference.  Here the predict hot
path (PCA projection + three-round z-masked normalization) is vmapped over
a sample batch and sharded over the mesh's "samples" axis — pure data
parallelism, no collectives.  Host-side pre/post-processing (coverage
normalization, combine, inflation, CBS input assembly) stays per-sample.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from wisecondorx_tpu.genome import GenomeLayout, MaskedLayout
from wisecondorx_tpu.models.predictor import (
    BinResults,
    PredictConfig,
    assemble_results,
    prepare_sample,
)
from wisecondorx_tpu.ops import normalize as norm_ops
from wisecondorx_tpu.ops import pca as pca_ops


@functools.partial(jax.jit, static_argnames=("ct", "rounds"))
def _batched_kernel(
    test_mat, components, mean, global_idx, dist_ok, ct: int, rounds: int = 3
):
    def one(tv):
        projected = pca_ops.project_sample(tv, components, mean)
        return norm_ops._normalize_repeat_kernel(
            projected, global_idx, dist_ok, ct=ct, rounds=rounds
        )

    return jax.vmap(one)(test_mat)


def _run_pass_batched(
    samples, ref_pass, ct, optimal_cutoff, mesh=None, chunk=8
):
    """Run one normalization pass for a batch of prepared samples.

    Returns per-sample tuples (z, r, weights, ref_sizes, m_lr, m_z).
    """
    bins_per_chr = np.asarray(ref_pass["bins_per_chr"])
    mask = np.asarray(ref_pass["mask"], dtype=bool)
    ml = MaskedLayout(GenomeLayout(bins_per_chr), mask)

    test_mat = np.stack(
        [
            norm_ops.coverage_normalize_and_mask(s, bins_per_chr, mask)
            for s in samples
        ]
    )
    components = jnp.asarray(ref_pass["pca_components"])
    mean = jnp.asarray(ref_pass["pca_mean"])
    distances = np.asarray(ref_pass["distances"])
    weights = norm_ops.get_weights(distances)[ct:]
    global_idx = ml.neighbour_to_global(np.asarray(ref_pass["indexes"]))[ct:]
    dist_ok = distances[ct:] < optimal_cutoff

    gi = jnp.asarray(global_idx, dtype=jnp.int32)
    ok = jnp.asarray(dist_ok)
    if mesh is not None:
        repl = NamedSharding(mesh, P())
        components = jax.device_put(components, repl)
        mean = jax.device_put(mean, repl)
        gi = jax.device_put(gi, repl)
        ok = jax.device_put(ok, repl)

    n_dev = mesh.devices.size if mesh is not None else 1
    chunk = max(chunk, n_dev)

    out = []
    for s0 in range(0, len(samples), chunk):
        block = test_mat[s0 : s0 + chunk]
        pad = -len(block) % n_dev
        if pad:
            block = np.concatenate([block, block[-1:].repeat(pad, axis=0)])
        tm = jnp.asarray(block)
        if mesh is not None:
            tm = jax.device_put(tm, NamedSharding(mesh, P("samples")))
        z, r, sizes, m_lr, m_z = _batched_kernel(
            tm, components, mean, gi, ok, ct=int(ct)
        )
        n_real = len(test_mat[s0 : s0 + chunk])
        for i in range(n_real):
            out.append(
                (
                    np.asarray(z[i]),
                    np.asarray(r[i]),
                    np.array(weights),
                    np.asarray(sizes[i], dtype=np.float64),
                    float(m_lr[i]),
                    float(m_z[i]),
                )
            )
    return out, ml


def predict_batch(
    samples_with_binsize,
    ref_passes,
    ref_meta,
    cfg: PredictConfig = PredictConfig(),
    mesh=None,
    chunk: int = 8,
) -> list[BinResults]:
    """Predict a batch of samples data-parallel.

    Per-sample results are identical to :func:`predict_bins` (verified by
    the batch-equivalence tests).
    """
    cfg.validate()
    prepped = [
        prepare_sample(s, bs, ref_passes, ref_meta, cfg)
        for s, bs in samples_with_binsize
    ]

    a_pass = ref_passes["A"]
    cutoff = norm_ops.get_optimal_cutoff(
        np.asarray(a_pass["distances"]), cfg.maskrepeats
    )

    a_out, _ = _run_pass_batched(
        [p[0] for p in prepped], a_pass, 0, cutoff, mesh, chunk
    )

    results: list = [None] * len(prepped)
    for gender in ("F", "M"):
        idxs = [i for i, p in enumerate(prepped) if p[2] == gender]
        if not idxs:
            continue
        g_pass = ref_passes[gender]
        g_cum = np.asarray(g_pass["masked_bins_per_chr_cum"])
        ct = int(g_cum[21])
        g_out, g_ml = _run_pass_batched(
            [prepped[i][0] for i in idxs], g_pass, ct, cutoff, mesh, chunk
        )
        for j, i in enumerate(idxs):
            z_g, r_g, w_g, sizes_g, _, _ = g_out[j]
            results[i] = assemble_results(
                a_out[i],
                (z_g, r_g, w_g, sizes_g),
                g_ml,
                a_pass,
                g_pass,
                cfg,
                ref_gender=gender,
                gender=prepped[i][1],
                n_reads=prepped[i][3],
            )
    return results
