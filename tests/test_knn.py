"""Parity tests: KNN within-sample reference search vs the reference's
bisect-insertion loop (newref_tools.py:155-278)."""

import random

import numpy as np
import pytest

from synthetic import CohortSim
from wisecondorx_tpu.genome import MaskedLayout, samples_to_matrix
from wisecondorx_tpu.ops import knn as knn_ops
from wisecondorx_tpu.ops import mask as mask_ops
from wisecondorx_tpu.ops import pca as pca_ops


def _prepped(genome_scale=0.015, n_f=8, n_m=6, seed=11, last_chr=22):
    sim = CohortSim(binsize=1e5, genome_scale=genome_scale, seed=seed)
    samples, _ = sim.cohort(n_f, n_m)
    matrix, layout = samples_to_matrix(samples)
    mask = mask_ops.get_mask(matrix)
    tl = layout.truncated(last_chr)
    tm = mask[: tl.total_bins]
    normed = np.asarray(mask_ops.depth_normalize(matrix[: tl.total_bins]))
    masked = normed[tm]
    corrected, _, _ = pca_ops.train_pca(masked)
    ml = MaskedLayout(tl, tm)
    return corrected, ml


@pytest.fixture(scope="module")
def prepped():
    return _prepped()


def test_knn_matches_reference(ref_modules, prepped):
    corrected, ml = prepped
    ref_size = 60

    ref_idx, ref_dist, _ = ref_modules["newref_tools"].get_reference(
        corrected,
        ml.masked_bins_per_chr,
        ml.masked_bins_per_chr_cum,
        ref_size=ref_size,
        part=1,
        split_parts=1,
    )

    idx, dist = knn_ops.knn_search(
        corrected,
        ml.chr_of_masked_bin,
        ml.masked_chr_starts,
        ml.masked_bins_per_chr,
        ref_size=ref_size,
        col_tile=256,
    )

    np.testing.assert_allclose(dist, ref_dist, rtol=1e-9, atol=1e-12)
    np.testing.assert_array_equal(idx, ref_idx)


def test_knn_row_tiling_consistent(prepped):
    corrected, ml = prepped
    full_idx, full_dist = knn_ops.knn_search(
        corrected,
        ml.chr_of_masked_bin,
        ml.masked_chr_starts,
        ml.masked_bins_per_chr,
        ref_size=40,
        col_tile=128,
    )
    tiled_idx, tiled_dist = knn_ops.knn_search(
        corrected,
        ml.chr_of_masked_bin,
        ml.masked_chr_starts,
        ml.masked_bins_per_chr,
        ref_size=40,
        col_tile=512,
        row_tile=173,
    )
    np.testing.assert_array_equal(full_idx, tiled_idx)
    np.testing.assert_allclose(full_dist, tiled_dist, rtol=1e-12)


def test_knn_unfilled_slots_sentinels(ref_modules):
    """ref_size larger than the candidate pool -> -1 / 1e10 sentinel slots."""
    corrected, ml = _prepped(genome_scale=0.0012, n_f=6, n_m=5, seed=5)
    ref_size = corrected.shape[0]  # guaranteed > candidates per row

    ref_idx, ref_dist, _ = ref_modules["newref_tools"].get_reference(
        corrected,
        ml.masked_bins_per_chr,
        ml.masked_bins_per_chr_cum,
        ref_size=ref_size,
        part=1,
        split_parts=1,
    )
    idx, dist = knn_ops.knn_search(
        corrected,
        ml.chr_of_masked_bin,
        ml.masked_chr_starts,
        ml.masked_bins_per_chr,
        ref_size=ref_size,
        col_tile=128,
    )
    assert (idx == -1).any(), "expected unfilled sentinel slots in this setup"
    np.testing.assert_array_equal(idx, ref_idx)
    np.testing.assert_allclose(dist, ref_dist, rtol=1e-9, atol=1e-12)


def test_gonosome_pass_rows(ref_modules):
    """F-pass (23 chromosomes): only chrX rows are searched; the reference
    emits zero/one placeholders for autosome rows (newref_tools.py:186-191)."""
    corrected, ml = _prepped(genome_scale=0.01, last_chr=23, seed=13)
    ref_size = 30

    ref_idx, ref_dist, _ = ref_modules["newref_tools"].get_reference(
        corrected,
        ml.masked_bins_per_chr,
        ml.masked_bins_per_chr_cum,
        ref_size=ref_size,
        part=1,
        split_parts=1,
    )

    x_start = int(ml.masked_chr_starts[22])
    x_end = int(ml.masked_bins_per_chr_cum[22])
    idx, dist = knn_ops.knn_search(
        corrected,
        ml.chr_of_masked_bin,
        ml.masked_chr_starts,
        ml.masked_bins_per_chr,
        ref_size=ref_size,
        row_range=(x_start, x_end),
        col_tile=256,
    )
    np.testing.assert_array_equal(idx, ref_idx[x_start:x_end])
    np.testing.assert_allclose(
        dist, ref_dist[x_start:x_end], rtol=1e-9, atol=1e-12
    )
    # reference placeholder rows for autosomes
    assert (ref_idx[:x_start] == 0).all()
    assert (ref_dist[:x_start] == 1.0).all()


def test_null_ratios_match_reference(ref_modules, prepped):
    corrected, ml = prepped
    ref_size = 50

    random.seed(42)
    ref_idx, _, ref_null = ref_modules["newref_tools"].get_reference(
        corrected,
        ml.masked_bins_per_chr,
        ml.masked_bins_per_chr_cum,
        ref_size=ref_size,
        part=1,
        split_parts=1,
    )
    random.seed(42)
    chosen = random.sample(
        range(corrected.shape[1]), min(corrected.shape[1], 100)
    )

    ours = knn_ops.compute_null_ratios(corrected, ref_idx, np.array(chosen))
    np.testing.assert_allclose(ours, ref_null, rtol=1e-12, atol=0)


def test_null_ratios_jax_backend_matches_numpy(prepped):
    corrected, ml = prepped
    idx, _ = knn_ops.knn_search(
        corrected,
        ml.chr_of_masked_bin,
        ml.masked_chr_starts,
        ml.masked_bins_per_chr,
        ref_size=40,
        col_tile=256,
    )
    ids = np.arange(corrected.shape[1])
    a = knn_ops.compute_null_ratios(corrected, idx, ids, backend="numpy")
    b = knn_ops.compute_null_ratios(corrected, idx, ids, backend="jax")
    np.testing.assert_allclose(a, b, rtol=1e-10, atol=1e-12)
