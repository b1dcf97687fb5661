"""Predict-stage parity: our predictor vs the reference's normalize /
post-process / log_trans chain driven on the same reference npz."""

import argparse
import copy

import numpy as np
import pytest

from synthetic import CohortSim
from wisecondorx_tpu.io import npz as io_npz
from wisecondorx_tpu.models.predictor import PredictConfig, predict_bins
from wisecondorx_tpu.models.reference import NewrefConfig, build_reference

#: Planted CNV: 3 copies (trisomy-like gain) across a chunk of chr14.
CNV = (14, 2, 5, 3.0)


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("predict")
    sim = CohortSim(binsize=1e5, genome_scale=0.006, seed=33)
    samples, _ = sim.cohort(8, 7)
    passes, meta = build_reference(
        [(copy.deepcopy(s), 100000) for s in samples],
        NewrefConfig(binsize=100000, refsize=25, col_tile=128),
    )
    ref_path = tmp / "ref.npz"
    io_npz.save_reference_npz(
        ref_path,
        passes,
        is_nipt=meta["is_nipt"],
        trained_cutoff=meta["trained_cutoff"],
    )
    test_sample = sim.sample("M", cnvs=[CNV])
    return sim, ref_path, test_sample


def _reference_predict(ref, ref_path, sample, minrefbins=10, maskrepeats=5):
    """Replication of reference main.py:167-271 (tool_test up to the results
    dict) calling the reference's own functions.  main.py itself cannot be
    imported here (it pulls in pysam via convert_tools), and project_pc is
    substituted with its own documented formula because the reference's
    hand-assembled sklearn PCA object crashes on sklearn>=1.5."""
    pt, pc, ot = ref["predict_tools"], ref["predict_control"], ref["overall_tools"]

    def project_pc(sample_data, ref_file, ap):
        components = ref_file[f"pca_components{ap}"]
        mean = ref_file[f"pca_mean{ap}"]
        coeffs = (sample_data - mean) @ components.T
        return sample_data / (coeffs @ components + mean)

    orig = pc.project_pc
    pc.project_pc = project_pc
    try:
        args = argparse.Namespace(
            minrefbins=minrefbins, maskrepeats=maskrepeats, blacklist=None
        )
        ref_file = np.load(ref_path, encoding="latin1", allow_pickle=True)
        sample = copy.deepcopy(sample)
        sample = ot.scale_sample(sample, 100000, int(ref_file["binsize"]))
        gender = pt.predict_gender(sample, ref_file["trained_cutoff"])
        assert not ref_file["is_nipt"]
        sample = ot.gender_correct(sample, gender)
        ref_gender = gender

        results_r, results_z, results_w, ref_sizes, m_lr, m_z = pc.normalize(
            args, sample, ref_file, "A"
        )
        null_ratios_aut = ref_file["null_ratios"]
        null_ratios_gon = ref_file[f"null_ratios.{ref_gender}"][
            len(null_ratios_aut):
        ]
        results_r_2, results_z_2, results_w_2, ref_sizes_2, _, _ = pc.normalize(
            args, sample, ref_file, ref_gender
        )

        rem_input = {
            "args": args,
            "binsize": int(ref_file["binsize"]),
            "ref_gender": ref_gender,
            "gender": gender,
            "mask": ref_file[f"mask.{ref_gender}"],
            "bins_per_chr": ref_file[f"bins_per_chr.{ref_gender}"],
            "masked_bins_per_chr": ref_file[
                f"masked_bins_per_chr.{ref_gender}"
            ],
            "masked_bins_per_chr_cum": ref_file[
                f"masked_bins_per_chr_cum.{ref_gender}"
            ],
        }

        results_r = np.append(results_r, results_r_2)
        results_z = np.append(results_z, results_z_2) - m_z
        results_w = np.append(
            results_w * np.nanmean(results_w_2),
            results_w_2 * np.nanmean(results_w),
        )
        results_w = results_w / np.nanmean(results_w)
        assert not (np.isnan(results_w).any() or np.isinf(results_w).any())
        ref_sizes = np.append(ref_sizes, ref_sizes_2)
        null_ratios = np.array(
            [x.tolist() for x in null_ratios_aut]
            + [x.tolist() for x in null_ratios_gon],
            dtype=object,
        )

        results = {
            "results_r": results_r,
            "results_z": results_z,
            "results_w": results_w,
            "results_nr": null_ratios,
        }
        for key in results.keys():
            results[key] = pc.get_post_processed_result(
                args, results[key], ref_sizes, rem_input
            )
        pt.log_trans(results, m_lr)
        return results, rem_input
    finally:
        pc.project_pc = orig


def test_predict_bins_matches_reference(ref_modules, setup):
    _, ref_path, test_sample = setup

    theirs, rem = _reference_predict(ref_modules, ref_path, test_sample)

    passes, meta = io_npz.load_reference_npz(ref_path)
    ours = predict_bins(
        copy.deepcopy(test_sample),
        100000,
        passes,
        meta,
        PredictConfig(minrefbins=10, maskrepeats=5),
    )

    assert ours.ref_gender == rem["ref_gender"]
    assert ours.gender == rem["gender"]
    n_chr = len(theirs["results_r"])
    assert len(ours.results_r) == n_chr

    for c in range(n_chr):
        np.testing.assert_allclose(
            ours.results_r[c], theirs["results_r"][c],
            rtol=1e-8, atol=1e-10, err_msg=f"results_r chr{c+1}",
        )
        np.testing.assert_allclose(
            ours.results_z[c], theirs["results_z"][c],
            rtol=1e-8, atol=1e-10, err_msg=f"results_z chr{c+1}",
        )
        np.testing.assert_allclose(
            ours.results_w[c], theirs["results_w"][c],
            rtol=1e-8, atol=1e-10, err_msg=f"results_w chr{c+1}",
        )
        # null-ratio rows: reference holds lists/0-scalars per bin
        for i, row in enumerate(theirs["results_nr"][c]):
            ours_row = ours.results_nr[c][i]
            if np.isscalar(row) or np.ndim(row) == 0:
                np.testing.assert_allclose(ours_row, 0.0)
            else:
                # Our nr table pads the narrower pass with NaN columns
                # (reference keeps ragged per-pass widths); the prefix must
                # match and the padding must be inert (NaN or zeroed).
                row_arr = np.asarray(row, dtype=float)
                np.testing.assert_allclose(
                    ours_row[: len(row_arr)], row_arr,
                    rtol=1e-8, atol=1e-10,
                    err_msg=f"results_nr chr{c+1} bin{i}",
                )
                pad = np.asarray(ours_row[len(row_arr):])
                assert np.all(np.isnan(pad) | (pad == 0))


def test_planted_cnv_visible(setup):
    _, ref_path, test_sample = setup
    passes, meta = io_npz.load_reference_npz(ref_path)
    ours = predict_bins(
        copy.deepcopy(test_sample),
        100000,
        passes,
        meta,
        PredictConfig(minrefbins=10, maskrepeats=5),
    )
    chr_idx, s, e, _ = CNV
    region_z = np.asarray(ours.results_z[chr_idx - 1][s:e])
    region_r = np.asarray(ours.results_r[chr_idx - 1][s:e])
    informative = region_r != 0
    assert informative.any()
    assert np.mean(region_z[informative]) > 5
    assert abs(np.mean(region_r[informative]) - np.log2(1.5)) < 0.15
