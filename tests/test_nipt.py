"""NIPT-mode behavior: no gender correction, no male pass, F gonosomal
reference for every sample (reference main.py:73-80, 118, 179-187)."""

import copy

import numpy as np
import pytest

from synthetic import CohortSim
from wisecondorx_tpu.models.predictor import PredictConfig, predict_bins
from wisecondorx_tpu.models.reference import NewrefConfig, build_reference


@pytest.fixture(scope="module")
def nipt_ref():
    sim = CohortSim(binsize=1e5, genome_scale=0.006, seed=77)
    # NIPT cohort: pregnancies are "F"-like with some male feti (small
    # chrY fraction); use female samples as the cohort.
    samples, _ = sim.cohort(8, 6)
    passes, meta = build_reference(
        [(copy.deepcopy(s), 100000) for s in samples],
        NewrefConfig(binsize=100000, refsize=25, nipt=True, col_tile=128),
    )
    return sim, passes, meta


def test_nipt_reference_structure(nipt_ref):
    _, passes, meta = nipt_ref
    assert meta["is_nipt"] is True
    assert "M" not in passes  # no male gonosomal pass in NIPT mode
    assert "A" in passes and "F" in passes


def test_nipt_predict_uses_female_pass(nipt_ref):
    sim, passes, meta = nipt_ref
    case = sim.sample("M")  # male fetus -> male-looking chrY fraction
    bins = predict_bins(
        copy.deepcopy(case), 100000, passes, meta,
        PredictConfig(minrefbins=10),
    )
    assert bins.ref_gender == "F"
    assert bins.gender == "M"  # sex still reported from the GMM
    assert len(bins.results_r) == 23  # F layout: chr1..X


def test_nipt_no_gender_correction(nipt_ref):
    """In NIPT mode male samples must NOT have gonosome counts doubled."""
    sim, passes, meta = nipt_ref
    case = sim.sample("M")
    original_23 = case["23"].copy()
    predict_bins(
        copy.deepcopy(case), 100000, passes, meta,
        PredictConfig(minrefbins=10),
    )
    np.testing.assert_array_equal(case["23"], original_23)


def test_nipt_demoted_without_females():
    """<5 F samples + --nipt: the flag is dropped with a warning
    (reference main.py:73-77)."""
    sim = CohortSim(binsize=1e5, genome_scale=0.006, seed=78)
    samples, _ = sim.cohort(3, 9)
    passes, meta = build_reference(
        [(copy.deepcopy(s), 100000) for s in samples],
        NewrefConfig(binsize=100000, refsize=20, nipt=True, col_tile=128),
    )
    assert meta["is_nipt"] is False
    assert "M" in passes  # male pass built since nipt was demoted


def test_blacklist_zeroes_regions(nipt_ref, tmp_path):
    sim, passes, meta = nipt_ref
    case = sim.sample("F")
    bl = tmp_path / "blacklist.bed"
    # blacklist most of chr5 (0-based chr index 4)
    bl.write_text("chr5\t0\t2000000\n5\t2000000\t4000000\n")
    cfg = PredictConfig(minrefbins=10, blacklist=str(bl))
    bins = predict_bins(copy.deepcopy(case), 100000, passes, meta, cfg)
    assert np.all(np.asarray(bins.results_r[4][:40]) == 0)
    assert np.all(np.asarray(bins.results_z[4][:40]) == 0)
    assert np.all(np.asarray(bins.results_w[4][:40]) == 0)
