"""Kill-and-resume test for the newref checkpoint mechanism (the analogue
of the reference's staged temp-file recovery, newref_control.py:56-106)."""

import copy
import os

import numpy as np
import pytest

from synthetic import CohortSim
from wisecondorx_tpu.models.reference import NewrefConfig, build_reference


@pytest.fixture(scope="module")
def cohort():
    sim = CohortSim(binsize=1e5, genome_scale=0.006, seed=77)
    samples, _ = sim.cohort(8, 7)
    return [(s, 100000) for s in samples]


def _cfg(ckpt_dir=None):
    return NewrefConfig(
        binsize=100000, refsize=20, col_tile=128,
        checkpoint_dir=ckpt_dir, knn_checkpoint_rows=1024,
    )


def _assert_passes_equal(a, b):
    assert a.keys() == b.keys()
    for g in a:
        for k in a[g]:
            np.testing.assert_array_equal(
                np.asarray(a[g][k]), np.asarray(b[g][k]), err_msg=f"{g}/{k}"
            )


def test_kill_and_resume_bit_identical(cohort, tmp_path):
    baseline, _ = build_reference(
        [(copy.deepcopy(s), bs) for s, bs in cohort], _cfg()
    )

    ckpt_dir = str(tmp_path / "ckpt")

    # Simulate a crash mid-build: abort after the first KNN chunk of the
    # F pass has been checkpointed.
    calls = {"n": 0}
    import wisecondorx_tpu.utils.checkpoint as ckpt_mod

    orig_save = ckpt_mod.NewrefCheckpoint.save

    def crashing_save(self, name, **arrays):
        orig_save(self, name, **arrays)
        if name.startswith("knn_F_"):
            calls["n"] += 1
            if calls["n"] >= 1:
                raise KeyboardInterrupt("simulated crash")

    ckpt_mod.NewrefCheckpoint.save = crashing_save
    try:
        with pytest.raises(KeyboardInterrupt):
            build_reference(
                [(copy.deepcopy(s), bs) for s, bs in cohort],
                _cfg(ckpt_dir),
            )
    finally:
        ckpt_mod.NewrefCheckpoint.save = orig_save

    # Artifacts exist: the whole A pass + the F prep + >= 1 KNN chunk.
    files = os.listdir(ckpt_dir)
    assert any(f.startswith("pass_A") for f in files)
    assert any(f.startswith("prep_F") for f in files)
    assert any(f.startswith("knn_F_") for f in files)

    # Resume: completed stages load from disk, the rest recomputes.
    resumed, _ = build_reference(
        [(copy.deepcopy(s), bs) for s, bs in cohort], _cfg(ckpt_dir)
    )
    _assert_passes_equal(baseline, resumed)
    # Success removes the checkpoint directory (reference cleanup parity).
    assert not os.path.exists(ckpt_dir)


def test_checkpoint_refuses_different_cohort(cohort, tmp_path):
    ckpt_dir = str(tmp_path / "ckpt2")
    full, _ = build_reference(
        [(copy.deepcopy(s), bs) for s, bs in cohort[:10]], _cfg()
    )
    # Seed a checkpoint from a different cohort subset, keep it on disk by
    # crashing before completion.
    import wisecondorx_tpu.utils.checkpoint as ckpt_mod

    orig_save = ckpt_mod.NewrefCheckpoint.save

    def crashing_save(self, name, **arrays):
        orig_save(self, name, **arrays)
        raise KeyboardInterrupt

    ckpt_mod.NewrefCheckpoint.save = crashing_save
    try:
        with pytest.raises(KeyboardInterrupt):
            build_reference(
                [(copy.deepcopy(s), bs) for s, bs in cohort],
                _cfg(ckpt_dir),
            )
    finally:
        ckpt_mod.NewrefCheckpoint.save = orig_save

    with pytest.raises(RuntimeError, match="different cohort"):
        build_reference(
            [(copy.deepcopy(s), bs) for s, bs in cohort[:10]],
            _cfg(ckpt_dir),
        )
