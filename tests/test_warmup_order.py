"""Warm-up choreography contract (round-5 fix): the A-pass
normalization kernel must compile BEFORE the CBS bucket warm-ups start
— GIL-bound CBS tracing threads starved the critical A compile from
~7 s to 18-45 s on the 2-core bench host (BENCH_r04's 44.6 s
normalize_autosomes)."""

import threading

import numpy as np
import pytest

from synthetic import CohortSim
from wisecondorx_tpu.io import npz as io_npz
from wisecondorx_tpu.models.reference import NewrefConfig, build_reference
from wisecondorx_tpu.utils import warmup as warmup_mod


@pytest.fixture(scope="module")
def tiny_reference(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("warmord")
    sim = CohortSim(binsize=1e5, genome_scale=0.004, seed=13)
    samples, _ = sim.cohort(6, 5)
    passes, meta = build_reference(
        [(s, 100000) for s in samples],
        NewrefConfig(binsize=100000, refsize=10),
    )
    path = str(tmp / "ref.npz")
    io_npz.save_reference_npz(
        path, passes,
        is_nipt=meta["is_nipt"], trained_cutoff=meta["trained_cutoff"],
    )
    return path


def test_cbs_warm_starts_only_after_a_pass_compile(
    tiny_reference, monkeypatch
):
    import jax

    from wisecondorx_tpu.ops import normalize as norm_mod

    events = []
    lock = threading.Lock()

    real_kernel = norm_mod._normalize_repeat_kernel

    def spying_kernel(*a, **k):
        with lock:
            events.append("normalize-kernel")
        return real_kernel(*a, **k)

    def spying_cbs(n_max, cfg=None, **k):
        with lock:
            events.append("cbs-warm-start")
        done = threading.Event()
        done.set()
        return done

    monkeypatch.setattr(
        norm_mod, "_normalize_repeat_kernel", spying_kernel
    )
    monkeypatch.setattr(warmup_mod, "start_cbs_warmup", spying_cbs)
    # The warm-up is TPU-gated; force it on (the kernels compile fine on
    # CPU at these tiny shapes).
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")

    warmup_mod.set_predict_gender_hint("F")
    done = warmup_mod.start_predict_warmup(tiny_reference)
    assert done.wait(timeout=120)

    with lock:
        seq = list(events)
    assert "cbs-warm-start" in seq, seq
    assert "normalize-kernel" in seq, seq
    # The FIRST normalize-kernel compile (the A pass) precedes the CBS
    # warm start; the gonosomal warm may come after.
    assert seq.index("normalize-kernel") < seq.index("cbs-warm-start"), seq


def test_cbs_warm_survives_a_pass_failure(tiny_reference, monkeypatch):
    """Degraded mode: a transient A-warm failure must not forfeit the
    CBS warm track (review finding on the round-5 reordering)."""
    import jax

    from wisecondorx_tpu.ops import normalize as norm_mod

    started = threading.Event()

    def failing_kernel(*a, **k):
        raise RuntimeError("transient compile-service error")

    def spying_cbs(n_max, cfg=None, **k):
        started.set()
        done = threading.Event()
        done.set()
        return done

    monkeypatch.setattr(
        norm_mod, "_normalize_repeat_kernel", failing_kernel
    )
    monkeypatch.setattr(warmup_mod, "start_cbs_warmup", spying_cbs)
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")

    warmup_mod.set_predict_gender_hint("F")
    done = warmup_mod.start_predict_warmup(tiny_reference)
    assert done.wait(timeout=120)
    assert started.is_set(), "CBS warm track skipped after A-warm failure"
