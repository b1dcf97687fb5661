"""Randomized differential campaign (round-4 validation sweep).

Runs many more randomized cases than the committed test suite:

1. CBS threshold-mode segmentation vs the exhaustive numpy oracle;
2. the engine's weighted Monte-Carlo split decision vs an independent
   numpy permutation oracle (clear-case agreement);
3. newref built PIPELINED (prep/search overlap threads) vs SEQUENTIAL
   (checkpointed path) — every schema array must be bit-identical;
4. predict: streamed-loader vs in-memory vs batched paths — per-bin
   tables must agree exactly (loader) / to fp-noise (vmapped batch);

The committed tests pin representative subsets of each; this drive
exists to grind many seeds in one go.  Usage:

    python dev/differential_campaign.py [n_cohorts] [n_cbs]
"""

import os
import sys
import tempfile

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))

from synthetic import CohortSim  # noqa: E402

from cbs_oracle import max_arc_t, segment_values  # noqa: E402
from wisecondorx_tpu.io import npz as io_npz  # noqa: E402
from wisecondorx_tpu.models.predictor import (  # noqa: E402
    PredictConfig,
    predict_bins,
)
from wisecondorx_tpu.models.ref_loader import ReferenceLoader  # noqa: E402
from wisecondorx_tpu.models.reference import (  # noqa: E402
    NewrefConfig,
    build_reference,
)
from wisecondorx_tpu.ops.cbs import CBSConfig, _segment_values  # noqa: E402
from wisecondorx_tpu.parallel.batch import predict_batch  # noqa: E402

failures = []


def check(name, cond, detail=""):
    status = "ok" if cond else "FAIL"
    print(f"  [{status}] {name} {detail}", flush=True)
    if not cond:
        failures.append((name, detail))


def cbs_sweep(n_cases):
    rng = np.random.default_rng(999)
    for t in range(n_cases):
        n = int(rng.integers(20, 260))
        y = rng.normal(0, 1, n)
        for _ in range(int(rng.integers(0, 4))):
            a = int(rng.integers(0, max(n - 6, 1)))
            b = min(n, a + int(rng.integers(4, 60)))
            y[a:b] += rng.choice([-1, 1]) * rng.uniform(1.0, 3.5)
        w = 10.0 ** rng.uniform(-2, 2, n)
        thr = float(rng.uniform(3.0, 6.5))
        cfg = CBSConfig(t_threshold=thr, exact_max=1 << 14)
        prod = _segment_values(y, w, cfg)
        oracle = segment_values(y, w, thr)
        check(f"cbs threshold case {t} (n={n} thr={thr:.2f})", prod == oracle)


def perm_decision_sweep(n_cases):
    """Engine Monte-Carlo decision vs an independent numpy permutation
    oracle, on cases whose oracle p sits clearly away from alpha."""
    rng = np.random.default_rng(4242)
    alpha = 0.01
    tried = 0
    used = 0
    while used < n_cases and tried < n_cases * 6:
        tried += 1
        n = int(rng.integers(36, 56))
        delta = float(rng.choice([0.0, 0.0, 3.5, 4.5]))
        y = rng.normal(0, 1, n)
        a = int(rng.integers(4, n - 16))
        y[a : a + 12] += delta
        w = 10.0 ** rng.uniform(-1.5, 1.5, n)
        obs, _, _ = max_arc_t(y, w)
        hits = 0
        n_perms = 900
        prng = np.random.default_rng(tried)
        for _ in range(n_perms):
            order = prng.permutation(n)
            t_p, _, _ = max_arc_t(y[order], w[order])
            hits += t_p >= obs
        p = (hits + 1) / (n_perms + 1)
        if alpha / 3 < p < alpha * 3:
            continue  # boundary case: genuinely random for any MC test
        used += 1
        cfg = CBSConfig(alpha=alpha, nperm=2000, seed=5, exact_max=1 << 14)
        segments = _segment_values(y, w, cfg)
        split = len(segments) > 1
        check(
            f"perm decision case {used} (p={p:.4f} delta={delta})",
            split == (p < alpha),
        )


def cohort_sweep(n_cohorts):
    rng = np.random.default_rng(777)
    for trial in range(n_cohorts):
        n_f = int(rng.integers(5, 9))
        n_m = int(rng.integers(5, 9))
        scale = float(rng.uniform(0.004, 0.008))
        seed = int(rng.integers(0, 2**31))
        sim = CohortSim(binsize=1e5, genome_scale=scale, seed=seed)
        samples, _ = sim.cohort(n_f, n_m)
        cohort = [(dict(s), 100000) for s in samples]
        cfg = NewrefConfig(
            binsize=100000, refsize=int(rng.integers(12, 26)), seed=3
        )

        # 3) pipelined (default) vs sequential (checkpointed) builds.
        passes_p, meta = build_reference(
            [(dict(s), bs) for s, bs in cohort], cfg
        )
        with tempfile.TemporaryDirectory() as ckdir:
            cfg_seq = NewrefConfig(
                binsize=100000, refsize=cfg.refsize, seed=3,
                checkpoint_dir=ckdir,
            )
            passes_s, _ = build_reference(
                [(dict(s), bs) for s, bs in cohort], cfg_seq
            )
        same = set(passes_p) == set(passes_s)
        detail = []
        if same:
            for g in passes_p:
                for k in io_npz.PASS_KEYS:
                    a, b = np.asarray(passes_p[g][k]), np.asarray(
                        passes_s[g][k]
                    )
                    if a.shape != b.shape or not np.array_equal(
                        a, b, equal_nan=True
                    ):
                        same = False
                        detail.append(f"{g}/{k}")
        check(
            f"pipelined==sequential build {trial} "
            f"(F={n_f} M={n_m} scale={scale:.4f})",
            same, ",".join(detail),
        )

        # 4) predict: loader vs in-memory vs batch.
        ref_dir = tempfile.TemporaryDirectory()
        path = os.path.join(ref_dir.name, "ref.npz")
        io_npz.save_reference_npz(
            path, passes_p, is_nipt=meta["is_nipt"],
            trained_cutoff=meta["trained_cutoff"],
        )
        chrom = int(rng.integers(0, 22))
        test = sim.sample(
            "F" if rng.random() < 0.5 else "M",
            cnvs=[(chrom, 1, 5, float(rng.choice([1.0, 3.0])))],
        )
        pcfg = PredictConfig(minrefbins=10, maskrepeats=5, seed=11)
        ref_passes, ref_meta = io_npz.load_reference_npz(path)
        mem = predict_bins(dict(test), 100000, ref_passes, ref_meta, pcfg)
        loader = ReferenceLoader(path)
        ld = predict_bins(
            dict(test), 100000, loader.passes, loader.meta, pcfg,
            loader=loader,
        )
        exact = all(
            np.array_equal(
                np.asarray(mem.results_r[c]), np.asarray(ld.results_r[c])
            )
            and np.array_equal(
                np.asarray(mem.results_z[c]), np.asarray(ld.results_z[c])
            )
            for c in range(len(mem.results_r))
        )
        check(f"loader==in-memory predict {trial}", exact)

        batch = predict_batch(
            [(dict(test), 100000)], ref_passes, ref_meta, pcfg
        )[0]
        close = all(
            np.allclose(
                np.asarray(mem.results_r[c]), np.asarray(batch.results_r[c]),
                atol=1e-9, rtol=1e-9, equal_nan=True,
            )
            for c in range(len(mem.results_r))
        )
        check(f"batch~=solo predict {trial}", close)
        ref_dir.cleanup()


if __name__ == "__main__":
    n_cohorts = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    n_cbs = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    print(f"== CBS threshold-mode differential ({n_cbs} cases) ==")
    cbs_sweep(n_cbs)
    print("== weighted perm decisions vs independent oracle ==")
    perm_decision_sweep(8)
    print(f"== cohort sweeps ({n_cohorts}) ==")
    cohort_sweep(n_cohorts)
    print()
    if failures:
        print(f"{len(failures)} FAILURES:")
        for name, detail in failures:
            print(" -", name, detail)
        sys.exit(1)
    print("campaign clean: all cases agree")
