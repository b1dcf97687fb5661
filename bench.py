#!/usr/bin/env python3
"""Benchmark harness — measures the PRODUCT, not just the kernels.

Headline metric: cold-process wall of the real ``newref`` CLI at 15 kb
bins with 500 reference samples — the workload whose O(bins^2 x samples)
Python loop made the reference's predecessor take ~24 h (reference
README.md:10-11) — including npz parsing, compile residual, KNN, null
ratios, reference npz write, and QC.  ``vs_baseline`` extrapolates the
reference implementation's own KNN loop (newref_tools.py:255-278) timed
on a row slice of identical data (the loop is embarrassingly parallel
over rows, so linear extrapolation is exact up to constants; the npz
parsing the reference would also pay is NOT charged to it).

Also reported (stderr JSON lines, recorded in the driver's bench tail):

* ``predict_e2e_wall_s``   — cold ``predict --bed`` CLI wall for one
  sample against the 500-sample reference: normalize + full 23-chr CBS +
  segment z + tables.
* ``predict_batch_s_per_sample`` — cold ``predict-batch --bed`` CLI wall
  over a plate, amortized per sample (the production batch path).

Synthetic convert-npz cohorts are cached under
``~/.cache/wcx_bench_cohort`` keyed by (binsize, samples, scale) so
repeat runs skip the ~minutes of Poisson draws + npz writes.

Environment knobs: WCX_BENCH_BINSIZE, WCX_BENCH_SAMPLES, WCX_BENCH_SCALE,
WCX_BENCH_PREDICT_BATCH, WCX_BENCH_REF_SLICE.
"""

import json
import os
import subprocess
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def metric(name, value, unit):
    log(json.dumps({"metric": name, "value": round(value, 2), "unit": unit}))


def build_cohort(binsize, n_samples, scale):
    """Generate (or reuse) a cohort of convert-npz files + test samples."""
    sys.path.insert(0, os.path.join(REPO, "tests"))
    from synthetic import CohortSim

    from wisecondorx_tpu.io.npz import save_sample_npz

    tag = f"b{int(binsize)}_s{n_samples}_g{scale:g}"
    root = os.path.expanduser(f"~/.cache/wcx_bench_cohort/{tag}")
    done = os.path.join(root, ".complete")
    files = [os.path.join(root, f"ref{i:04d}.npz") for i in range(n_samples)]
    trisomy = os.path.join(root, "test_t21.npz")
    if os.path.exists(done):
        return files, trisomy
    os.makedirs(root, exist_ok=True)
    t0 = time.perf_counter()
    sim = CohortSim(
        binsize=binsize, genome_scale=scale, mean_reads_per_bin=100.0,
        seed=7,
    )
    qual = {"filter_rmdup": 0, "filter_mapq": 0, "pre_retro": 0,
            "post_retro": 0}
    for i, path in enumerate(files):
        s = sim.sample(gender="F" if i % 2 else "M")
        save_sample_npz(path, int(binsize), s, qual)
        if i % 100 == 99:
            log(f"cohort: {i + 1}/{n_samples} files")
    n21 = len(sim.bias[20])
    t = sim.sample(gender="F", cnvs=[(21, 0, n21, 3.0)])
    save_sample_npz(trisomy, int(binsize), t, qual)
    open(done, "w").write("ok")
    log(f"cohort generated in {time.perf_counter() - t0:.0f}s -> {root}")
    return files, trisomy


def reference_baseline(binsize, n_samples, scale, slice_rows):
    """Extrapolate the reference's pure-Python KNN loop on identical-shape
    data; returns estimated total seconds for the newref hot loop alone."""
    sys.path.insert(0, "/root/reference/src")
    from wisecondorx.newref_tools import get_ref_for_bins

    chr_mbp = np.array(
        [248, 242, 198, 190, 181, 171, 159, 145, 138, 133, 135, 133, 114,
         107, 102, 90, 83, 80, 59, 64, 47, 51, 156, 57], dtype=float)
    bins = int((chr_mbp * 1e6 * scale / binsize).astype(np.int64).sum())
    n_masked = int(bins * 0.93)
    rng = np.random.default_rng(0)
    data = rng.random((n_masked, n_samples))
    data /= data.sum(axis=0, keepdims=True)
    chr1 = int(chr_mbp[0] * 1e6 * scale / binsize * 0.93)
    tb = time.perf_counter()
    get_ref_for_bins(300, 0, slice_rows, data, data[chr1:, :])
    t_slice = time.perf_counter() - tb
    est = t_slice / slice_rows * n_masked
    log(
        f"reference slice: {slice_rows} rows in {t_slice:.2f}s "
        f"-> est {est:.0f}s total ({est / 3600:.1f}h) for the KNN loop alone"
    )
    return est


def run_cli(args, tag):
    """Run the CLI in a COLD subprocess; returns (wall s, channel-init s).

    The tunneled axon TPU pays a 50-900 s one-time d2h channel init per
    process — an environment artifact absent on directly attached TPU
    hosts.  The CLI logs it; it is parsed out and reported alongside so
    the product wall is attributable.  (The axon compile service caches
    compiled programs across processes, so these runs are cold-process /
    warm-service — stated in the metrics.)
    """
    cmd = [sys.executable, "-m", "wisecondorx_tpu.cli", *args]
    env = dict(os.environ)
    env["PYTHONPATH"] = (
        REPO + os.pathsep + env.get("PYTHONPATH", "")
    )
    t0 = time.perf_counter()
    proc = subprocess.run(
        cmd, capture_output=True, text=True, env=env, timeout=5400
    )
    wall = time.perf_counter() - t0
    chan = 0.0
    for line in proc.stderr.split("\n"):
        if "d2h readback channel live after" in line:
            chan = float(line.rsplit(" ", 1)[-1].rstrip("s"))
    tail = "\n".join(proc.stderr.strip().split("\n")[-12:])
    log(
        f"--- {tag}: rc={proc.returncode} wall={wall:.1f}s "
        f"(channel-init {chan:.1f}s)\n{tail}"
    )
    if proc.returncode != 0:
        raise RuntimeError(f"{tag} failed (rc={proc.returncode})")
    return wall, chan


def main():
    binsize = float(os.environ.get("WCX_BENCH_BINSIZE", 15000))
    n_samples = int(os.environ.get("WCX_BENCH_SAMPLES", 500))
    scale = float(os.environ.get("WCX_BENCH_SCALE", 1.0))
    batch_n = int(os.environ.get("WCX_BENCH_PREDICT_BATCH", 32))
    slice_rows = max(2, int(os.environ.get("WCX_BENCH_REF_SLICE", 6)))

    import jax

    dev = jax.devices()[0]
    log(f"device: {dev.platform} {getattr(dev, 'device_kind', '')}")

    import tempfile

    work = tempfile.mkdtemp(prefix="wcx_bench_")
    files, trisomy = build_cohort(binsize, n_samples, scale)
    ref_est = reference_baseline(binsize, n_samples, scale, slice_rows)

    # ---- newref, cold end-to-end ----
    ref_npz = os.path.join(work, "reference.npz")
    newref_wall, newref_chan = run_cli(
        ["newref", *files, ref_npz, "--binsize", str(int(binsize))],
        "newref e2e",
    )
    metric("newref_e2e_wall_s", newref_wall, "s")
    metric("newref_e2e_minus_tunnel_init_s", newref_wall - newref_chan, "s")
    log(
        f"reference npz: {os.path.getsize(ref_npz) / 2**20:.0f} MB"
    )

    # ---- predict, cold end-to-end (one sample) ----
    outid = os.path.join(work, "t21")
    predict_wall, chan = run_cli(
        ["predict", trisomy, ref_npz, outid, "--bed"], "predict e2e"
    )
    metric("predict_e2e_wall_s", predict_wall, "s")
    metric("predict_e2e_minus_tunnel_init_s", predict_wall - chan, "s")
    aber = open(outid + "_aberrations.bed").read().strip().split("\n")
    log(f"aberrations called: {aber[1:] if len(aber) > 1 else 'NONE'}")

    # ---- predict-batch, cold, amortized ----
    plate = files[:batch_n - 1] + [trisomy]
    outdir = os.path.join(work, "plate")
    batch_wall, chan = run_cli(
        ["predict-batch", ref_npz, outdir, "--bed", "--infiles", *plate],
        f"predict-batch x{len(plate)}",
    )
    metric("predict_batch_s_per_sample", batch_wall / len(plate), "s")
    metric(
        "predict_batch_s_per_sample_minus_tunnel_init",
        (batch_wall - chan) / len(plate), "s",
    )

    # Headline: the tunnel-corrected wall.  The raw cold-process wall is
    # reported above (newref_e2e_wall_s), but the axon tunnel's one-time
    # d2h channel init is measured at 1.8 s to 984 s across consecutive
    # identical processes — pure harness noise that does not exist on
    # directly attached TPU hosts — so the comparable product number
    # excludes exactly that one measured wait and nothing else.
    corrected = newref_wall - newref_chan
    print(
        json.dumps(
            {
                "metric": "newref_e2e_15kb_500samples_minus_tunnel_s",
                "value": round(corrected, 2),
                "unit": "s",
                "vs_baseline": round(ref_est / corrected, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
