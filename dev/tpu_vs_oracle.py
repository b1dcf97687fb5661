"""Round-5 TPU-vs-f64-oracle KNN differential (verify-skill drive).

Runs the fused Pallas kernel on the real chip over a production-shaped
problem, then the float64 'sort' oracle in a CPU subprocess on identical
data; reports neighbour-set agreement and distance error.
"""
import os, subprocess, sys, time
sys.path.insert(0, "/root/repo")
import numpy as np

rows, n_chr, S, K = 8192, 22, 500, 300
chr_mbp = np.linspace(250, 45, n_chr)
sizes = (chr_mbp / chr_mbp.sum() * 65536).astype(np.int64)
n = int(sizes.sum())
starts = np.concatenate([[0], np.cumsum(sizes)[:-1]])
chr_of = np.repeat(np.arange(n_chr, dtype=np.int32), sizes)
rng = np.random.default_rng(2026)
data = (1.0 + 0.03 * rng.standard_normal((n, S))).astype(np.float32)
np.save("/tmp/oracle_data.npy", data)
np.save("/tmp/oracle_chr.npy", chr_of)
np.save("/tmp/oracle_starts.npy", starts)
np.save("/tmp/oracle_sizes.npy", sizes)

import jax
print("backend:", jax.default_backend(), file=sys.stderr)
from wisecondorx_tpu.ops.knn import knn_search
t0 = time.perf_counter()
idx_tpu, dist_tpu = knn_search(
    data, chr_of, starts, sizes, ref_size=K, row_range=(0, rows)
)
print(f"tpu pallas search: {time.perf_counter()-t0:.1f}s", file=sys.stderr)
np.save("/tmp/oracle_idx_tpu.npy", idx_tpu)
np.save("/tmp/oracle_dist_tpu.npy", dist_tpu)

oracle_src = r'''
import os, sys, time
os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import numpy as np
from wisecondorx_tpu.ops.knn import knn_search
data = np.load("/tmp/oracle_data.npy").astype(np.float64)
chr_of = np.load("/tmp/oracle_chr.npy")
starts = np.load("/tmp/oracle_starts.npy")
sizes = np.load("/tmp/oracle_sizes.npy")
t0 = time.perf_counter()
idx, dist = knn_search(
    data, chr_of, starts, sizes, ref_size=300, row_range=(0, 8192),
    merge_method="sort", col_tile=4096,
)
print(f"cpu f64 oracle: {time.perf_counter()-t0:.1f}s", file=sys.stderr)
np.save("/tmp/oracle_idx_cpu.npy", idx)
np.save("/tmp/oracle_dist_cpu.npy", dist)
'''
subprocess.run([sys.executable, "-c", oracle_src], check=True)

idx_cpu = np.load("/tmp/oracle_idx_cpu.npy")
dist_cpu = np.load("/tmp/oracle_dist_cpu.npy")
agree = np.array([
    len(np.intersect1d(idx_tpu[i], idx_cpu[i])) for i in range(rows)
]) / K
d_t = np.sort(dist_tpu, axis=1)
d_c = np.sort(dist_cpu, axis=1)
rel = np.abs(d_t - d_c) / np.maximum(d_c, 1e-30)
print(f"rows={rows} cands={n} samples={S} k={K}")
print(f"neighbour-set agreement: mean {agree.mean()*100:.3f}% "
      f"min {agree.min()*100:.2f}% (rows <99%: {(agree < 0.99).sum()})")
print(f"kth-distance rel err: median {np.median(rel):.2e} "
      f"max {rel.max():.2e}")
