"""Measure jax.lax.sort runtime (and compile wall) for the CBS shuffle."""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
from wisecondorx_tpu.utils.device import warm_readback_channel  # noqa: E402


def main():
    warm_readback_channel().wait(timeout=900)
    for n_pad, B in ((16384, 4096), (2048, 16384)):
        rng = np.random.default_rng(0)
        keys = jnp.asarray(
            rng.integers(0, 2**31, (B, n_pad)).astype(np.uint32)
        )
        w = jnp.asarray(rng.random((B, n_pad), dtype=np.float32))
        wx = jnp.asarray(rng.random((B, n_pad), dtype=np.float32))

        f = jax.jit(
            lambda k, a, b: jax.lax.sort(
                (k, a, b), dimension=1, is_stable=False, num_keys=1
            )
        )
        t0 = time.perf_counter()
        out = jax.block_until_ready(f(keys, w, wx))
        print(
            f"n_pad={n_pad} B={B} compile+first: "
            f"{time.perf_counter()-t0:.1f}s",
            file=sys.stderr, flush=True,
        )
        t0 = time.perf_counter()
        for _ in range(3):
            out = jax.block_until_ready(f(keys, w, wx))
        print(
            f"n_pad={n_pad} B={B} sort run: "
            f"{(time.perf_counter()-t0)/3*1000:.0f} ms",
            file=sys.stderr, flush=True,
        )
        del out


if __name__ == "__main__":
    main()
