"""Cold-process compile warm-up.

The axon TPU path compiles remotely (AOT over HTTP) and its PJRT plugin
cannot serialize executables back, so JAX's persistent compilation cache
never stores entries (ROADMAP.md): every fresh process pays the full
compile tax again — ~20 s for the fused Pallas KNN program, several
seconds each for the finalizer, PCA, and null-ratio programs.  That tax
does not have to sit on the critical path: all program shapes are known
the moment the cohort's bin/sample counts are, which is long before the
hot path runs (input npz parsing, mask building, and — in the benchmark —
the reference-baseline timing all happen first).

:func:`start_warmup` spawns a daemon thread that runs the production hot
path once on a synthetic device-generated cohort of *identical shapes*:
every jitted/Pallas program the real pass will request is thereby compiled
and cached in-process while the host does input work.  Results are never
fetched (``_warm_only``), the synthetic cohort generates on device (no
host link traffic), and a planted duplicate-row collision exercises the
exact-rerun path so its programs compile too.
"""

from __future__ import annotations

import functools
import logging
import threading
import time

import numpy as np


def _filler(n: int, s: int):
    """Deterministic pseudo-random device cohort in [1, 2) — a Knuth
    multiplicative hash over iota; generic enough that distances are
    distinct (no accidental bucket-overflow storms), no host upload."""
    import jax
    import jax.numpy as jnp

    @functools.partial(jax.jit, static_argnames=("n", "s"))
    def gen(*, n: int, s: int):
        i = jnp.arange(n * s, dtype=jnp.uint32).reshape(n, s)
        h = (i * jnp.uint32(2654435761)) ^ (i >> 7)
        return 1.0 + (h % jnp.uint32(65521)).astype(jnp.float32) / 65521.0

    return gen(n=n, s=s)


def _layout(n: int, n_chr: int):
    """Synthetic near-equal chromosome split — only the table SHAPES enter
    the compiled-program keys, not their contents."""
    base = n // n_chr
    sizes = np.full(n_chr, base, dtype=np.int64)
    sizes[: n - base * n_chr] += 1
    starts = np.concatenate([[0], np.cumsum(sizes)[:-1]])
    chr_of = np.repeat(np.arange(n_chr, dtype=np.int32), sizes)
    return chr_of, starts, sizes


def warm_newref_pass(
    n_bins: int,
    n_samples: int,
    *,
    ref_size: int = 300,
    n_chr: int = 22,
    gonosome_rows: int | None = None,
    n_chosen: int | None = None,
    n_pad: int | None = None,
    rows_pad: int | None = None,
    pca: bool = True,
    null_warm: bool = True,
    interpret: bool = False,
) -> None:
    """Compile every program of one newref pass's hot path (synchronous).

    ``gonosome_rows`` switches to the F/M-pass shape (only the last
    ``gonosome_rows`` target rows searched, autosome placeholder rows in
    the null table).  ``n_pad`` / ``rows_pad`` pin the planned paddings —
    pass the same values to the real calls so the warmed programs are the
    ones used.
    """
    import jax.numpy as jnp

    from wisecondorx_tpu.ops.knn import compute_null_ratios_device
    from wisecondorx_tpu.ops.knn_pallas import DEPTH, LANES, knn_search_pallas
    from wisecondorx_tpu.ops.pca import train_pca

    if n_chosen is None:
        n_chosen = min(100, n_samples)
    chr_of, starts, sizes = _layout(n_bins, n_chr)
    data = _filler(n_bins, n_samples)

    r0 = 0 if gonosome_rows is None else n_bins - gonosome_rows
    row_range = None if gonosome_rows is None else (r0, n_bins)

    # Plant DEPTH+2 duplicates of the first searched row in its residue
    # class mod LANES on other chromosomes: the bucket provably overflows,
    # the drop certificate flags the row, and the exact-rerun programs
    # compile (capped to one tile by _warm_only).
    cand = np.arange(r0 % LANES, n_bins, LANES)
    cand = cand[(cand != r0) & (chr_of[cand] != chr_of[r0])][: DEPTH + 2]
    if cand.size:
        data = data.at[jnp.asarray(cand.astype(np.int32))].set(data[r0])

    if pca:
        train_pca(data, return_device=True)

    dev_out: dict = {}
    knn_search_pallas(
        data, chr_of, starts, sizes,
        ref_size=ref_size, row_range=row_range, n_pad=n_pad,
        _warm_only=True, _device_out=dev_out, interpret=interpret,
    )
    if null_warm and "indexes" in dev_out:
        compute_null_ratios_device(
            data, dev_out["indexes"], np.arange(n_chosen),
            placeholder_rows=r0, rows_pad=rows_pad, fetch=False,
        )


def _header_shape(h: dict, gender: str):
    """(n_masked, k, ct) for one pass from its npz member headers — the
    same ct convention as models/ref_loader.pass_ct (which this reuses:
    the header dict carries masked_bins_per_chr_cum)."""
    from wisecondorx_tpu.models.ref_loader import pass_ct

    n = int(h["mask"].sum())
    k = int(h["indexes_shape"][1])
    return n, k, pass_ct(h, gender)


#: Resolved gonosomal pass for the current predict, set by the predictor
#: the moment prepare_sample decides it — lets the warm-up thread skip
#: compiling the pass that will not run (a third of the normalize warm).
_gender_hint: dict = {"event": threading.Event(), "gender": None}

#: Set once start_predict_warmup has been launched; predict() then skips
#: spawning its own CBS warm pool (a second pool splits the buckets with
#: the first and doubles the GIL-hungry tracing threads).
_predict_warm_started = False


def set_predict_gender_hint(gender: str) -> None:
    _gender_hint["gender"] = gender
    _gender_hint["event"].set()


def start_predict_warmup(ref_path, cfg=None):
    """Compile the predict hot-path programs while the reference npz's
    big tables (hundreds of MB of indexes/distances) decompress/upload.

    Only the npz's small members and the big members' HEADERS are read
    (io/npz.reference_npz_headers) — enough to pin every program shape.
    Two warm tracks run concurrently from t=0 (the axon compile service
    accepts parallel requests):

    * normalize track: the autosomal three-round normalization kernel +
      PCA projection first (needed first), then the gonosomal pass —
      narrowed to the gender the predictor resolves via
      :func:`set_predict_gender_hint` (waits briefly for the hint);
    * CBS track: every segment-size bucket for the largest chromosome,
      largest-first (:func:`start_cbs_warmup`) — started only AFTER the
      A-pass kernel has compiled.  Tracing is pure-Python (GIL-bound):
      on the 2-core bench host three concurrent CBS tracing threads
      starved the A-pass warm from ~7 s to 18-45 s (BENCH_r04's 44.6 s
      normalize_autosomes), and the A compile gates the first
      normalization while CBS is only needed two stages later — so the
      critical compile gets the interpreter to itself.

    Returns an Event set when the normalize track finishes.  No-op off-TPU.
    """
    import jax

    done = threading.Event()
    if jax.default_backend() != "tpu":
        done.set()
        return done

    def warm_normalize_pass(h, gender):
        import jax.numpy as jnp

        from wisecondorx_tpu.models.ref_loader import warm_upload_path
        from wisecondorx_tpu.ops.normalize import _normalize_repeat_kernel
        from wisecondorx_tpu.ops.pca import project_sample

        n, k, ct = _header_shape(h, gender)
        # Mirror production dtypes exactly: f64 host arrays downcast on
        # transfer under the default x64-off setting.
        test = jnp.asarray(np.zeros(n))
        gi = jnp.asarray(np.zeros((n - ct, k), np.int32))
        _normalize_repeat_kernel(test, gi, ct=ct)
        # The streamed sentinel upload's chunked concat + decode
        # programs (exact shapes) — otherwise their first compiles land
        # inside the upload stage.
        warm_upload_path(n - ct, k)
        comps = jnp.asarray(np.zeros((5, n)))
        project_sample(test, comps, jnp.asarray(np.zeros(n)))

    def run():
        t0 = time.perf_counter()
        try:
            from wisecondorx_tpu.io.npz import reference_npz_headers

            headers = reference_npz_headers(ref_path)
            max_chr_bins = max(
                int(np.max(h["bins_per_chr"])) for h in headers.values()
            )
            # Critical path first: nothing else traces until the A-pass
            # normalization kernel is compiled.  A transient A-warm
            # failure must not also forfeit the CBS warm track, so it
            # gets its own guard.
            try:
                warm_normalize_pass(headers["A"], "A")
                logging.info(
                    "predict normalize warm-up (A) done in %.1fs",
                    time.perf_counter() - t0,
                )
            except Exception as e:  # best-effort
                logging.warning("predict A-pass warm-up failed: %s", e)
            # CBS buckets have until predict.cbs (post-normalize,
            # post-postprocess) to finish; their remote compiles overlap
            # the normalize dispatch/fetch from here.
            start_cbs_warmup(max_chr_bins, _to_cbs_cfg(cfg), threads=2)
            _gender_hint["event"].wait(timeout=60)
            hint = _gender_hint["gender"]
            genders = (
                [hint] if hint in headers
                else [g for g in headers if g != "A"]
            )
            for gender in genders:
                warm_normalize_pass(headers[gender], gender)
            logging.info(
                "predict normalize warm-up done in %.1fs",
                time.perf_counter() - t0,
            )
        except Exception as e:  # best-effort
            logging.warning("predict warm-up failed: %s", e)
        finally:
            done.set()

    global _predict_warm_started
    _predict_warm_started = True

    threading.Thread(
        target=run, name="wcx-predict-warmup", daemon=True
    ).start()
    return done


def start_predict_batch_warmup(ref_path, chunk: int, cfg=None):
    """Compile the predict-batch hot-path programs (the vmapped
    normalization kernel for every pass at the fixed chunk shape, plus
    the CBS size buckets) while the reference npz and the plate's sample
    npzs load.  predict-batch previously compiled everything on demand —
    ~30-40 s of its wall.  Returns an Event; no-op off-TPU.
    """
    import jax

    done = threading.Event()
    if jax.default_backend() != "tpu":
        done.set()
        return done
    if len(jax.local_devices()) > 1:
        # Under a mesh, _run_pass_batched commits inputs with
        # NamedShardings; a plain default-device warm compile would be a
        # jit-cache MISS for the production call (sharding is part of
        # the executable key) — wasted work.  Warm CBS only.
        def run_cbs_only():
            try:
                from wisecondorx_tpu.io.npz import reference_npz_headers

                headers = reference_npz_headers(ref_path)
                start_cbs_warmup(
                    max(
                        int(np.max(h["bins_per_chr"]))
                        for h in headers.values()
                    ),
                    _to_cbs_cfg(cfg),
                )
            except Exception as e:  # best-effort
                logging.warning("predict-batch warm-up failed: %s", e)
            finally:
                done.set()

        threading.Thread(
            target=run_cbs_only, name="wcx-batch-warmup", daemon=True
        ).start()
        return done

    global _predict_warm_started
    _predict_warm_started = True

    def run():
        t0 = time.perf_counter()
        try:
            import jax.numpy as jnp

            from wisecondorx_tpu.io.npz import reference_npz_headers
            from wisecondorx_tpu.parallel.batch import _batched_kernel

            headers = reference_npz_headers(ref_path)
            max_chr_bins = max(
                int(np.max(h["bins_per_chr"])) for h in headers.values()
            )
            start_cbs_warmup(max_chr_bins, _to_cbs_cfg(cfg))
            for gender, h in headers.items():
                n, k, ct = _header_shape(h, gender)
                tm = jnp.asarray(np.zeros((chunk, n)))
                comps = jnp.asarray(np.zeros((5, n)))
                mean = jnp.asarray(np.zeros(n))
                gi = jnp.asarray(np.zeros((n - ct, k), np.int32))
                _batched_kernel(tm, comps, mean, gi, ct=ct)
            logging.info(
                "predict-batch warm-up done in %.1fs (%d passes)",
                time.perf_counter() - t0, len(headers),
            )
        except Exception as e:  # best-effort
            logging.warning("predict-batch warm-up failed: %s", e)
        finally:
            done.set()

    threading.Thread(
        target=run, name="wcx-batch-warmup", daemon=True
    ).start()
    return done


def _to_cbs_cfg(cfg):
    """Accept either a CBSConfig or a PredictConfig-ish object."""
    from wisecondorx_tpu.ops.cbs import CBSConfig

    if cfg is None or isinstance(cfg, CBSConfig):
        return cfg
    seed = getattr(cfg, "seed", None)
    return CBSConfig(
        alpha=getattr(cfg, "alpha", 1e-4),
        seed=seed if seed is not None else 0,
    )


def _cbs_bucket_list_cached(n_max: int) -> list[int]:
    from wisecondorx_tpu.ops.cbs import _bucket_list

    return _bucket_list(n_max)


#: Buckets already warmed in this process — predict warms CBS both from
#: start_predict_warmup (pre-load) and predict() (post-load); re-running
#: a warmed bucket costs a wasted multi-second 67M-element dispatch.
_warmed_cbs: set = set()


def warm_cbs_bucket(n_pad: int, cfg=None) -> None:
    """Compile one CBS segment-size bucket's programs (synchronous).

    The level-synchronous engine (ops/cbs.py round 3) runs exactly two
    programs per (bucket, family-mode): the fused permutation round
    (shuffle + statistic + exceedance counts, with the observed rows
    inlined) and the batched exact-location scan.  Every shape the bucket
    can request is pinned here: seg_batch segments, the engine's row
    count, and the bucket's shared shift-invariant length family — so
    the production run compiles nothing.
    """
    import jax
    import jax.numpy as jnp

    from wisecondorx_tpu.ops import cbs as cbs_ops

    if cfg is None:
        cfg = cbs_ops.CBSConfig()
    key = (n_pad, cfg.seg_batch, cfg.row_elems, cfg.p_method,
           cfg.exact_max, cfg.min_width, cfg.kmax,
           cfg.t_threshold is not None)
    if key in _warmed_cbs:
        return
    _warmed_cbs.add(key)
    t0 = time.perf_counter()
    S = cfg.seg_batch
    w_seg = jnp.asarray(np.ones((S, n_pad), dtype=np.float64))
    wx_seg = jnp.asarray(np.zeros((S, n_pad), dtype=np.float64))
    n_seg = jnp.asarray(np.full(S, n_pad, dtype=np.int32))
    modes = set()
    if n_pad <= cbs_ops._bucket(cfg.exact_max):
        modes.add("exact")
    if n_pad > cfg.exact_max:  # bucket can hold n > exact_max
        modes.add("short" if cfg.p_method == "hybrid" else "thin")
    B = max(64, min(cfg.row_elems // n_pad, 1 << 16))
    seg_of_row = jnp.asarray(np.zeros(B, dtype=np.int32))
    row_live = jnp.asarray(np.ones(B, dtype=bool))
    row_i32 = jnp.asarray(np.zeros(B, dtype=np.int32))
    obs_ext = jnp.asarray(np.zeros(S, dtype=np.float64))
    for mode in sorted(modes):
        lengths = jnp.asarray(cbs_ops._group_lengths(n_pad, cfg, mode))
        cbs_ops._perm_round_device(
            jax.random.PRNGKey(0), w_seg, wx_seg, n_seg,
            seg_of_row, row_live, row_i32, row_i32, row_i32, row_i32,
            obs_ext, lengths, cfg.min_width, cfg.kmax, mode == "short",
        )
        if cfg.t_threshold is not None or mode == "short":
            # Hybrid obs runs over the thin family; same [_LFIX] operand
            # shape as "short", so one _max_t_rows compile covers both.
            cbs_ops._max_t_rows(
                w_seg, wx_seg, n_seg, lengths, cfg.min_width, cfg.kmax
            )
    # Exact breakpoint-location scan (runs once per accepted split).
    cbs_ops._locate_batch(w_seg, wx_seg, n_seg, cfg.min_width)
    logging.info(
        "[timing] warmup.cbs_bucket_%d: %.3fs", n_pad,
        time.perf_counter() - t0,
    )


def start_cbs_warmup(
    n_max: int,
    cfg=None,
    enabled: bool | None = None,
    threads: int = 3,
    after: "threading.Event | None" = None,
):
    """Warm every CBS bucket <= bucket(n_max) on daemon threads.

    Buckets warm largest-first (the recursion tests the whole chromosome
    before its pieces) and concurrently — the axon compile service accepts
    parallel requests.  ``after`` (optional Event) delays the start until
    another warm-up finishes: tracing the 100+-stage bitonic networks is
    GIL-heavy and competing compile RPCs share the tunnel, so running two
    warm-ups concurrently slows both (measured: +9 s on the newref hot
    path).  Returns an Event.
    """
    import jax

    done = threading.Event()
    if enabled is None:
        enabled = jax.default_backend() == "tpu"
    if not enabled or n_max < 4:
        done.set()
        return done

    from wisecondorx_tpu.ops.cbs import _bucket_list

    buckets = _bucket_list(n_max)

    from concurrent.futures import ThreadPoolExecutor

    def run():
        if after is not None:
            after.wait(timeout=1800)
        t0 = time.perf_counter()
        with ThreadPoolExecutor(max_workers=threads) as pool:
            for p, err in zip(
                buckets,
                pool.map(
                    lambda b: _try(warm_cbs_bucket, b, cfg), buckets
                ),
            ):
                if err is not None:
                    logging.warning(
                        "CBS warm-up bucket %d failed: %s", p, err
                    )
        logging.info(
            "CBS compile warm-up done in %.1fs (%d buckets)",
            time.perf_counter() - t0,
            len(buckets),
        )
        done.set()

    threading.Thread(target=run, name="wcx-cbs-warmup", daemon=True).start()
    return done


def _try(fn, *a):
    try:
        fn(*a)
        return None
    except Exception as e:  # best-effort
        return e


def start_warmup(passes: list[dict], enabled: bool | None = None):
    """Warm the given pass shapes on a daemon thread; returns an Event.

    ``passes`` is a list of :func:`warm_newref_pass` kwargs dicts.  On
    non-TPU backends (the CPU parity/test path compiles in milliseconds)
    this is a no-op unless ``enabled`` forces it.
    """
    import jax

    done = threading.Event()
    if enabled is None:
        enabled = jax.default_backend() == "tpu"
    if not enabled or not passes:
        done.set()
        return done

    def run():
        t0 = time.perf_counter()
        # One thread per pass shape: the axon compile service accepts
        # parallel requests, and the A pass's programs (requested first,
        # needed first) are not queued behind the F/M shapes — measured
        # sequential warm cost at 3 pass shapes was 314 s, fully on the
        # newref critical path at small cohort sizes.
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=max(1, len(passes))) as pool:
            for kw, err in zip(
                passes,
                pool.map(lambda kw: _try(warm_newref_pass_kw, kw), passes),
            ):
                if err is not None:
                    logging.warning("compile warm-up failed: %s", err)
        logging.info(
            "compile warm-up done in %.1fs (%d pass shapes)",
            time.perf_counter() - t0,
            len(passes),
        )
        done.set()

    threading.Thread(target=run, name="wcx-warmup", daemon=True).start()
    return done


def warm_newref_pass_kw(kw: dict) -> None:
    warm_newref_pass(**kw)
