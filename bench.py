"""North-star benchmark suite. Prints ONE JSON line (driver contract).

Headline metric: global-BA LM iteration throughput on a 500-camera
problem (BASELINE.json "Global BA 500-camera problem: batched
Schur-complement LM vs ceres reference"). The `extra` dict carries the
rest of the north-star set: batched SIFT img/s, matcher pairs/s, and
incremental-mapping images-registered/s.

Every repeated metric reports `std` over its reps (the tunnel's
day-to-day variance is 20-30%; one number with no error bar cannot
distinguish a regression from noise) and, where the FLOPs are
closed-form, an `mfu` block: achieved TFLOP/s vs the chip's bf16 peak.

Baselines (see BASELINE_MEASURED.json for provenance):
  * BA: ceres-class DENSE_SCHUR LM measured on THIS host via
    scripts/ba_cpu_baseline.py -> 0.23 iters/s (numpy/scipy). Public
    ceres C++ numbers on comparable BAL problems are ~1-3 iters/s; we
    conservatively compare against 2.0, not our slower scipy analog.
  * SIFT: cv2 SIFT (CPU) measured on this host on the same rendered
    1472x1088 frame: 2.85 img/s.
  * Matching: cv2 BFMatcher L2 knn (CPU), 4096^2 descriptors:
    2.6 pairs/s.
  * Mapping: no reference binary exists in this image; vs_baseline uses
    1.0 img/s (COLMAP-class CPU mappers on few-hundred-image scenes,
    order of magnitude), recorded as an estimate in BASELINE_MEASURED.
"""

import json
import os
import time

import numpy as np


def _setup_compile_cache():
    """Persistent XLA compile cache: remote (tunnel) TPU compiles take
    seconds-to-minutes per program and dominate cold runs; the cache makes
    every repeat program load in ~15 ms (verified against the axon
    backend)."""
    try:
        import jax

        jax.config.update("jax_compilation_cache_dir",
                          os.path.expanduser("~/.cache/jax_tpu_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception:
        pass


_setup_compile_cache()

CERES_REFERENCE_ITERS_PER_S = 2.0   # conservative public ceres bar
SCIPY_MEASURED_ITERS_PER_S = 0.23   # scripts/ba_cpu_baseline.py on this host
CV2_SIFT_IMG_PER_S = 2.85           # measured, BASELINE_MEASURED.json
CV2_MATCHER_PAIRS_PER_S = 2.6       # measured, 4096^2
REF_MAPPER_IMG_PER_S = 1.0          # order-of-magnitude estimate

# TPU v5e peak: 197 TFLOP/s bf16 / 394 TOPS int8. MFU below is reported
# against the bf16 peak using ALGORITHMIC flops (the work a minimal
# implementation must do), not the padded/augmented flops actually issued.
PEAK_BF16_TFLOPS = 197.0


def _timed_reps(fn, reps):
    """Run fn() `reps` times, return per-rep wall seconds (fn must block)."""
    out = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        out.append(time.perf_counter() - t0)
    return np.asarray(out)


def bench_ba(refine_intrinsics=False, reps=5):
    import jax

    from colmap_tpu.estimators import bundle_adjustment as ba
    from __graft_entry__ import _build_problem

    problem, _ = _build_problem(num_poses=500, num_points=50_000,
                                obs_per_point=6, seed=7)
    # fixed-iteration mode (function_tolerance=0, cg_tolerance=0 ->
    # fixed-trip CG) for stable timing
    options = ba.BAOptions(max_iterations=10, cg_iterations=20,
                           function_tolerance=0.0, cg_tolerance=0.0,
                           refine_intrinsics=refine_intrinsics)
    solve = jax.jit(lambda p: ba.solve(p, options))
    state = solve(problem)
    float(np.asarray(state.cost))
    # value-fetch (block_until_ready does not reliably block on the
    # tunneled backend); the scalar fetch adds one RTT (~1% of a solve)
    dts = _timed_reps(lambda: float(np.asarray(solve(problem).cost)), reps)
    iters_per_s = options.max_iterations / dts
    # closed-form CG flops: each CG iter applies J and J^T (2 x 2*nnz
    # where nnz = obs * 2 residuals * (6 pose + 3 point + k cam params))
    n_obs = int(problem.obs_xy.shape[0])
    k_cam = 4 if not refine_intrinsics else 4
    flops_per_cg = 2 * (2 * n_obs * 2 * (6 + 3 + k_cam))
    flops_per_lm = options.cg_iterations * flops_per_cg
    tflops = iters_per_s.mean() * flops_per_lm / 1e12
    return dict(value=round(float(iters_per_s.mean()), 3),
                std=round(float(iters_per_s.std()), 3),
                reps=reps,
                mfu=dict(achieved_tflops=round(tflops, 4),
                         pct_of_bf16_peak=round(100 * tflops
                                                / PEAK_BF16_TFLOPS, 3)))


def bench_sift(reps=3):
    """Batched SIFT extraction. Reports the device rate via the k-call
    chain methodology (see bench_matcher) plus the wall rate of a single
    dispatch incl. the tunnel RTT + keypoint/descriptor download (a few
    MB at erratic 2-65 MB/s on this tunnel — on production hardware that
    download is PCIe/DMA-fast and the device rate is the throughput)."""
    import jax
    import jax.numpy as jnp
    from functools import partial

    from colmap_tpu.features import sift
    from colmap_tpu.scene import synthetic_images as synth

    opts = synth.RoomDatasetOptions(num_images=4, width=1472, height=1088,
                                    focal=1200.0, seed=5)
    images, _, _, _ = synth.render_room_dataset(opts)
    imgs = (np.stack([im if im.ndim == 2 else im.mean(-1)
                      for im in images]) / 255.0).astype(np.float32)
    o = sift.SiftExtractionOptions(max_num_features=4096)
    B = len(imgs)
    core = sift._extract_static.__wrapped__

    @partial(jax.jit, static_argnames=("k",))
    def chain(ims, k):
        def body(carry, _):
            out = jax.vmap(lambda im: core(im + 0.0 * carry, o))(ims)
            return jnp.float32(out["valid"].sum()), None

        c, _ = jax.lax.scan(body, jnp.float32(0), None, length=k)
        return c

    for k in (1, 5):
        float(np.asarray(chain(imgs, k)))  # compile both
    t1 = _timed_reps(lambda: float(np.asarray(chain(imgs, 1))), reps)
    t5 = _timed_reps(lambda: float(np.asarray(chain(imgs, 5))), reps)
    per_call = (t5 - t1.min()) / 4
    device_rate = B / per_call

    # wall rate = the PRODUCTION path: uint8 upload (1 B/px), one packed
    # uint8 download carrying descriptors + bitcast keypoint meta
    # (features/sift.py extract_batch_packed — what the extraction
    # controller dispatches), fully fetched to host
    imgs_u8 = (imgs * 255).astype(np.uint8)
    sift.extract_batch_packed(imgs_u8, o).sum()  # compile + warm

    def run():
        buf = sift.extract_batch_packed(imgs_u8, o)
        sift.unpack_features(buf[0])

    dts = _timed_reps(run, reps)
    ips = B / dts
    return dict(value=round(float(device_rate.mean()), 2),
                std=round(float(device_rate.std()), 2), reps=reps,
                wall_img_per_s=round(float(ips.mean()), 2),
                wall_std=round(float(ips.std()), 2))


def bench_matcher(reps=5, pipeline_depth=4):
    """Production matcher path (tiled-scan fused matcher on TPU).

    Timing methodology: block_until_ready does not reliably block on the
    tunneled backend, so the device rate is measured by running the
    matcher k times inside ONE jit with a scalar carry forcing sequential
    execution and fetching the final scalar; the (k=9 - k=1)/8 slope is
    the true per-call device time, independent of RTT and dispatch
    overhead. The wall rate (pipelined dispatch, value-fetched) is
    reported alongside — on this dev tunnel it is bound by the ~25 ms
    per-dispatch RPC, not by the chip.
    """
    import jax
    import jax.numpy as jnp
    from functools import partial

    from colmap_tpu.features import matching

    rng = np.random.default_rng(0)
    B, N = 16, 4096
    d1 = rng.integers(0, 255, (B, N, 128)).astype(np.uint8)
    d2 = rng.integers(0, 255, (B, N, 128)).astype(np.uint8)
    b1 = jax.vmap(matching.prepare_descriptors)(d1)
    b2 = jax.vmap(matching.prepare_descriptors)(d2)

    if jax.default_backend() == "cpu":
        match_core = matching.match_pairs_batch.__wrapped__
    else:
        match_core = matching.match_pairs_batch_scan.__wrapped__

    @partial(jax.jit, static_argnames=("k",))
    def chain(b1, b2, k):
        def body(carry, _):
            b1x = b1._replace(row_sum=b1.row_sum + 0.0 * carry)
            out = match_core(b1x, b2, matching.MatchingOptions())
            return jnp.float32(out.sum()), None

        c, _ = jax.lax.scan(body, jnp.float32(0), None, length=k)
        return c

    for k in (1, 9):
        float(np.asarray(chain(b1, b2, k)))  # compile both
    t1 = _timed_reps(lambda: float(np.asarray(chain(b1, b2, 1))), reps)
    t9 = _timed_reps(lambda: float(np.asarray(chain(b1, b2, 9))), reps)
    per_call = (t9 - t1.min()) / 8  # per-rep slope against best 1-call
    device_rate = B / per_call
    # wall rate: pipelined dispatch of independent calls, value-fetched
    np.asarray(matching.match_pairs_batch_auto(b1, b2))  # warm
    def run_wall():
        outs = [matching.match_pairs_batch_auto(b1, b2)
                for _ in range(pipeline_depth)]
        np.asarray(outs[-1])
        for o in outs:
            jax.block_until_ready(o)
    wall = _timed_reps(run_wall, reps)
    wall_rate = B * pipeline_depth / wall
    # algorithmic flops per pair: ONE exact bf16 GEMM (N^2 * 128 MACs);
    # the single-pass kernel covers the cross-check from the same GEMM
    flops_per_pair = 2 * N * N * 128
    tflops = device_rate.mean() * flops_per_pair / 1e12
    return dict(value=round(float(device_rate.mean()), 1),
                std=round(float(device_rate.std()), 1), reps=reps,
                wall_pipelined_pairs_per_s=round(float(wall_rate.mean()), 1),
                dispatch_overhead_ms=round(
                    float(max(t1.min() - per_call.mean(), 0.0)) * 1e3, 1),
                mfu=dict(achieved_tflops=round(tflops, 2),
                         pct_of_bf16_peak=round(100 * tflops
                                                / PEAK_BF16_TFLOPS, 2)))


def bench_patch_match(width=640, height=480, n_src=4, reps=3,
                      big_width=2048):
    """Dense-stereo throughput at reference defaults (window 11x11,
    5 iters, 4-direction checkerboard propagation + geometric term off),
    k-chain device-rate methodology as bench_matcher. Also runs ONE
    big-resolution problem (>= 2000 px, the reference max_image_size
    regime, patch_match_cuda.cu:1262) to prove memory discipline — it
    reports only ok/elapsed.

    Bar: the reference's tuned CUDA solver sweeps a full-res image in 5
    iters x 4 sweeps (mvs/patch_match_cuda.cu). FLOP accounting: per
    pixel per candidate per source ~ window taps x (4-tap bilinear + NCC
    accumulation ~ 12 flops)."""
    import jax
    import jax.numpy as jnp
    from functools import partial

    from colmap_tpu.mvs import patch_match as pm
    from colmap_tpu.scene import synthetic_images as synth

    def build(width, height, n_src):
        focal = 0.9 * width
        o = synth.RoomDatasetOptions(num_images=n_src + 1, width=width,
                                     height=height, focal=focal, seed=2)
        images, K, Rs, ts, depths = synth.render_room_dataset(
            o, return_depth=True)
        ref, srcs = 0, list(range(1, n_src + 1))
        R_rel = np.stack([Rs[s] @ Rs[ref].T for s in srcs])
        t_rel = np.stack([ts[s] - R_rel[i] @ ts[ref]
                          for i, s in enumerate(srcs)])
        gt = depths[ref]
        return pm.PatchMatchProblem(
            ref_image=jnp.asarray(images[ref], jnp.float32) / 255.0,
            src_images=jnp.asarray(np.stack([images[s] for s in srcs]),
                                   jnp.float32) / 255.0,
            K_ref=jnp.asarray(K, jnp.float32),
            K_src=jnp.asarray(np.stack([K] * n_src), jnp.float32),
            R_rel=jnp.asarray(R_rel, jnp.float32),
            t_rel=jnp.asarray(t_rel, jnp.float32),
            depth_min=jnp.asarray(gt[gt > 0].min() * 0.7, jnp.float32),
            depth_max=jnp.asarray(gt[gt > 0].max() * 1.3, jnp.float32))

    opts = pm.PatchMatchOptions()
    problem = build(width, height, n_src)
    solve = jax.jit(pm.patch_match, static_argnames=("options",))

    @partial(jax.jit, static_argnames=("k",))
    def chain(p, k):
        def body(carry, _):
            d, n, c = pm.patch_match(
                jax.random.PRNGKey(0),
                p._replace(ref_image=p.ref_image + 0.0 * carry), opts)
            return jnp.float32(d.sum()), None

        c, _ = jax.lax.scan(body, jnp.float32(0), None, length=k)
        return c

    for k in (1, 3):
        float(np.asarray(chain(problem, k)))
    t1 = _timed_reps(lambda: float(np.asarray(chain(problem, 1))), reps)
    t3 = _timed_reps(lambda: float(np.asarray(chain(problem, 3))), reps)
    per_call = (t3 - t1.min()) / 2
    maps_per_s = 1.0 / per_call
    mpix = width * height / 1e6
    # algorithmic flops per depth map: pixels x candidates x srcs x taps
    # x ~12 flops x (iters + refinement iters)
    taps = (2 * opts.window_radius // opts.window_step + 1) ** 2
    cands = 4 + opts.num_perturbations
    total_iters = opts.num_iterations + opts.num_refinement_iterations
    flops = (width * height * cands * n_src * taps * 12 * total_iters)
    tflops = maps_per_s.mean() * flops / 1e12
    out = dict(value=round(float(maps_per_s.mean()), 3),
               std=round(float(maps_per_s.std()), 3), reps=reps,
               mpix_per_s=round(float(maps_per_s.mean() * mpix), 2),
               mfu=dict(achieved_tflops=round(tflops, 2),
                        pct_of_bf16_peak=round(100 * tflops
                                               / PEAK_BF16_TFLOPS, 2)))
    # memory-discipline run at >= 2000 px (one problem, 2 srcs)
    try:
        big_h = int(big_width * 3 / 4)
        big = build(big_width, big_h, 2)
        t0 = time.perf_counter()
        d, _, _ = solve(jax.random.PRNGKey(0), big, options=opts)
        frac = float(np.asarray((d > 0).mean()))
        out["big_run"] = dict(ok=True, width=big_width, height=big_h,
                              elapsed_s=round(time.perf_counter() - t0, 1),
                              est_frac=round(frac, 3))
    except Exception as e:
        out["big_run"] = dict(ok=False, error=str(e)[:120])
    return out


def bench_mapping(num_images=200):
    """Incremental mapping throughput, cold/warm split.

    The timed quantity of record is the WARM run: the same 200-image
    reconstruction executed twice, where the first pass populates the
    jit + persistent-XLA caches (every shape bucket the run touches) and
    the second pass measures steady-state mapper throughput. The first
    pass's wall time is reported as cold_s — in a fresh driver window
    with a stale compile cache the cold pass is compile-dominated and is
    NOT a throughput number (round-3 lesson: a single cold-timed run
    halved the metric of record)."""
    from colmap_tpu.controllers.incremental_pipeline import IncrementalPipeline
    from colmap_tpu.scene.database import Database
    from colmap_tpu.scene.synthetic import (
        SyntheticDatasetOptions,
        synthesize_dataset,
    )

    db = Database(":memory:")
    synthesize_dataset(
        SyntheticDatasetOptions(num_images=num_images,
                                num_points3D=10 * num_images,
                                point2D_stddev=0.5, seed=3), db)
    t0 = time.perf_counter()
    rec_cold = IncrementalPipeline(db).run()
    cold_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    rec = IncrementalPipeline(db).run()
    warm_s = time.perf_counter() - t0
    n_reg = 0 if rec is None else rec.num_registered_images()
    n_cold = 0 if rec_cold is None else rec_cold.num_registered_images()
    return dict(warm_img_per_s=n_reg / warm_s, cold_s=cold_s,
                cold_img_per_s=n_cold / cold_s, n_reg=n_reg)


def _wait_for_healthy_backend(max_probes=4, probe_timeout_s=75):
    """The tunneled TPU worker occasionally wedges its execute path (ops
    hang indefinitely while device enumeration still works). Probe with a
    REAL op in a subprocess (a hung in-process jax call cannot be timed
    out) and wait briefly for recovery, so a driver-run bench doesn't
    hang forever on the first device op. Proceeds regardless after the
    probe budget — a late hang is still better than silently skipping."""
    import subprocess
    import sys

    probe = ("import jax, jax.numpy as jnp; jax.devices(); "
             "assert float(jnp.ones((128,128)).sum()) == 16384.0; "
             "print('TPU-OK')")
    for attempt in range(max_probes):
        try:
            r = subprocess.run([sys.executable, "-c", probe],
                               capture_output=True, text=True,
                               timeout=probe_timeout_s)
            if "TPU-OK" in r.stdout:
                return True
        except subprocess.TimeoutExpired:
            pass
        time.sleep(30)
    return False


def _resilient(fn, *args, **kwargs):
    """Run a bench block; on a worker crash ('UNAVAILABLE: TPU worker
    process crashed'), wait for the backend to recover and retry ONCE —
    the tunneled worker restarts take 2-40 min and a single crash must
    not blank the block's metric in the round's record."""
    try:
        return fn(*args, **kwargs)
    except Exception as e:
        if "UNAVAILABLE" not in str(e):
            raise
        _wait_for_healthy_backend(max_probes=20, probe_timeout_s=75)
        return fn(*args, **kwargs)


def main():
    _wait_for_healthy_backend()
    results = {}
    ba_res = _resilient(bench_ba)
    results["ba_lm_iters_per_s_500cam_300kobs"] = dict(
        ba_res, unit="LM iters/s (20 CG steps each)",
        vs_baseline=round(ba_res["value"] / CERES_REFERENCE_ITERS_PER_S, 3),
        vs_measured_scipy=round(ba_res["value"] / SCIPY_MEASURED_ITERS_PER_S,
                                1),
    )
    try:
        # A/B: same problem with intrinsics refinement on (ceres A/B per
        # round-2 verdict item 7)
        ab = _resilient(bench_ba, refine_intrinsics=True, reps=3)
        results["ba_lm_iters_per_s_refine_intrinsics"] = dict(
            ab, unit="LM iters/s (20 CG steps, +intrinsics)")
    except Exception as e:
        results["ba_lm_iters_per_s_refine_intrinsics"] = {"error": str(e)[:100]}
    try:
        s = _resilient(bench_sift)
        # like-for-like ratio: wall-vs-wall (cv2 baseline is a wall rate);
        # the device-rate ratio is published alongside, labeled as such
        results["sift_batched_img_per_s_1472x1088"] = dict(
            s, unit="img/s device rate (batch 4, 4096 feats)",
            vs_baseline=round(s["wall_img_per_s"] / CV2_SIFT_IMG_PER_S, 2),
            vs_baseline_device_rate=round(s["value"] / CV2_SIFT_IMG_PER_S,
                                          2))
    except Exception as e:  # TPU worker memory is variable; keep the line
        results["sift_batched_img_per_s_1472x1088"] = {"error": str(e)[:100]}
    try:
        m = _resilient(bench_matcher)
        results["matcher_pairs_per_s_16x4096sq"] = dict(
            m, unit="pairs/s (batch 16, pipelined x4)",
            vs_baseline=round(m["value"] / CV2_MATCHER_PAIRS_PER_S, 1))
    except Exception as e:
        results["matcher_pairs_per_s_16x4096sq"] = {"error": str(e)[:100]}
    try:
        n_img = int(os.environ.get("BENCH_MAPPING_IMAGES", "200"))
        mp = _resilient(bench_mapping, n_img)
        results["mapping_images_registered_per_s"] = {
            "value": round(mp["warm_img_per_s"], 3),
            "unit": (f"img/s warm ({mp['n_reg']}/{n_img} registered; "
                     "2nd identical run, all caches hot)"),
            "cold_s": round(mp["cold_s"], 1),
            "cold_img_per_s": round(mp["cold_img_per_s"], 3),
            "vs_baseline": round(mp["warm_img_per_s"]
                                 / REF_MAPPER_IMG_PER_S, 2),
        }
    except Exception as e:
        results["mapping_images_registered_per_s"] = {"error": str(e)[:100]}

    # PatchMatch runs LAST and in a SUBPROCESS: the dense solver can crash
    # the tunneled TPU worker (observed kernel faults at reference window
    # sizes on some days), and a crash poisons the parent process's jax
    # client for every later block — isolation keeps the rest of the
    # bench's metrics intact regardless.
    try:
        import subprocess
        import sys

        _wait_for_healthy_backend()
        code = ("import json, bench; "
                "print('PMRESULT ' + json.dumps(bench.bench_patch_match()))")
        r = subprocess.run([sys.executable, "-c", code],
                           capture_output=True, text=True, timeout=1800,
                           cwd=os.path.dirname(os.path.abspath(__file__)))
        line = next((ln for ln in r.stdout.splitlines()
                     if ln.startswith("PMRESULT ")), None)
        if line is None:
            raise RuntimeError(
                "patch_match subprocess produced no result: "
                + (r.stderr or r.stdout)[-120:])
        p = json.loads(line[len("PMRESULT "):])
        results["patch_match_depth_maps_per_s_640x480"] = dict(
            p, unit="depth maps/s (640x480, 4 src, reference defaults)")
    except Exception as e:
        results["patch_match_depth_maps_per_s_640x480"] = {
            "error": str(e)[:100]}

    # Long-form runs executed out-of-band (hours-scale; cannot run inside
    # the driver's bench window) publish their reports into the repo; embed
    # them so the round's BENCH file carries the evidence. These blocks are
    # BUILDER-PRODUCED, not driver-measured — each is stamped
    # self_reported=true with its producing command + UTC timestamp (the
    # writers in scripts/ add these; added here too as a backstop):
    #   SCALE_r*.json   — 1000-image north-star run (scripts/scale_run.py)
    #   E2E_SCALE_r*.json — full pixels->model pipeline scale run
    #   DSLR_GATE.json  — DSLR-res accuracy gate
    #                     (scripts/benchmark_reconstruction.py --synthetic 20
    #                      --synthetic_width 1536 --synthetic_height 1152)
    # Round-4 lesson: embedding the artifacts VERBATIM ballooned the JSON
    # line past the driver's capture buffer and the round's record parsed
    # as null. Embed COMPACT summaries only (full evidence stays in the
    # named repo files) and enforce a hard size cap on the printed line.
    import glob

    here = os.path.dirname(os.path.abspath(__file__))

    def latest(pattern):
        hits = sorted(glob.glob(os.path.join(here, pattern)))
        return hits[-1] if hits else None

    KEEP = ("ok", "elapsed_s", "num_images", "num_registered",
            "num_points3D", "images_per_s", "max_rotation_error_deg",
            "max_center_error", "num_gt_images", "timestamp_utc")

    def summarize(path):
        with open(path) as fp:
            blob = json.load(fp)
        out = {k: blob[k] for k in KEEP if k in blob}
        stages = blob.get("stage_seconds")
        if isinstance(stages, dict) and stages:
            num = {k: v for k, v in stages.items()
                   if isinstance(v, (int, float))}
            top = sorted(num.items(), key=lambda kv: -kv[1])[:3]
            out["top_stages_s"] = {k: round(v, 1) for k, v in top}
        for curve_key in ("ba", "matcher"):
            c = blob.get(curve_key, {}).get("curve")
            if isinstance(c, dict):
                out[f"{curve_key}_rel_vs_1dev"] = {
                    n: c[n].get("rel_vs_1dev") for n in sorted(c)}
        out["self_reported"] = True
        out["source_file"] = os.path.basename(path)
        return out

    for key, path in (("scale_run_1000img", latest("SCALE_r*.json")),
                      ("e2e_scale_run", latest("E2E_SCALE_r*.json")),
                      ("device_scaling_curve", latest("SCALING_r*.json")),
                      ("dslr_accuracy_gate", latest("DSLR_GATE*.json"))):
        if path and os.path.exists(path):
            try:
                results[key] = summarize(path)
            except Exception as e:
                results[key] = {"error": str(e)[:100]}

    headline = results["ba_lm_iters_per_s_500cam_300kobs"]
    payload = {
        "metric": "ba_lm_iters_per_s_500cam_300kobs",
        "value": headline["value"],
        "unit": headline["unit"],
        "vs_baseline": headline["vs_baseline"],
        "extra": {k: v for k, v in results.items()
                  if k != "ba_lm_iters_per_s_500cam_300kobs"},
    }
    line = json.dumps(payload)
    # hard cap: the driver records only the tail of stdout; a line that
    # overruns it parses as null. Drop embedded summaries, then extras,
    # until the line fits comfortably.
    MAX_LEN = 3500
    drop_order = ["device_scaling_curve", "e2e_scale_run",
                  "scale_run_1000img", "dslr_accuracy_gate"]
    while len(line) > MAX_LEN and drop_order:
        k = drop_order.pop(0)
        if k in payload["extra"]:
            payload["extra"][k] = {"see": k, "dropped_for_size": True}
        line = json.dumps(payload)
    if len(line) > MAX_LEN:
        payload["extra"] = {"dropped_for_size": True}
        line = json.dumps(payload)
    print(line)


if __name__ == "__main__":
    main()
