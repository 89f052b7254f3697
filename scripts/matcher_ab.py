"""A/B the matcher implementations on the attached TPU.

Variants: XLA tiled-scan (bf16 GEMM), Pallas f32 contraction, Pallas bf16
contraction. All three are EXACT for uint8 descriptors (int values in
bf16/f32 are exact; 128-term sums < 2^24), so correctness is asserted as
identical match indices before anything is timed.

Timing uses the k-call chain methodology (see bench.py bench_matcher):
run the matcher k times inside one jit with a scalar carry forcing
sequential execution; the (k_hi - k_lo)/(hi - lo) slope is the per-call
device time, independent of tunnel RTT.

    python scripts/matcher_ab.py --batch 16 --n 4096
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--n", type=int, default=4096)
    p.add_argument("--reps", type=int, default=5)
    p.add_argument("--out", default="")
    args = p.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/jax_tpu_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    import jax.numpy as jnp
    from functools import partial

    from colmap_tpu.features import matching
    from colmap_tpu.features import pallas_matcher as pm

    rng = np.random.default_rng(0)
    B, N = args.batch, args.n
    d1 = rng.integers(0, 255, (B, N, 128)).astype(np.uint8)
    d2 = rng.integers(0, 255, (B, N, 128)).astype(np.uint8)
    b1 = jax.vmap(matching.prepare_descriptors)(d1)
    b2 = jax.vmap(matching.prepare_descriptors)(d2)
    opts = matching.MatchingOptions()

    variants = {
        "scan_bf16_xla": lambda a, b: matching.match_pairs_batch_scan.__wrapped__(a, b, opts),
        "pallas_f32": lambda a, b: pm.match_pairs_batch_pallas.__wrapped__(
            a, b, opts, 1024, 1024, False),
        "pallas_bf16": lambda a, b: pm.match_pairs_batch_pallas.__wrapped__(
            a, b, opts, 1024, 1024, True),
    }

    # correctness first: identical indices across variants
    ref = None
    compiled_ok = {}
    outputs = {}
    for name, fn in variants.items():
        try:
            out = np.asarray(jax.jit(fn)(b1, b2))
            outputs[name] = out
            compiled_ok[name] = True
        except Exception as e:
            print(f"{name}: COMPILE/RUN FAILED: {str(e)[:300]}")
            compiled_ok[name] = False
    ref_name = "scan_bf16_xla"
    ref = outputs.get(ref_name)
    report = {"batch": B, "n": N, "variants": {}}
    for name, out in outputs.items():
        same = bool(ref is not None and np.array_equal(out, ref))
        n_match = int((out >= 0).sum())
        report["variants"][name] = {"identical_to_scan": same,
                                    "num_matches": n_match}
        print(f"{name}: matches={n_match} identical_to_scan={same}")

    flops_per_pair = 2 * N * N * 128

    def bench(fn):
        @partial(jax.jit, static_argnames=("k",))
        def chain(a, b, k):
            def body(carry, _):
                ax = a._replace(row_sum=a.row_sum + 0.0 * carry)
                out = fn(ax, b)
                return jnp.float32(out.sum()), None

            c, _ = jax.lax.scan(body, jnp.float32(0), None, length=k)
            return c

        for k in (1, 9):
            float(np.asarray(chain(b1, b2, k)))
        t1 = []
        t9 = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            float(np.asarray(chain(b1, b2, 1)))
            t1.append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            float(np.asarray(chain(b1, b2, 9)))
            t9.append(time.perf_counter() - t0)
        t1, t9 = np.array(t1), np.array(t9)
        per_call = (t9 - t1.min()) / 8
        rate = B / per_call
        return rate

    for name, fn in variants.items():
        if not compiled_ok.get(name):
            continue
        rate = bench(fn)
        tf = rate.mean() * flops_per_pair / 1e12
        report["variants"][name].update(
            pairs_per_s=round(float(rate.mean()), 1),
            std=round(float(rate.std()), 1),
            achieved_tflops=round(float(tf), 2),
            pct_bf16_peak=round(100 * tf / 197.0, 2))
        print(f"{name}: {rate.mean():.1f} pairs/s (std {rate.std():.1f}), "
              f"{tf:.2f} TFLOP/s = {100*tf/197.0:.1f}% bf16 peak")

    if args.out:
        with open(args.out, "w") as fp:
            json.dump(report, fp, indent=2)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
