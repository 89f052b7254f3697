"""Benchmark: global-BA LM iteration throughput on a 500-camera problem.

Matches BASELINE.json config "Global BA 500-camera problem: batched
Schur-complement LM vs ceres reference". Prints ONE JSON line.

vs_baseline: ceres on a CPU workstation runs ITERATIVE_SCHUR+SCHUR_JACOBI at
roughly 1-3 LM iterations/s on a 500-camera/50k-point/200k-observation
problem (public ceres bundle-adjustment benchmarks on BAL problems of this
size, e.g. problem-394-100368 ~1s/iter multithreaded). We use 2.0 iter/s as
the reference point.
"""

import json
import time

import numpy as np

CERES_REFERENCE_ITERS_PER_S = 2.0


def main():
    import jax

    from colmap_tpu.estimators import bundle_adjustment as ba
    from __graft_entry__ import _build_problem

    # 500 cameras, 50k points, 300k observations
    problem, _ = _build_problem(num_poses=500, num_points=50_000, obs_per_point=6, seed=7)
    options = ba.BAOptions(max_iterations=10, cg_iterations=20)

    solve = jax.jit(lambda p: ba.solve(p, options))
    # warmup/compile
    state = solve(problem)
    state.cost.block_until_ready()

    t0 = time.perf_counter()
    reps = 3
    for _ in range(reps):
        state = solve(problem)
        state.cost.block_until_ready()
    dt = time.perf_counter() - t0

    iters = options.max_iterations * reps
    iters_per_s = iters / dt
    print(
        json.dumps(
            {
                "metric": "ba_lm_iters_per_s_500cam_300kobs",
                "value": round(iters_per_s, 3),
                "unit": "LM iters/s (20 CG steps each)",
                "vs_baseline": round(iters_per_s / CERES_REFERENCE_ITERS_PER_S, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
