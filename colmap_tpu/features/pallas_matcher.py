"""Pallas TPU kernel: fused descriptor matching (GEMM + running top-2).

The XLA matcher (features/matching.py) materializes the (N, M) similarity
matrix in HBM (256 MB for an 8192^2 pair) and then reduces it three times.
This kernel tiles the GEMM over M and keeps ONLY the running best /
second-best similarity and best index per query row in VMEM — the
similarity matrix never leaves the chip.

Trick: the exact-uint8 rank-1 corrections and norms fold into AUGMENTED
descriptors, so the whole similarity is ONE MXU contraction:

    aug1[i] = inv_norm1[i] * [c1, row_sum1[i], 1,   1, 0...]
    aug2[j] = inv_norm2[j] * [c2, 128, 128*row_sum2[j] - 128^3, B_j, 0...]

with B_j a large negative bias for invalid rows; then sims = aug1 @ aug2^T.
Mosaic constraints honored: operand blocks are (mult-of-8, mult-of-128);
per-row running stats live in (8, N) carry blocks (rows 0..2 used).

matching.match_descriptors remains the portable exact fallback.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from colmap_tpu.features.matching import DescriptorBlock, MatchingOptions

_NEG = -3.0e38
_AUG = 256  # augmented descriptor width (128 data + 4 used + pad)


def _augment(b: DescriptorBlock, side: int) -> jax.Array:
    """(N, 256) f32 augmented descriptors (see module docstring)."""
    n = b.centered.shape[0]
    c = b.centered.astype(jnp.float32)
    ones = jnp.ones((n, 1), jnp.float32)
    if side == 1:
        cols = [c, b.row_sum[:, None], ones, ones]
        scale = b.inv_norm[:, None]
    else:
        bias = jnp.where(b.valid, 0.0, -1e30)[:, None]
        cols = [c, 128.0 * ones, (128.0 * b.row_sum - 128.0**3)[:, None], bias]
        # invalid rows may have zero norm -> keep scale finite
        scale = jnp.where(b.valid, b.inv_norm, 1.0)[:, None]
    aug = jnp.concatenate(cols, axis=1) * scale
    pad = _AUG - aug.shape[1]
    return jnp.pad(aug, ((0, 0), (0, pad)))


def _matcher_kernel(a1_ref, a2_ref, stats_ref, idx_ref):
    """2-D grid (N tiles x M tiles, M fastest); carries running top-2 in
    (8, TN) blocks revisited across the M sweep.

    a1 tile: (TN, 256) f32; a2 tile: (TM, 256) f32.
    stats rows: 0 = best, 1 = second. idx row 0 = best index.
    """
    from jax.experimental import pallas as pl

    t = pl.program_id(1)

    @pl.when(t == 0)
    def _init():
        stats_ref[:] = jnp.full_like(stats_ref, _NEG)
        idx_ref[:] = jnp.full_like(idx_ref, -1)

    sims = jax.lax.dot_general(
        a1_ref[:], a2_ref[:], dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)  # (N, TM)

    tm = sims.shape[1]
    tile_best = jnp.max(sims, axis=1)  # (N,)
    tile_arg = jnp.argmax(sims, axis=1).astype(jnp.int32)
    cols = jax.lax.broadcasted_iota(jnp.int32, sims.shape, 1)
    tile_second = jnp.max(
        jnp.where(cols == tile_arg[:, None], _NEG, sims), axis=1)
    tile_idx = tile_arg + t * tm

    cur_best = stats_ref[0, :]
    cur_second = stats_ref[1, :]
    cur_idx = idx_ref[0, :]

    new_best = jnp.maximum(cur_best, tile_best)
    new_idx = jnp.where(tile_best > cur_best, tile_idx, cur_idx)
    new_second = jnp.maximum(
        jnp.minimum(cur_best, tile_best),
        jnp.maximum(cur_second, tile_second))
    stats_ref[0, :] = new_best
    stats_ref[1, :] = new_second
    idx_ref[0, :] = new_idx


@functools.partial(jax.jit, static_argnames=("tile_m",))
def _top2_forward(b1: DescriptorBlock, b2: DescriptorBlock, tile_m: int = 2048):
    """Running top-2 over image-2 tiles. Returns (best, second, idx), (n,)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n = b1.centered.shape[0]
    m = b2.centered.shape[0]
    tile_n = min(1024, n)
    tile_m = min(tile_m, m)
    assert n % tile_n == 0 and m % tile_m == 0 \
        and tile_n % 128 == 0 and tile_m % 128 == 0, \
        f"pad descriptor capacity to a multiple of 128 (n={n}, m={m})"
    a1 = _augment(b1, 1)
    a2 = _augment(b2, 2)
    # M is the fast axis so each N tile completes its sweep with its carry
    # block resident in VMEM; sims tile is (TN, TM) = 4 MB
    grid = (n // tile_n, m // tile_m)

    stats, idx = pl.pallas_call(
        _matcher_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_n, _AUG), lambda i, t: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_m, _AUG), lambda i, t: (t, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((8, tile_n), lambda i, t: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, tile_n), lambda i, t: (0, i),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((8, n), jnp.float32),
            jax.ShapeDtypeStruct((8, n), jnp.int32),
        ),
    )(a1, a2)
    return stats[0], stats[1], idx[0]


def match_descriptors_pallas(b1: DescriptorBlock, b2: DescriptorBlock,
                             options: MatchingOptions = MatchingOptions(),
                             tile_m: int = 2048) -> jax.Array:
    """Drop-in replacement for matching.match_descriptors on TPU."""
    best, second, idx = _top2_forward(b1, b2, tile_m=tile_m)
    best_dist = jnp.arccos(jnp.clip(best, -1.0, 1.0))
    second_dist = jnp.arccos(jnp.clip(second, -1.0, 1.0))
    ok = best > -1e20
    ok &= best_dist <= options.max_distance
    ok &= best_dist < options.max_ratio * second_dist
    if options.cross_check:
        rbest, _, ridx = _top2_forward(b2, b1, tile_m=tile_m)
        n = b1.centered.shape[0]
        rev = jnp.where(rbest > -1e20, ridx, -1)
        ok &= rev[jnp.maximum(idx, 0)] == jnp.arange(n)
    return jnp.where(ok & b1.valid, idx, -1).astype(jnp.int32)


# ---------------------------------------------------------------------------
# pair-batched kernel: one pallas_call over a (B, n-tiles, m-tiles) grid.
# The similarity matrices of a whole block of image pairs never touch HBM
# — only the (B, N) top-2 stats do. This is the production matching path
# (controllers/feature_matching.py) on TPU; the vmapped XLA matcher
# materializes (B, N, M) f32 in HBM (1 GB at 16x4096^2) and re-reads it
# for every reduction.
# ---------------------------------------------------------------------------


def _matcher_kernel_batch(a1_ref, a2_ref, stats_ref, idx_ref):
    """Grid (B, N tiles, M tiles), M fastest; same running top-2 as
    _matcher_kernel with a leading size-1 batch block dim."""
    from jax.experimental import pallas as pl

    t = pl.program_id(2)

    @pl.when(t == 0)
    def _init():
        stats_ref[:] = jnp.full_like(stats_ref, _NEG)
        idx_ref[:] = jnp.full_like(idx_ref, -1)

    sims = jax.lax.dot_general(
        a1_ref[0], a2_ref[0], dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)  # (TN, TM)

    tm = sims.shape[1]
    tile_best = jnp.max(sims, axis=1)
    tile_arg = jnp.argmax(sims, axis=1).astype(jnp.int32)
    cols = jax.lax.broadcasted_iota(jnp.int32, sims.shape, 1)
    tile_second = jnp.max(
        jnp.where(cols == tile_arg[:, None], _NEG, sims), axis=1)
    tile_idx = tile_arg + t * tm

    cur_best = stats_ref[0, 0, :]
    cur_second = stats_ref[0, 1, :]
    cur_idx = idx_ref[0, 0, :]

    new_best = jnp.maximum(cur_best, tile_best)
    new_idx = jnp.where(tile_best > cur_best, tile_idx, cur_idx)
    new_second = jnp.maximum(
        jnp.minimum(cur_best, tile_best),
        jnp.maximum(cur_second, tile_second))
    stats_ref[0, 0, :] = new_best
    stats_ref[0, 1, :] = new_second
    idx_ref[0, 0, :] = new_idx


@functools.partial(jax.jit, static_argnames=("tile_m",))
def _top2_forward_batch(b1: DescriptorBlock, b2: DescriptorBlock,
                        tile_m: int = 2048):
    """Running top-2 for a batch of pairs: centered (B, N, 128).
    Returns (best, second, idx), each (B, N)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, n = b1.centered.shape[:2]
    m = b2.centered.shape[1]
    tile_n = min(1024, n)
    tile_m = min(tile_m, m)
    assert n % tile_n == 0 and m % tile_m == 0 \
        and tile_n % 128 == 0 and tile_m % 128 == 0, \
        f"pad descriptor capacity to a multiple of 128 (n={n}, m={m})"
    a1 = jax.vmap(lambda b: _augment(b, 1))(b1)  # (B, N, AUG)
    a2 = jax.vmap(lambda b: _augment(b, 2))(b2)
    grid = (B, n // tile_n, m // tile_m)

    stats, idx = pl.pallas_call(
        _matcher_kernel_batch,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tile_n, _AUG), lambda b, i, t: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_m, _AUG), lambda b, i, t: (b, t, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, 8, tile_n), lambda b, i, t: (b, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, tile_n), lambda b, i, t: (b, 0, i),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, 8, n), jnp.float32),
            jax.ShapeDtypeStruct((B, 8, n), jnp.int32),
        ),
    )(a1, a2)
    return stats[:, 0], stats[:, 1], idx[:, 0]


@functools.partial(jax.jit, static_argnames=("options", "tile_m"))
def match_pairs_batch_pallas(b1: DescriptorBlock, b2: DescriptorBlock,
                             options: MatchingOptions = MatchingOptions(),
                             tile_m: int = 2048) -> jax.Array:
    """Pair-batched drop-in for matching.match_pairs_batch on TPU.

    b1/b2 hold batched arrays: centered (B, N, 128), row_sum (B, N), ...
    Returns (B, N) int32 match indices into b2 (-1 = none).
    """
    best, second, idx = _top2_forward_batch(b1, b2, tile_m=tile_m)
    best_dist = jnp.arccos(jnp.clip(best, -1.0, 1.0))
    second_dist = jnp.arccos(jnp.clip(second, -1.0, 1.0))
    ok = best > -1e20
    ok &= best_dist <= options.max_distance
    ok &= best_dist < options.max_ratio * second_dist
    if options.cross_check:
        rbest, _, ridx = _top2_forward_batch(b2, b1, tile_m=tile_m)
        n = b1.centered.shape[1]
        rev = jnp.where(rbest > -1e20, ridx, -1)  # (B, M)
        rev_at_best = jnp.take_along_axis(rev, jnp.maximum(idx, 0), axis=1)
        ok &= rev_at_best == jnp.arange(n)[None, :]
    return jnp.where(ok & b1.valid, idx, -1).astype(jnp.int32)
