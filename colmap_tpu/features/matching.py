"""Descriptor matching as batched int8 MXU GEMMs + fused ratio/cross checks.

Reference: SiftCPUFeatureMatcher (src/colmap/feature/sift.cc:1269,
FindBestMatchesBruteForce :1003): distance = arccos of the normalized uint8
descriptor dot product, ratio test 0.8, max distance 0.7, cross check.

TPU re-design: SIFT descriptors are uint8, so the pair GEMM runs on the
MXU's int8 path (exact int32 accumulation, 2-4x bf16 throughput). uint8
doesn't fit int8, so descriptors are stored centered (d - 128) and the
exact uint8 dot product is recovered with a rank-1 correction from
precomputed row sums:

    a . b = (a-128).(b-128) + 128*sum(a) + 128*sum(b) - 128*128*128

(bf16 was measured insufficient here: eps ~8e-3 near sim=1.0 collapses the
top-2 distance gap the ratio test depends on.) A batch of image pairs
matches in ONE program — (B, N, 128) x (B, M, 128) batched GEMM + fused
top-2 / ratio / cross-check reductions — replacing the reference's matcher
thread pool with a single pjit-able op that shards over pair blocks
(SURVEY §2.11).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class MatchingOptions:
    max_ratio: float = 0.8
    max_distance: float = 0.7
    cross_check: bool = True


class DescriptorBlock(NamedTuple):
    """Device-resident packed descriptors for one image (fixed capacity)."""

    centered: jax.Array  # (N, 128) int8 = uint8 - 128
    row_sum: jax.Array  # (N,) float32 = sum(uint8 row)
    inv_norm: jax.Array  # (N,) float32 = 1 / ||uint8 row||
    valid: jax.Array  # (N,) bool


def prepare_descriptors(desc_u8, valid=None) -> DescriptorBlock:
    """Pack uint8 descriptors (N, 128) for int8 matching."""
    d = jnp.asarray(desc_u8)
    di = d.astype(jnp.int32)
    row_sum = jnp.sum(di, axis=-1).astype(jnp.float32)
    sq = jnp.sum(di * di, axis=-1).astype(jnp.float32)
    inv_norm = 1.0 / jnp.sqrt(jnp.maximum(sq, 1e-12))
    centered = (di - 128).astype(jnp.int8)
    if valid is None:
        valid = jnp.ones(d.shape[0], dtype=bool)
    return DescriptorBlock(centered=centered, row_sum=row_sum, inv_norm=inv_norm, valid=valid)


def _cosine_similarities(b1: DescriptorBlock, b2: DescriptorBlock) -> jax.Array:
    """Exact normalized uint8 dot products (N, M) in float32."""
    dots_c = jax.lax.dot_general(
        b1.centered,
        b2.centered,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    ).astype(jnp.float32)
    # rank-1 correction back to the exact uint8 dot product
    dots = (
        dots_c
        + 128.0 * b1.row_sum[:, None]
        + 128.0 * b2.row_sum[None, :]
        - 128.0 * 128.0 * 128.0
    )
    return dots * b1.inv_norm[:, None] * b2.inv_norm[None, :]


def _select_matches(sims, b1: DescriptorBlock, b2: DescriptorBlock,
                    options: MatchingOptions):
    sims = jnp.where(b1.valid[:, None] & b2.valid[None, :], sims, -jnp.inf)
    # best + second-best via two max passes — lax.top_k(k=2) sorts every
    # row, which dominated the whole matcher on TPU (43ms of 52ms for an
    # 8192^2 pair); the masked double-max is three fused reductions
    best_sim = jnp.max(sims, axis=1)
    best_idx = jnp.argmax(sims, axis=1).astype(jnp.int32)
    cols = jax.lax.broadcasted_iota(jnp.int32, sims.shape, 1)
    second_sim = jnp.max(
        jnp.where(cols == best_idx[:, None], -jnp.inf, sims), axis=1)
    best_dist = jnp.arccos(jnp.clip(best_sim, -1.0, 1.0))
    second_dist = jnp.arccos(jnp.clip(second_sim, -1.0, 1.0))

    ok = jnp.isfinite(best_sim)
    ok &= best_dist <= options.max_distance
    # strict <: equal distances (e.g. duplicated descriptors) are ambiguous
    ok &= best_dist < options.max_ratio * second_dist
    if options.cross_check:
        rev_best = jnp.argmax(sims, axis=0)  # (M,)
        ok &= rev_best[best_idx] == jnp.arange(b1.centered.shape[0])
    return jnp.where(ok & b1.valid, best_idx, -1).astype(jnp.int32)


def match_descriptors(b1: DescriptorBlock, b2: DescriptorBlock,
                      options: MatchingOptions = MatchingOptions()) -> jax.Array:
    """One-to-one matches. Returns (N,) int32 indices into b2 (-1 = none).

    Jittable; vmap over a leading pair axis for pair-batched matching.
    """
    sims = _cosine_similarities(b1, b2)
    return _select_matches(sims, b1, b2, options)


@partial(jax.jit, static_argnames=("options",))
def match_pairs_batch(b1: DescriptorBlock, b2: DescriptorBlock,
                      options: MatchingOptions = MatchingOptions()) -> jax.Array:
    """Match a batch of image pairs in one fused program.

    b1/b2 hold batched arrays: centered (B, N, 128), row_sum (B, N), ...
    """
    return jax.vmap(lambda a, b: match_descriptors(a, b, options))(b1, b2)


def match_pairs_batch_auto(b1: DescriptorBlock, b2: DescriptorBlock,
                           options: MatchingOptions = MatchingOptions()
                           ) -> jax.Array:
    """Production dispatch: the fused Pallas kernel on TPU (similarity
    tiles stay in VMEM — the XLA path materializes (B, N, M) f32 in HBM
    and re-reads it per reduction), exact XLA everywhere else or when the
    capacity isn't Mosaic-tileable (multiple of 128)."""
    import os

    n, m = b1.centered.shape[1], b2.centered.shape[1]
    if (jax.default_backend() != "cpu"
            and not os.environ.get("COLMAP_TPU_NO_PALLAS")
            and n % 128 == 0 and m % 128 == 0):
        from colmap_tpu.features.pallas_matcher import match_pairs_batch_pallas

        return match_pairs_batch_pallas(b1, b2, options)
    return match_pairs_batch(b1, b2, options)


def guided_match_descriptors(
    b1: DescriptorBlock, b2: DescriptorBlock,
    xy1, xy2, F: jax.Array, max_epipolar_error: float,
    options: MatchingOptions = MatchingOptions(),
) -> jax.Array:
    """Guided matching: candidates gated by epipolar (Sampson) distance.

    Reference: guided matching with E/F constraint (feature/sift.cc:1508).
    """
    sims = _cosine_similarities(b1, b2)
    one1 = jnp.ones_like(xy1[:, :1])
    h1 = jnp.concatenate([xy1, one1], axis=-1)  # (N, 3)
    one2 = jnp.ones_like(xy2[:, :1])
    h2 = jnp.concatenate([xy2, one2], axis=-1)  # (M, 3)
    Fx1 = h1 @ F.T  # (N, 3)
    Ftx2 = h2 @ F  # (M, 3)
    num = jnp.einsum("ni,mi->nm", Fx1, h2)  # x2^T F x1
    denom = (
        Fx1[:, 0:1] ** 2 + Fx1[:, 1:2] ** 2
        + (Ftx2[:, 0] ** 2 + Ftx2[:, 1] ** 2)[None, :]
    )
    sampson = num * num / jnp.maximum(denom, 1e-12)
    sims = jnp.where(sampson <= max_epipolar_error**2, sims, -jnp.inf)
    return _select_matches(sims, b1, b2, options)


def matches_to_pairs(match_idx) -> "tuple":
    """Host helper: (N,) match indices -> (K, 2) index pair array (numpy)."""
    import numpy as np

    m = np.asarray(match_idx)
    rows = np.nonzero(m >= 0)[0]
    return np.stack([rows, m[rows]], axis=-1).astype(np.uint32)
