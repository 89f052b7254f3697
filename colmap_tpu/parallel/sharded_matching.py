"""Multi-chip sharded descriptor matching.

Reference parallelism surface: block-wise exhaustive matching distributed
over GPU worker threads (src/colmap/feature/pairing.h:41-47,
controllers/feature_matching_utils.cc). TPU design: the pair-block axis is
sharded over the device mesh — every chip matches its slice of pair blocks
with the same int8 GEMM program (features/matching.py), no collectives
needed until the host gathers the match indices. For the O(N^2) exhaustive
problem this is the DP axis of BASELINE.json's multi-host matching config;
descriptors are replicated (or ring-passed for very large N — the
all_gather variant below).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from colmap_tpu.features import matching as matching_mod
from colmap_tpu.parallel.mesh import DATA_AXIS, make_mesh


def match_pair_blocks_sharded(
    mesh,
    d1_u8: np.ndarray,  # (B, N, 128) uint8 descriptors, side 1
    d2_u8: np.ndarray,  # (B, N, 128)
    v1: np.ndarray,  # (B, N) bool
    v2: np.ndarray,
    options: matching_mod.MatchingOptions = matching_mod.MatchingOptions(),
) -> np.ndarray:
    """Match B pairs sharded over the mesh; returns (B, N) int32 indices.

    B must be a multiple of the mesh size (pad with empty pairs).
    """
    n_dev = mesh.devices.size
    B = d1_u8.shape[0]
    assert B % n_dev == 0, f"pad pair blocks to a multiple of {n_dev}"

    shard = NamedSharding(mesh, P(DATA_AXIS))

    def prep(d, v):
        b = matching_mod.prepare_descriptors(
            jnp.asarray(d.reshape(-1, 128)), jnp.asarray(v.reshape(-1)))
        return jax.tree.map(
            lambda x: x.reshape((B,) + ((d.shape[1],) + x.shape[1:])), b)

    b1 = prep(d1_u8, v1)
    b2 = prep(d2_u8, v2)
    b1 = jax.tree.map(lambda x: jax.device_put(x, shard), b1)
    b2 = jax.tree.map(lambda x: jax.device_put(x, shard), b2)

    @jax.jit
    def run(b1, b2):
        return jax.vmap(
            lambda a, b: matching_mod.match_descriptors(a, b, options)
        )(b1, b2)

    out = run(b1, b2)
    return np.asarray(out)


def exhaustive_match_all_gather(
    mesh,
    descriptors: np.ndarray,  # (I, N, 128) uint8, one row per image
    valid: np.ndarray,  # (I, N)
    options: matching_mod.MatchingOptions = matching_mod.MatchingOptions(),
) -> np.ndarray:
    """All-pairs matching with image shards: each chip holds I/n_dev images
    and matches them against ALL images via jax.lax.all_gather over ICI —
    the ring-style analog of the reference's 50x50 block schedule for
    problems where descriptors do not fit one chip.

    Returns (I, I, N) int32 match indices (row image -> column image).
    """
    try:
        from jax import shard_map
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map

    n_dev = mesh.devices.size
    I = descriptors.shape[0]
    assert I % n_dev == 0, f"pad images to a multiple of {n_dev}"

    d = jnp.asarray(descriptors)
    v = jnp.asarray(valid)

    def block(d_local, v_local, d_all, v_all):
        # d_local: (I/n, N, 128); d_all: (I, N, 128)
        def one_row(dl, vl):
            b1 = matching_mod.prepare_descriptors(dl, vl)

            def one_col(dc, vc):
                b2 = matching_mod.prepare_descriptors(dc, vc)
                return matching_mod.match_descriptors(b1, b2, options)

            return jax.vmap(one_col)(d_all, v_all)

        return jax.vmap(one_row)(d_local, v_local)

    def shard_fn(d_shard, v_shard):
        d_all = jax.lax.all_gather(d_shard, DATA_AXIS, axis=0, tiled=True)
        v_all = jax.lax.all_gather(v_shard, DATA_AXIS, axis=0, tiled=True)
        return block(d_shard, v_shard, d_all, v_all)

    fn = shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(DATA_AXIS), P(DATA_AXIS)),
        out_specs=P(DATA_AXIS),
    )
    out = jax.jit(fn)(d, v)
    return np.asarray(out)
