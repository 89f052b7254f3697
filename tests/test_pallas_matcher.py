"""Pallas fused matcher vs the exact XLA matcher (interpret mode on CPU).

On TPU hardware the kernel compiles natively (verified: 100% agreement and
~8 ms for an 8192^2 pair); CI runs it through the Pallas interpreter.
"""

import numpy as np
import pytest

import jax

from colmap_tpu.features import matching as m
from colmap_tpu.features import pallas_matcher as pm


@pytest.fixture(autouse=True)
def _interpret(monkeypatch):
    from jax.experimental import pallas as pl

    orig = pl.pallas_call

    def patched(*args, **kwargs):
        kwargs.setdefault("interpret", True)
        return orig(*args, **kwargs)

    monkeypatch.setattr(pl, "pallas_call", patched)
    # bypass the jit wrappers (their caches would keep a non-interpret build)
    for name in ("_top2_fwd_rev_batch", "match_pairs_batch_pallas"):
        fn = getattr(pm, name)
        if hasattr(fn, "__wrapped__"):
            monkeypatch.setattr(pm, name, fn.__wrapped__)
    yield


def test_pallas_matcher_agrees_with_exact(rng):
    n = 512
    d1 = rng.integers(0, 200, (n, 128)).astype(np.uint8)
    perm = rng.permutation(n)
    d2 = np.clip(d1[perm].astype(int) + rng.integers(-3, 4, (n, 128)),
                 0, 255).astype(np.uint8)
    b1 = m.prepare_descriptors(d1)
    b2 = m.prepare_descriptors(d2)
    out = np.asarray(pm.match_descriptors_pallas(b1, b2, tile_m=128))
    ref = np.asarray(m.match_descriptors(b1, b2))
    assert (out == ref).mean() > 0.999
    matched = out >= 0
    inv = np.argsort(perm)
    assert (out[matched] == inv[matched]).mean() > 0.99


def test_pallas_batched_agrees_with_exact(rng):
    B, n = 3, 256
    d1 = rng.integers(0, 200, (B, n, 128)).astype(np.uint8)
    d2 = np.empty_like(d1)
    for b in range(B):
        perm = rng.permutation(n)
        d2[b] = np.clip(d1[b, perm].astype(int)
                        + rng.integers(-3, 4, (n, 128)), 0, 255)
    v1 = np.ones((B, n), bool)
    v2 = np.ones((B, n), bool)
    v2[0, : n // 4] = False  # padding rows in one pair of the block
    b1 = jax.vmap(m.prepare_descriptors)(d1, jax.numpy.asarray(v1))
    b2 = jax.vmap(m.prepare_descriptors)(d2, jax.numpy.asarray(v2))
    out = np.asarray(pm.match_pairs_batch_pallas(b1, b2, tile_m=128))
    ref = np.asarray(m.match_pairs_batch(b1, b2))
    assert out.shape == (B, n)
    assert (out == ref).mean() > 0.999


def test_pallas_matcher_handles_invalid_rows(rng):
    n = 256
    d1 = rng.integers(0, 200, (n, 128)).astype(np.uint8)
    d2 = d1.copy()
    v1 = np.ones(n, bool)
    v2 = np.ones(n, bool)
    v2[: n // 2] = False  # half of image-2 rows are padding
    b1 = m.prepare_descriptors(d1, jax.numpy.asarray(v1))
    b2 = m.prepare_descriptors(d2, jax.numpy.asarray(v2))
    out = np.asarray(pm.match_descriptors_pallas(b1, b2, tile_m=128))
    # no match may point at an invalid row
    assert not np.any((out >= 0) & (out < n // 2))
    # valid identical rows still match
    assert (out[n // 2:] == np.arange(n // 2, n)).mean() > 0.95
