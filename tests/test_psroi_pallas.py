"""Pallas PSROIAlign kernel vs the jnp oracle (interpret mode on CPU)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental import pallas as pl

from test_psroi import random_rois
from x_detector_tpu.ops.psroi_align import psroi_align_reference
from x_detector_tpu.ops.pallas import psroi_align_kernel as K


@pytest.fixture(autouse=True)
def interpret_mode(monkeypatch):
    """Run pallas_call in interpreter mode (no TPU in the test env)."""
    orig = pl.pallas_call
    monkeypatch.setattr(pl, "pallas_call",
                        functools.partial(orig, interpret=True))
    yield


def test_kernel_matches_oracle(rng):
    grid, c = 7, 10
    feat = rng.normal(0, 1, (13, 17, grid * grid * c)).astype(np.float32)
    rois = random_rois(rng, 2 * K.BLOCK_R)
    ref = np.asarray(psroi_align_reference(jnp.asarray(feat),
                                           jnp.asarray(rois), grid=grid))
    got = np.asarray(K.psroi_align_pallas(jnp.asarray(feat),
                                          jnp.asarray(rois), grid))
    assert got.shape == (2 * K.BLOCK_R, grid, grid, c)
    np.testing.assert_allclose(got, ref, atol=2e-2, rtol=2e-2)


def test_kernel_small_grid(rng):
    grid, c = 3, 4
    feat = rng.normal(0, 1, (10, 12, grid * grid * c)).astype(np.float32)
    rois = random_rois(rng, K.BLOCK_R)
    ref = np.asarray(psroi_align_reference(jnp.asarray(feat),
                                           jnp.asarray(rois), grid=grid))
    got = np.asarray(K.psroi_align_pallas(jnp.asarray(feat),
                                          jnp.asarray(rois), grid))
    np.testing.assert_allclose(got, ref, atol=2e-2, rtol=2e-2)


def test_kernel_gradient_matches_einsum(rng):
    from x_detector_tpu.ops.psroi_align import psroi_align
    grid, c = 2, 2
    feat = rng.normal(0, 1, (6, 6, grid * grid * c)).astype(np.float32)
    rois = jnp.asarray(random_rois(rng, K.BLOCK_R))

    g_pallas = jax.grad(
        lambda f: (K.psroi_align_pallas(f, rois, grid) ** 2).sum())(
        jnp.asarray(feat))
    g_einsum = jax.grad(
        lambda f: (psroi_align(f, rois, grid=grid, precise=True) ** 2).sum())(
        jnp.asarray(feat))
    np.testing.assert_allclose(np.asarray(g_pallas), np.asarray(g_einsum),
                               atol=5e-2, rtol=5e-2)


def test_batched_kernel(rng):
    grid, c = 7, 10
    feats = rng.normal(0, 1, (2, 9, 11, grid * grid * c)).astype(np.float32)
    rois = np.stack([random_rois(rng, K.BLOCK_R) for _ in range(2)])
    out = np.asarray(K.batched_psroi_align_pallas(
        jnp.asarray(feats), jnp.asarray(rois), grid=grid))
    assert out.shape == (2, K.BLOCK_R, grid, grid, c)
    for b in range(2):
        ref = np.asarray(psroi_align_reference(
            jnp.asarray(feats[b]), jnp.asarray(rois[b]), grid=grid))
        np.testing.assert_allclose(out[b], ref, atol=2e-2, rtol=2e-2)
