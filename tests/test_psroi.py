import jax
import jax.numpy as jnp
import numpy as np

from x_detector_tpu.ops.psroi_align import (
    batched_psroi_align, psroi_align, psroi_align_reference)


def random_rois(rng, n):
    ymin = rng.uniform(0, 0.6, n)
    xmin = rng.uniform(0, 0.6, n)
    h = rng.uniform(0.1, 0.4, n)
    w = rng.uniform(0.1, 0.4, n)
    return np.stack([ymin, xmin, np.minimum(ymin + h, 1.0),
                     np.minimum(xmin + w, 1.0)], -1).astype(np.float32)


def test_einsum_matches_gather_oracle(rng):
    grid, c = 3, 4
    feat = rng.normal(0, 1, (10, 12, grid * grid * c)).astype(np.float32)
    rois = random_rois(rng, 16)
    ref = np.asarray(psroi_align_reference(jnp.asarray(feat),
                                           jnp.asarray(rois), grid=grid))
    got = np.asarray(psroi_align(jnp.asarray(feat), jnp.asarray(rois),
                                 grid=grid, precise=True))
    assert ref.shape == (16, grid, grid, c)
    np.testing.assert_allclose(got, ref, atol=1e-4, rtol=1e-4)


def test_realistic_lighthead_shape(rng):
    # 490-channel thin map, 7x7 grid, 10 channels/bin
    feat = rng.normal(0, 1, (13, 17, 490)).astype(np.float32)
    rois = random_rois(rng, 32)
    ref = np.asarray(psroi_align_reference(jnp.asarray(feat),
                                           jnp.asarray(rois), grid=7))
    got = np.asarray(psroi_align(jnp.asarray(feat), jnp.asarray(rois),
                                 grid=7, precise=True))
    assert got.shape == (32, 7, 7, 10)
    np.testing.assert_allclose(got, ref, atol=1e-4, rtol=1e-4)


def test_position_sensitivity():
    # constant-per-group features: bin (i,j) must read group i*k+j exactly
    grid, c = 2, 1
    feat = np.zeros((8, 8, grid * grid * c), np.float32)
    for g in range(grid * grid):
        feat[:, :, g] = float(g)
    rois = jnp.asarray([[0.25, 0.25, 0.75, 0.75]], jnp.float32)
    out = np.asarray(psroi_align(jnp.asarray(feat), rois, grid=grid, precise=True))
    np.testing.assert_allclose(out[0, :, :, 0], [[0.0, 1.0], [2.0, 3.0]],
                               atol=1e-5)


def test_degenerate_roi_does_not_nan(rng):
    grid, c = 3, 2
    feat = rng.normal(0, 1, (6, 6, grid * grid * c)).astype(np.float32)
    rois = jnp.asarray([[0.5, 0.5, 0.5, 0.5],      # zero-size
                        [0.0, 0.0, 0.0, 0.0]], jnp.float32)
    out = np.asarray(psroi_align(jnp.asarray(feat), rois, grid=grid, precise=True))
    assert np.isfinite(out).all()


def test_gradient_deterministic_and_correct(rng):
    grid, c = 2, 2
    feat = rng.normal(0, 1, (6, 6, grid * grid * c)).astype(np.float32)
    rois = jnp.asarray(random_rois(rng, 4))

    def loss(f):
        return (psroi_align(f, rois, grid=grid, precise=True) ** 2).sum()

    g1 = jax.grad(loss)(jnp.asarray(feat))
    g2 = jax.grad(loss)(jnp.asarray(feat))
    # bitwise determinism (reference CUDA backward was atomicAdd-nondet)
    assert (np.asarray(g1) == np.asarray(g2)).all()
    # finite-difference check on one coordinate
    eps = 1e-3
    idx = (2, 3, 1)
    fp = feat.copy(); fp[idx] += eps
    fm = feat.copy(); fm[idx] -= eps
    fd = (loss(jnp.asarray(fp)) - loss(jnp.asarray(fm))) / (2 * eps)
    np.testing.assert_allclose(np.asarray(g1)[idx], fd, rtol=1e-2, atol=1e-2)


def test_batched_matches_loop(rng):
    grid, c = 2, 3
    feats = rng.normal(0, 1, (2, 7, 9, grid * grid * c)).astype(np.float32)
    rois = np.stack([random_rois(rng, 5) for _ in range(2)])
    out = np.asarray(batched_psroi_align(jnp.asarray(feats),
                                         jnp.asarray(rois), grid=grid, precise=True))
    for b in range(2):
        single = np.asarray(psroi_align(jnp.asarray(feats[b]),
                                        jnp.asarray(rois[b]), grid=grid, precise=True))
        np.testing.assert_allclose(out[b], single, atol=1e-5)


def test_bf16_default_close_to_oracle(rng):
    feat = rng.normal(0, 1, (13, 17, 490)).astype(np.float32)
    rois = random_rois(rng, 16)
    ref = np.asarray(psroi_align_reference(jnp.asarray(feat),
                                           jnp.asarray(rois), grid=7))
    got = np.asarray(psroi_align(jnp.asarray(feat), jnp.asarray(rois),
                                 grid=7))  # default bf16 operands
    # bf16 operands, fp32 accumulation: ~2-3 decimal digits
    np.testing.assert_allclose(got, ref, atol=0.05, rtol=0.05)
