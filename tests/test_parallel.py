"""Data-parallel training on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from test_train import small_ssd_cfg, small_lighthead_cfg, get_batch
from x_detector_tpu.parallel import mesh as mesh_lib
from x_detector_tpu.parallel.data_parallel import make_dp_train_step
from x_detector_tpu.train.trainer import (create_model_and_state,
                                          make_train_step)

import dataclasses


def test_mesh_has_8_devices():
    m = mesh_lib.make_mesh()
    assert m.devices.size == 8


def test_dp_step_runs_on_8_devices(dp8_ssd):
    cfg, model, fresh_state, m, step = dp8_ssd
    state = fresh_state()
    batch = get_batch(cfg)
    batch = mesh_lib.shard_batch(m, batch)
    state = mesh_lib.replicate_state(m, state)
    state, metrics = step(state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["total_loss"]))
    assert int(state.step) == 1


@pytest.mark.slow
def test_dp_collective_math_exact_on_continuous_loss():
    """DP psum grad sync == manual per-shard grad averaging, verified with a
    continuous surrogate loss.

    (Exact equality on the real detection losses is ill-posed: hard-negative
    mining/OHEM are discontinuous top-k selections, so fp-reassociation
    between differently-compiled partitionings can flip which anchors are
    selected and reroute gradients — observed and expected.  The detector DP
    steps are covered by the smoke tests; here we isolate the collective
    arithmetic.)
    """
    cfg = small_ssd_cfg()
    cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, batch_size=4))
    model, state0 = create_model_and_state(cfg, jax.random.PRNGKey(0),
                                           dtype=jnp.float32)
    batch = get_batch(cfg)
    rng = jax.random.PRNGKey(3)
    n_dev = 4

    def surrogate(params, batch_stats, b, rng):
        # continuous + param/batch-dependent: couples a conv kernel's norm
        # with the per-shard image statistics
        k = params["backbone"]["stem"]["Conv_0"]["kernel"]
        loss = (jnp.tanh(k) ** 2).sum() * (b["image"] ** 2).mean()
        return loss, ({"surrogate": loss}, batch_stats)

    grads_list, losses = [], []
    for i in range(n_dev):
        shard = {k: v[i:i + 1] for k, v in batch.items()}
        r = jax.random.fold_in(rng, i)
        (loss, _), g = jax.value_and_grad(surrogate, has_aux=True)(
            state0.params, state0.batch_stats, shard, r)
        grads_list.append(g)
        losses.append(float(loss))
    avg_grads = jax.tree_util.tree_map(
        lambda *gs: sum(gs) / n_dev, *grads_list)
    s_ref = state0.apply_gradients(avg_grads)

    m = mesh_lib.make_mesh(n_dev)
    dp_step = make_dp_train_step(model, cfg, m, loss_fn=surrogate)
    s2, m2 = dp_step(mesh_lib.replicate_state(m, state0),
                     mesh_lib.shard_batch(m, batch), rng)

    np.testing.assert_allclose(float(m2["total_loss"]), np.mean(losses),
                               rtol=1e-6)
    l1 = jax.tree_util.tree_leaves(s_ref.params)
    l2 = jax.tree_util.tree_leaves(s2.params)
    for a, b in zip(l1, l2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


@pytest.mark.slow
def test_dp_detector_loss_matches_shard_mean(dp8_ssd):
    """The DP detector loss equals the mean of per-shard losses (continuous
    quantity; tolerant of fp reassociation). Reuses the session DP compile
    (8 devices, 1 image/device)."""
    from x_detector_tpu.train.trainer import make_loss_fn

    cfg, model, fresh_state, m, dp_step = dp8_ssd
    state0 = fresh_state()
    batch = get_batch(cfg)
    rng = jax.random.PRNGKey(3)
    loss_fn = jax.jit(make_loss_fn(model, cfg))
    losses = []
    for i in range(8):
        shard = {k: v[i:i + 1] for k, v in batch.items()}
        l, _ = loss_fn(state0.params, state0.batch_stats, shard,
                       jax.random.fold_in(rng, i))
        losses.append(float(l))
    _, m2 = dp_step(mesh_lib.replicate_state(m, state0),
                    mesh_lib.shard_batch(m, batch), rng)
    np.testing.assert_allclose(float(m2["total_loss"]), np.mean(losses),
                               rtol=1e-3)


def test_dp_lighthead_step():
    cfg = small_lighthead_cfg()
    cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, batch_size=8))
    model, state = create_model_and_state(cfg, jax.random.PRNGKey(0),
                                          dtype=jnp.float32)
    m = mesh_lib.make_mesh(8)
    step = make_dp_train_step(model, cfg, m)
    batch = get_batch(cfg)
    state = mesh_lib.replicate_state(m, state)
    batch = mesh_lib.shard_batch(m, batch)
    state, metrics = step(state, batch, jax.random.PRNGKey(1))
    for k in ("rpn_cls_loss", "roi_cls_loss", "total_loss"):
        assert np.isfinite(float(metrics[k])), k
    assert int(state.step) == 1


@pytest.mark.slow  # subprocess spins up its own 8-device CPU jax
def test_graft_dryrun_multichip_is_environment_proof():
    """The driver calls __graft_entry__.dryrun_multichip(8) from a process
    whose ambient JAX platform may be an unusable remote-TPU backend
    (round-1 post-mortem: MULTICHIP_r01.json recorded a libtpu version
    mismatch).  The function must self-pin to a virtual CPU mesh in a
    subprocess, so it must succeed even when the caller's env demands a
    nonexistent platform."""
    import os
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "definitely_not_a_platform"
    env.pop("XLA_FLAGS", None)
    proc = subprocess.run(
        [sys.executable, "-c",
         "import __graft_entry__ as g; g.dryrun_multichip(8)"],
        cwd=repo, env=env, capture_output=True, text=True, timeout=900)
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "ok, loss=" in proc.stdout


@pytest.mark.slow  # compiles two full eval pipelines on the 1-core host
def test_dp_eval_matches_single_device():
    """Data-parallel inference (batch sharded over the 8-device mesh,
    params replicated) returns the same detections as the single-device
    eval fn — detection is per-image, so partitioning the batch must not
    change any output."""
    from x_detector_tpu.cli.evaluate import build_eval_fn

    cfg = small_ssd_cfg()
    model, state = create_model_and_state(cfg, jax.random.PRNGKey(0),
                                          dtype=jnp.float32)
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    images = jax.random.uniform(jax.random.PRNGKey(5), (8, 64, 64, 3),
                                jnp.float32, maxval=1.0)

    single = build_eval_fn(model, cfg)
    m = mesh_lib.make_mesh(8)
    dp = build_eval_fn(model, cfg, mesh=m)

    ref = [np.asarray(x) for x in single(variables, images)]
    got = [np.asarray(x) for x in
           dp(mesh_lib.replicate_state(m, variables),
              mesh_lib.shard_batch(m, images))]
    np.testing.assert_array_equal(ref[3], got[3])        # valid mask
    for r, g, name in zip(ref, got, ("boxes", "scores", "classes")):
        np.testing.assert_allclose(r, g, atol=1e-4, err_msg=name)

    # partial final batch: eval data sources do not drop remainders, so
    # run_eval must zero-pad a 5-image tail to the mesh multiple and
    # discard the padded rows (regression: this used to assert out)
    from x_detector_tpu.cli.evaluate import run_eval

    raw = {
        "image": np.asarray(images[:5]) * 255.0,
        "gt_boxes": np.tile([[0.2, 0.2, 0.6, 0.6]], (5, 1, 1)),
        "gt_labels": np.ones((5, 1), np.int32),
        "gt_mask": np.ones((5, 1), bool),
    }
    res = run_eval(model, variables, cfg, iter([raw]), 1, mesh=m,
                   eval_fn=None)
    assert 0.0 <= res["mAP"] <= 1.0


# ---------------------------------------------------------------------------
# Gradient accumulation (TrainConfig.grad_accum_steps)
# ---------------------------------------------------------------------------

def _bn_touching_surrogate(params, batch_stats, b, rng):
    """Continuous loss that also perturbs batch_stats, so the accumulation
    path's grad averaging AND BN-stat averaging are both exercised (see
    test_dp_collective_math_exact_on_continuous_loss for why the real
    detection losses cannot be compared bitwise across partitionings)."""
    del rng
    k = params["backbone"]["stem"]["Conv_0"]["kernel"]
    loss = (jnp.tanh(k) ** 2).sum() * (b["image"] ** 2).mean()
    new_bs = jax.tree_util.tree_map(
        lambda s: s + b["image"].mean(), batch_stats)
    return loss, ({"surrogate": loss}, new_bs)


def test_grad_accum_matches_dp_math():
    """accum-4 on one device == 4-way DP == (2-way DP x accum-2), exactly:
    same grads (averaged), same BN stats (averaged from the step-initial
    running stats, i.e. pmean semantics), same metrics."""
    from x_detector_tpu.train.trainer import make_grad_fn

    cfg = small_ssd_cfg()
    cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, batch_size=4))
    model, state0 = create_model_and_state(cfg, jax.random.PRNGKey(0),
                                           dtype=jnp.float32)
    batch = get_batch(cfg)
    rng = jax.random.PRNGKey(3)

    # arm 1: single device, accum 4
    gf = jax.jit(make_grad_fn(_bn_touching_surrogate, 4))
    grads, new_bs, metrics = gf(state0.params, state0.batch_stats, batch,
                                rng)
    s_accum = state0.apply_gradients(grads, new_bs)

    # The DP steps donate their state arg and replicate_state aliases the
    # input buffers on CPU — each donating arm gets a genuine copy.
    def state_copy():
        return jax.tree_util.tree_map(jnp.array, state0)

    # arm 2: 4-way DP, no accumulation
    m4 = mesh_lib.make_mesh(4)
    dp4 = make_dp_train_step(model, cfg, m4,
                             loss_fn=_bn_touching_surrogate)
    s_dp, m_dp = dp4(mesh_lib.replicate_state(m4, state_copy()),
                     mesh_lib.shard_batch(m4, batch), rng)

    # arm 3: 2-way DP x accum-2 composition
    cfg22 = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, grad_accum_steps=2))
    m2 = mesh_lib.make_mesh(2)
    dp22 = make_dp_train_step(model, cfg22, m2,
                              loss_fn=_bn_touching_surrogate)
    s_22, _ = dp22(mesh_lib.replicate_state(m2, state_copy()),
                   mesh_lib.shard_batch(m2, batch), rng)

    np.testing.assert_allclose(float(metrics["total_loss"]),
                               float(m_dp["total_loss"]), rtol=1e-6)
    for ref, got, tag in ((s_accum, s_dp, "dp4"), (s_accum, s_22, "dp2x2")):
        for a, b in zip(jax.tree_util.tree_leaves(ref.params),
                        jax.tree_util.tree_leaves(got.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-6, err_msg=tag)
        for a, b in zip(jax.tree_util.tree_leaves(ref.batch_stats),
                        jax.tree_util.tree_leaves(got.batch_stats)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-6, err_msg=tag + " bn")


def test_grad_accum_batch_divisibility_error():
    from x_detector_tpu.train.trainer import make_grad_fn

    cfg = small_ssd_cfg()
    model, state0 = create_model_and_state(cfg, jax.random.PRNGKey(0),
                                           dtype=jnp.float32)
    batch = get_batch(cfg)  # batch 2
    gf = make_grad_fn(_bn_touching_surrogate, 3)
    with pytest.raises(ValueError, match="not divisible"):
        gf(state0.params, state0.batch_stats, batch, jax.random.PRNGKey(0))


@pytest.mark.slow  # compiles a full SSD train step with a scan body
def test_grad_accum_real_family_step():
    """The real SSD loss under accum-2: runs, learns direction (finite
    loss), one optimizer update, loss ~= mean of the per-microbatch losses
    (loose: OHEM top-k can reassociate across compilations)."""
    from x_detector_tpu.train.trainer import make_loss_fn, make_train_step

    cfg = small_ssd_cfg()
    cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, batch_size=4,
                                       grad_accum_steps=2))
    model, state = create_model_and_state(cfg, jax.random.PRNGKey(0),
                                          dtype=jnp.float32)
    batch = get_batch(cfg)
    rng = jax.random.PRNGKey(7)
    step = jax.jit(make_train_step(model, cfg))
    state1, metrics = step(state, batch, rng)
    assert int(state1.step) == 1
    assert np.isfinite(float(metrics["total_loss"]))

    loss_fn = jax.jit(make_loss_fn(model, cfg))
    micro_losses = []
    for i in range(2):
        mb = {k: v[i * 2:(i + 1) * 2] for k, v in batch.items()}
        l, _ = loss_fn(state.params, state.batch_stats, mb,
                       jax.random.fold_in(rng, i))
        micro_losses.append(float(l))
    np.testing.assert_allclose(float(metrics["total_loss"]),
                               np.mean(micro_losses), rtol=1e-3)
