"""Data-parallel training step: shard_map over the mesh, psum grad sync.

BASELINE config 5 (v5e-16, global batch 128, psum gradient sync over ICI).
The per-device body is the *same* loss function the single-chip trainer uses
(x_detector_tpu.train.trainer.make_loss_fn); shard_map shards the batch on
the leading axis, every device computes local grads, one ``pmean`` over the
"data" axis synchronizes gradients (and batch-norm statistics), and the
optimizer update runs replicated — identical math to a single device with
the global batch.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, PartitionSpec as P

from x_detector_tpu.config import ExperimentConfig
from x_detector_tpu.parallel.mesh import DATA_AXIS
from x_detector_tpu.train.trainer import make_grad_fn, make_loss_fn
from x_detector_tpu.train.train_state import TrainState


def make_dp_train_step(model, cfg: ExperimentConfig, mesh: Mesh,
                       loss_fn=None):
    """Returns a jitted (state, batch, rng) -> (state, metrics) where
    ``batch`` is sharded over ``mesh``'s data axis and ``state`` replicated.

    ``loss_fn`` (params, batch_stats, batch, rng) -> (loss, (metrics, bs))
    defaults to the family loss; injectable for tests.
    """
    if loss_fn is None:
        loss_fn = make_loss_fn(model, cfg)
    # Composes with gradient accumulation: each device scans its shard in
    # cfg.train.grad_accum_steps microbatches before the pmean (global
    # batch = devices x accum x microbatch, one optimizer update).
    grad_fn = make_grad_fn(loss_fn, cfg.train.grad_accum_steps)

    def per_device(state: TrainState, batch, rng: jax.Array):
        # Decorrelate per-device randomness (RPN sampling etc.).
        rng = jax.random.fold_in(rng, jax.lax.axis_index(DATA_AXIS))
        grads, new_bs, metrics = grad_fn(state.params, state.batch_stats,
                                         batch, rng)
        # Gradient + BN-stat + metric sync over ICI.
        grads = jax.lax.pmean(grads, DATA_AXIS)
        new_bs = jax.lax.pmean(new_bs, DATA_AXIS)
        metrics = jax.lax.pmean(metrics, DATA_AXIS)
        state = state.apply_gradients(grads, new_bs)
        return state, metrics

    sharded = jax.shard_map(
        per_device, mesh=mesh,
        in_specs=(P(), P(DATA_AXIS), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(sharded, donate_argnums=(0,))
