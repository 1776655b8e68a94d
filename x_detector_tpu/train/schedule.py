"""Learning-rate schedules (piecewise-constant decay + linear warmup).

The reference drives Momentum with piecewise-constant lr decay via flags
(SURVEY.md §2.6 T1); warmup is the standard detection-training addition.
"""

from __future__ import annotations

from typing import Sequence

import optax

from x_detector_tpu.config import TrainConfig


def piecewise_with_warmup(base_lr: float, boundaries: Sequence[int],
                          decays: Sequence[float],
                          warmup_steps: int = 0) -> optax.Schedule:
    assert len(decays) == len(boundaries) + 1

    assert all(int(b) > warmup_steps for b in boundaries), (
        f"lr boundaries {tuple(boundaries)} must all exceed "
        f"warmup_steps={warmup_steps}")

    def make_piecewise(offset: int):
        # join_schedules passes (step - warmup_steps) to later schedules, so
        # boundaries are expressed relative to the warmup end — otherwise
        # every decay would silently fire warmup_steps late.
        return optax.piecewise_constant_schedule(
            init_value=base_lr,
            boundaries_and_scales={
                int(b) - offset: decays[i + 1] / decays[i]
                for i, b in enumerate(boundaries)})

    if warmup_steps <= 0:
        return make_piecewise(0)
    warmup = optax.linear_schedule(init_value=base_lr * 0.1,
                                   end_value=base_lr,
                                   transition_steps=warmup_steps)
    return optax.join_schedules([warmup, make_piecewise(warmup_steps)],
                                [warmup_steps])


def _kernel_mask(params):
    """Weight decay only on conv/dense kernels, not biases/BN (slim idiom)."""
    import jax
    return jax.tree_util.tree_map_with_path(
        lambda path, _: any(
            getattr(k, "key", None) == "kernel" for k in path), params)


def make_optimizer(cfg: TrainConfig) -> optax.GradientTransformation:
    """SGD + momentum 0.9 + decoupled weight decay (reference: Momentum with
    L2 ~1e-4; SURVEY.md §2.6 T1)."""
    schedule = piecewise_with_warmup(cfg.learning_rate, cfg.lr_boundaries,
                                     cfg.lr_decays, cfg.warmup_steps)
    return optax.chain(
        optax.add_decayed_weights(cfg.weight_decay, mask=_kernel_mask),
        optax.sgd(learning_rate=schedule, momentum=cfg.momentum),
    )
