"""Train state: params + batch stats + optimizer state, one pytree.

Replaces TF1 Saver/Scaffold state (SURVEY.md §5 checkpoint/resume) with a
functional pytree that Orbax serializes wholesale.
"""

from __future__ import annotations

from typing import Any

import flax.struct
import jax
import optax


@flax.struct.dataclass
class TrainState:
    step: jax.Array
    params: Any
    batch_stats: Any
    opt_state: Any
    ema_params: Any  # None, or EMA shadow of params (reference T5 EMA)
    tx: optax.GradientTransformation = flax.struct.field(pytree_node=False)
    ema_decay: float = flax.struct.field(pytree_node=False, default=0.0)

    def apply_gradients(self, grads, new_batch_stats=None) -> "TrainState":
        updates, new_opt_state = self.tx.update(grads, self.opt_state,
                                                self.params)
        new_params = optax.apply_updates(self.params, updates)
        new_ema = self.ema_params
        # decay 0 freezes an adopted shadow (checkpoint-reconcile case)
        # instead of collapsing it onto the raw params every step.
        if self.ema_params is not None and self.ema_decay > 0:
            d = self.ema_decay
            new_ema = jax.tree_util.tree_map(
                lambda e, p: d * e + (1.0 - d) * p,
                self.ema_params, new_params)
        return self.replace(
            step=self.step + 1,
            params=new_params,
            batch_stats=(new_batch_stats if new_batch_stats is not None
                         else self.batch_stats),
            opt_state=new_opt_state,
            ema_params=new_ema,
        )

    @classmethod
    def create(cls, params, batch_stats, tx: optax.GradientTransformation,
               ema_decay: float = 0.0) -> "TrainState":
        import jax.numpy as jnp
        # The shadow must be a genuine copy: aliasing the params buffers
        # makes any donating jit ("donate the same buffer twice") explode.
        ema = (jax.tree_util.tree_map(jnp.array, params)
               if ema_decay > 0 else None)
        return cls(step=jnp.zeros((), jnp.int32), params=params,
                   batch_stats=batch_stats, opt_state=tx.init(params),
                   ema_params=ema, tx=tx, ema_decay=ema_decay)
