"""Micro-bench: depthwise-3x3 backward strategies on TPU.

The config-4 train profile shows depthwise backward at 12.3 ms/step across
16 convs — ~100x the FLOPs-proportional cost.  This isolates, per stage
shape, what XLA charges for: forward, full autodiff backward, the data
gradient expressed as a flipped-kernel depthwise FORWARD (algebraically
identical at stride 1), and the filter gradient alone.

  PYTHONPATH=.:/root/.axon_site python tools/bench_depthwise.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

import jax
import jax.numpy as jnp
import numpy as np

SHAPES = [  # (B, H, W, C, dilation) mirroring xception stages at 800px
    (16, 200, 200, 128, 1),
    (16, 100, 100, 256, 1),
    (16, 50, 50, 512, 1),
    (16, 50, 50, 1024, 2),
]


def dw(x, w, dilation):
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(1, 1), padding="SAME",
        rhs_dilation=(dilation, dilation),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=x.shape[-1])


LOOP = 20


def timed(fn, *args, iters=3):
    """ms per op application.  The op loops LOOP times INSIDE one jit (with
    a data dependency so XLA cannot CSE it away): per-dispatch tunnel RTT is
    ~100 ms, far above these ms-scale ops, so host-side queuing cannot
    resolve them."""
    def looped(*a):
        def body(i, acc):
            # data-dependency through the first operand defeats CSE/hoisting
            a0 = a[0] * (1 + 0 * acc).astype(a[0].dtype)
            outs = fn(a0, *a[1:])
            leaf = jax.tree_util.tree_leaves(outs)[0]
            return acc + leaf.ravel()[0].astype(jnp.float32)
        return jax.lax.fori_loop(0, LOOP, body, jnp.float32(0.0))
    jl = jax.jit(looped)
    _ = np.asarray(jl(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = jl(*args)
    _ = np.asarray(out)
    return (time.perf_counter() - t0) / iters / LOOP * 1e3


def main():
    tot = {"fwd": 0.0, "bwd": 0.0, "dx_flip": 0.0, "dW_only": 0.0}
    for (b, h, w_, c, dil) in SHAPES:
        key = jax.random.PRNGKey(0)
        x = jax.random.normal(key, (b, h, w_, c), jnp.bfloat16)
        w = jax.random.normal(key, (3, 3, 1, c), jnp.bfloat16)
        dy = jax.random.normal(key, (b, h, w_, c), jnp.bfloat16)

        f_fwd = lambda x, w: dw(x, w, dil)
        f_bwd = lambda x, w, dy: jax.vjp(
            lambda a, b_: dw(a, b_, dil), x, w)[1](dy)
        f_dx = lambda dy, w: dw(dy, jnp.flip(w, (0, 1)), dil)
        f_dw = lambda x, w, dy: jax.vjp(
            lambda b_: dw(x, b_, dil), w)[1](dy)

        t_f = timed(f_fwd, x, w)
        t_b = timed(f_bwd, x, w, dy)
        t_x = timed(f_dx, dy, w)
        # the grouped filter-grad conv refuses to lower inside fori_loop;
        # estimate dW as (full backward - data grad)
        t_w = t_b - t_x
        print(f"[{b},{h},{w_},{c}] dil={dil}: fwd {t_f:6.2f}  "
              f"full-bwd {t_b:6.2f}  dx-as-flipped-fwd {t_x:6.2f}  "
              f"dW-est {t_w:6.2f} ms")
        tot["fwd"] += t_f; tot["bwd"] += t_b
        tot["dx_flip"] += t_x; tot["dW_only"] += t_w
    print("totals per unique shape-set:", {k: round(v, 2)
                                           for k, v in tot.items()})


if __name__ == "__main__":
    main()
