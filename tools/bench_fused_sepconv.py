"""Race: fused separable-conv Pallas kernel vs the unfused XLA pair.

Round-5 build of the config-3 depthwise attack (round-4 verdict item 5).
Two tiers, both §13 in-jit K-vs-2K timing (tunnel-safe):

  1. per-stage op microbench at the judged config-3 shapes (batch 16 @
     800 px): fused_separable_conv vs the exact lax dw3x3 -> 1x1 ->
     affine -> relu it replaces, with the HBM speed-of-light for each
     (fused floor = read x + write y; unfused = 2x the activation bytes);
  2. end-to-end lighthead_xception inference, ModelConfig.
     backbone_fused_sepconv on vs off (same variables).

Run WITHOUT setting PYTHONPATH (this script inserts its own sys.path):

  python tools/bench_fused_sepconv.py [--batch 16] [--iters 48] [--passes 3]
"""
import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

import jax
import jax.numpy as jnp
import numpy as np

from bench_infer import V5E_HBM_BW, _time_fn

STAGES = [  # (H, W, C, Cout, dilation) at config-3 800px, batch 16
    ("stage1", 200, 200, 128, 128, 1),
    ("stage2", 100, 100, 256, 256, 1),
    ("stage3", 50, 50, 512, 512, 1),
    ("stage4", 50, 50, 1024, 1024, 2),
]


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--iters", type=int, default=48,
                   help="in-jit loop count per timed call; at 8 the sub-ms "
                        "per-stage ops were swamped by tunnel RTT jitter "
                        "(negative K-vs-2K differences, race3 log); 48 "
                        "gave stable numbers (race5)")
    p.add_argument("--passes", type=int, default=3)
    p.add_argument("--skip-ops", action="store_true")
    p.add_argument("--skip-e2e", action="store_true")
    args = p.parse_args()

    from x_detector_tpu.ops.pallas.fused_sepconv import (
        fused_separable_conv, reference_separable_conv)

    print(f"platform: {jax.devices()[0].platform}")

    if not args.skip_ops:
        b = args.batch
        print(f"{'stage':<9}{'unfused ms':>11}{'fused ms':>10}{'x':>6}"
              f"{'fused BW-floor':>15}")
        for name, h, w, c, co, d in STAGES:
            key = jax.random.PRNGKey(0)
            wd = jax.random.normal(key, (3, 3, c), jnp.float32) * 0.1
            wp = jax.random.normal(key, (c, co), jnp.float32) * 0.05
            scale = jnp.ones((co,), jnp.float32)
            bias = jnp.zeros((co,), jnp.float32)
            stacked = jax.jit(lambda k: jax.random.normal(
                k, (args.iters, b, h, w, c), jnp.bfloat16))(key)

            def mk(fn):
                # _time_fn feeds f32 inputs with a data-dep epsilon; cast
                # back to bf16 (the production activation dtype)
                def run(v, x):
                    y = fn(x.astype(jnp.bfloat16), wd, wp, scale, bias,
                           dilation=d, relu=True)
                    return y.astype(jnp.float32).sum()
                return run

            t_ref = _time_fn(mk(reference_separable_conv), {}, stacked,
                             args.passes)
            t_fused = _time_fn(mk(fused_separable_conv), {}, stacked,
                               args.passes)
            floor = 2 * b * h * w * c * 2 / V5E_HBM_BW * 1e3
            print(f"{name:<9}{t_ref * 1e3:>11.2f}{t_fused * 1e3:>10.2f}"
                  f"{t_ref / t_fused:>6.2f}{floor:>13.2f}ms")

    if not args.skip_e2e:
        from x_detector_tpu.config import PRESETS
        from x_detector_tpu.models.lighthead import (LightHeadRCNN,
                                                     lighthead_postprocess)
        cfg = PRESETS["lighthead_xception"]()
        size = cfg.model.image_size
        model = LightHeadRCNN(config=cfg.model, dtype=jnp.bfloat16)
        variables = model.init(jax.random.PRNGKey(0),
                               jnp.zeros((1, size, size, 3)), train=False)
        fused_cfg = dataclasses.replace(cfg.model,
                                        backbone_fused_sepconv=True)
        fused_model = LightHeadRCNN(config=fused_cfg, dtype=jnp.bfloat16)
        stacked = jax.jit(lambda k: jax.random.uniform(
            k, (args.iters, args.batch, size, size, 3), jnp.bfloat16,
            maxval=255.0))(jax.random.PRNGKey(0))

        out = {}
        for name, m, mc in (("unfused", model, cfg.model),
                            ("fused", fused_model, fused_cfg)):
            def fn(v, x, m=m, mc=mc):
                det = lighthead_postprocess(m.apply(v, x, train=False), mc)
                return det.scores.sum()
            sec = _time_fn(fn, variables, stacked, args.passes)
            out[name] = sec
            print(f"e2e {name}: {sec * 1e3:.2f} ms/batch -> "
                  f"{args.batch / sec:.1f} img/s/chip")
        print(json.dumps({
            "preset": "lighthead_xception", "batch": args.batch,
            "unfused_ms": round(out["unfused"] * 1e3, 2),
            "fused_ms": round(out["fused"] * 1e3, 2),
            "speedup": round(out["unfused"] / out["fused"], 3),
            "fused_images_per_sec_per_chip":
                round(args.batch / out["fused"], 1),
        }))


if __name__ == "__main__":
    main()
