"""int8-vs-bf16 conv feasibility microbench for the serving path.

v5e's MXU peak is 2x in int8 vs bf16, and int8 halves the HBM bytes the
bandwidth-bound stages move (DESIGN §14: both judged backbones sit at
1.06-1.44x their bf16 bandwidth floor) — so post-training quantization is
the one remaining >1.2x serving lever the rooflines leave open. Before
building a PTQ path, this measures what XLA actually delivers for the
dominant conv shapes of config 3 (Xception-lite 800px/b16) and config 1
(ResNet-50): same conv, bf16 vs int8xint8->int32 (requantized to int8
between iterations, as a real quantized net would).

Timing per the repo protocol (§13): K iterations chained through a data
dependency inside ONE jit, best-of-3 passes, scalar readback fence.

  python tools/bench_int8.py
"""
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))
import time
import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

K = 30          # chained conv iterations inside one jit
PASSES = 3

# (name, batch, H, W, Cin, Cout, kernel, feature_group_count)
SHAPES = [
    # config-3 Xception-lite stage pointwise convs (the MXU work)
    ("xc stage1 1x1 200x200x128", 16, 200, 200, 128, 128, (1, 1), 1),
    ("xc stage2 1x1 100x100x256", 16, 100, 100, 256, 256, (1, 1), 1),
    ("xc stage4 1x1 50x50x1024", 16, 50, 50, 1024, 1024, (1, 1), 1),
    # depthwise 3x3 (the bandwidth work; fgc=C)
    ("xc stage1 dw3x3 200x200x128", 16, 200, 200, 128, 128, (3, 3), 128),
    ("xc stage4 dw3x3 50x50x1024", 16, 50, 50, 1024, 1024, (3, 3), 1024),
    # config-1 ResNet-50 3x3 dense convs
    ("r50 C3 3x3 100x100x128", 16, 100, 100, 128, 128, (3, 3), 1),
    ("r50 C5(dilated) 3x3 50x50x512", 16, 50, 50, 512, 512, (3, 3), 1),
]


def bench_one(name, b, h, w, cin, cout, kern, fgc):
    kh, kw = kern
    dn = lax.conv_dimension_numbers((b, h, w, cin), (kh, kw, cin // fgc, cout),
                                    ("NHWC", "HWIO", "NHWC"))

    def chain_bf16(x, k):
        def body(_, x):
            y = lax.conv_general_dilated(x, k, (1, 1), "SAME",
                                         dimension_numbers=dn,
                                         feature_group_count=fgc,
                                         preferred_element_type=jnp.float32)
            return y.astype(jnp.bfloat16)
        return lax.fori_loop(0, K, body, x).sum(dtype=jnp.float32)

    def chain_int8(x, k):
        def body(_, x):
            y = lax.conv_general_dilated(x, k, (1, 1), "SAME",
                                         dimension_numbers=dn,
                                         feature_group_count=fgc,
                                         preferred_element_type=jnp.int32)
            # requantize: shift back into int8 range (stand-in for the
            # per-channel rescale a PTQ net applies; a real rescale is a
            # multiply the VPU fuses the same way)
            return (y >> 7).astype(jnp.int8)
        return lax.fori_loop(0, K, body, x).sum(dtype=jnp.int32)

    key = jax.random.PRNGKey(0)
    xb = jax.random.normal(key, (b, h, w, cin), jnp.bfloat16)
    kb = jax.random.normal(key, (kh, kw, cin // fgc, cout), jnp.bfloat16) * 0.05
    xi = jax.random.randint(key, (b, h, w, cin), -127, 127, jnp.int8)
    ki = jax.random.randint(key, (kh, kw, cin // fgc, cout), -4, 4, jnp.int8)

    fb = jax.jit(chain_bf16)
    fi = jax.jit(chain_int8)
    out = {}
    for label, f, args in (("bf16", fb, (xb, kb)), ("int8", fi, (xi, ki))):
        try:
            _ = np.asarray(f(*args))  # compile + warm
            best = float("inf")
            for _ in range(PASSES):
                t0 = time.perf_counter()
                _ = np.asarray(f(*args))
                best = min(best, time.perf_counter() - t0)
            out[label] = best / K * 1e3  # ms per conv
        except Exception as e:  # int8 conv unsupported -> record, don't die
            out[label] = None
            out[label + "_err"] = str(e).splitlines()[0][:120]
    flops = 2 * b * h * w * kh * kw * (cin // fgc) * cout
    return out, flops


def main():
    print(f"platform: {jax.devices()[0].platform}")
    print(f"{'shape':38s} {'bf16 ms':>8s} {'int8 ms':>8s} {'speedup':>8s} "
          f"{'bf16 TF/s':>9s}")
    for row in SHAPES:
        out, flops = bench_one(*row)
        b16, i8 = out.get("bf16"), out.get("int8")
        if i8 is None:
            print(f"{row[0]:38s} {b16:8.3f} {'ERR':>8s}   "
                  f"-> {out.get('int8_err', '?')}")
            continue
        print(f"{row[0]:38s} {b16:8.3f} {i8:8.3f} {b16 / i8:7.2f}x "
              f"{flops / (b16 * 1e-3) / 1e12:9.1f}")


if __name__ == "__main__":
    main()
