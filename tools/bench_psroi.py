"""Op-level PSROIAlign A/B: XLA separable-einsum vs Pallas kernel (fp32/bf16).

Config-3 shapes (SURVEY.md §2.5 O1, docs/ROADMAP.md item 5): 50x50x490 thin
maps, 1000 rois, batch 16.  Measurement uses the axon-safe protocol: N
queued executions over distinct inputs, one scalar readback fences the FIFO.

  PYTHONPATH=.:/root/.axon_site python tools/bench_psroi.py
"""
import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))
import jax, jax.numpy as jnp, numpy as np
from x_detector_tpu.ops.psroi_align import batched_psroi_align
from x_detector_tpu.ops.pallas.psroi_align_kernel import batched_psroi_align_pallas

B, H, W, K, C, R = 16, 50, 50, 7, 10, 1000
ITERS = 8

def bench(name, fn):
    feats = [jax.random.normal(jax.random.PRNGKey(i), (B, H, W, K*K*C), jnp.float32)
             for i in range(ITERS)]
    roi = jax.random.uniform(jax.random.PRNGKey(99), (B, R, 2, 2))
    rois = jnp.concatenate([roi.min(2), roi.max(2)], -1)[..., [0,2,1,3]][..., [0,1,2,3]]
    lo = jnp.minimum(roi[..., 0, :], roi[..., 1, :])
    hi = jnp.maximum(roi[..., 0, :], roi[..., 1, :])
    rois = jnp.stack([lo[...,0], lo[...,1], hi[...,0], hi[...,1]], -1)
    jf = jax.jit(lambda f: fn(f, rois).sum())
    _ = np.asarray(jf(feats[0])); _ = np.asarray(jf(feats[1]))
    t0 = time.perf_counter()
    outs = [jf(f) for f in feats]
    _ = np.asarray(outs[-1])
    dt = (time.perf_counter() - t0) / ITERS
    print(f"{name:28s} {dt*1e3:7.2f} ms")
    return dt

e_bf = bench("einsum bf16 (production)", lambda f, r: batched_psroi_align(f, r))
e_fp = bench("einsum fp32 (precise)", lambda f, r: batched_psroi_align(f, r, precise=True))
p_fp = bench("pallas fp32", lambda f, r: batched_psroi_align_pallas(f, r))
p_bf = bench("pallas bf16", lambda f, r: batched_psroi_align_pallas(f, r, precise=False))
print(f"pallas-bf16 vs einsum-bf16: {e_bf/p_bf:.2f}x")
