"""Offline pretrained-backbone converters: torch/TF checkpoints -> Flax.

Rebuilds the reference's ImageNet-init path (SURVEY.md §2.6 T5:
``get_init_fn_for_scaffold``-style restore with variable-name remapping) for
a no-egress environment (§7 hard part 6): torch 2.x-cpu and TF 2.x are in
the image purely to *read* checkpoint formats; this module maps a
torchvision-style ResNet-50 state dict onto this repo's ``ResNetV1``
parameter tree.  From-scratch training remains the fallback (synthetic-data
configs never use pretrained weights).

Weight layout notes:
  * torch conv weight [O, I, kH, kW]  ->  flax kernel [kH, kW, I, O]
  * torch BN {weight, bias, running_mean, running_var} ->
    BatchNorm2D {scale, bias} params + {mean, var} batch_stats
  * torchvision bottleneck downsample == our "proj" ConvBN
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np


def _conv(w) -> np.ndarray:
    return np.transpose(np.asarray(w, np.float32), (2, 3, 1, 0))


def torch_resnet50_to_flax(state_dict: Dict[str, "np.ndarray"],
                           stage_sizes=(3, 4, 6, 3)
                           ) -> Tuple[dict, dict]:
    """Map a torchvision ``resnet50().state_dict()`` to (params,
    batch_stats) for :class:`x_detector_tpu.models.resnet.ResNetV1`.

    Ignores the fc head.  Tensors may be torch tensors or numpy arrays.
    """
    sd = {k: np.asarray(getattr(v, "cpu", lambda: v)()) if hasattr(v, "cpu")
          else np.asarray(v) for k, v in state_dict.items()}

    params: dict = {}
    stats: dict = {}

    def put(tree, path, leaf):
        node = tree
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = leaf

    def bn(prefix, dst):
        put(params, dst + ("bn", "scale"),
            sd[prefix + ".weight"].astype(np.float32))
        put(params, dst + ("bn", "bias"),
            sd[prefix + ".bias"].astype(np.float32))
        put(stats, dst + ("bn", "mean"),
            sd[prefix + ".running_mean"].astype(np.float32))
        put(stats, dst + ("bn", "var"),
            sd[prefix + ".running_var"].astype(np.float32))

    # stem
    put(params, ("stem", "Conv_0", "kernel"), _conv(sd["conv1.weight"]))
    bn("bn1", ("stem",))

    for stage, n_blocks in enumerate(stage_sizes):
        for block in range(n_blocks):
            t = f"layer{stage + 1}.{block}"
            f = (f"stage{stage + 1}_block{block}",)
            for ci, tname in enumerate(["conv1", "conv2", "conv3"]):
                put(params, f + (f"ConvBN_{ci}", "Conv_0", "kernel"),
                    _conv(sd[f"{t}.{tname}.weight"]))
                bn(f"{t}.bn{ci + 1}", f + (f"ConvBN_{ci}",))
            if f"{t}.downsample.0.weight" in sd:
                put(params, f + ("proj", "Conv_0", "kernel"),
                    _conv(sd[f"{t}.downsample.0.weight"]))
                bn(f"{t}.downsample.1", f + ("proj",))
    return params, stats


def load_backbone_into_variables(variables: dict, backbone_params: dict,
                                 backbone_stats: dict,
                                 scope: str = "backbone") -> dict:
    """Graft converted backbone weights into a full model's variables
    (heads keep their fresh init — the reference's exclude-logits restore)."""
    import jax

    new_vars = jax.tree_util.tree_map(lambda x: x, variables)  # copy
    target_p = new_vars["params"][scope]
    target_s = new_vars["batch_stats"][scope]

    def merge(dst, src, path=""):
        for k, v in src.items():
            assert k in dst, f"no target for pretrained {path}/{k}"
            if isinstance(v, dict):
                merge(dst[k], v, f"{path}/{k}")
            else:
                assert dst[k].shape == v.shape, (
                    f"shape mismatch at {path}/{k}: "
                    f"{dst[k].shape} vs {v.shape}")
                dst[k] = v.astype(dst[k].dtype)

    merge(target_p, backbone_params)
    merge(target_s, backbone_stats)
    return new_vars
