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


def _put(tree: dict, path: Tuple[str, ...], leaf) -> None:
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = leaf


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
    put = _put

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


def tf_slim_resnet50_to_flax(ckpt: Dict[str, "np.ndarray"],
                             stage_sizes=(3, 4, 6, 3),
                             scope: str = "resnet_v1_50"
                             ) -> Tuple[dict, dict]:
    """Map a TF-slim ``resnet_v1_50`` checkpoint (the reference's actual
    pretrained-ImageNet format — SURVEY.md §2.6 T5: slim var names like
    ``resnet_v1_50/block1/unit_1/bottleneck_v1/conv1/weights``) to
    (params, batch_stats) for :class:`ResNetV1`.

    ``ckpt`` is a flat name->array dict (see :func:`read_tf_checkpoint`).
    Slim conv kernels are already [kH, kW, I, O] — no transpose.  The
    logits head is ignored, mirroring the reference's exclude-logits
    restore.  Note slim's stride placement (last unit of a block) differs
    from torchvision's (first unit); weight SHAPES are identical, and this
    model family fixes its own stride layout, so the graft is name-only.
    """
    def g(name: str) -> np.ndarray:
        return np.asarray(ckpt[f"{scope}/{name}"], np.float32)

    params: dict = {}
    stats: dict = {}

    def bn(prefix: str, dst: Tuple[str, ...]) -> None:
        gamma = f"{scope}/{prefix}/BatchNorm/gamma"
        # resnet_arg_scope uses scale=True; tolerate scale=False ckpts
        scale = (np.asarray(ckpt[gamma], np.float32) if gamma in ckpt
                 else np.ones_like(g(f"{prefix}/BatchNorm/beta")))
        _put(params, dst + ("bn", "scale"), scale)
        _put(params, dst + ("bn", "bias"), g(f"{prefix}/BatchNorm/beta"))
        _put(stats, dst + ("bn", "mean"),
             g(f"{prefix}/BatchNorm/moving_mean"))
        _put(stats, dst + ("bn", "var"),
             g(f"{prefix}/BatchNorm/moving_variance"))

    _put(params, ("stem", "Conv_0", "kernel"), g("conv1/weights"))
    bn("conv1", ("stem",))

    for stage, n_units in enumerate(stage_sizes):
        for unit in range(n_units):
            t = f"block{stage + 1}/unit_{unit + 1}/bottleneck_v1"
            f = (f"stage{stage + 1}_block{unit}",)
            for ci in range(3):
                _put(params, f + (f"ConvBN_{ci}", "Conv_0", "kernel"),
                     g(f"{t}/conv{ci + 1}/weights"))
                bn(f"{t}/conv{ci + 1}", f + (f"ConvBN_{ci}",))
            if f"{scope}/{t}/shortcut/weights" in ckpt:
                _put(params, f + ("proj", "Conv_0", "kernel"),
                     g(f"{t}/shortcut/weights"))
                bn(f"{t}/shortcut", f + ("proj",))
    return params, stats


def read_tf_checkpoint(path: str) -> Dict[str, np.ndarray]:
    """Read every variable of a TF checkpoint into a flat name->array dict
    (host-side; TF is in the image purely as a checkpoint reader)."""
    import tensorflow as tf  # local import: TF is optional at runtime

    reader = tf.train.load_checkpoint(path)
    return {name: reader.get_tensor(name)
            for name in reader.get_variable_to_shape_map()}


def load_pretrained_backbone(variables: dict, path: str,
                             stage_sizes=(3, 4, 6, 3),
                             scope: str = "backbone") -> dict:
    """Format-sniffing pretrained restore covering both lineages the
    reference's T5 supports: torchvision ``.pth``/``.pt`` state dicts and
    TF-slim ``resnet_v1_50`` checkpoints (path = Saver prefix or file).
    Returns new variables with the backbone grafted, heads untouched."""
    if path.endswith((".pth", ".pt")):
        import torch  # cpu wheel; checkpoint reader only

        sd = torch.load(path, map_location="cpu", weights_only=True)
        bp, bs = torch_resnet50_to_flax(sd, stage_sizes=stage_sizes)
    else:
        bp, bs = tf_slim_resnet50_to_flax(read_tf_checkpoint(path),
                                          stage_sizes=stage_sizes)
    return load_backbone_into_variables(variables, bp, bs, scope=scope)


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
