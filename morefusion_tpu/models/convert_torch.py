"""torchvision-format ResNet18 weight conversion (offline pretrained path).

The reference's ``--pretrained-resnet18`` recipe initializes its extractor
from chainercv2's ImageNet ResNet18 and freezes BN
(``morefusion/models/resnet.py:7-52``). This environment has no network
egress, so the import path is: download ``resnet18-f37072fd.pth``
(torchvision) on any machine, copy it here, and convert with
``convert_torchvision_resnet18(torch.load(path))``.

Layout mapping (torchvision -> ``ResNet18Extractor``):

    conv1 / bn1              -> Conv_0 / BatchNorm_0
    layer1.{0,1}             -> BNBasicBlock_{0,1}      (64 ch)
    layer2.{0,1}             -> BNBasicBlock_{2,3}      (128 ch, downsample)
    layer3.{0,1}             -> BNBasicBlock_{4,5}      (256 ch, dilation 2)
    layer4.{0,1}             -> BNBasicBlock_{6,7}      (512 ch, dilation 4)

The res4/res5 stride-2 convolutions are applied at stride 1 with dilation
instead (weights unchanged) — exactly the reference's dilated conversion.
Torch conv weights are (O, I, kH, kW); flax wants (kH, kW, I, O).
"""

from __future__ import annotations

from typing import Dict

import numpy as np


def _np(v) -> np.ndarray:
    if hasattr(v, "detach"):
        v = v.detach().cpu().numpy()
    return np.asarray(v, dtype=np.float32)


def _conv(state: Dict, key: str) -> Dict:
    return {"kernel": _np(state[f"{key}.weight"]).transpose(2, 3, 1, 0)}


def _bn(state: Dict, key: str):
    params = {
        "scale": _np(state[f"{key}.weight"]),
        "bias": _np(state[f"{key}.bias"]),
    }
    stats = {
        "mean": _np(state[f"{key}.running_mean"]),
        "var": _np(state[f"{key}.running_var"]),
    }
    return params, stats


def _block(state: Dict, key: str, downsample: bool):
    """One torchvision BasicBlock -> one BNBasicBlock param/stats pair."""
    params, stats = {}, {}
    params["Conv_0"] = _conv(state, f"{key}.conv1")
    params["BatchNorm_0"], stats["BatchNorm_0"] = _bn(state, f"{key}.bn1")
    params["Conv_1"] = _conv(state, f"{key}.conv2")
    params["BatchNorm_1"], stats["BatchNorm_1"] = _bn(state, f"{key}.bn2")
    if downsample:
        params["Conv_2"] = _conv(state, f"{key}.downsample.0")
        params["BatchNorm_2"], stats["BatchNorm_2"] = _bn(
            state, f"{key}.downsample.1"
        )
    return params, stats


def convert_torchvision_resnet18(state_dict: Dict) -> Dict:
    """torchvision resnet18 ``state_dict`` -> flax variables for
    ``ResNet18Extractor`` (``{"params": ..., "batch_stats": ...}``)."""
    if "state_dict" in state_dict and "conv1.weight" not in state_dict:
        state_dict = state_dict["state_dict"]

    params: Dict = {"Conv_0": _conv(state_dict, "conv1")}
    stats: Dict = {}
    params["BatchNorm_0"], stats["BatchNorm_0"] = _bn(state_dict, "bn1")

    i = 0
    for layer in (1, 2, 3, 4):
        for sub in (0, 1):
            name = f"BNBasicBlock_{i}"
            downsample = layer > 1 and sub == 0
            params[name], stats[name] = _block(
                state_dict, f"layer{layer}.{sub}", downsample
            )
            i += 1
    return {"params": params, "batch_stats": stats}


def graft_resnet18(variables: Dict, converted: Dict) -> Dict:
    """Insert converted extractor weights into a full model's variables.

    ``variables`` is the init output of a model built with
    ``pretrained_resnet18=True`` (the extractor lives under
    ``resnet_extractor``). Returns a new variables dict.
    """
    import jax

    variables = jax.tree_util.tree_map(lambda x: x, variables)  # copy
    out = {k: dict(v) for k, v in variables.items()}
    out["params"] = dict(out["params"])
    out["params"]["resnet_extractor"] = converted["params"]
    stats = dict(out.get("batch_stats", {}))
    stats["resnet_extractor"] = converted["batch_stats"]
    out["batch_stats"] = stats
    return out
