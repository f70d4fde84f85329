"""Pretrained-backbone import (SURVEY.md §2.3 "Pretrained-weight loader",
§5.4 "separate one-shot converter for pretrained backbone import").

The reference restores an ImageNet VGG/MobileNet checkpoint into the
backbone via a tf.train.Saver var map. TPU-native equivalents here:

  * npz transplant — export/import any params subtree by flattened path.
    Covers backbone reuse across our own configs (e.g. train SSD300,
    seed SSD512) and any externally-prepared ImageNet npz keyed by our
    param paths.
  * torch VGG16 converter — one-shot mapping from a torchvision-layout
    `vgg16` state_dict (features.N.weight/bias) onto VGG16Backbone's
    conv1_1..conv5_3 (fc6/fc7 have no torchvision counterpart in conv
    form and keep their random init, as in the original SSD recipe the
    reference follows — those were re-derived from fc layers there).
  * torch MobileNetV1 converter — mapping from a HuggingFace
    `transformers` MobileNetV1 state_dict (conv_stem + 26 alternating
    dw/pw layers, e.g. `google/mobilenet_v1_1.0_224`) onto
    MobileNetBackbone's stem + ds1..ds13, INCLUDING BatchNorm running
    stats (torchvision ships no MobileNetV1; HF does).

All conversions are host-side NumPy; the result is a normal variables
pytree ready for `jax.device_put`.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Mapping

import numpy as np


def flatten_tree(tree: Any, prefix: str = "") -> dict[str, np.ndarray]:
    """{'a': {'b': x}} → {'a/b': x} (dict-of-dict pytrees only)."""
    out: dict[str, np.ndarray] = {}
    if isinstance(tree, Mapping):
        for k, v in tree.items():
            out.update(flatten_tree(v, f"{prefix}{k}/"))
    else:
        out[prefix[:-1]] = np.asarray(tree)
    return out


def unflatten_into(tree: Any, flat: Mapping[str, np.ndarray], prefix: str = ""):
    """Return a copy of `tree` with any path present in `flat` replaced
    (shape-checked). Missing paths keep their current values."""
    if not isinstance(tree, Mapping):
        key = prefix[:-1]
        if key in flat:
            new = np.asarray(flat[key])
            if new.shape != tuple(np.shape(tree)):
                raise ValueError(
                    f"shape mismatch at {key}: ckpt {new.shape} vs "
                    f"model {np.shape(tree)}"
                )
            return new.astype(np.asarray(tree).dtype)
        return tree
    return {
        k: unflatten_into(v, flat, f"{prefix}{k}/") for k, v in tree.items()
    }


def save_params_npz(params: Any, path: str | Path, subtree: str | None = None):
    """Export a params (sub)tree to an npz keyed by flattened path."""
    if subtree:
        for part in subtree.split("/"):
            params = params[part]
    np.savez(path, **flatten_tree(params))


def load_params_npz(
    variables: dict, path: str | Path, subtree: str = "params/backbone"
) -> dict:
    """Merge an npz (keyed by path *within* `subtree`) into `variables`.

    Returns a new variables dict; arrays not present in the npz keep their
    (random-init) values — the standard transfer-learning contract.
    """
    flat = dict(np.load(path))
    parts = subtree.split("/")

    def rec(tree, depth):
        if depth == len(parts):
            return unflatten_into(tree, flat)
        out = dict(tree)
        out[parts[depth]] = rec(tree[parts[depth]], depth + 1)
        return out

    return rec(variables, 0)


def load_backbone_any_npz(variables: dict, path: str | Path) -> dict:
    """Seed `variables`' backbone from an npz in EITHER layout:

    * bare transplant — keys relative to ``params/backbone`` (the
      `save_params_npz(..., subtree=...)` form, or an externally prepared
      ImageNet npz keyed by our param paths);
    * full detector artifact — `utils/weights.py` layout
      (``params/...`` + ``batch_stats/...`` + ``__meta__``), e.g. the
      committed `artifacts/ssd_mobilenet_300_synth9k.npz`. Only the
      backbone subtree is taken — params AND BatchNorm running stats — so
      a backbone trained under one head (SSD) can seed another (YOLO).
    """
    flat = dict(np.load(path))
    flat.pop("__meta__", None)
    if not any(k.startswith("params/") for k in flat):
        return load_params_npz(variables, path)

    pp, sp = "params/backbone/", "batch_stats/backbone/"
    bb = {k[len(pp):]: v for k, v in flat.items() if k.startswith(pp)}
    if not bb:
        raise ValueError(f"{path} has no params/backbone/* entries")
    out = dict(variables)
    out["params"] = dict(variables["params"])
    out["params"]["backbone"] = unflatten_into(
        variables["params"]["backbone"], bb
    )
    stats = {k[len(sp):]: v for k, v in flat.items() if k.startswith(sp)}
    if stats and variables.get("batch_stats", {}).get("backbone") is not None:
        out["batch_stats"] = dict(variables["batch_stats"])
        out["batch_stats"]["backbone"] = unflatten_into(
            variables["batch_stats"]["backbone"], stats
        )
    return out


# torchvision vgg16 `features` conv indices, in order conv1_1..conv5_3.
_TORCH_VGG16_CONV_IDX = (0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28)
_VGG_BLOCK_LAYOUT = (  # (flax block name, convs in block)
    ("block1", 2), ("block2", 2), ("block3", 3), ("block4", 3), ("block5", 3)
)


def convert_torch_vgg16(state_dict: Mapping[str, Any]) -> dict[str, np.ndarray]:
    """torchvision vgg16 state_dict → flat {backbone-relative path: array}.

    Torch conv weights are (O, I, H, W); flax wants (H, W, I, O).
    Accepts tensors or ndarrays (call .numpy() lazily so torch stays an
    optional import).
    """
    flat: dict[str, np.ndarray] = {}
    idx = iter(_TORCH_VGG16_CONV_IDX)
    for block, n_convs in _VGG_BLOCK_LAYOUT:
        for ci in range(n_convs):
            i = next(idx)
            w = state_dict[f"features.{i}.weight"]
            b = state_dict[f"features.{i}.bias"]
            w = w.numpy() if hasattr(w, "numpy") else np.asarray(w)
            b = b.numpy() if hasattr(b, "numpy") else np.asarray(b)
            flat[f"{block}/conv{ci + 1}/kernel"] = np.transpose(
                w, (2, 3, 1, 0)
            ).astype(np.float32)
            flat[f"{block}/conv{ci + 1}/bias"] = b.astype(np.float32)
    return flat


# Our MobileNetBackbone block names in HF layer order: layer.{2k} is the
# depthwise conv of block k, layer.{2k+1} its pointwise conv (k = 0..12).
_MOBILENET_BLOCKS = tuple(f"ds{k + 1}" for k in range(13))


def convert_torch_mobilenet_v1(
    state_dict: Mapping[str, Any],
) -> tuple[dict[str, np.ndarray], dict[str, np.ndarray]]:
    """HF-transformers MobileNetV1 state_dict → (flat params, flat stats).

    Returns backbone-relative paths for the params tree
    (`stem/Conv_0/kernel`, `ds3/dw/BatchNorm_0/scale`, …) and the
    batch_stats tree (`…/BatchNorm_0/{mean,var}`). Torch conv weights are
    (O, I/g, H, W); flax wants (H, W, I/g, O) — one transpose covers both
    regular and depthwise convs. Accepts a bare MobileNetV1Model state_dict
    or a classifier's (keys prefixed `mobilenet_v1.`).
    """

    def arr(t):
        return (t.numpy() if hasattr(t, "numpy") else np.asarray(t)).astype(
            np.float32
        )

    sd = {
        (k[len("mobilenet_v1."):] if k.startswith("mobilenet_v1.") else k): v
        for k, v in state_dict.items()
    }
    params: dict[str, np.ndarray] = {}
    stats: dict[str, np.ndarray] = {}

    def take(src: str, dst: str):
        params[f"{dst}/Conv_0/kernel"] = np.transpose(
            arr(sd[f"{src}.convolution.weight"]), (2, 3, 1, 0)
        )
        params[f"{dst}/BatchNorm_0/scale"] = arr(sd[f"{src}.normalization.weight"])
        params[f"{dst}/BatchNorm_0/bias"] = arr(sd[f"{src}.normalization.bias"])
        stats[f"{dst}/BatchNorm_0/mean"] = arr(
            sd[f"{src}.normalization.running_mean"]
        )
        stats[f"{dst}/BatchNorm_0/var"] = arr(
            sd[f"{src}.normalization.running_var"]
        )

    take("conv_stem", "stem")
    for k, block in enumerate(_MOBILENET_BLOCKS):
        take(f"layer.{2 * k}", f"{block}/dw")
        take(f"layer.{2 * k + 1}", f"{block}/pw")
    return params, stats


def import_torch_mobilenet_v1(variables: dict, ckpt_path: str | Path) -> dict:
    """Load a torch-saved HF MobileNetV1 state_dict into MobileNetBackbone.

    Accepts either a full detector's variables (backbone under
    params/backbone + batch_stats/backbone) or a bare backbone's variables.
    BatchNorm running stats import alongside the weights so fine-tuning
    starts from the ImageNet statistics (SURVEY.md §2.3).
    """
    import torch

    state_dict = torch.load(ckpt_path, map_location="cpu", weights_only=True)
    if hasattr(state_dict, "state_dict"):
        state_dict = state_dict.state_dict()
    flat_params, flat_stats = convert_torch_mobilenet_v1(state_dict)

    out = dict(variables)
    for col, flat in (("params", flat_params), ("batch_stats", flat_stats)):
        if col not in out:
            continue
        tree = dict(out[col])
        if "backbone" in tree:
            tree["backbone"] = unflatten_into(tree["backbone"], flat)
        else:
            tree = unflatten_into(tree, flat)
        out[col] = tree
    return out


def import_torch_vgg16(variables: dict, ckpt_path: str | Path) -> dict:
    """Load a torch .pth ImageNet VGG16 into VGG16Backbone's conv stacks.

    Accepts either a full detector's variables (backbone under
    params/backbone) or a bare VGG16Backbone's variables.
    """
    import torch

    state_dict = torch.load(ckpt_path, map_location="cpu", weights_only=True)
    if hasattr(state_dict, "state_dict"):
        state_dict = state_dict.state_dict()
    flat = convert_torch_vgg16(state_dict)
    out = dict(variables)
    out["params"] = dict(variables["params"])
    if "backbone" in out["params"]:
        out["params"]["backbone"] = unflatten_into(
            variables["params"]["backbone"], flat
        )
    else:
        out["params"] = unflatten_into(variables["params"], flat)
    return out
