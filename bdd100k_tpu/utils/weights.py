"""Single-file detector weights (.npz) — a portable, committable artifact.

The orbax run directory (utils/checkpoint.py) is the training-time format:
sharding-aware, async, resumable — and tied to a directory tree that lives
in scratch space. This module is the complement: ONE compressed npz holding
{params, batch_stats} by flattened path (utils/pretrained.py conventions)
plus a JSON meta record (config name, step, EMA provenance). Use cases:

  * commit a trained model into the repo (fp16 params ≈ 13 MB for the
    SSD300-MobileNet flagship) so accuracy claims survive scratch wipes;
  * hand a single file to evaluate.py / infer.py (`--ckpt_dir foo.npz`);
  * archive the EMA shadow of a run as plain weights.

The reference's analog is a `tf.train.Saver` checkpoint triple
(SURVEY.md §2.4 "Checkpointing") — this is the same "just the weights"
artifact, minus the session graph baggage.

Restore is STRICT, unlike the transfer-learning loader in
utils/pretrained.py: every model path must be present in the file and
every file path must be consumed — a full-detector artifact that only
partially matches the model is an error, not a warm start.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any, Mapping

import numpy as np

FORMAT_VERSION = 1
_META_KEY = "__meta__"


def save_detector_npz(
    path: str | Path,
    params: Any,
    batch_stats: Any,
    *,
    config_name: str,
    step: int = 0,
    source: str = "params",
    param_dtype=np.float16,
) -> dict:
    """Write a single-file weights artifact; returns the meta record.

    Floating-point params are stored at `param_dtype` (fp16 by default:
    measured mAP impact is below the int8 path's −0.0015, see
    BENCH_MATRIX.md "Accuracy"); batch_stats stay fp32 — they are tiny and
    E[x²]-derived variances lose real precision in half floats.
    `source` records provenance ("params" or "ema").
    """
    from bdd100k_tpu.utils.pretrained import flatten_tree

    flat: dict[str, np.ndarray] = {}
    for k, v in flatten_tree(params, "params/").items():
        v = np.asarray(v)
        if np.issubdtype(v.dtype, np.floating):
            v = v.astype(param_dtype)
        flat[k] = v
    if batch_stats:
        for k, v in flatten_tree(batch_stats, "batch_stats/").items():
            flat[k] = np.asarray(v, np.float32)
    meta = {
        "format_version": FORMAT_VERSION,
        "config": config_name,
        "step": int(step),
        "source": source,
        "param_dtype": np.dtype(param_dtype).name,
    }
    flat[_META_KEY] = np.frombuffer(
        json.dumps(meta).encode("utf-8"), np.uint8
    ).copy()
    np.savez_compressed(path, **flat)
    return meta


def load_detector_npz(
    path: str | Path,
) -> tuple[dict[str, np.ndarray], dict[str, np.ndarray], dict]:
    """Read an artifact → (flat params, flat batch_stats, meta).

    Keys are paths relative to their collection (no 'params/' prefix);
    dtypes are as stored — the strict restore below casts to the model's.
    """
    with np.load(path) as z:
        flat = {k: z[k] for k in z.files}
    meta = {}
    if _META_KEY in flat:
        meta = json.loads(bytes(flat.pop(_META_KEY).tobytes()).decode())
    params = {
        k[len("params/"):]: v
        for k, v in flat.items()
        if k.startswith("params/")
    }
    stats = {
        k[len("batch_stats/"):]: v
        for k, v in flat.items()
        if k.startswith("batch_stats/")
    }
    unknown = [
        k for k in flat
        if not k.startswith(("params/", "batch_stats/"))
    ]
    if unknown:
        raise ValueError(f"unrecognized keys in {path}: {unknown[:5]}")
    return params, stats, meta


def _restore_tree(
    template: Any, flat: Mapping[str, np.ndarray], what: str, prefix: str = ""
) -> Any:
    """Rebuild `template`'s structure from `flat`, shape-checked, cast to
    the template leaf dtype. Missing path = error (strict contract)."""
    if isinstance(template, Mapping):
        return {
            k: _restore_tree(v, flat, what, f"{prefix}{k}/")
            for k, v in template.items()
        }
    key = prefix[:-1]
    if key not in flat:
        raise ValueError(
            f"weights file is missing {what} path '{key}' — artifact/"
            "model config mismatch (strict full-detector restore)"
        )
    arr = np.asarray(flat[key])
    want_shape = tuple(template.shape)
    if arr.shape != want_shape:
        raise ValueError(
            f"shape mismatch at {what}/{key}: file {arr.shape} vs model "
            f"{want_shape}"
        )
    return arr.astype(template.dtype)


def _flat_paths(tree: Any, prefix: str = "") -> set[str]:
    if isinstance(tree, Mapping):
        out: set[str] = set()
        for k, v in tree.items():
            out |= _flat_paths(v, f"{prefix}{k}/")
        return out
    return {prefix[:-1]}


def load_into_state(
    state: Any,
    path: str | Path,
    *,
    ema: bool = False,
    expect_config: str | None = None,
):
    """Restore a single-file artifact into a TrainState → (state, step).

    Strict both ways: the file must cover every model path AND contain no
    extra paths. `ema=True` demands an artifact exported from the EMA
    shadow (`source == "ema"`); there is no in-file shadow to pick from —
    the file IS one set of weights.
    """
    import jax

    flat_params, flat_stats, meta = load_detector_npz(path)
    if ema and meta.get("source") != "ema":
        raise SystemExit(
            f"--ema requested but {path} was exported from "
            f"source={meta.get('source', 'unknown')!r}; re-export with "
            "scripts/export_weights.py --ema"
        )
    if expect_config and meta.get("config") not in (None, expect_config):
        print(
            f"WARNING: weights artifact was exported for config "
            f"{meta.get('config')!r} but loading into {expect_config!r} "
            "(shapes checked, postprocess constants are the config's)"
        )
    tpl = jax.tree.map(
        lambda l: jax.ShapeDtypeStruct(np.shape(l), l.dtype),
        {"params": state.params, "batch_stats": state.batch_stats},
    )
    new_params = _restore_tree(tpl["params"], flat_params, "params")
    new_stats = _restore_tree(tpl["batch_stats"], flat_stats, "batch_stats")
    extra = (set(flat_params) - _flat_paths(state.params)) | (
        set(flat_stats)
        - (_flat_paths(state.batch_stats) if state.batch_stats else set())
    )
    if extra:
        raise ValueError(
            f"weights file has paths absent from the model: "
            f"{sorted(extra)[:5]}{'…' if len(extra) > 5 else ''}"
        )
    # keep each leaf's device placement/sharding (mesh-replicated eval
    # restores replicated; single-device stays single-device); one put per
    # tree, not per leaf — tunnel dispatches are ~10-30 ms each (CLAUDE.md)
    put = {
        "params": jax.device_put(
            new_params, jax.tree.map(lambda l: l.sharding, state.params)
        ),
        "batch_stats": jax.device_put(
            new_stats, jax.tree.map(lambda l: l.sharding, state.batch_stats)
        ) if state.batch_stats else {},
    }
    step = int(meta.get("step", 0))
    state = state.replace(
        params=put["params"],
        batch_stats=put["batch_stats"],
        step=np.asarray(step, np.int32),
    )
    return state, step


def restore_eval_weights(
    state: Any,
    path: str | Path,
    *,
    ema: bool = False,
    expect_config: str | None = None,
):
    """The drivers' one restore entry point: dispatch on the path.

    `path` ending in .npz → single-file artifact (this module); anything
    else → orbax run directory (utils/checkpoint.py), params-only restore
    as eval/infer need.
    """
    if str(path).endswith(".npz"):
        return load_into_state(
            state, path, ema=ema, expect_config=expect_config
        )
    from bdd100k_tpu.utils.checkpoint import CheckpointManager

    return CheckpointManager(path).restore_latest(
        state, params_only=True, prefer_ema=ema
    )
