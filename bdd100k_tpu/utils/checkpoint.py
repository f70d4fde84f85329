"""Checkpoint/resume via orbax (SURVEY.md §5.4).

Reference mechanism: `tf.train.Saver` keep-latest-N + restore-latest. TPU-
native rebuild: async, sharding-aware orbax checkpoints of
{params, batch_stats, opt_state, step}; crash recovery = restart + auto-
resume from latest step (SURVEY.md §5.3).
"""

from __future__ import annotations

from pathlib import Path
from typing import Any

import jax
import numpy as np
import orbax.checkpoint as ocp


class CheckpointManager:
    """Thin wrapper over ocp.CheckpointManager for the TrainState pytree."""

    def __init__(
        self,
        directory: str | Path,
        keep: int = 5,
        async_save: bool = True,
    ):
        self.directory = Path(directory).absolute()
        self.directory.mkdir(parents=True, exist_ok=True)
        options = ocp.CheckpointManagerOptions(
            max_to_keep=keep, enable_async_checkpointing=async_save
        )
        self._mgr = ocp.CheckpointManager(self.directory, options=options)

    def save(
        self, step: int, state: Any, input_state: bytes | None = None
    ) -> None:
        """Async-save the state pytree (non-optax-fn leaves only).

        `input_state`: opaque input-iterator state (e.g. grain's native
        iterator checkpoint, SURVEY.md §5.4) written beside the orbax step
        dir — outside it, so orbax's atomic finalize/cleanup is untouched.
        The state is PER-HOST (each host's grain loader walks its own
        shard), so every process writes its own file tagged with its
        process index and the world size — a shared directory holds one
        file per host; a host restores only the state matching its own
        index AND the same world size (a topology change invalidates shard
        positions, so restore returns None and the caller reshuffles)."""
        payload = {
            "params": state.params,
            "batch_stats": state.batch_stats,
            "opt_state": state.opt_state,
            "step": np.asarray(state.step),
        }
        if getattr(state, "ema_params", None) is not None:
            payload["ema_params"] = state.ema_params
        self._mgr.save(step, args=ocp.args.StandardSave(payload))
        if input_state is not None:
            (self.directory / self._input_state_name(step)).write_bytes(
                input_state
            )
            # prune states for steps orbax has already garbage-collected
            kept = {str(s) for s in self._mgr.all_steps()} | {str(step)}
            # names: input_state_<step>.bin | input_state_<step>.pIofN.bin
            for p in self.directory.glob("input_state_*.bin"):
                if p.stem.split("_")[2].split(".")[0] not in kept:
                    p.unlink(missing_ok=True)

    @staticmethod
    def _input_state_name(step: int) -> str:
        if jax.process_count() == 1:
            return f"input_state_{step}.bin"
        return (
            f"input_state_{step}"
            f".p{jax.process_index()}of{jax.process_count()}.bin"
        )

    def restore_input_state(self, step: int) -> bytes | None:
        """This host's input-iterator state saved at `step`, or None (also
        None when the saved world size differs from the current one)."""
        p = self.directory / self._input_state_name(step)
        return p.read_bytes() if p.exists() else None

    def restore_latest(
        self, state: Any, params_only: bool = False, prefer_ema: bool = False
    ) -> tuple[Any, int]:
        """Restore into the abstract structure of `state`; returns
        (state, step); (state, 0) if no checkpoint exists.

        `params_only=True` restores just {params, batch_stats, step} — for
        eval/infer, which build a throwaway optimizer whose state structure
        need not match the one the checkpoint was trained with (e.g. eval
        defaults to momentum while the run used adam).

        `prefer_ema=True` (implies the params_only shape) restores the
        checkpoint's `ema_params` shadow INTO `state.params` — the eval-time
        weights of an --ema_decay run (SURVEY.md §2.4). Raises SystemExit
        with a clear message when the checkpoint was trained without EMA."""
        latest = self._mgr.latest_step()
        if latest is None:
            return state, 0
        params_only = params_only or prefer_ema
        template = {
            "params": state.params,
            "batch_stats": state.batch_stats,
            "step": np.asarray(state.step),
        }
        if prefer_ema:
            template["ema_params"] = state.params
            del template["params"]
        if not params_only:
            template["opt_state"] = state.opt_state
            if getattr(state, "ema_params", None) is not None:
                template["ema_params"] = state.ema_params
        abstract = jax.tree.map(ocp.utils.to_shape_dtype_struct, template)
        if params_only:
            # The on-disk tree also has opt_state; partial-restore just our
            # subtree. Use a standalone PyTree checkpointer on the step dir —
            # the manager may already have Standard handlers registered
            # (from saving), which reject PyTreeRestore args.
            restored = self._partial_restore(latest, abstract)
            if prefer_ema and any(
                isinstance(leaf, jax.ShapeDtypeStruct)
                for leaf in jax.tree_util.tree_leaves(restored["ema_params"])
            ):
                # partial_restore does NOT error on a missing subtree — it
                # hands back the abstract ShapeDtypeStructs. Refuse loudly
                # instead of shipping garbage weights into eval.
                raise SystemExit(
                    f"--ema requested but checkpoint step {latest} has "
                    "no ema_params shadow — it was trained without "
                    "--ema_decay"
                )
        else:
            try:
                restored = self._mgr.restore(
                    latest, args=ocp.args.StandardRestore(abstract)
                )
            except Exception:
                # structure mismatch on the EMA subtree, both directions:
                if "ema_params" in abstract:
                    # resuming a pre-EMA checkpoint with --ema_decay newly
                    # on — restore the rest, seed the shadow at the params
                    del abstract["ema_params"]
                    restored = self._mgr.restore(
                        latest, args=ocp.args.StandardRestore(abstract)
                    )
                    restored["ema_params"] = restored["params"]
                else:
                    # checkpoint carries ema_params but this run has EMA
                    # off — partial-restore just our subtree
                    restored = self._partial_restore(latest, abstract)
        state = state.replace(
            params=restored["ema_params" if prefer_ema else "params"],
            batch_stats=restored["batch_stats"],
            step=restored["step"],
        )
        if not params_only:
            state = state.replace(opt_state=restored["opt_state"])
            if getattr(state, "ema_params", None) is not None:
                state = state.replace(ema_params=restored["ema_params"])
        return state, int(latest)

    def _partial_restore(self, step: int, abstract: Any) -> Any:
        """PyTree partial restore of `abstract` (a subset of the on-disk
        tree) from the given step dir — standalone checkpointer because the
        manager's Standard handlers reject PyTreeRestore args."""
        restore_args = jax.tree.map(
            lambda a: ocp.RestoreArgs(restore_type=None), abstract
        )
        with ocp.PyTreeCheckpointer() as ckptr:
            return ckptr.restore(
                self.directory / str(step) / "default",
                args=ocp.args.PyTreeRestore(
                    abstract,
                    restore_args=restore_args,
                    partial_restore=True,
                ),
            )

    def wait(self) -> None:
        self._mgr.wait_until_finished()

    def close(self) -> None:
        self._mgr.close()
