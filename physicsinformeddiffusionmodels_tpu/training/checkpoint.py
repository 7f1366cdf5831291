"""Structured checkpointing.

Improves on the reference's state_dict-only checkpoints
(`/root/reference/src/denoising_utils.py:273-300`, toy dill variant
`denoising_toy_utils.py:527-592`): a checkpoint here stores raw params,
EMA params, optimizer state, step and the config dict, so training resumes
exactly. Format: msgpack (flax.serialization) + a JSON sidecar for the
config — no pickle, portable across hosts.

Note on parity: the reference saves whatever weights are live at save time,
which inside the eval block are the *EMA* weights (`main.py:183,313-316`);
we store both slots explicitly.
"""

from __future__ import annotations

import json
import os
from pathlib import Path
from typing import Any, Optional

import jax
import numpy as np
from flax import serialization


def _to_host(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def save_checkpoint(
    directory: str | os.PathLike,
    step: int,
    *,
    params: Any,
    ema_params: Any = None,
    opt_state: Any = None,
    config: Optional[dict] = None,
) -> Path:
    """Write checkpoint_<step>.msgpack (+ config.json) under ``directory``."""
    directory = Path(directory)
    directory.mkdir(parents=True, exist_ok=True)
    payload = {
        "step": step,
        "params": serialization.to_state_dict(_to_host(params)),
        "ema_params": serialization.to_state_dict(_to_host(ema_params)) if ema_params is not None else {},
        "opt_state": serialization.to_state_dict(_to_host(opt_state)) if opt_state is not None else {},
    }
    path = directory / f"checkpoint_{step}.msgpack"
    path.write_bytes(serialization.msgpack_serialize(payload))
    if config is not None:
        (directory / "config.json").write_text(json.dumps(config, indent=2, default=str))
    return path


def load_checkpoint(path: str | os.PathLike, target: Optional[dict] = None) -> dict:
    """Load a checkpoint written by ``save_checkpoint``.

    If ``target`` (a pytree with the same structure, e.g.
    {"params": params, ...}) is given, the arrays are restored into that
    structure; otherwise returns the raw dict-of-arrays.
    """
    raw = serialization.msgpack_restore(Path(path).read_bytes())
    if target is not None:
        return serialization.from_state_dict(target, raw)
    return raw


def restore_train_state(directory: str | os.PathLike, state):
    """Restore a ``TrainState`` from the newest checkpoint under ``directory``.

    ``state`` is a freshly created TrainState used as the typed template
    (structure + dtypes + shardings are taken from it). Returns
    ``(state, start_step)`` — the restored state with ``step`` advanced, or
    the input state and 0 if no checkpoint exists. Covers the reference's
    ``load_model_flag`` resume path (`main.py:16-21`), extended to EMA /
    optimizer / step so a preempted long run continues exactly.
    """
    path = latest_checkpoint(directory)
    if path is None:
        return state, 0
    raw = serialization.msgpack_restore(Path(path).read_bytes())
    # the stored step is the loop-iteration label at save time; that
    # iteration's optimizer update is already in the params, so the resumed
    # run continues at label+1 (exactly reproducing an uninterrupted run —
    # the per-step PRNG key folds in state.step)
    step = int(raw["step"]) + 1
    params = serialization.from_state_dict(state.params, raw["params"])
    ema = (
        serialization.from_state_dict(state.ema_params, raw["ema_params"])
        if raw.get("ema_params")
        else params
    )
    opt_state = (
        serialization.from_state_dict(state.opt_state, raw["opt_state"])
        if raw.get("opt_state")
        else state.opt_state
    )
    new_state = state._replace(
        params=params,
        ema_params=ema,
        opt_state=opt_state,
        step=jax.numpy.asarray(step, state.step.dtype),
    )
    print(f"Resumed from {path} at step {step}")
    return new_state, step


def latest_checkpoint(directory: str | os.PathLike) -> Optional[Path]:
    directory = Path(directory)
    if not directory.exists():
        return None
    ckpts = sorted(
        directory.glob("checkpoint_*.msgpack"),
        key=lambda p: int(p.stem.split("_")[-1]),
    )
    return ckpts[-1] if ckpts else None
