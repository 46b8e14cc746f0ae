"""Checkpointing with "reload weights, override config" semantics.

The reference relies on Lightning checkpoints that embed hyperparameters,
selectively overridden at load time (`load_from_checkpoint(ckpt, **new)`,
reference continue_train_single.py:36-37, test.py:29-36, sampling.py:53-65)
— that is how one pretrained model is re-purposed for finetuning, eval and
sampling. Here a checkpoint is an orbax directory holding:

  * `state`   — the TrainState pytree (params, opt state, step)
  * `config`  — json: model config + task config + any user metadata

`load(..., **overrides)` restores weights and returns a config with the
overrides applied — the exact reference semantic, minus pickle.
"""

from __future__ import annotations

import dataclasses
import json
import pathlib
from typing import Any, Dict, Optional, Tuple

import jax
import orbax.checkpoint as ocp

from ..dsp.mel import MelConfig
from ..models.base import DiffRollConfig
from ..tasks.baseline import BaselineConfig
from ..tasks.diffusion import TaskConfig


def _to_jsonable(obj: Any) -> Any:
    if dataclasses.is_dataclass(obj) and not isinstance(obj, type):
        # NOT dataclasses.asdict: it flattens nested dataclasses to plain
        # dicts before we can tag them with their class name
        d = {f.name: _to_jsonable(getattr(obj, f.name))
             for f in dataclasses.fields(obj)}
        d["__dataclass__"] = type(obj).__name__
        return d
    if isinstance(obj, dict):
        return {k: _to_jsonable(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return [_to_jsonable(v) for v in obj]
    if isinstance(obj, (str, int, float, bool)) or obj is None:
        return obj
    # dtypes and other scalar-type objects (e.g. jnp.float32) -> dtype name;
    # jax APIs accept the string form everywhere
    try:
        import numpy as np

        return np.dtype(obj).name
    except TypeError:
        return str(obj)


_DATACLASSES = {
    "DiffRollConfig": DiffRollConfig,
    "TaskConfig": TaskConfig,
    "BaselineConfig": BaselineConfig,
    "MelConfig": MelConfig,
}


def _from_jsonable(obj: Any) -> Any:
    if isinstance(obj, dict):
        name = obj.pop("__dataclass__", None)
        body = {k: _from_jsonable(v) for k, v in obj.items()}
        if name and name in _DATACLASSES:
            cls = _DATACLASSES[name]
            fields = {f.name for f in dataclasses.fields(cls)}
            kwargs = {k: v for k, v in body.items() if k in fields}
            # json round-trips tuples as lists; dataclass fields that were
            # tuples are restored by the constructor's type, so coerce
            for f in dataclasses.fields(cls):
                v = kwargs.get(f.name)
                if isinstance(v, list):
                    kwargs[f.name] = tuple(v)
            return cls(**kwargs)
        return body
    if isinstance(obj, list):
        return [_from_jsonable(v) for v in obj]
    return obj


class Checkpointer:
    """Thin orbax wrapper managing `<dir>/step_<N>` checkpoints."""

    def __init__(self, directory: str | pathlib.Path, max_to_keep: int = 2):
        self.directory = pathlib.Path(directory).absolute()
        self.directory.mkdir(parents=True, exist_ok=True)
        self._ckptr = ocp.StandardCheckpointer()
        self.max_to_keep = max_to_keep

    def _path(self, step) -> pathlib.Path:
        if step == "last":
            return self.directory / "last"
        return self.directory / f"step_{step:09d}"

    def save_last(self, state: Any, config: Optional[Dict[str, Any]] = None,
                  extras: Optional[Dict[str, Any]] = None):
        """Overwrite the rolling `last` checkpoint (reference
        ModelCheckpoint save_last, config/spec_roll.yaml:44)."""
        return self._save(self._path("last"), state, config, extras)

    def save(self, step: int, state: Any, config: Optional[Dict[str, Any]] = None,
             extras: Optional[Dict[str, Any]] = None):
        path = self._save(self._path(step), state, config, extras)
        self._gc()
        return path

    def _save(self, path, state, config, extras):
        self._ckptr.save(path / "state", state, force=True)
        for name, tree in (extras or {}).items():
            self._ckptr.save(path / name, tree, force=True)
        if config is not None:
            (path / "config.json").write_text(json.dumps(_to_jsonable(config)))
        return path

    def load_extra(self, name: str, abstract: Any, step=None) -> Optional[Any]:
        """Restore an extra pytree (e.g. 'ema') if the checkpoint has it."""
        if step is None:
            step = self.latest_step()
            if step is None and (self.directory / "last").exists():
                step = "last"
        if step is None or not (self._path(step) / name).exists():
            return None
        return self._ckptr.restore(self._path(step) / name, abstract)

    def _gc(self):
        ckpts = sorted(self.directory.glob("step_*"))
        for stale in ckpts[: -self.max_to_keep]:
            import shutil

            shutil.rmtree(stale, ignore_errors=True)

    def peek_config(self, step=None) -> Dict[str, Any]:
        """Read only the stored config (no tensor restore) — needed to build
        the model before constructing the abstract state for `load`."""
        if step is None:
            step = self.latest_step()
            if step is None and (self.directory / "last").exists():
                step = "last"
            if step is None:
                raise FileNotFoundError(f"no checkpoints under {self.directory}")
        cfg_file = self._path(step) / "config.json"
        if not cfg_file.exists():
            return {}
        return _from_jsonable(json.loads(cfg_file.read_text()))

    def latest_step(self) -> Optional[int]:
        ckpts = sorted(self.directory.glob("step_*"))
        if not ckpts:
            return None
        return int(ckpts[-1].name.split("_")[1])

    def load(
        self,
        abstract_state: Any,
        step: Optional[int] = None,
        **config_overrides: Any,
    ) -> Tuple[Any, Dict[str, Any]]:
        """Restore (state, config). `config_overrides` are applied on top of
        the stored config dict — dotted keys update nested dataclasses, e.g.
        `task=TaskConfig(...)` replaces whole entries, while
        `frame_threshold=0.6` updates `config['task']` if present.
        """
        if step is None:
            step = self.latest_step()
            if step is None and (self.directory / "last").exists():
                step = "last"
            if step is None:
                raise FileNotFoundError(f"no checkpoints under {self.directory}")
        path = self._path(step)
        state = self._ckptr.restore(path / "state", abstract_state)
        cfg_file = path / "config.json"
        config: Dict[str, Any] = (
            _from_jsonable(json.loads(cfg_file.read_text())) if cfg_file.exists() else {}
        )
        for k, v in config_overrides.items():
            if k in config:
                config[k] = v
            elif "task" in config and dataclasses.is_dataclass(config["task"]) and hasattr(
                config["task"], k
            ):
                config["task"] = config["task"].replace(**{k: v})
            elif "model" in config and dataclasses.is_dataclass(
                config["model"]
            ) and hasattr(config["model"], k):
                config["model"] = config["model"].replace(**{k: v})
            else:
                config[k] = v
        self._ckptr.wait_until_finished()
        return state, config

    def wait(self):
        self._ckptr.wait_until_finished()
