"""PyTorch-Lightning checkpoint -> JAX params converter.

The reference publishes trained DiffRoll checkpoints on Zenodo (record
7246522, reference README.md:110) as Lightning .ckpt files holding
`state_dict` + `hyper_parameters` (reference roll2midi.ipynb cell 2).
This module converts them into this framework's flax param pytree so the
published weights can be evaluated / fine-tuned here, and so parity can be
asserted numerically (SURVEY.md §7 'checkpoint conversion').

Weight-layout translation (torch -> flax):
  Conv1d  (O, I, K)       -> kernel (K, I, O)
  Conv2d  (O, I, Kh, Kw)  -> kernel (Kh, Kw, I, O)
  Linear  (O, I)          -> kernel (I, O)

Name translation for the DiffRoll family (reference model/diffwave.py):
  residual_layers.{i}.*   -> residual_layers_{i}/*
  diffusion_embedding.projection{1,2} -> diffusion_embedding/projection{1,2}
  input/skip/output_projection        -> same name
Buffers (the sin/cos embedding table, torchaudio mel filterbank/window,
beta-schedule tables) carry no learned weights and are rebuilt natively,
so they are skipped.
"""

from __future__ import annotations

import dataclasses
import io
import pickle
from typing import Any, Dict, Optional, Tuple

import numpy as np

from ..models.base import DiffRollConfig

# ---------------------------------------------------------------------------
# Tolerant unpickling: real Zenodo checkpoints were written by Hydra +
# PyTorch-Lightning, so their `hyper_parameters` blob pickles omegaconf
# containers (DictConfig for spec_args/training/sampling, ListConfig for
# norm_args/loss_keys) and Lightning's AttributeDict — none of which are
# installed here. find_class falls back to a dict-backed stub for any
# missing class, and `plain_hparams` then coerces omegaconf's internal
# layout (`_content` dicts of ValueNodes carrying `_val`) to plain Python.
# ---------------------------------------------------------------------------


class _Stub(dict):
    """Stand-in for an unimportable pickled class. Subclasses dict so the
    unpickler's BUILD/SETITEMS opcodes (dict-subclass state like Lightning's
    AttributeDict) apply directly; object state is merged into the dict."""

    def __setstate__(self, state):
        if isinstance(state, tuple):  # (state, slotstate)
            merged = {}
            for part in state:
                if part:
                    merged.update(part)
            state = merged
        if isinstance(state, dict):
            self.update(state)

    # list-subclass pickles append items instead of setting state
    def append(self, v):
        self.setdefault("_list_items", []).append(v)

    def extend(self, vs):
        self.setdefault("_list_items", []).extend(vs)


_STUB_CACHE: Dict[Tuple[str, str], type] = {}


def _make_stub(module: str, name: str) -> type:
    key = (module, name)
    if key not in _STUB_CACHE:
        _STUB_CACHE[key] = type(name, (_Stub,), {"__module__": module})
    return _STUB_CACHE[key]


class _TolerantUnpickler(pickle.Unpickler):
    def find_class(self, module, name):
        try:
            return super().find_class(module, name)
        except (ImportError, AttributeError):
            return _make_stub(module, name)


class _TolerantPickleModule:
    """Duck-typed `pickle_module` for torch.load."""

    Unpickler = _TolerantUnpickler

    @staticmethod
    def load(f, **kw):
        return _TolerantUnpickler(f, **kw).load()

    @staticmethod
    def loads(b, **kw):
        return _TolerantUnpickler(io.BytesIO(b), **kw).load()


def plain_hparams(obj: Any) -> Any:
    """Recursively coerce stubbed omegaconf/Lightning containers to plain
    Python values: DictConfig -> its `_content` dict, ValueNode -> `_val`,
    ListConfig -> list, AttributeDict -> dict; metadata is dropped."""
    if isinstance(obj, _Stub):
        d = dict(obj)
        if "_content" in d:
            return plain_hparams(d["_content"])
        if "_val" in d:
            return plain_hparams(d["_val"])
        if "_list_items" in d:
            return plain_hparams(d["_list_items"])
        return {k: plain_hparams(v) for k, v in d.items()
                if not k.startswith("_")}
    if isinstance(obj, dict):
        return {k: plain_hparams(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return [plain_hparams(v) for v in obj]
    return obj

# state_dict entries that are recomputed buffers, not weights
_SKIP_PREFIXES = (
    "mel_layer.",           # torchaudio MelSpectrogram buffers
    "normalization",
    "betas", "alphas", "sqrt_", "posterior_",  # schedule buffers
    "diffusion_embedding.embedding",           # sin/cos table
    "spec_layer.",
)


def _t2np(t) -> np.ndarray:
    return np.asarray(t.detach().cpu().numpy(), dtype=np.float32)


def _convert_weight(name: str, w: np.ndarray) -> Tuple[str, np.ndarray]:
    """Map one tensor to (flax leaf name, transposed array)."""
    if name.endswith(".bias"):
        return "bias", w
    if w.ndim == 3:        # Conv1d
        return "kernel", w.transpose(2, 1, 0)
    if w.ndim == 4:        # Conv2d
        return "kernel", w.transpose(2, 3, 1, 0)
    if w.ndim == 2:        # Linear
        return "kernel", w.transpose(1, 0)
    return "param", w      # 1-D learned vectors (uncon_z is 2-D, handled below)


def convert_state_dict(state_dict: Dict[str, Any]) -> Dict[str, Any]:
    """torch state_dict -> flax params dict (the {'params': ...} payload)."""
    params: Dict[str, Any] = {}
    for name, tensor in state_dict.items():
        if any(name.startswith(p) for p in _SKIP_PREFIXES):
            continue
        w = _t2np(tensor)

        if name.startswith("residual_layers."):
            _, idx, rest = name.split(".", 2)
            scope = params.setdefault(f"residual_layers_{idx}", {})
            if rest.startswith("uncon_z"):
                # reference keeps (2C, T) (model/diffwave.py:163-166);
                # ours is (T, 2C)
                scope["uncon_z"] = w.transpose(1, 0)
                continue
            mod, leaf_t = rest.rsplit(".", 1)
            leaf, arr = _convert_weight(name, w)
            scope.setdefault(mod, {})[leaf] = arr
        elif name.startswith("diffusion_embedding."):
            _, rest = name.split(".", 1)
            mod, _ = rest.rsplit(".", 1)
            leaf, arr = _convert_weight(name, w)
            params.setdefault("diffusion_embedding", {}).setdefault(mod, {})[
                leaf] = arr
        elif name == "trainable_parameters":
            # trainable_spec unconditional embedding: reference (n_mels, T)
            # (model/diffwave.py:600-606) -> ours (T, n_mels)
            params["trainable_parameters"] = w.transpose(1, 0)
        elif "." in name:
            mod, _ = name.rsplit(".", 1)
            leaf, arr = _convert_weight(name, w)
            params.setdefault(mod, {})[leaf] = arr
        else:
            params[name] = w
    return params


def config_from_hparams(
    hparams: Dict[str, Any], name: str = "ClassifierFreeDiffRoll",
) -> DiffRollConfig:
    """Best-effort DiffRollConfig from a Lightning checkpoint's
    hyper_parameters blob (constructor args captured by
    save_hyperparameters, reference task/diffusion.py:235)."""
    from ..models import PRESETS

    cfg = PRESETS.get(name, DiffRollConfig())
    field_map = {
        "residual_channels": "residual_channels",
        "residual_layers": "residual_layers",
        "kernel_size": "kernel_size",
        "dilation_base": "dilation_base",
        "dilation_bound": "dilation_bound",
        "spec_dropout": "spec_dropout",
        "condition": "condition",
        "unconditional": "unconditional",
        "n_mels": "n_mels",
        "timesteps": "timesteps",
    }
    updates = {}
    for src, dst in field_map.items():
        if src in hparams and hparams[src] is not None:
            v = hparams[src]
            updates[dst] = tuple(v) if isinstance(v, list) else v
    if "norm_args" in hparams and hparams["norm_args"] is not None:
        na = list(hparams["norm_args"])
        updates["norm_args"] = (float(na[0]), float(na[1]), str(na[2]))
    # the nested spec_args blob (reference: ClassifierFreeDiffRoll is
    # constructed with spec_args=cfg.spec.args, train_spec_roll.py:29-30,
    # captured by save_hyperparameters) carries the torchaudio
    # MelSpectrogram kwargs -> our MelConfig
    spec = hparams.get("spec_args") or {}
    if spec:
        mel_map = {"sample_rate": int, "n_fft": int, "hop_length": int,
                   "n_mels": int, "f_min": float, "f_max": float,
                   "center": bool, "normalized": bool, "pad_mode": str,
                   "power": float, "win_length": int}
        mel_updates = {k: cast(spec[k]) for k, cast in mel_map.items()
                       if spec.get(k) is not None}
        updates["mel"] = dataclasses.replace(cfg.mel, **mel_updates)
        if "n_mels" in mel_updates:
            updates["n_mels"] = mel_updates["n_mels"]
    return cfg.replace(**updates)


def task_updates_from_hparams(hparams: Dict[str, Any]) -> Dict[str, Any]:
    """Task-level knobs recorded in a Lightning checkpoint (the reference
    passes **cfg.task into the model ctor, train_spec_roll.py:29-30), as a
    dict of TaskConfig field updates."""
    out: Dict[str, Any] = {}
    flat = {"timesteps": int, "beta_start": float, "beta_end": float,
            "loss_type": str, "frame_threshold": float, "lr": float}
    for k, cast in flat.items():
        if hparams.get(k) is not None:
            out[k] = cast(hparams[k])
    if hparams.get("loss_keys"):
        out["loss_keys"] = tuple(hparams["loss_keys"])
    training = hparams.get("training") or {}
    if training.get("mode"):
        out["training_mode"] = str(training["mode"])
    sampling = hparams.get("sampling") or {}
    if sampling.get("type"):
        out["sampling_type"] = str(sampling["type"])
    if sampling.get("w") is not None:
        out["w"] = float(sampling["w"])
    return out


def _read_ckpt(path: str) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """torch.load with the tolerant pickle module -> (hparams, state_dict).
    Works on real Hydra/Lightning checkpoints even though omegaconf and
    pytorch_lightning are not installed (their pickled containers stub to
    dicts and are coerced by plain_hparams)."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False,
                      pickle_module=_TolerantPickleModule)
    state_dict = ckpt.get("state_dict", ckpt)
    raw = ckpt.get("hyper_parameters", {})
    hparams = plain_hparams(raw)
    if not isinstance(hparams, dict):
        hparams = {}
    return hparams, state_dict


def load_torch_checkpoint(
    path: str,
    model_name: str = "ClassifierFreeDiffRoll",
    **config_overrides: Any,
) -> Tuple[DiffRollConfig, Dict[str, Any]]:
    """Load a Lightning .ckpt -> (DiffRollConfig, {'params': pytree}),
    with the reference's override-hparams-at-load semantic
    (reference test.py:29-36)."""
    hparams, state_dict = _read_ckpt(path)
    cfg = config_from_hparams(hparams, model_name).replace(**config_overrides)
    return cfg, {"params": convert_state_dict(state_dict)}


def load_lightning(
    path: str, model_name: str = "ClassifierFreeDiffRoll",
) -> Tuple[DiffRollConfig, Dict[str, Any], Dict[str, Any]]:
    """Full Lightning-checkpoint adoption for the CLI path
    (`pretrained_path=<file>.ckpt`): returns (model config, TaskConfig
    field updates recorded in the checkpoint, {'params': pytree})."""
    hparams, state_dict = _read_ckpt(path)
    cfg = config_from_hparams(hparams, model_name)
    return cfg, task_updates_from_hparams(hparams), {
        "params": convert_state_dict(state_dict)}
