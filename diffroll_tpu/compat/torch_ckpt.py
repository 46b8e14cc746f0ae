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

from typing import Any, Dict, Optional, Tuple

import numpy as np

from ..models.base import DiffRollConfig

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
    return cfg.replace(**updates)


def load_torch_checkpoint(
    path: str,
    model_name: str = "ClassifierFreeDiffRoll",
    **config_overrides: Any,
) -> Tuple[DiffRollConfig, Dict[str, Any]]:
    """Load a Lightning .ckpt -> (DiffRollConfig, {'params': pytree}),
    with the reference's override-hparams-at-load semantic
    (reference test.py:29-36)."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    state_dict = ckpt.get("state_dict", ckpt)
    hparams = dict(ckpt.get("hyper_parameters", {}))
    cfg = config_from_hparams(hparams, model_name).replace(**config_overrides)
    return cfg, {"params": convert_state_dict(state_dict)}
