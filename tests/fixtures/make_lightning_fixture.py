"""Generate tests/fixtures/lightning_small.ckpt — a small but structurally
complete PyTorch-Lightning checkpoint shaped like the published Zenodo
files (record 7246522, reference README.md:110).

A real checkpoint's `hyper_parameters` blob pickles omegaconf containers
(Hydra configs: DictConfig spec_args/training/sampling, ListConfig
norm_args/loss_keys) and Lightning's AttributeDict. Neither package is
installed here, so this generator registers FAKE modules under the real
import paths whose classes pickle with the same module/qualname and the
same instance-state layout (`_content` dicts holding `_val` nodes) that
omegaconf 2.x produces — the committed fixture therefore exercises the
exact unpickle path a real Zenodo file will hit: missing-module stubs in
`compat.torch_ckpt._TolerantUnpickler` + `plain_hparams` coercion.

The state_dict comes from the in-repo torch oracle (tests/test_compat.py,
written to the reference's published semantics, model/diffwave.py:58-151)
plus the non-learned buffers a Lightning checkpoint carries (schedule
tables, torchaudio mel buffers, the sin/cos embedding table — reference
task/diffusion.py:237-256) which the converter must skip.

Run from the repo root (writes the .ckpt next to this file):

    python tests/fixtures/make_lightning_fixture.py
"""

import pathlib
import sys
import types

import torch

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[2]))
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def _mod(name):
    m = types.ModuleType(name)
    sys.modules[name] = m
    return m


def install_fake_omegaconf():
    om = _mod("omegaconf")
    omb = _mod("omegaconf.base")
    omd = _mod("omegaconf.dictconfig")
    oml = _mod("omegaconf.listconfig")
    omn = _mod("omegaconf.nodes")

    class ContainerMetadata:
        def __init__(self):
            self.ref_type = None
            self.object_type = None
            self.optional = True
            self.key = None
            self.flags = {}
            self.element_type = None

    class Metadata:
        def __init__(self):
            self.ref_type = None
            self.object_type = None
            self.optional = True
            self.key = None
            self.flags = {}

    class AnyNode:
        def __init__(self, v):
            self._val = v
            self._metadata = Metadata()
            self._parent = None

    class DictConfig:
        def __init__(self, d):
            self._metadata = ContainerMetadata()
            self._parent = None
            self._flags_cache = None
            self._content = {
                k: (v if isinstance(v, (DictConfig, ListConfig))
                    else AnyNode(v))
                for k, v in d.items()
            }

    class ListConfig:
        def __init__(self, xs):
            self._metadata = ContainerMetadata()
            self._parent = None
            self._flags_cache = None
            self._content = [AnyNode(x) for x in xs]

    for cls, mod in ((ContainerMetadata, omb), (Metadata, omb),
                     (AnyNode, omn), (DictConfig, omd), (ListConfig, oml)):
        cls.__module__ = mod.__name__
        cls.__qualname__ = cls.__name__
        setattr(mod, cls.__name__, cls)
    om.DictConfig, om.ListConfig = DictConfig, ListConfig
    return DictConfig, ListConfig


def install_fake_lightning():
    _mod("pytorch_lightning")
    _mod("pytorch_lightning.utilities")
    parsing = _mod("pytorch_lightning.utilities.parsing")

    class AttributeDict(dict):
        pass

    AttributeDict.__module__ = parsing.__name__
    AttributeDict.__qualname__ = "AttributeDict"
    parsing.AttributeDict = AttributeDict
    return AttributeDict


def main():
    from test_compat import (  # the in-repo torch oracle
        C, K, LAYERS, MAX_STEPS, N_MELS, TorchDiffRoll,
    )

    DictConfig, ListConfig = install_fake_omegaconf()
    AttributeDict = install_fake_lightning()

    torch.manual_seed(0)
    model = TorchDiffRoll().eval()
    sd = dict(model.state_dict())
    # buffers a Lightning checkpoint carries that are NOT learned weights
    sd["betas"] = torch.linspace(1e-4, 0.02, MAX_STEPS)
    sd["alphas"] = 1.0 - sd["betas"]
    sd["sqrt_alphas_cumprod"] = torch.sqrt(torch.cumprod(sd["alphas"], 0))
    sd["sqrt_one_minus_alphas_cumprod"] = torch.sqrt(
        1 - torch.cumprod(sd["alphas"], 0))
    sd["sqrt_recip_alphas"] = torch.rsqrt(sd["alphas"])
    sd["posterior_variance"] = sd["betas"].clone()
    sd["mel_layer.spectrogram.window"] = torch.hann_window(2048)
    sd["mel_layer.mel_scale.fb"] = torch.zeros(1025, N_MELS)
    # the sin/cos table: keep the oracle's own buffer if it registered one
    # (a real ckpt stores the real table, and the parity test restores the
    # oracle from this very state_dict)
    sd.setdefault("diffusion_embedding.embedding",
                  torch.zeros(MAX_STEPS, 128))

    # the ctor-arg capture of save_hyperparameters (reference
    # train_spec_roll.py:29-30: **model.args, spec_args=cfg.spec.args,
    # **cfg.task), values typed the way Hydra leaves them
    hparams = AttributeDict({
        "residual_channels": C,
        "unconditional": False,
        "condition": "fixed",
        "n_mels": N_MELS,
        "residual_layers": LAYERS,
        "kernel_size": K,
        "dilation_base": 2,
        "dilation_bound": 2,
        "spec_dropout": 0.1,
        "norm_args": ListConfig([0, 1, "imagewise"]),
        "spec_args": DictConfig({
            "sample_rate": 16000, "n_fft": 2048, "hop_length": 512,
            "n_mels": N_MELS, "f_min": 0, "f_max": 8000,
            "center": True, "normalized": True, "pad_mode": "reflect",
        }),
        "lr": 1e-5,
        "timesteps": MAX_STEPS,
        "loss_type": "l2",
        "loss_keys": ListConfig(["diffusion_loss"]),
        "frame_threshold": 0.65,
        "beta_start": 1e-4,
        "beta_end": 0.02,
        "training": DictConfig({"mode": "x_0"}),
        "sampling": DictConfig({"type": "cfdg_ddpm_x0", "w": 0.5}),
    })

    ckpt = {
        "epoch": 2499,
        "global_step": 100000,
        "pytorch-lightning_version": "1.6.4",
        "state_dict": sd,
        "loops": None,
        "callbacks": {},
        "optimizer_states": [],
        "lr_schedulers": [],
        "hparams_name": "kwargs",
        "hyper_parameters": hparams,
    }
    out = pathlib.Path(__file__).parent / "lightning_small.ckpt"
    torch.save(ckpt, out)
    print(f"wrote {out} ({out.stat().st_size} bytes)")


if __name__ == "__main__":
    main()
