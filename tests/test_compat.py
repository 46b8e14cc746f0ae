"""Torch-checkpoint conversion parity tests.

A fresh torch implementation of the DiffRoll forward (written here, to the
reference's published semantics: gated dilated conv blocks, DiffWave
timestep embedding, zero-init head — reference model/diffwave.py:58-151,
283-345) is converted via `compat.convert_state_dict` and must match the
flax `DiffRollNet` numerically. This validates every weight-layout
transpose (Conv1d OIK->KIO, Linear OI->IO), the padding scheme, and the
gating order in one shot.
"""

import math
import pathlib

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from diffroll_tpu.compat import convert_state_dict, config_from_hparams  # noqa: E402
from diffroll_tpu.nn.denoiser import DiffRollNet  # noqa: E402

C, LAYERS, K, N_MELS, T_FRAMES, MAX_STEPS = 8, 3, 3, 12, 16, 10


class TorchResBlock(tnn.Module):
    def __init__(self, c, n_mels, k, dilation):
        super().__init__()
        pad = ((k - 1) * (dilation - 1) + k - 1) // 2
        self.dilated_conv = tnn.Conv1d(c, 2 * c, k, padding=pad,
                                       dilation=dilation)
        self.diffusion_projection = tnn.Linear(512, c)
        self.conditioner_projection = tnn.Conv1d(n_mels, 2 * c, 1)
        self.output_projection = tnn.Conv1d(c, 2 * c, 1)

    def forward(self, x, t_emb, cond):
        y = x + self.diffusion_projection(t_emb).unsqueeze(-1)
        y = self.dilated_conv(y) + self.conditioner_projection(cond)
        gate, filt = torch.chunk(y, 2, dim=1)
        y = torch.sigmoid(gate) * torch.tanh(filt)
        y = self.output_projection(y)
        residual, skip = torch.chunk(y, 2, dim=1)
        return (x + residual) / math.sqrt(2.0), skip


class TorchEmbedding(tnn.Module):
    def __init__(self, max_steps, dim=128):
        super().__init__()
        steps = torch.arange(max_steps).unsqueeze(1).double()
        dims = torch.arange(dim // 2).unsqueeze(0).double()
        table = steps * 10.0 ** (dims * 4.0 / (dim // 2 - 1))
        self.register_buffer(
            "embedding",
            torch.cat([torch.sin(table), torch.cos(table)], dim=1).float(),
        )
        self.projection1 = tnn.Linear(dim, 512)
        self.projection2 = tnn.Linear(512, 512)

    def forward(self, t):
        x = self.embedding[t]
        x = tnn.functional.silu(self.projection1(x))
        return tnn.functional.silu(self.projection2(x))


class TorchDiffRoll(tnn.Module):
    def __init__(self):
        super().__init__()
        self.input_projection = tnn.Conv1d(88, C, 1)
        self.diffusion_embedding = TorchEmbedding(MAX_STEPS)
        self.residual_layers = tnn.ModuleList(
            [TorchResBlock(C, N_MELS, K, 2 ** (i % 2)) for i in range(LAYERS)]
        )
        self.skip_projection = tnn.Conv1d(C, C, 1)
        self.output_projection = tnn.Conv1d(C, 88, 1)

    def forward(self, roll, t, cond):
        # roll (B, T, 88) channels-last in, reference-style (B, 88, T) inside
        x = roll.transpose(1, 2)
        cond = cond.transpose(1, 2)
        x = torch.relu(self.input_projection(x))
        t_emb = self.diffusion_embedding(t)
        skip = None
        for layer in self.residual_layers:
            x, s = layer(x, t_emb, cond)
            skip = s if skip is None else skip + s
        x = skip / math.sqrt(len(self.residual_layers))
        x = torch.relu(self.skip_projection(x))
        x = self.output_projection(x)
        return x.transpose(1, 2)


@pytest.fixture(scope="module")
def torch_model():
    torch.manual_seed(0)
    m = TorchDiffRoll().eval()
    return m


def test_forward_parity(torch_model):
    params = {"params": convert_state_dict(torch_model.state_dict())}

    net = DiffRollNet(
        residual_channels=C, residual_layers=LAYERS, kernel_size=K,
        dilation_base=2, dilation_bound=2, max_steps=MAX_STEPS,
        n_mels=N_MELS,
    )

    rng = np.random.RandomState(1)
    roll = rng.randn(2, T_FRAMES, 88).astype(np.float32)
    cond = rng.randn(2, T_FRAMES, N_MELS).astype(np.float32)
    t = np.array([3, 7])

    with torch.no_grad():
        ref = torch_model(torch.from_numpy(roll), torch.from_numpy(t),
                          torch.from_numpy(cond)).numpy()
    ours = np.asarray(net.apply(params, jnp.asarray(roll), jnp.asarray(t),
                                jnp.asarray(cond)))
    np.testing.assert_allclose(ours, ref, atol=2e-5, rtol=1e-4)


def test_converted_tree_matches_init(torch_model):
    """Converted tree has exactly the structure/shapes of a fresh init."""
    converted = convert_state_dict(torch_model.state_dict())
    net = DiffRollNet(
        residual_channels=C, residual_layers=LAYERS, kernel_size=K,
        dilation_base=2, dilation_bound=2, max_steps=MAX_STEPS,
        n_mels=N_MELS,
    )
    init = net.init(
        jax.random.key(0),
        jnp.zeros((1, T_FRAMES, 88)), jnp.zeros((1,), jnp.int32),
        jnp.zeros((1, T_FRAMES, N_MELS)), None,
    )["params"]
    flat_init = jax.tree_util.tree_leaves_with_path(init)
    flat_conv = jax.tree_util.tree_leaves_with_path(converted)
    paths_init = {jax.tree_util.keystr(p): l.shape for p, l in flat_init}
    paths_conv = {jax.tree_util.keystr(p): l.shape for p, l in flat_conv}
    assert paths_init == paths_conv


def test_config_from_hparams():
    cfg = config_from_hparams({
        "residual_channels": 256, "kernel_size": 9, "spec_dropout": 0.4,
        "norm_args": [0.0, 1.0, "imagewise"], "timesteps": 200,
    })
    assert cfg.residual_channels == 256
    assert cfg.kernel_size == 9
    assert cfg.spec_dropout == 0.4
    assert cfg.norm_args == (0.0, 1.0, "imagewise")


def test_full_scale_reference_state_dict_structure():
    """A state dict with the exact reference naming at FULL flagship scale —
    including the buffers a Lightning checkpoint carries (mel_layer,
    schedule tables, embedding table) that must be skipped — converts to a
    tree that matches a fresh full-size init exactly."""
    C_, L_, K_, MELS = 512, 15, 3, 229
    sd = {}
    sd["betas"] = torch.zeros(200)
    sd["sqrt_alphas_cumprod"] = torch.zeros(200)
    sd["posterior_variance"] = torch.zeros(200)
    sd["mel_layer.spectrogram.window"] = torch.zeros(2048)
    sd["mel_layer.mel_scale.fb"] = torch.zeros(1025, MELS)
    sd["diffusion_embedding.embedding"] = torch.zeros(200, 128)
    sd["diffusion_embedding.projection1.weight"] = torch.randn(512, 128)
    sd["diffusion_embedding.projection1.bias"] = torch.randn(512)
    sd["diffusion_embedding.projection2.weight"] = torch.randn(512, 512)
    sd["diffusion_embedding.projection2.bias"] = torch.randn(512)
    sd["input_projection.weight"] = torch.randn(C_, 88, 1)
    sd["input_projection.bias"] = torch.randn(C_)
    for i in range(L_):
        p = f"residual_layers.{i}."
        sd[p + "dilated_conv.weight"] = torch.randn(2 * C_, C_, K_)
        sd[p + "dilated_conv.bias"] = torch.randn(2 * C_)
        sd[p + "diffusion_projection.weight"] = torch.randn(C_, 512)
        sd[p + "diffusion_projection.bias"] = torch.randn(C_)
        sd[p + "conditioner_projection.weight"] = torch.randn(2 * C_, MELS, 1)
        sd[p + "conditioner_projection.bias"] = torch.randn(2 * C_)
        sd[p + "output_projection.weight"] = torch.randn(2 * C_, C_, 1)
        sd[p + "output_projection.bias"] = torch.randn(2 * C_)
    sd["skip_projection.weight"] = torch.randn(C_, C_, 1)
    sd["skip_projection.bias"] = torch.randn(C_)
    sd["output_projection.weight"] = torch.randn(88, C_, 1)
    sd["output_projection.bias"] = torch.randn(88)

    converted = convert_state_dict(sd)

    from diffroll_tpu import models

    model = models.build("ClassifierFreeDiffRoll")
    init = model.init(jax.random.key(0))["params"]
    paths_init = {jax.tree_util.keystr(p): l.shape
                  for p, l in jax.tree_util.tree_leaves_with_path(init)}
    paths_conv = {jax.tree_util.keystr(p): l.shape
                  for p, l in jax.tree_util.tree_leaves_with_path(converted)}
    assert paths_init == paths_conv

    # and the converted weights actually run a full-size forward
    out = model.apply({"params": converted},
                      jnp.zeros((1, 640, 88)), jnp.zeros((1,), jnp.int32),
                      jnp.zeros((1, 640, 229)), None)
    assert out.shape == (1, 640, 88)


def _reference_cfdg_ddpm_x0_loop(model, x_T, spec, w, betas, noises):
    """Fresh torch reimplementation of the reference's full test-time
    sampling loop: T steps of cfdg_ddpm_x0 (reference task/diffusion.py:
    765-790 loop, :943-969 step — CFG mix (1+w)c - w u, posterior step from
    the x0 prediction, the odd t==0 branch, per-step Gaussian noise).
    The unconditional branch conditions on spec := -1 (the effect of
    `sampling=True`, reference model/diffwave.py:656-660)."""
    alphas = 1.0 - betas
    alphas_cumprod = torch.cumprod(alphas, dim=0)
    sac = torch.sqrt(alphas_cumprod)
    s1m = torch.sqrt(1.0 - alphas_cumprod)
    x = x_T.clone()
    traj = []
    uncond = torch.full_like(spec, -1.0)
    for i, t in enumerate(reversed(range(len(betas)))):
        t_vec = torch.full((x.shape[0],), t, dtype=torch.long)
        with torch.no_grad():
            x0_c = model(x, t_vec, spec)
            x0_u = model(x, t_vec, uncond)
        x0 = (1.0 + w) * x0_c - w * x0_u
        if t == 0:
            x = x0 / sac[0]
        else:
            sigma = (s1m[t - 1] / s1m[t]) * torch.sqrt(1.0 - alphas[t])
            x = (sac[t - 1] * x0
                 + torch.sqrt(1.0 - sac[t - 1] ** 2 - sigma ** 2)
                 * (x - sac[t] * x0) / s1m[t]
                 + sigma * noises[i])
        traj.append(x.clone())
    return x, traj


@pytest.mark.parametrize("use_fused", [False, True])
def test_sampler_trajectory_parity_vs_torch_oracle(torch_model, use_fused):
    """END-TO-END parity: `DiffusionTask.sample` (flagship cfdg_ddpm_x0,
    converted torch weights, shared per-step noise) must reproduce the
    reference sampling trajectory step for step — one test that catches
    any schedule/sampler/net/weight-conversion regression at once. Runs
    both the flax path and the fused-stack path (XLA variant on CPU)."""
    from diffroll_tpu import models
    from diffroll_tpu.tasks import DiffusionTask, TaskConfig

    W = 0.5
    params = {"params": convert_state_dict(torch_model.state_dict())}
    model = models.build(
        "ClassifierFreeDiffRoll", residual_channels=C, residual_layers=LAYERS,
        kernel_size=K, dilation_bound=2, frames=T_FRAMES,
        timesteps=MAX_STEPS, n_mels=N_MELS)
    task = DiffusionTask(model, TaskConfig(
        timesteps=MAX_STEPS, w=W, sampling_type="cfdg_ddpm_x0",
        debug=True, use_fused=use_fused))

    rng = np.random.RandomState(2)
    x_T = rng.randn(2, T_FRAMES, 88).astype(np.float32)
    spec = rng.rand(2, T_FRAMES, N_MELS).astype(np.float32)

    key = jax.random.key(5)
    x0_jax, traj_jax = task.sample(params, jnp.asarray(x_T), key,
                                   roll_cond=jnp.asarray(spec),
                                   record_every=1)

    # replay the exact same per-step noises in the torch loop
    keys = jax.random.split(key, MAX_STEPS)
    noises = [torch.from_numpy(np.asarray(jax.random.normal(k, x_T.shape)))
              for k in keys]
    betas = torch.linspace(1e-4, 0.02, MAX_STEPS)
    x0_ref, traj_ref = _reference_cfdg_ddpm_x0_loop(
        torch_model, torch.from_numpy(x_T), torch.from_numpy(spec), W,
        betas, noises)

    np.testing.assert_allclose(np.asarray(x0_jax), x0_ref.numpy(),
                               atol=5e-4, rtol=1e-3)
    traj_jax = np.asarray(traj_jax)
    assert traj_jax.shape[0] == len(traj_ref) == MAX_STEPS
    for i in range(MAX_STEPS):
        np.testing.assert_allclose(
            traj_jax[i], traj_ref[i].numpy(), atol=5e-4, rtol=1e-3,
            err_msg=f"trajectory diverged at reverse step {i}")


# ------------------------------------------------------------------ fixture

FIXTURE = pathlib.Path(__file__).parent / "fixtures" / "lightning_small.ckpt"


def test_lightning_fixture_loads_without_omegaconf():
    """The committed Lightning-style fixture (structurally a Zenodo ckpt:
    AttributeDict hparams holding pickled omegaconf DictConfig/ListConfig,
    Lightning bookkeeping keys, buffer-bearing state_dict) loads via the
    tolerant unpickler even though omegaconf/pytorch_lightning are NOT
    installed, and every hparam coerces to a plain Python value."""
    import importlib.util

    assert importlib.util.find_spec("omegaconf") is None, (
        "test precondition: omegaconf must be absent for the stub path")

    from diffroll_tpu.compat import load_lightning

    cfg, task_updates, params = load_lightning(str(FIXTURE))

    # model args (flat hparams)
    assert cfg.residual_channels == C
    assert cfg.residual_layers == LAYERS
    assert cfg.kernel_size == K
    assert cfg.dilation_bound == 2
    assert cfg.spec_dropout == 0.1
    assert cfg.norm_args == (0.0, 1.0, "imagewise")   # ListConfig
    # nested spec_args DictConfig -> MelConfig
    assert cfg.n_mels == N_MELS
    assert cfg.mel.n_mels == N_MELS
    assert cfg.mel.hop_length == 512
    assert cfg.mel.n_fft == 2048
    assert cfg.mel.f_max == 8000.0
    # task knobs (incl. nested sampling/training DictConfigs)
    assert cfg.timesteps == MAX_STEPS
    assert task_updates["sampling_type"] == "cfdg_ddpm_x0"
    assert task_updates["w"] == 0.5
    assert task_updates["frame_threshold"] == 0.65
    assert task_updates["training_mode"] == "x_0"
    assert task_updates["loss_keys"] == ("diffusion_loss",)
    assert task_updates["lr"] == 1e-5

    # buffers skipped, weights converted
    names = set(params["params"])
    assert "betas" not in names and "mel_layer" not in str(names)
    assert "residual_layers_0" in names


def test_lightning_fixture_forward_parity():
    """Weights from the fixture drive the flax net to the same output as
    the torch oracle restored from the same state_dict."""
    from diffroll_tpu.compat import load_torch_checkpoint

    cfg, params = load_torch_checkpoint(str(FIXTURE))
    net = DiffRollNet(
        residual_channels=C, residual_layers=LAYERS, kernel_size=K,
        dilation_base=2, dilation_bound=2, max_steps=MAX_STEPS,
        n_mels=N_MELS,
    )
    sd = torch.load(str(FIXTURE), map_location="cpu",
                    weights_only=False,
                    pickle_module=__import__(
                        "diffroll_tpu.compat.torch_ckpt",
                        fromlist=["_TolerantPickleModule"]
                    )._TolerantPickleModule)["state_dict"]
    oracle = TorchDiffRoll().eval()
    oracle.load_state_dict(
        {k: v for k, v in sd.items() if k in oracle.state_dict()})

    rng = np.random.RandomState(5)
    roll = rng.randn(2, T_FRAMES, 88).astype(np.float32)
    cond = rng.randn(2, T_FRAMES, N_MELS).astype(np.float32)
    t = np.array([1, 9])
    with torch.no_grad():
        ref = oracle(torch.from_numpy(roll), torch.from_numpy(t),
                     torch.from_numpy(cond)).numpy()
    ours = np.asarray(net.apply(params, jnp.asarray(roll), jnp.asarray(t),
                                jnp.asarray(cond)))
    np.testing.assert_allclose(ours, ref, atol=2e-5, rtol=1e-4)


def test_cli_test_on_lightning_ckpt(tmp_path):
    """The one-command Zenodo recipe: `python -m diffroll_tpu test
    pretrained_path=<file>.ckpt` auto-detects the Lightning file, converts,
    adopts recorded hparams (sampler w=0.5, frame_threshold=0.65), and
    scores — no separate conversion step (reference test.py:18-50)."""
    from diffroll_tpu.cli import test as test_cli
    from diffroll_tpu.io import write_midi, write_wav

    SR, HOP = 16000, 512
    frames = 16  # T_FRAMES of the oracle fixture
    seq = frames * HOP
    d = tmp_path / "MAPS" / "ENSTDkAm" / "MUS"
    d.mkdir(parents=True)
    rng = np.random.RandomState(0)
    for i in range(2):
        write_wav(d / f"c{i}.wav", rng.randn(seq).astype(np.float32) * 0.1,
                  SR)
        write_midi(str(d / f"c{i}.mid"), [60, 64], [(0.1, 0.4), (0.5, 0.9)])

    metrics = test_cli.main([
        f"pretrained_path={FIXTURE}",
        f"dataset.root={tmp_path}", f"dataset.sequence_length={seq}",
        f"model.frames={frames}",
        "dataloader.test_batch_size=2", "dataloader.num_workers=1",
        f"trainer.output_dir={tmp_path / 'out'}",
    ])
    assert 0.0 <= metrics["frame_f1"] <= 1.0
    assert metrics["n_clips"] == 2
