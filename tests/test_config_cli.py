"""Config system + CLI entry tests: preset composition, dotted overrides,
YAML layering, and tiny end-to-end runs of the train/test/sample/infer
entries on a synthetic MAPS tree (the L5/L6 layers, SURVEY.md §1)."""

import json
import pathlib

import numpy as np
import pytest

from diffroll_tpu.config import (
    PRESETS,
    apply_overrides,
    compose,
    from_argv,
    parse_argv,
)
from diffroll_tpu.config.experiment import asdict_flat
from diffroll_tpu.io import write_midi, write_wav

SR, HOP = 16000, 512
# 64-frame clips keep U-Net/CFG compile fast on the CPU test backend
FRAMES = 64
SEQ = FRAMES * HOP


# ----------------------------------------------------------------- config

def test_presets_compose():
    for name in PRESETS:
        cfg = compose(name)
        assert cfg.model.timesteps == cfg.task.timesteps, name


def test_dotted_overrides_types():
    cfg = compose("spec_roll", {
        "model.kernel_size": "9",
        "model.spec_dropout": "0.4",
        "task.w": "0.5",
        "task.sampling_type": "ddim_x0",
        "task.inpainting_t": "[10,20]",
        "trainer.run_name": "null",
        "dataset.download": "false",
        "dataloader.train_batch_size": "2",
    })
    assert cfg.model.kernel_size == 9
    assert cfg.model.spec_dropout == 0.4
    assert cfg.task.w == 0.5
    assert cfg.task.sampling_type == "ddim_x0"
    assert cfg.task.inpainting_t == (10, 20)
    assert cfg.trainer.run_name is None
    assert cfg.dataset.download is False
    assert cfg.dataloader.train_batch_size == 2


def test_model_swap_recomposes():
    cfg = compose("spec_roll", {"model_name": "DiffRollv2",
                                "model.residual_layers": "4"})
    assert cfg.model.variant == "2d"
    assert cfg.model.residual_layers == 4
    # timesteps synced model<->task
    assert cfg.model.timesteps == cfg.task.timesteps


def test_unknown_key_raises():
    with pytest.raises(KeyError):
        compose("spec_roll", {"model.bogus_knob": "1"})
    with pytest.raises(KeyError):
        compose("nonexistent_preset")


def test_yaml_layering(tmp_path):
    y = tmp_path / "exp.yaml"
    y.write_text("task:\n  w: 0.25\nmodel:\n  kernel_size: 5\n")
    cfg = compose("spec_roll", {"config": str(y), "task.w": "0.75"})
    assert cfg.model.kernel_size == 5
    assert cfg.task.w == 0.75  # CLI beats YAML


def test_parse_argv_and_from_argv():
    pos, ov = parse_argv(["test", "task.w=1.5", "--flag"])
    assert pos == ["test", "--flag"] and ov == {"task.w": "1.5"}
    cfg, rest, _ = from_argv(["unsupervised_pretrained", "dual"], "spec_roll")
    assert cfg.model.spec_dropout == 1.0
    assert rest == ["dual"]


def test_from_argv_overrides_include_yaml_keys(tmp_path):
    """Keys pinned via config=<file>.yaml count as explicit user overrides
    (checkpoint loaders must not clobber them); CLI still beats YAML."""
    y = tmp_path / "exp.yaml"
    y.write_text("task:\n  w: 0.25\n  sampling_steps: 50\n")
    cfg, _, ov = from_argv([f"config={y}", "task.w=0.75"], "spec_roll")
    assert cfg.task.w == 0.75 and cfg.task.sampling_steps == 50
    assert ov["task.w"] == "0.75"          # CLI wins in the dict too
    assert "task.sampling_steps" in ov     # YAML key surfaces as explicit


def test_asdict_flat_roundtrippable():
    flat = asdict_flat(compose("spec_roll"))
    assert flat["model.residual_channels"] == 512
    assert flat["task.sampling_type"] == "cfdg_ddpm_x0"


def test_platform_tpu_resolves_to_registered_backend():
    """`platform=tpu` must mean "this host's hardware TPU" even when the
    chip registers under a custom PJRT plugin name (e.g. a tunneled v5e
    pinned as JAX_PLATFORMS=axon by sitecustomize); `platform=cpu` and
    explicit plugin names pass through verbatim."""
    from diffroll_tpu.__main__ import _resolve_platform

    assert _resolve_platform("tpu", "axon") == "axon"
    assert _resolve_platform("tpu", "") == "tpu"
    assert _resolve_platform("tpu", "cpu") == "tpu"
    assert _resolve_platform("cpu", "axon") == "cpu"
    assert _resolve_platform("axon", "axon") == "axon"


# ----------------------------------------------------------------- CLI e2e

def make_clip(path: pathlib.Path, seconds=SEQ / SR):
    n = int(seconds * SR)
    rng = np.random.RandomState(hash(str(path)) % (2**31))
    write_wav(path.with_suffix(".wav"), rng.randn(n).astype(np.float32) * 0.1, SR)
    write_midi(str(path.with_suffix(".mid")), [60, 64, 67],
               [(0.1, 0.5), (0.5, 1.0), (1.0, 1.5)])


@pytest.fixture()
def maps_tree(tmp_path):
    for subset in ("AkPnBcht", "ENSTDkAm"):
        d = tmp_path / "MAPS" / subset / "MUS"
        d.mkdir(parents=True)
        for i in range(2):
            make_clip(d / f"clip{i}")
    return tmp_path


@pytest.fixture()
def maestro_cli_tree(tmp_path):
    """MAESTRO-v3 layout (year dirs + metadata json) for CLI e2e runs."""
    d = tmp_path / "maestro-v3.0.0" / "2020"
    d.mkdir(parents=True)
    rows = {"split": {}, "audio_filename": {}, "midi_filename": {}}
    for i, split in enumerate(["train", "train", "validation", "test"]):
        make_clip(d / f"p{i}")
        rows["split"][str(i)] = split
        rows["audio_filename"][str(i)] = f"2020/p{i}.wav"
        rows["midi_filename"][str(i)] = f"2020/p{i}.mid"
    (tmp_path / "maestro-v3.0.0" / "maestro-v3.0.0.json").write_text(
        json.dumps(rows))
    return tmp_path


TINY = [
    "model.residual_channels=16", "model.residual_layers=2",
    f"model.frames={FRAMES}", "task.timesteps=4",
    "dataloader.train_batch_size=2", "dataloader.test_batch_size=2",
    "dataloader.num_workers=1", "trainer.max_epochs=1",
    "trainer.check_val_every_n_epoch=1", "trainer.log_every_n_steps=1",
    f"dataset.sequence_length={SEQ}",
]


def _tiny_args(maps_tree, out, extra=()):
    return TINY + [f"dataset.root={maps_tree}", f"trainer.output_dir={out}",
                   *extra]


def test_cli_train_then_test_then_sample(maps_tree, tmp_path):
    from diffroll_tpu.cli import sample as sample_cli
    from diffroll_tpu.cli import test as test_cli
    from diffroll_tpu.cli import train as train_cli

    out = tmp_path / "out"
    train_cli.main(["spec_roll", *_tiny_args(maps_tree, out)])

    ckpts = sorted(out.rglob("checkpoints"))
    assert ckpts, "train produced no checkpoint dir"
    ckpt = ckpts[0]
    assert (ckpt / "last").exists()
    metrics_files = sorted(out.rglob("test_metrics.json"))
    assert metrics_files
    metrics = json.loads(metrics_files[0].read_text())
    assert 0.0 <= metrics["frame_f1"] <= 1.0
    assert metrics["n_clips"] == 2

    # standalone eval entry reloads the checkpoint and re-scores
    m2 = test_cli.main([f"pretrained_path={ckpt}",
                        *_tiny_args(maps_tree, out, ["task.w=0.5"])])
    assert 0.0 <= m2["frame_f1"] <= 1.0

    # transcription sampling over the MAPS test split
    run_dir = sample_cli.main([
        f"pretrained_path={ckpt}", "dataset.name=MAPS", "num_samples=2",
        *_tiny_args(maps_tree, out),
    ])
    mids = sorted(run_dir.glob("*.mid"))
    npzs = sorted(run_dir.glob("*.npz"))
    assert len(npzs) == 2
    assert len(mids) == 2
    traj = np.load(npzs[0])
    assert traj["roll"].shape == (FRAMES, 88)


def test_cli_generation_needs_no_audio(maps_tree, tmp_path):
    from diffroll_tpu.cli import sample as sample_cli
    from diffroll_tpu.cli import train as train_cli

    out = tmp_path / "out"
    train_cli.main(["spec_roll", *_tiny_args(maps_tree, out)])
    ckpt = sorted(out.rglob("checkpoints"))[0]
    run_dir = sample_cli.main([
        f"pretrained_path={ckpt}", "task.sampling_type=generation_ddpm_x0",
        "num_samples=2", *_tiny_args(maps_tree, out),
    ])
    assert len(sorted(run_dir.glob("*.npz"))) >= 2


def test_cli_train_test_maestro(maestro_cli_tree, tmp_path):
    """The reference's other corpus end-to-end: `dataset.name=MAESTRO` on a
    v3-layout tree drives train (with the metadata train/validation split)
    and the standard eval (test split) through the same entries
    (reference train_spec_roll.py:16-59 with config/dataset/MAESTRO.yaml)."""
    from diffroll_tpu.cli import test as test_cli
    from diffroll_tpu.cli import train as train_cli

    out = tmp_path / "out"
    train_cli.main(["spec_roll", "dataset.name=MAESTRO",
                    *_tiny_args(maestro_cli_tree, out)])
    ckpt = sorted(out.rglob("checkpoints"))[0]
    metrics = json.loads(sorted(out.rglob("test_metrics.json"))[0].read_text())
    assert metrics["n_clips"] == 1  # the tree's single test recording
    m2 = test_cli.main([f"pretrained_path={ckpt}", "dataset.name=MAESTRO",
                        *_tiny_args(maestro_cli_tree, out)])
    assert 0.0 <= m2["frame_f1"] <= 1.0


def test_cli_distill_then_eval(maps_tree, tmp_path):
    """Progressive distillation compresses a trained checkpoint and the
    distilled stage evaluates through the standard test entry."""
    from diffroll_tpu.cli import distill as distill_cli
    from diffroll_tpu.cli import test as test_cli
    from diffroll_tpu.cli import train as train_cli

    out = tmp_path / "out"
    train_cli.main(["spec_roll", *_tiny_args(maps_tree, out)])
    ckpt = sorted(out.rglob("checkpoints"))[0]

    distill_cli.main([
        f"pretrained_path={ckpt}", "distill.start_steps=2",
        "distill.stages=1", "distill.steps_per_stage=3", "distill.lr=1e-4",
        *_tiny_args(maps_tree, out),
    ])
    stage_ckpts = sorted(out.rglob("distilled_2steps/checkpoints"))
    assert stage_ckpts, "distill produced no stage checkpoint"
    # saves must be COMMITTED by the time main() returns: without the
    # explicit ckpt.wait(), orbax's async commit raced interpreter
    # shutdown in the real CLI and left only state.orbax-checkpoint-tmp
    assert (stage_ckpts[0] / "last" / "state").exists(), (
        "stage checkpoint not committed at main() return")
    assert not list((stage_ckpts[0] / "last").glob("*-tmp*")), (
        "uncommitted orbax tmp dir left behind")
    m = test_cli.main([
        f"pretrained_path={stage_ckpts[0]}", "task.sampling_type=ddim_x0",
        "task.sampling_steps=2", "task.w=0",
        *_tiny_args(maps_tree, out),
    ])
    assert 0.0 <= m["frame_f1"] <= 1.0

    # serve adopts the distilled checkpoint's RECORDED sampler identity
    # when no explicit task.* flags are given (cli/serve.py)
    import diffroll_tpu.serve as serve_pkg
    from diffroll_tpu.cli import serve as serve_cli

    captured = {}

    def fake_serve_forever(service, host="127.0.0.1", port=8077,
                           info=None, ready=None):
        captured["sampler"] = service.task.config.sampling_type
        captured["steps"] = service.task.config.sampling_steps
        # ServeConfig's serving defaults must reach the service (r5:
        # int16 transfer + depth-2 pipeline, results/serve_profile_r5/)
        captured["transfer"] = service.transfer_dtype
        captured["depth"] = service.pipeline_depth
        service.close()

    orig = serve_pkg.serve_forever
    serve_pkg.serve_forever = fake_serve_forever
    try:
        serve_cli.main([f"pretrained_path={stage_ckpts[0]}"])
    finally:
        serve_pkg.serve_forever = orig
    assert captured == {"sampler": "ddim_x0", "steps": 2,
                        "transfer": "int16", "depth": 2}


def test_cli_baseline_task(maps_tree, tmp_path):
    """The discriminative baseline recipe (reference task/baseline.py)
    trains and evaluates through the same entries."""
    from diffroll_tpu.cli import train as train_cli

    out = tmp_path / "out"
    train_cli.main(["baseline", *_tiny_args(maps_tree, out)])
    metrics = json.loads(sorted(out.rglob("test_metrics.json"))[0].read_text())
    assert 0.0 <= metrics["frame_f1"] <= 1.0


def test_cli_dual_dataset_finetune(maps_tree, tmp_path):
    """continue_train_both equivalent: dual-loss fine-tuning from a ckpt
    (reference continue_train_both.py:44-47)."""
    from diffroll_tpu.cli import train as train_cli

    out = tmp_path / "out"
    train_cli.main(["spec_roll", *_tiny_args(maps_tree, out)])
    ckpt = sorted(out.rglob("checkpoints"))[0]
    # both datasets point at the same synthetic MAPS tree
    train_cli.main([
        "spec_roll", "dual", f"pretrained_path={ckpt}",
        "dataset2.name=MAPS", f"dataset2.root={maps_tree}",
        f"dataset2.sequence_length={SEQ}",
        *_tiny_args(maps_tree, out),
    ])
    logs = sorted(out.rglob("metrics.jsonl"))
    text = "".join(p.read_text() for p in logs)
    assert "unconditional_diffusion_loss" in text


def test_cli_inpainting_sample(maps_tree, tmp_path):
    from diffroll_tpu.cli import sample as sample_cli
    from diffroll_tpu.cli import train as train_cli

    out = tmp_path / "out"
    train_cli.main(["spec_roll", *_tiny_args(maps_tree, out)])
    ckpt = sorted(out.rglob("checkpoints"))[0]
    run_dir = sample_cli.main([
        f"pretrained_path={ckpt}", "dataset.name=MAPS", "num_samples=2",
        "task.sampling_type=inpainting_ddpm_x0", "task.inpainting_t=[10,30]",
        *_tiny_args(maps_tree, out),
    ])
    assert len(sorted(run_dir.glob("*.npz"))) == 2


def test_cli_infer_unet(maps_tree, tmp_path):
    from diffroll_tpu.cli import infer as infer_cli
    from diffroll_tpu.cli import train as train_cli

    out = tmp_path / "out"
    unet_tiny = [
        "model.residual_channels=6", f"model.frames={FRAMES}",
        "task.timesteps=4", "dataloader.train_batch_size=2",
        "dataloader.num_workers=1", "trainer.max_epochs=1",
        "trainer.check_val_every_n_epoch=1",
        f"dataset.sequence_length={SEQ}", "dataset.name=MAPS",
        f"dataset.root={maps_tree}", f"trainer.output_dir={out}",
    ]
    train_cli.main(["pianoroll", *unet_tiny])
    ckpt = sorted(out.rglob("checkpoints"))[0]
    run_dir = infer_cli.main([f"pretrained_path={ckpt}", "num_samples=2",
                              f"trainer.output_dir={out}"])
    assert len(sorted(run_dir.glob("*.npz"))) == 2


def test_dual_as_override_form(maps_tree, tmp_path):
    """The documented `dual=true` override form selects the dual recipe."""
    from diffroll_tpu.config import compose

    cfg = compose("spec_roll", {"dual": "true"})
    assert cfg.dual is True


def test_model_overrides_survive_checkpoint_reload(maps_tree, tmp_path):
    """Reference continue_train_single semantics: explicit model.* CLI keys
    are re-applied on top of the STORED model config at reload (e.g.
    switching spec_dropout between pretrain and fine-tune)."""
    from diffroll_tpu.cli import _common
    from diffroll_tpu.cli import train as train_cli
    from diffroll_tpu.config import from_argv

    out = tmp_path / "out"
    train_cli.main(["spec_roll", "model.spec_dropout=1.0",
                    *_tiny_args(maps_tree, out)])
    ckpt = sorted(out.rglob("checkpoints"))[0]
    cfg, _, overrides = from_argv(
        [f"pretrained_path={ckpt}", "model.spec_dropout=0.1",
         *_tiny_args(maps_tree, out)], "spec_roll")
    cfg2, model, task, state = _common.load_pretrained(cfg, overrides=overrides)
    assert cfg2.model.spec_dropout == 0.1          # CLI override applied
    assert cfg2.model.residual_channels == 16      # architecture from ckpt


def test_cli_specunet_trains(maps_tree, tmp_path):
    """The spec-conditioned U-Net family trains through the same entry."""
    from diffroll_tpu.cli import train as train_cli

    out = tmp_path / "out"
    train_cli.main([
        "spec_roll", "model_name=SpecUnet", "model.residual_channels=6",
        f"model.frames={FRAMES}", "task.timesteps=4",
        "dataloader.train_batch_size=2", "dataloader.test_batch_size=2",
        "dataloader.num_workers=1", "trainer.max_epochs=1",
        "trainer.check_val_every_n_epoch=1",
        f"dataset.sequence_length={SEQ}",
        f"dataset.root={maps_tree}", f"trainer.output_dir={out}",
    ])
    metrics = json.loads(sorted(out.rglob("test_metrics.json"))[0].read_text())
    assert 0.0 <= metrics["frame_f1"] <= 1.0


def test_cli_test_scores_full_recordings(tmp_path):
    """The eval protocol scores FULL recordings: a test clip longer than one
    window is reassembled from its consecutive windows and scored as one
    recording (reference `overlap: True`, config/dataset/MAPS.yaml:29-44;
    round-1 gap: eval used to score only each clip's first window)."""
    import jax

    from diffroll_tpu.cli import _common
    from diffroll_tpu.cli.test import run_test
    from diffroll_tpu.train.state import TrainState, make_optimizer

    # 2 test recordings of ~2.4 windows each -> 3 windows per recording
    for subset in ("AkPnBcht", "ENSTDkAm"):
        d = tmp_path / "MAPS" / subset / "MUS"
        d.mkdir(parents=True)
        for i in range(2):
            make_clip(d / f"clip{i}", seconds=2.4 * SEQ / SR)

    cfg = compose("test", dict(zip(
        ["model.residual_channels", "model.residual_layers", "model.frames",
         "task.timesteps", "dataloader.test_batch_size",
         "dataloader.num_workers", "dataset.sequence_length",
         "dataset.root", "trainer.output_dir",
         "dataset.eval_overlap_frames"],
        [8, 2, FRAMES, 4, 2, 1, SEQ, str(tmp_path), str(tmp_path / "out"),
         0])))  # butted tiles pinned: this test asserts tile geometry
    model, task = _common.setup_model_task(cfg)
    params = model.init(jax.random.key(0))
    state = TrainState.create(params, make_optimizer(1e-4))

    # sanity: the test loader enumerates 3 windows x 2 recordings
    ds = _common.build_dataset(cfg.dataset, "test")
    assert len(ds) == 6
    it = ds[0]
    assert {"clip_idx", "start_frame", "n_clip_frames"} <= set(it.keys())

    metrics = run_test(cfg, model, task, state)
    assert metrics["n_clips"] == 2  # recordings, not windows
    assert 0.0 <= metrics["frame_f1"] <= 1.0
    assert 0.0 <= metrics["note_f1"] <= 1.0


def test_cli_test_overlapped_eval_windows(tmp_path):
    """dataset.eval_overlap_frames routes eval through context-overlapped
    windows + crossfade stitching: recordings still score once each, and
    with a deterministic debug-style model the stitched roll is exact."""
    import jax

    from diffroll_tpu.cli import _common
    from diffroll_tpu.cli.test import run_test
    from diffroll_tpu.train.state import TrainState, make_optimizer

    for subset in ("ENSTDkAm",):
        d = tmp_path / "MAPS" / subset / "MUS"
        d.mkdir(parents=True)
        for i in range(2):
            make_clip(d / f"clip{i}", seconds=2.9 * SEQ / SR)

    cfg = compose("test", dict(zip(
        ["model.residual_channels", "model.residual_layers", "model.frames",
         "task.timesteps", "dataloader.test_batch_size",
         "dataloader.num_workers", "dataset.sequence_length",
         "dataset.root", "trainer.output_dir",
         "dataset.eval_overlap_frames"],
        [8, 2, FRAMES, 4, 2, 1, SEQ, str(tmp_path), str(tmp_path / "out"),
         8])))
    model, task = _common.setup_model_task(cfg)
    params = model.init(jax.random.key(0))
    state = TrainState.create(params, make_optimizer(1e-4))

    ds = _common.build_dataset(cfg.dataset, "test")
    win = SEQ // 512
    # overlapped stride -> more windows than butted tiling
    n_frames = int(np.ceil(2.9 * SEQ / SR * SR / 512))
    assert ds.n_windows(n_frames) > int(np.ceil(n_frames / win))

    metrics = run_test(cfg, model, task, state)
    assert metrics["n_clips"] == 2  # recordings, not windows
    assert 0.0 <= metrics["frame_f1"] <= 1.0
    # the protocol is self-describing: published tables carry the geometry
    assert metrics["eval_overlap_frames"] == 8


def test_cli_test_overlap_clamped_to_window(tmp_path):
    """An eval overlap >= win_frames is clamped to win_frames-1 exactly as
    the dataset clamps it when placing window starts (data/amt.py:151) —
    the stitch stride must match the dataset geometry or short-sequence
    configs silently misalign predictions before scoring."""
    import jax

    from diffroll_tpu.cli import _common
    from diffroll_tpu.cli.test import run_test
    from diffroll_tpu.train.state import TrainState, make_optimizer

    d = tmp_path / "MAPS" / "ENSTDkAm" / "MUS"
    d.mkdir(parents=True)
    make_clip(d / "clip0", seconds=2.2 * SEQ / SR)

    cfg = compose("test", dict(zip(
        ["model.residual_channels", "model.residual_layers", "model.frames",
         "task.timesteps", "dataloader.test_batch_size",
         "dataloader.num_workers", "dataset.sequence_length",
         "dataset.root", "trainer.output_dir",
         "dataset.eval_overlap_frames"],
        [8, 2, FRAMES, 4, 2, 1, SEQ, str(tmp_path), str(tmp_path / "out"),
         FRAMES + 10])))  # overlap exceeds the window
    model, task = _common.setup_model_task(cfg)
    params = model.init(jax.random.key(0))
    state = TrainState.create(params, make_optimizer(1e-4))

    metrics = run_test(cfg, model, task, state)
    assert metrics["n_clips"] == 1
    assert metrics["eval_overlap_frames"] == FRAMES - 1  # clamped
    assert 0.0 <= metrics["frame_f1"] <= 1.0


def test_cli_p_sweep_trains_per_point(maps_tree, tmp_path):
    """sweep p_grid=[...] drives one full train+test per spec_dropout and
    collects the F1-vs-p table (the paper's central experiment)."""
    from diffroll_tpu.cli import sweep as sweep_cli

    out = tmp_path / "out"
    rows = sweep_cli.main([
        "spec_roll", "p_grid=[0.0,0.5]",
        *_tiny_args(maps_tree, out)])
    assert [r["spec_dropout"] for r in rows] == [0.0, 0.5]
    assert all(0.0 <= r["note_f1"] <= 1.0 for r in rows)
    table = json.loads((out / "p_sweep" / "p_sweep.json").read_text())
    assert len(table) == 2
    # one train run dir per point
    assert sorted((out / "p_sweep").glob("p*")) != []
