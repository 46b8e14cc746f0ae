"""First-party C++ host-runtime parity tests: the native resampler,
rasterizer, and note-event decoder must match their numpy/scipy
counterparts (which remain the fallbacks when no toolchain exists)."""

import numpy as np
import pytest

from diffroll_tpu import native

pytestmark = pytest.mark.skipif(
    not native.available(), reason="no C++ toolchain / native build failed"
)


def test_resample_matches_scipy():
    from diffroll_tpu.io.wav import _resample_scipy

    rng = np.random.RandomState(0)
    x = rng.randn(44100 * 2).astype(np.float32)
    ours = native.resample(x, 44100, 16000)
    ref = _resample_scipy(x, 44100, 16000)
    assert ours.shape == ref.shape
    # identical filter design; differences are float32-accumulation only
    np.testing.assert_allclose(ours, ref, atol=2e-4)


def test_resample_upsample_and_batch():
    from diffroll_tpu.io.wav import _resample_scipy

    rng = np.random.RandomState(1)
    x = rng.randn(3, 8000).astype(np.float32)
    ours = native.resample(x, 8000, 16000)
    ref = _resample_scipy(x, 8000, 16000)
    assert ours.shape == ref.shape == (3, 16000)
    np.testing.assert_allclose(ours, ref, atol=2e-4)


def test_rasterize_matches_numpy():
    from diffroll_tpu.data.rasterize import rasterize_notes
    from diffroll_tpu.io.midi import MidiNote

    rng = np.random.RandomState(2)
    notes = [
        MidiNote(onset=float(o), offset=float(o + d), pitch=int(p), velocity=100)
        for o, d, p in zip(rng.uniform(0, 18, 50), rng.uniform(0.05, 2, 50),
                           rng.randint(15, 115, 50))
    ]
    # the public entry dispatches to native; compute the numpy reference by
    # rasterizing with native disabled
    frame_n, onset_n = rasterize_notes(notes, 640)
    avail, native._lib = native._lib, None
    tried = native._tried
    native._tried = True
    try:
        frame_py, onset_py = rasterize_notes(notes, 640)
    finally:
        native._lib, native._tried = avail, tried
    np.testing.assert_array_equal(frame_n, frame_py)
    np.testing.assert_array_equal(onset_n, onset_py)


def test_extract_notes_matches_numpy():
    rng = np.random.RandomState(3)
    roll = (rng.rand(200, 88) > 0.85).astype(np.float32)
    out_native = native.extract_notes(roll > 0.5, roll > 0.5, rule1=True)
    assert out_native is not None
    p_n, i_n = out_native

    from diffroll_tpu.eval import notes as notes_mod

    avail, native._lib = native._lib, None
    tried = native._tried
    native._tried = True
    try:
        p_py, i_py = notes_mod.extract_notes(roll, roll, 0.5, 0.5, "rule1")
    finally:
        native._lib, native._tried = avail, tried
    np.testing.assert_array_equal(p_n, p_py)
    np.testing.assert_array_equal(i_n, i_py)


def test_build_fingerprint_gates_cached_binary(tmp_path, monkeypatch):
    """A cached .so is reused only when its recorded build fingerprint
    matches the current (source, compiler, flags) hash — a binary from a
    foreign host must be recompiled, never dlopened (it can SIGILL)."""
    import importlib

    import diffroll_tpu.native as nat

    fpr = nat._fingerprint()
    assert fpr is not None and len(fpr) == 64
    # deterministic for fixed inputs
    assert nat._fingerprint() == fpr

    # simulate a foreign binary: same .so on disk, stale fingerprint
    build = tmp_path / "_build"
    build.mkdir()
    lib = build / "libdiffroll_native.so"
    lib.write_bytes(b"\x7fELF not a real library")
    (build / "fingerprint.txt").write_text("0" * 64)
    monkeypatch.setattr(nat, "_BUILD", build)
    monkeypatch.setattr(nat, "_LIB_PATH", lib)
    monkeypatch.setattr(nat, "_FPR_PATH", build / "fingerprint.txt")
    monkeypatch.setattr(nat, "_lib", None)
    monkeypatch.setattr(nat, "_tried", False)
    assert nat._load() is not None  # recompiled, not the fake binary
    assert (build / "fingerprint.txt").read_text().strip() == fpr
    assert lib.stat().st_size > 100  # real library replaced the stub
