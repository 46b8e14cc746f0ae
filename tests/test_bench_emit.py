"""The bench harness's un-losable-headline guarantees (r4 post-mortem).

BENCH_r04.json had value=null although the headline HAD been measured:
it lived only in the sampling section's return value, which a later
sub-measurement timeout discarded. These tests pin the fix: the emitter
derives the headline from extras via a fallback ladder, and sections
cooperatively skip sub-measurements when their budget runs out.
"""

import importlib
import json
import sys
import time
import types


def _fresh_bench(monkeypatch):
    # bench.py module-level state is a singleton; reload for isolation
    sys.modules.pop("bench", None)
    sys.path.insert(0, "/root/repo")
    import bench
    importlib.reload(bench)
    return bench


def _emit_and_parse(bench, capsys):
    bench._emit_json_line()
    out = capsys.readouterr().out.strip()
    return json.loads(out)


def test_emit_uses_state_dt(monkeypatch, capsys):
    bench = _fresh_bench(monkeypatch)
    bench._STATE["dt"] = 0.1185
    line = _emit_and_parse(bench, capsys)
    assert line["value"] == 0.1185
    assert line["vs_baseline"] == round(1.0 / 0.1185, 3)


def test_emit_falls_back_to_extras_e2e_latency(monkeypatch, capsys):
    bench = _fresh_bench(monkeypatch)
    bench._STATE["extras"]["e2e_latency_s"] = 0.12
    line = _emit_and_parse(bench, capsys)
    assert line["value"] == 0.12


def test_emit_derives_from_steps_per_sec(monkeypatch, capsys):
    # exactly the r4 failure shape: steps/sec present, nothing else
    bench = _fresh_bench(monkeypatch)
    bench._STATE["extras"]["ddpm_steps_per_sec"] = 1687.2
    line = _emit_and_parse(bench, capsys)
    assert line["value"] == round(200.0 / 1687.2, 4)
    assert line["extras"]["headline_source"] == "derived_from_steps_per_sec"


def test_emit_scan_path_last_resort(monkeypatch, capsys):
    bench = _fresh_bench(monkeypatch)
    bench._STATE["extras"]["e2e_scan_latency_s"] = 0.1468
    line = _emit_and_parse(bench, capsys)
    assert line["value"] == 0.1468
    assert line["extras"]["headline_source"] == "scan_path_fallback"


def test_emit_null_only_when_nothing_measured(monkeypatch, capsys):
    bench = _fresh_bench(monkeypatch)
    line = _emit_and_parse(bench, capsys)
    assert line["value"] is None and line["vs_baseline"] is None


def test_emit_is_once_only(monkeypatch, capsys):
    bench = _fresh_bench(monkeypatch)
    bench._STATE["dt"] = 0.1
    bench._emit_json_line()
    bench._emit_json_line()
    out = capsys.readouterr().out.strip().splitlines()
    assert len(out) == 1


def test_section_ctx_skips_and_records(monkeypatch):
    bench = _fresh_bench(monkeypatch)
    ctx = bench.SectionCtx(time.perf_counter() + 5.0)
    extras = {}
    assert ctx.has(1.0, "a", extras) and "a" not in extras
    assert not ctx.has(100.0, "b", extras)
    assert extras["b"].startswith("skipped (budget:")
    ctx.cancel.set()
    assert not ctx.has(0.1, "c", extras)
    assert extras["c"] == "skipped (section abandoned)"


def test_run_section_timeout_keeps_eager_extras(monkeypatch):
    """A section that writes extras eagerly then hangs must leave those
    extras intact and set only the section error — the r4 invariant."""
    bench = _fresh_bench(monkeypatch)
    extras = {}

    def section(ex, ctx):
        ex["e2e_latency_s"] = 0.118
        bench._STATE["dt"] = 0.118
        time.sleep(60)
        return 999.0  # the return value must not matter

    out = bench.run_section("sampling", section, extras, budget_s=2.0)
    assert out is None
    assert extras["e2e_latency_s"] == 0.118
    assert "timeout" in extras["sampling_error"]
    assert bench._STATE["dt"] == 0.118
