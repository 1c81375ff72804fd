"""bench.py matrix-harness plumbing (VERDICT r3 #1 + ADVICE r3).

The r3 driver bench timed out with NO parseable artifact; these tests
pin the guard rails that make that impossible again: stage ordering,
deadline skips with partial output, and headline fallback when the
rigid stage fails or is not selected. All with a stubbed _stage_entry
(no model builds) -- the real stages are covered on-chip.
"""

import json
import signal
import time

import pytest

import bench


@pytest.fixture
def restore_signals():
    saved = {s: signal.getsignal(s) for s in (signal.SIGALRM, signal.SIGTERM)}
    yield
    signal.alarm(0)
    for sig, handler in saved.items():
        signal.signal(sig, handler)


def _run_main(monkeypatch, capsys, entries, stages, deadline=0.0,
              t_start=None):
    calls = []

    def fake_entry(stage):
        calls.append(stage)
        result = entries[stage]
        if isinstance(result, Exception):
            raise result
        return result

    monkeypatch.setattr(bench, "_stage_entry", fake_entry)
    monkeypatch.setattr(bench, "_setup_compile_cache", lambda: None)
    monkeypatch.setattr(bench, "STAGE", "")
    monkeypatch.setattr(bench, "STAGES", stages)
    monkeypatch.setattr(bench, "DEADLINE_S", deadline)
    monkeypatch.setattr(bench, "T_START", t_start or time.time())
    bench.main()
    out = capsys.readouterr().out.strip().splitlines()[-1]
    return json.loads(out), calls


def test_matrix_order_and_entries(monkeypatch, capsys, restore_signals):
    entries = {s: (f"m_{s}", 100.0 + i, {"mfu": 0.06})
               for i, s in enumerate(["rigid", "predict", "flow", "joint"])}
    data, calls = _run_main(monkeypatch, capsys, entries,
                            ["joint", "rigid", "flow", "predict"])
    # canonical compile-cost order, independent of selection order
    assert calls == ["rigid", "predict", "flow", "joint"]
    assert data["metric"] == "m_rigid" and data["value"] == 100.0
    assert data["mfu"] == 0.06
    assert set(data["stages"]) == {"predict", "flow", "joint"}
    assert data["stages"]["joint"]["secs"] >= 0


def test_headline_falls_back_when_rigid_fails(monkeypatch, capsys,
                                              restore_signals):
    entries = {"rigid": RuntimeError("boom"),
               "predict": ("m_predict", 50.0, {})}
    data, calls = _run_main(monkeypatch, capsys, entries,
                            ["rigid", "predict"])
    assert calls == ["rigid", "predict"]
    assert data["metric"] == "m_predict" and data["value"] == 50.0
    assert "boom" in data["stages"]["rigid"]["error"]


def test_headline_without_rigid_selected(monkeypatch, capsys,
                                         restore_signals):
    # ADVICE r3: BENCH_STAGES=joint,flow must not crash on missing rigid
    entries = {"joint": ("m_joint", 42.0, {}), "flow": ("m_flow", 43.0, {})}
    data, _ = _run_main(monkeypatch, capsys, entries, ["joint", "flow"])
    assert data["metric"] == "m_flow"  # flow first in canonical order
    assert data["stages"] == {"joint": {"metric": "m_joint", "value": 42.0,
                                        "unit": "images/sec",
                                        "secs": data["stages"]["joint"]["secs"]}}


def test_deadline_skips_but_still_emits(monkeypatch, capsys,
                                        restore_signals):
    entries = {"rigid": ("m_rigid", 10.0, {}),
               "predict": ("m_predict", 20.0, {})}
    # budget already exhausted before the first stage
    with pytest.raises(SystemExit):
        _run_main(monkeypatch, capsys, entries, ["rigid", "predict"],
                  deadline=1.0, t_start=time.time() - 100)
    data = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert data["stages"]["rigid"] == {"skipped": "deadline"}
    assert data["stages"]["predict"] == {"skipped": "deadline"}


def test_low_budget_skips_extras_but_runs_headline(monkeypatch, capsys,
                                                   restore_signals):
    # a stage is never STARTED without STAGE_MIN_S of budget left (the
    # remote compile is uncancellable, so starting one with 250 s left
    # would blow the deadline inside a blocking RPC) -- but the headline
    # stage always gets its shot
    entries = {"rigid": ("m_rigid", 10.0, {}),
               "predict": ("m_predict", 20.0, {})}
    data, calls = _run_main(monkeypatch, capsys, entries,
                            ["rigid", "predict"], deadline=100.0)
    assert calls == ["rigid"]
    assert data["value"] == 10.0
    assert data["stages"]["predict"] == {"skipped": "deadline"}


def test_per_stage_minimums_admit_predict(monkeypatch, capsys,
                                          restore_signals):
    # VERDICT r4 #2: a flat 550 s minimum could never admit a second
    # stage after rigid's ~730 s of a 1200 s budget; predict's floor is
    # 120 s so it IS admitted in a 300 s remainder while train-stage
    # extras still skip
    entries = {"rigid": ("m_rigid", 10.0, {}),
               "predict": ("m_predict", 20.0, {}),
               "flow": ("m_flow", 30.0, {})}
    data, calls = _run_main(monkeypatch, capsys, entries,
                            ["rigid", "predict", "flow"], deadline=300.0)
    assert calls == ["rigid", "predict"]
    assert data["stages"]["predict"]["value"] == 20.0
    assert data["stages"]["flow"] == {"skipped": "deadline"}


def test_flat_stage_min_override(monkeypatch):
    monkeypatch.setattr(bench, "_STAGE_MIN_FLAT", "200")
    assert bench._stage_min_s("predict") == 200.0
    assert bench._stage_min_s("stereo") == 200.0
    monkeypatch.setattr(bench, "_STAGE_MIN_FLAT", None)
    assert bench._stage_min_s("predict") == 120.0
    assert bench._stage_min_s("highres") == 650.0


def test_unmeasured_extras_run_first(monkeypatch, capsys, restore_signals):
    # round-robin accumulation: extras already carrying a driver value
    # in a committed BENCH_r*.json yield their slot to unmeasured ones
    entries = {s: (f"m_{s}", 1.0, {}) for s in
               ["rigid", "predict", "flow", "joint"]}
    monkeypatch.setattr(bench, "_driver_measured_stages",
                        lambda: {"rigid", "predict"})
    _, calls = _run_main(monkeypatch, capsys, entries,
                         ["rigid", "predict", "flow", "joint"])
    assert calls == ["rigid", "flow", "joint", "predict"]


def test_driver_measured_stages_parses_wrapper(tmp_path, monkeypatch):
    artifact = {"rc": 0, "tail": "...", "parsed": {
        "metric": "train_images_per_sec_per_chip_effb5_rigid_128x512",
        "value": 286.31,
        "stages": {"predict": {"value": 1500.0},
                   "flow": {"skipped": "deadline"}}}}
    import json as _json
    (tmp_path / "BENCH_r09.json").write_text(_json.dumps(artifact))
    monkeypatch.setattr(bench._os.path, "dirname",
                        lambda p: str(tmp_path))
    assert bench._driver_measured_stages() == {"rigid", "predict"}


def test_results_record_appends_ledger(tmp_path, monkeypatch, capsys):
    from xpt_mde_tpu.utils import results
    ledger = tmp_path / "RESULTS.jsonl"
    monkeypatch.setattr(results, "LEDGER", ledger)
    results.record("demo", {"ok": True, "x": 1.5})
    results.record("demo", {"ok": False})
    lines = [json.loads(l) for l in ledger.read_text().splitlines()]
    assert [l["ok"] for l in lines] == [True, False]
    assert lines[0]["check"] == "demo" and lines[0]["x"] == 1.5
    assert "date" in lines[0]
    # stdout contract: the JSON line is printed too
    printed = capsys.readouterr().out.strip().splitlines()
    assert json.loads(printed[-1])["ok"] is False


def test_mid_matrix_deadline_keeps_measured_stages(monkeypatch, capsys,
                                                   restore_signals):
    t_start = time.time()

    def slow_then_ok(stage):
        if stage == "rigid":
            return "m_rigid", 10.0, {}
        raise bench._Deadline()

    monkeypatch.setattr(bench, "_stage_entry", slow_then_ok)
    monkeypatch.setattr(bench, "_setup_compile_cache", lambda: None)
    monkeypatch.setattr(bench, "STAGE", "")
    monkeypatch.setattr(bench, "STAGES", ["rigid", "flow"])
    monkeypatch.setattr(bench, "DEADLINE_S", 3600.0)
    monkeypatch.setattr(bench, "T_START", t_start)
    bench.main()
    data = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert data["value"] == 10.0
    assert data["stages"]["flow"] == {"skipped": "deadline"}
