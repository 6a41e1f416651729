"""tools/rehearse_eval.py — the on-chip eval dress-rehearsal runner.

The rehearsal itself needs the real chip (docs/rehearsal_eval.md is its
committed evidence); what CPU tests can lock in is the runner's
orchestration logic: per-step allowed return codes (tools/reproduce.py
exits 1 BY DESIGN when the ±0.5 reproduction bar is missed — the correct
outcome for mock weights), wall-time history accumulating across reruns
(tunnel-weather spread), persisted findings notes, and the report
writer's significant-digit rounding (probe deltas ~1e-5 must not render
as 0.0 — a real regression caught while writing the round-5 report).
"""

import importlib.util
import json
import os
import sys

import pytest

_SPEC = importlib.util.spec_from_file_location(
    "rehearse_eval",
    os.path.join(os.path.dirname(__file__), "..", "tools", "rehearse_eval.py"),
)
rehearse_eval = importlib.util.module_from_spec(_SPEC)
_SPEC.loader.exec_module(rehearse_eval)


def _exit_cmd(rc, msg=""):
    return [sys.executable, "-c",
            f"import sys; print('{msg}'); sys.exit({rc})"]


def test_run_step_ok_rcs_and_history():
    results = {}
    ok = rehearse_eval.run_step("s", _exit_cmd(1), results, ok_rcs=(0, 1))
    assert ok and results["s"]["rc_ok"] and results["s"]["returncode"] == 1
    assert "stderr_tail" not in results["s"]

    ok = rehearse_eval.run_step("s", _exit_cmd(0), results, ok_rcs=(0, 1))
    assert ok
    # reruns append to the wall history instead of losing the first run
    assert len(results["s"]["wall_s_history"]) == 2

    ok = rehearse_eval.run_step("f", _exit_cmd(2), results)
    assert not ok and not results["f"]["rc_ok"]
    assert "stderr_tail" in results["f"]


def test_run_step_parses_trailing_json():
    results = {}
    cmd = [sys.executable, "-c",
           "print('noise'); print('{\"a\": 1, \"b\": {\"c\": 2}}')"]
    assert rehearse_eval.run_step("j", cmd, results)
    assert results["j"]["metrics"] == {"a": 1, "b": {"c": 2}}


def test_write_report_rounding_notes_and_rc1(tmp_path):
    class Args:
        report = str(tmp_path / "r.md")
        scenes, frames, vos_scenes, vos_frames, size = 2, 8, 1, 4, 64

    results = {
        "_notes": {"notes": ["the probe bug story"]},
        "reproduce": {
            "cmd": "python tools/reproduce.py ...",
            "wall_s": 9.9,
            "wall_s_history": [423.4, 232.2],
            "returncode": 1,
            "rc_ok": True,
            "metrics": {
                "feature_parity": {"max_abs": 1.9073486328125e-05,
                                   "ok": True},
                "scalar": 34.66043535944702,
            },
        },
    }
    rehearse_eval.write_report(Args, results)
    text = open(Args.report).read()
    assert "**finding:** the probe bug story" in text
    # significant digits, not 4 decimals: 1.9e-5 must survive
    assert "1.907e-05" in text and "0.0," not in text.split("max_abs")[1][:30]
    assert "34.66" in text
    assert "designed exit" in text          # rc=1 semantics called out
    assert "[423.4, 232.2]" in text         # weather spread shown


def test_cli_notes_persist_and_steps_none(tmp_path, monkeypatch, capsys):
    """--steps none regenerates the report from the saved JSON; --note
    appends into it across invocations."""
    jpath = tmp_path / "rep.json"
    mdpath = tmp_path / "rep.md"
    with open(jpath, "w") as f:
        json.dump({"davis": {"cmd": "x", "wall_s": 1.0, "returncode": 0,
                             "rc_ok": True, "metrics": {"m": 1.0}}}, f)
    monkeypatch.setattr(
        sys, "argv",
        ["rehearse_eval.py", "--skip-generate", "--steps", "none",
         "--note", "first note", "--root", str(tmp_path),
         "--report", str(mdpath), "--json", str(jpath)],
    )
    with pytest.raises(SystemExit) as e:
        rehearse_eval.main()
    assert e.value.code == 0
    saved = json.load(open(jpath))
    assert saved["_notes"]["notes"] == ["first note"]
    assert "first note" in open(mdpath).read()
