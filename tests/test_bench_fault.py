"""bench.py mid-run fault isolation (run_section / emit_record).

Round 4's official perf record was lost when a transient TPU worker crash
inside ONE bench section propagated uncaught and killed the whole run
(BENCH_r04.json rc=1, zero numbers).  These tests force that failure mode
— a section raising a runtime fault mid-run, with and without backend
recovery — and prove the bench still emits its one-line JSON with every
section that did measure, an `errors` key, and the embedded last-good
record (the round-5 verdict's "forced-kill test").
"""

import json

import pytest


@pytest.fixture()
def bench():
    import sys

    sys.path.insert(0, "/root/repo")
    import bench as b

    return b


class FakeWorkerCrash(RuntimeError):
    """Stands in for jaxlib XlaRuntimeError: 'TPU worker process crashed
    or restarted' — the exact BENCH_r04 failure."""


def test_section_success_passthrough(bench):
    errors = {}
    assert bench.run_section("ok", lambda: {"x": 1}, errors) == {"x": 1}
    assert errors == {}


def test_section_retries_once_after_backend_recovers(bench, monkeypatch):
    probes = []
    monkeypatch.setattr(
        bench, "wait_for_backend", lambda *a, **k: probes.append(1) or True
    )
    calls = []

    def flaky():
        calls.append(1)
        if len(calls) == 1:
            raise FakeWorkerCrash("TPU worker process crashed or restarted")
        return {"fps": 123.0}

    errors = {}
    out = bench.run_section("davis_exact", flaky, errors)
    assert out == {"fps": 123.0}
    assert len(calls) == 2 and len(probes) == 1  # exactly one retry
    assert errors == {}


def test_section_records_error_after_failed_retry(bench, monkeypatch):
    monkeypatch.setattr(bench, "wait_for_backend", lambda *a, **k: True)

    def always_dies():
        raise FakeWorkerCrash("TPU worker process crashed or restarted")

    errors = {}
    assert bench.run_section("vos", always_dies, errors) is None
    assert "vos" in errors and "after retry" in errors["vos"]
    assert "FakeWorkerCrash" in errors["vos"]


def test_section_no_retry_when_backend_stays_down(bench, monkeypatch):
    monkeypatch.setattr(bench, "wait_for_backend", lambda *a, **k: False)
    calls = []

    def dies():
        calls.append(1)
        raise FakeWorkerCrash("unavailable")

    errors = {}
    assert bench.run_section("kinetics", dies, errors) is None
    assert len(calls) == 1  # no pointless retry into a dead backend
    assert "did not recover" in errors["kinetics"]


def test_keyboard_interrupt_propagates(bench):
    def interrupted():
        raise KeyboardInterrupt

    with pytest.raises(KeyboardInterrupt):
        bench.run_section("davis_headline", interrupted, {})


def test_forced_kill_mid_run_still_emits_partial_record(
    bench, monkeypatch, capsys, tmp_path
):
    """End-to-end simulation of the BENCH_r04 failure: the VOS section's
    worker dies mid-run and never recovers.  The earlier sections' numbers
    must survive into the emitted JSON alongside `errors` and the embedded
    last-good record, and the process exit code must be 0."""
    last_good = {"value": 131.3, "measured_at": "2026-08-19T00:00:00Z"}
    lg_path = tmp_path / "last_good.json"
    lg_path.write_text(json.dumps(last_good))
    monkeypatch.setattr(bench, "_LAST_GOOD_PATH", str(lg_path))
    monkeypatch.setattr(bench, "wait_for_backend", lambda *a, **k: False)

    sections = {
        "davis_headline": lambda: {"value": 137.1, "vs_baseline": 6.855},
        "propagation": lambda: {"exact_propagation_fps": 150.0},
        "vos": lambda: (_ for _ in ()).throw(
            FakeWorkerCrash("TPU worker process crashed or restarted")
        ),
    }
    errors, measured = {}, []
    record = {"metric": "davis_propagation_frames_per_sec_per_chip"}
    for name, fn in sections.items():
        out = bench.run_section(name, fn, errors)
        if out is not None:
            record.update(out)
            measured.append(name)

    rc = bench.emit_record(record, errors, measured)
    assert rc == 0  # partial measurements are a SUCCESSFUL bench run

    lines = capsys.readouterr().out.strip().splitlines()
    assert len(lines) == 1  # exactly one JSON line for the driver
    rec = json.loads(lines[0])
    assert rec["value"] == 137.1
    assert rec["exact_propagation_fps"] == 150.0
    assert "vos" in rec["errors"]
    assert rec["last_good_on_chip"] == last_good
    # a dirty run must NOT overwrite the last-good record
    assert json.loads(lg_path.read_text()) == last_good


def test_emit_record_nothing_measured_is_rc1(bench, monkeypatch, capsys, tmp_path):
    monkeypatch.setattr(bench, "_LAST_GOOD_PATH", str(tmp_path / "lg.json"))
    rc = bench.emit_record({"metric": "m", "value": 0.0}, {"davis": "boom"}, [])
    assert rc == 1
    rec = json.loads(capsys.readouterr().out.strip())
    assert rec["value"] == 0.0 and rec["errors"] == {"davis": "boom"}


def test_emit_record_clean_run_persists_last_good(
    bench, monkeypatch, capsys, tmp_path
):
    lg_path = tmp_path / "lg.json"
    monkeypatch.setattr(bench, "_LAST_GOOD_PATH", str(lg_path))
    record = {"metric": "m", "value": 140.0}
    rc = bench.emit_record(record, {}, ["davis_headline"])
    assert rc == 0
    saved = json.loads(lg_path.read_text())
    assert saved["value"] == 140.0 and "measured_at" in saved
    # the emitted line itself carries no measured_at (driver-schema keys only)
    assert "measured_at" not in json.loads(capsys.readouterr().out.strip())


def test_section_oom_degrades_without_retry(bench, monkeypatch):
    """A deterministic HBM OOM (bank beyond the single-chip ceiling) must
    not burn a backend re-probe + retry — the outcome cannot change.  The
    section records its error immediately and the run continues."""
    calls = []
    monkeypatch.setattr(
        bench, "wait_for_backend",
        lambda *a, **k: pytest.fail("OOM must not re-probe the backend"),
    )

    def oom_section():
        calls.append(1)
        raise RuntimeError(
            "XLA:TPU compile permanent error. Ran out of memory in memory "
            "space hbm. Used 16.54G of 15.75G hbm."
        )

    errors = {}
    assert bench.run_section("kinetics", oom_section, errors) is None
    assert len(calls) == 1  # no retry
    assert "hbm oom" in errors["kinetics"]
