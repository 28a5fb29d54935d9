"""Restart contract of tools/train_supervisor.py (no JAX, no training).

The supervisor is the failure-tolerance wrapper for long quality runs on
hosts where the TPU tunnel client leaks RSS per step (BENCH_NOTES.md
"Host RSS leak"): the child checkpoints and exits 75 at its RSS budget,
the supervisor relaunches with --resume until the absolute --until-step
target is met. These tests script the child's exit codes and assert the
relaunch/argument behavior.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import pytest

from tools import train_supervisor


def _run(monkeypatch, rcs, argv):
    calls = []

    def fake_call(cmd):
        calls.append(cmd)
        return rcs[len(calls) - 1]

    monkeypatch.setattr(train_supervisor.subprocess, "call", fake_call)
    rc = train_supervisor.main(argv)
    return rc, calls


def test_single_segment_success(monkeypatch):
    rc, calls = _run(monkeypatch, [0], [
        "--max-rss-gb", "55", "--",
        "--steps", "10", "--until-step", "10", "--ckpt", "/tmp/x"])
    assert rc == 0
    assert len(calls) == 1
    # child gets the RSS budget appended, and NO --resume on segment 0
    assert calls[0][-2:] == ["--max-rss-gb", "55.0"]
    assert "--resume" not in calls[0]
    assert calls[0][1].endswith("train_to_ap.py")


def test_exit75_relaunches_with_resume(monkeypatch):
    rc, calls = _run(monkeypatch, [75, 75, 0], [
        "--", "--steps", "10", "--until-step", "10", "--ckpt", "/tmp/x"])
    assert rc == 0
    assert len(calls) == 3
    assert "--resume" not in calls[0]
    assert calls[1].count("--resume") == 1
    assert calls[2].count("--resume") == 1


def test_nonrestart_failure_propagates(monkeypatch):
    rc, calls = _run(monkeypatch, [75, 1], [
        "--", "--steps", "10", "--until-step", "10", "--ckpt", "/tmp/x"])
    assert rc == 1
    assert len(calls) == 2


def test_restart_cap(monkeypatch):
    rc, calls = _run(monkeypatch, [75] * 3, [
        "--max-restarts", "2", "--",
        "--steps", "10", "--until-step", "10", "--ckpt", "/tmp/x"])
    assert rc == 1
    assert len(calls) == 3  # initial + 2 restarts


def test_requires_ckpt(monkeypatch):
    with pytest.raises(SystemExit):
        train_supervisor.main(["--", "--steps", "10"])


def test_explicit_resume_not_duplicated(monkeypatch):
    rc, calls = _run(monkeypatch, [75, 0], [
        "--", "--steps", "10", "--until-step", "10", "--ckpt", "/tmp/x", "--resume"])
    assert rc == 0
    assert calls[1].count("--resume") == 1


def test_warmup_segmented_restore_structure(tmp_path):
    """Real segmented training with --warmup: every restart must restore
    the checkpoint into an identically-structured optimizer state, even
    across the LR-drop boundary. Pre-fix, --warmup built a
    schedule-driven opt_state (with a count leaf) while the mid-loop
    LR/10 swap saved a constant-LR one, so the segment after the drop
    crashed in orbax restore. The drop is now folded into the warmup
    schedule itself (absolute count space), keeping one structure for
    the whole run."""
    from tools import train_to_ap

    ckpt = str(tmp_path / "ck")
    common = [
        "--image-size", "64", "--nvox", "8", "--samples", "2",
        "--scenes", "2", "--grid-reas", "add", "--steps", "999",
        "--until-step", "5", "--warmup", "1",       # drop at step 3
        "--ckpt", ckpt, "--max-rss-gb", "0.001",    # exit 75 every step
        "--smoke", "--skip-eval",
    ]
    # five 1-step segments (rss budget trips at the step-0 check), like
    # the supervisor would run them
    for seg in range(5):
        argv = list(common) + (["--resume"] if seg else [])
        with pytest.raises(SystemExit) as e:
            train_to_ap.main(argv)
        assert e.value.code == 75
    # final segment: restored at step 5, nothing left to run
    result = train_to_ap.main(list(common) + ["--resume"])
    assert result["steps"] == 5


def test_requires_until_step(monkeypatch):
    """--steps alone is relative (each restart trains N MORE steps);
    the supervisor demands the absolute --until-step target."""
    with pytest.raises(SystemExit):
        train_supervisor.main(["--", "--steps", "10", "--ckpt", "/tmp/x"])


def test_accepts_equals_form_flags(monkeypatch):
    rc, calls = _run(monkeypatch, [0], [
        "--", "--steps", "10", "--until-step=10", "--ckpt=/tmp/x"])
    assert rc == 0 and len(calls) == 1
