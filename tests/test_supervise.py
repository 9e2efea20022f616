"""Restart supervisor: unit semantics + a full hang->watchdog->restart->
resume->success cycle through the real trainer CLI.

The reference has no supervisor — its recovery is a human re-running the
driver, which resumes at the last *epoch* checkpoint
(reference: tfsr/trainer_sr.py:250-259). Here the chain
watchdog (exit 43) -> supervise -> mid-epoch resume completes a training
job through an injected mid-epoch hang with no human in the loop.
"""

import os
import subprocess
import sys

import pytest

from srf_tpu.tools.supervise import parse_args, should_restart, supervise

from tests.test_preempt import (  # noqa: F401  (shared corpus harness)
    _argv,
    _child_env,
    _restore_tree,
    corpus,
    jax_flat,
    written_corpus,
)


# ---------------------------------------------------------------- units
def test_parse_args_defaults_and_split():
    args, command = parse_args(["--max-restarts", "3", "--", "echo", "hi"])
    assert args.max_restarts == 3
    assert command == ["echo", "hi"]
    assert 43 in args.restart_codes and 143 in args.restart_codes


def test_parse_args_custom_codes_and_any():
    args, _ = parse_args(["--restart-on", "7, 9", "--", "x"])
    assert args.restart_codes == {7, 9}
    args, _ = parse_args(["--restart-on", "any", "--", "x"])
    assert args.restart_codes is None


def test_parse_args_no_command_errors():
    with pytest.raises(SystemExit):
        parse_args(["--max-restarts", "3", "--"])


def test_should_restart_semantics():
    codes = {42, 43, 137, 143, -9, -15}
    assert not should_restart(0, codes)
    assert should_restart(43, codes)
    assert should_restart(-15, codes)   # raw SIGTERM == shell 143
    assert should_restart(-9, codes)    # raw SIGKILL == shell 137
    assert not should_restart(1, codes)
    assert should_restart(1, None)      # 'any' mode
    assert not should_restart(0, None)


def _counting_child(tmp_path, fail_times, fail_code=43):
    """A command that exits ``fail_code`` its first ``fail_times`` runs,
    then 0; records its run count in a file."""
    counter = tmp_path / "runs"
    code = (
        "import sys\n"
        "p = %r\n"
        "n = int(open(p).read()) if __import__('os').path.exists(p) else 0\n"
        "open(p, 'w').write(str(n + 1))\n"
        "sys.exit(%d if n < %d else 0)\n" % (str(counter), fail_code, fail_times)
    )
    return [sys.executable, "-c", code], counter


def test_supervise_restarts_until_success(tmp_path):
    command, counter = _counting_child(tmp_path, fail_times=2)
    lines = []
    rc = supervise(command, max_restarts=5,
                   _print=lambda *a, **k: lines.append(a[0]))
    assert rc == 0
    assert counter.read_text() == "3"  # 2 failures + 1 success
    assert any("restart 1/5" in ln for ln in lines)
    assert any("succeeded after 2 restart(s)" in ln for ln in lines)


def test_supervise_gives_up_on_nonrestartable(tmp_path):
    command, counter = _counting_child(tmp_path, fail_times=99, fail_code=1)
    rc = supervise(command, max_restarts=5, _print=lambda *a, **k: None)
    assert rc == 1
    assert counter.read_text() == "1"  # no retries on a plain failure


def test_supervise_budget_exhausted(tmp_path):
    command, counter = _counting_child(tmp_path, fail_times=99, fail_code=43)
    rc = supervise(command, max_restarts=2, _print=lambda *a, **k: None)
    assert rc == 43
    assert counter.read_text() == "3"  # initial run + 2 restarts


# ------------------------------------------------------------------ e2e
def test_supervised_trainer_survives_hang(written_corpus):  # noqa: F811
    """One supervised command completes a training job through an injected
    mid-epoch hang: run 1 wedges at global step 8, the watchdog exits 43,
    supervise relaunches, run 2 resumes from the mid-epoch checkpoint and
    finishes both epochs."""
    base = written_corpus
    ckpt = base / "ckpt_supervised"

    # warm the persistent XLA cache so the watchdog timeout below is far
    # above any legitimate (compile-bound) step time
    warm = subprocess.run(
        [sys.executable, "-m", "srf_tpu.trainer_sr"]
        + _argv(base, base / "ckpt_sup_warm", ["--train-max-epoch=2"])[1:],
        capture_output=True, text=True, env=_child_env(),
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        timeout=1200,
    )
    assert warm.returncode == 0, warm.stderr[-3000:]

    trainer = [sys.executable, "-m", "srf_tpu.trainer_sr"] + _argv(
        base, ckpt, [
            "--train-max-epoch=2", "--tpu-ckpt-every-steps=2",
            "--tpu-watchdog-secs=30", "--tpu-fault-hang-at-step=8",
        ]
    )[1:]
    out = subprocess.run(
        [sys.executable, "-m", "srf_tpu.tools.supervise",
         "--max-restarts=2", "--"] + trainer,
        capture_output=True, text=True, env=_child_env(),
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        timeout=1200,
    )
    assert out.returncode == 0, (out.stderr or out.stdout)[-4000:]
    log = out.stdout + out.stderr
    assert "WATCHDOG: no training progress" in log
    assert "SUPERVISE: child exited 43; restart 1/2" in log
    assert "Resuming mid-epoch" in log
    assert "SUPERVISE: command succeeded after 1 restart(s)" in log
    assert _restore_tree(ckpt, 2) is not None  # both epochs completed


def test_main_converts_signal_codes(tmp_path):
    """A signal-killed final status must exit as 128+S (e.g. SIGKILL ->
    137), not a modulo-256 truncation of the negative Popen code."""
    from srf_tpu.tools.supervise import main

    rc = main([
        "--max-restarts=0", "--",
        sys.executable, "-c",
        "import os, signal; os.kill(os.getpid(), signal.SIGKILL)",
    ])
    assert rc == 137
