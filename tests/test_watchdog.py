"""Watchdog hang detection + graceful SIGTERM checkpointing."""

import time

import numpy as np
import pytest

from tests.test_preempt import (  # noqa: F401  (shared corpus harness)
    _argv,
    _child_env,
    _restore_tree,
    _run_trainer,
    corpus,
    jax_flat,
    written_corpus,
)


def test_watchdog_fires_on_stall():
    from srf_tpu.utils.watchdog import Watchdog

    fired = []
    dog = Watchdog(0.3, _exit=lambda code: fired.append(code)).start()
    try:
        # healthy phase: regular kicks keep it quiet
        for _ in range(4):
            time.sleep(0.1)
            dog.kick()
        assert not fired
        # stall: no kicks -> fires with the restartable exit code
        deadline = time.monotonic() + 5.0
        while not fired and time.monotonic() < deadline:
            time.sleep(0.05)
    finally:
        dog.stop()
    assert fired == [Watchdog.EXIT_CODE]


def test_watchdog_stop_disarms():
    from srf_tpu.utils.watchdog import Watchdog

    fired = []
    dog = Watchdog(0.2, _exit=lambda code: fired.append(code)).start()
    dog.stop()
    time.sleep(0.5)
    assert not fired


@pytest.fixture(scope="module")
def warmed_corpus(written_corpus):  # noqa: F811
    """Warm the persistent XLA compilation cache with one watchdog-free
    run: a cold-cache CPU compile of a bucket shape can legitimately take
    >45 s, which is exactly the 'slowest legitimate step' the flag's help
    text says to size the timeout above. The warm run makes each
    subsequent step sub-second, so the 45/60 s watchdogs below only fire
    on the injected hang."""
    _run_trainer(_argv(written_corpus, written_corpus / "ckpt_warm",
                       ["--train-max-epoch=2"]))
    return written_corpus


def test_hung_trainer_killed_then_resumes(warmed_corpus):
    """Inject a hang mid-epoch; the watchdog dumps stacks and exits 43;
    the restarted trainer resumes from the mid checkpoint and finishes."""
    base = warmed_corpus
    ckpt = base / "ckpt_hang"

    hung = _run_trainer(
        _argv(base, ckpt, [
            "--train-max-epoch=2", "--tpu-ckpt-every-steps=2",
            "--tpu-watchdog-secs=45", "--tpu-fault-hang-at-step=8",
        ]),
        expect_code=43,
    )
    err = hung.stderr + hung.stdout
    assert "WATCHDOG: no training progress" in err
    assert "Current thread" in err or "Thread" in err  # faulthandler dump

    resumed = _run_trainer(
        _argv(base, ckpt, [
            "--train-max-epoch=2", "--tpu-ckpt-every-steps=2",
            "--tpu-watchdog-secs=60",
        ]),
    )
    assert "Resuming mid-epoch" in (resumed.stderr + resumed.stdout)
    assert _restore_tree(ckpt, 2) is not None


def test_sigterm_saves_and_resumes_bit_exactly(warmed_corpus):
    """--tpu-fault-signal-at-step raises a real SIGTERM to the process at
    step N; the loop saves a mid checkpoint at exactly that step and exits
    143; the resumed run reaches the same final state as uninterrupted."""
    base = warmed_corpus
    ckpt_ref = base / "ckpt_sig_ref"
    ckpt_sig = base / "ckpt_sig"

    _run_trainer(_argv(base, ckpt_ref, ["--train-max-epoch=2"]))

    killed = _run_trainer(
        _argv(base, ckpt_sig, [
            "--train-max-epoch=2", "--tpu-ckpt-every-steps=1000",
            "--tpu-fault-signal-at-step=9",
        ]),
        expect_code=143,
    )
    assert "SIGTERM" in (killed.stderr + killed.stdout)

    resumed = _run_trainer(
        _argv(base, ckpt_sig, [
            "--train-max-epoch=2", "--tpu-ckpt-every-steps=1000",
        ]),
    )
    assert "Resuming mid-epoch" in (resumed.stderr + resumed.stdout)

    flat_ref = jax_flat(_restore_tree(ckpt_ref, 2))
    flat_sig = jax_flat(_restore_tree(ckpt_sig, 2))
    assert flat_ref.keys() == flat_sig.keys()
    for name in flat_ref:
        np.testing.assert_array_equal(
            flat_ref[name], flat_sig[name],
            err_msg="post-SIGTERM resume diverged at %s" % name,
        )
