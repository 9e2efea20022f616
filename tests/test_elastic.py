"""Elastic resume: a preempted training job restarts on a DIFFERENT
device topology and continues.

TPU-pod preemptions often come back resized (a donut replaces a full
slice). The reference cannot express this at all (single-node
MirroredStrategy, reference: tfsr/trainer_sr.py:139-149). Here the
checkpoint is topology-free (orbax + template-sharding restore), the
loader's batch order is independent of the mesh, and the global-batch
loss semantics make the DP update mathematically identical on any mesh
factorization — so a job killed mid-epoch on a 4-way mesh resumes on a
2-way (or 1-way) mesh and finishes with the same result up to float
reduction order.
"""

import os
import subprocess
import sys

import numpy as np
import pytest

from tests.test_preempt import (  # noqa: F401  (shared corpus harness)
    _argv,
    _child_env,
    _restore_tree,
    corpus,
    jax_flat,
    written_corpus,
)


def _run(base, ckpt, extra, expect_code=0):
    # drop the harness's fixed --tpu-mesh-data=1 BEFORE appending extra,
    # so an extra of --tpu-mesh-data=1 survives and controls the mesh
    argv = [a for a in _argv(base, ckpt, [])
            if a != "--tpu-mesh-data=1"] + extra
    out = subprocess.run(
        [sys.executable, "-m", "srf_tpu.trainer_sr"] + argv[1:],
        capture_output=True, text=True, env=_child_env(),
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        timeout=1200,
    )
    assert out.returncode == expect_code, (
        "rc=%d\n%s" % (out.returncode, (out.stderr or out.stdout)[-4000:])
    )
    return out


@pytest.mark.parametrize("resume_mesh", [2, 1])
def test_midepoch_resume_on_smaller_mesh(written_corpus, resume_mesh):  # noqa: F811
    """Kill a 4-way data-parallel run mid-epoch; resume on a smaller mesh;
    the finished run matches the uninterrupted 4-way run to float
    reduction-order tolerance."""
    base = written_corpus
    ckpt_ref = base / ("ckpt_el_ref%d" % resume_mesh)
    ckpt_el = base / ("ckpt_el%d" % resume_mesh)

    _run(base, ckpt_ref, ["--train-max-epoch=2", "--tpu-mesh-data=4"])

    _run(base, ckpt_el, [
        "--train-max-epoch=2", "--tpu-mesh-data=4",
        "--tpu-ckpt-every-steps=2", "--tpu-fault-at-step=8",
    ], expect_code=42)

    resumed = _run(base, ckpt_el, [
        "--train-max-epoch=2", "--tpu-mesh-data=%d" % resume_mesh,
        "--tpu-ckpt-every-steps=2",
    ])
    log = resumed.stderr + resumed.stdout
    assert "Resuming mid-epoch" in log

    flat_ref = jax_flat(_restore_tree(ckpt_ref, 2))
    flat_el = jax_flat(_restore_tree(ckpt_el, 2))
    assert flat_ref.keys() == flat_el.keys()
    for name in flat_ref:
        np.testing.assert_allclose(
            flat_el[name], flat_ref[name], rtol=2e-4, atol=1e-6,
            err_msg="elastic resume diverged at %s" % name,
        )


def test_epoch_resume_on_larger_mesh(written_corpus):  # noqa: F811
    """The complementary direction: epoch-boundary checkpoints written on
    a 1-way mesh continue on a 4-way mesh (scale-UP after a restore)."""
    base = written_corpus
    ckpt_ref = base / "ckpt_el_up_ref"
    ckpt_up = base / "ckpt_el_up"

    _run(base, ckpt_ref, ["--train-max-epoch=2", "--tpu-mesh-data=1"])

    _run(base, ckpt_up, ["--train-max-epoch=1", "--tpu-mesh-data=1"])
    resumed = _run(base, ckpt_up, [
        "--train-max-epoch=2", "--tpu-mesh-data=4",
    ])
    assert "Loaded ckpt" in (resumed.stderr + resumed.stdout)

    flat_ref = jax_flat(_restore_tree(ckpt_ref, 2))
    flat_up = jax_flat(_restore_tree(ckpt_up, 2))
    assert flat_ref.keys() == flat_up.keys()
    for name in flat_ref:
        np.testing.assert_allclose(
            flat_up[name], flat_ref[name], rtol=2e-4, atol=1e-6,
            err_msg="scale-up resume diverged at %s" % name,
        )


def test_mid_resume_refused_on_changed_batch_geometry(written_corpus):  # noqa: F811
    """If the elastic restart's mesh changes the rounded bucket batch
    sizes, `resume.batch_index` no longer names the same data position —
    the mid checkpoint must be REFUSED (epoch-checkpoint restart), not
    half-trusted. Here the kill happens on a 1-way mesh (batch 4) and the
    restart omits --tpu-mesh-data (default = all 8 virtual devices, batch
    rounds 4 -> 8)."""
    base = written_corpus
    ckpt = base / "ckpt_el_geom"

    _run(base, ckpt, [
        "--train-max-epoch=2", "--tpu-mesh-data=1",
        "--tpu-ckpt-every-steps=2", "--tpu-fault-at-step=8",
    ], expect_code=42)

    resumed = _run(base, ckpt, [
        "--train-max-epoch=2", "--tpu-ckpt-every-steps=2",
    ])
    log = resumed.stderr + resumed.stdout
    assert "Ignoring mid-epoch checkpoint" in log
    assert "different batch geometry" in log
    assert "Resuming mid-epoch" not in log
    assert _restore_tree(ckpt, 2) is not None  # completed from epoch ckpt

    # the refused mid must have been PURGED and replaced by the resumed
    # run's own mid checkpoints: orbax silently drops saves at steps <=
    # the latest existing one, so leaving the refused mid in place would
    # silently disable mid-epoch checkpointing for the restarted run
    # (whose global steps restart lower). Proof: the latest mid's
    # batch_sig matches the RESUMED run's geometry (batch 8), not the
    # killed run's (batch 4).
    from srf_tpu.utils.checkpoint import CheckpointManager

    mid = CheckpointManager(str(ckpt / "mid"))
    last = mid.latest_step()
    assert last is not None, "resumed run wrote no mid checkpoints"
    _i = lambda: np.zeros((), np.int64)      # noqa: E731
    _f = lambda: np.zeros((), np.float64)    # noqa: E731
    meta = mid.restore_partial(last, {"resume": {
        "epoch": _i(), "batch_index": _i(),
        "train_loss_total": _f(), "train_loss_count": _f(),
        "num_feats_total": _f(), "num_feats_count": _f(),
        "train_samples": _f(), "pre_loss": _f(),
        "tolerance": _i(), "batch_sig": _f(),
    }})
    mid.close()
    assert meta["resume"]["batch_sig"] == 8.0, meta["resume"]
