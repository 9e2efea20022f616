"""Preemption-safe mid-epoch checkpointing + EMA weight averaging.

The reference only checkpoints at epoch boundaries
(reference: tfsr/trainer_sr.py:280-288) — a preempted TPU worker loses the
whole in-flight epoch. ``--tpu-ckpt-every-steps`` saves the full state plus
the loop position every N optimizer steps; these tests kill the trainer
process mid-epoch (``--tpu-fault-at-step``, a hard ``os._exit`` with no
cleanup) and prove the resumed run replays the uninterrupted run exactly.

``--tpu-ema-decay`` maintains an exponential moving average of the params
inside the jitted train step (a training-time upgrade of the reference's
last-N checkpoint averaging, tfsr/utils/average_ckpt_sr.py:92-180);
``--tpu-decode-ema`` decodes with it.
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

FEAT_DIM = 8
VOCAB_TOKENS = ["<PADDING_SYMBOL>", "a", "b", "c", "<SPACE>", "$", "@"]


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    base = tmp_path_factory.mktemp("preempt_corpus")
    rng = np.random.RandomState(7)
    (base / "test.vocab").write_text("\n".join(VOCAB_TOKENS) + "\n")

    utts = []
    for i in range(28):
        n_frames = int(rng.randint(12, 30))
        feats = rng.randn(n_frames, FEAT_DIM).astype(np.float32)
        key = "utt%02d" % i
        np.save(base / ("%s.None.npy" % key), feats)
        text = "".join(rng.choice(list("abc"), size=rng.randint(2, 5)))
        utts.append({"key": key, "duration": n_frames / 100.0, "text": text})

    for split, sel in [("train", utts[:24]), ("valid", utts[24:]),
                       ("test", utts[24:])]:
        with open(base / ("%s.json" % split), "w") as f:
            for u in sel:
                f.write(json.dumps(u) + "\n")
    return base


def _argv(base, ckpt, extra):
    return [
        "prog",
        "--path-base=%s" % base,
        "--path-vocab=test.vocab",
        "--feat-dim=%d" % FEAT_DIM,
        "--feat-type=None",
        "--prep-data-name=synth",
        "--prep-data-shard=2",
        "--path-train-json=train.json",
        "--path-valid-json=valid.json",
        "--path-test-json=test.json",
        "--path-wrt-tfrecord=tfrecord",
        "--path-train-ptrn=tfrecord/synth-train-None-%d-*-of-*" % FEAT_DIM,
        "--path-valid-ptrn=tfrecord/synth-valid-None-%d-*-of-*" % FEAT_DIM,
        "--path-test-ptrn=tfrecord/synth-test-None-%d-*-of-*" % FEAT_DIM,
        "--path-ckpt=%s" % ckpt,
        "--model-type=lstm",
        "--model-encoder-num=1",
        "--model-dimension=8",
        "--model-lstm-is-cnnfe=False",
        "--train-opti-type=adam",
        "--train-lr-param-k=0.05",
        "--train-batch-dynamic=False",
        "--train-batch-size=4",
        "--train-es-tolerance=100",
        "--model-ckpt-max-to-keep=-1",
        "--decoding-beam-width=4",
        "--tpu-mesh-data=1",  # deterministic single-device replay
    ] + extra


@pytest.fixture(scope="module")
def written_corpus(corpus):
    from srf_tpu.config import Logger, ParseOption
    from srf_tpu.config.constants import Tag
    from srf_tpu.data.writer import convert_to_tfrecord, shuffle_records

    logger = Logger(name="preempt", level=Logger.INFO).logger
    config = ParseOption(_argv(corpus, corpus / "x", []), logger,
                         is_print_opts=False).args
    paths, n = convert_to_tfrecord(logger, config, Tag.TRAIN, None)
    assert n == 24
    convert_to_tfrecord(logger, config, Tag.VALID, None)
    convert_to_tfrecord(logger, config, Tag.TEST, None)
    for p in paths:
        shuffle_records(p, seed=0)
    return corpus


def _child_env():
    """Env for subprocess trainers that actually honors the test platform.

    The deployment's sitecustomize force-registers the remote-TPU ('axon')
    backend whenever PALLAS_AXON_POOL_IPS is set, PREPENDING it to
    jax_platforms — so a child with JAX_PLATFORMS=cpu in its env still
    runs over the remote tunnel (slow, and it can wedge mid-transfer,
    which is a real hang the watchdog tests would then non-
    deterministically catch). Dropping the activation var makes the
    sitecustomize a no-op and the inherited JAX_PLATFORMS=cpu effective.
    SRF_TEST_PLATFORM=axon keeps the tunnel (run-the-suite-on-chip mode).
    """
    env = dict(os.environ)
    if os.environ.get("SRF_TEST_PLATFORM", "cpu") != "axon":
        env.pop("PALLAS_AXON_POOL_IPS", None)
    return env


def _run_trainer(argv, expect_code=0, timeout=1200):
    out = subprocess.run(
        [sys.executable, "-m", "srf_tpu.trainer_sr"] + argv[1:],
        capture_output=True, text=True, env=_child_env(),
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        timeout=timeout,
    )
    assert out.returncode == expect_code, (
        "rc=%d\n%s" % (out.returncode, (out.stderr or out.stdout)[-4000:])
    )
    return out


def _restore_tree(ckpt_dir, step):
    import orbax.checkpoint as ocp

    return ocp.StandardCheckpointer().restore(
        os.path.join(str(ckpt_dir), str(step), "default")
    )


def _epoch_losses(ckpt_dir):
    losses = {}
    with open(os.path.join(str(ckpt_dir), "metrics.jsonl")) as f:
        for line in f:
            rec = json.loads(line)
            if rec.get("kind") == "train_epoch":
                losses[rec["epoch"]] = rec["loss"]
    return losses


def test_preempted_run_resumes_bit_exactly(written_corpus):
    """Kill the trainer mid-epoch-2 with no cleanup; the resumed process
    must reach the same final checkpoint as an uninterrupted run."""
    base = written_corpus
    ckpt_a, ckpt_b = base / "ckpt_uninterrupted", base / "ckpt_preempted"

    _run_trainer(_argv(base, ckpt_a, ["--train-max-epoch=2"]))

    # 24 utts / batch 4 = 6 steps per epoch; step 8 is mid-epoch-2.
    # Mid-saves land every 2 steps, so the freshest mid state is step 8
    # itself — the resume must still replay batches 2..5 of epoch 2.
    fault = _run_trainer(
        _argv(base, ckpt_b, [
            "--train-max-epoch=2", "--tpu-ckpt-every-steps=2",
            "--tpu-fault-at-step=8",
        ]),
        expect_code=42,
    )
    assert "FAULT INJECTION" in (fault.stderr + fault.stdout)
    assert os.path.isdir(str(ckpt_b / "mid"))

    resume = _run_trainer(
        _argv(base, ckpt_b, [
            "--train-max-epoch=2", "--tpu-ckpt-every-steps=2",
        ]),
    )
    assert "Resuming mid-epoch" in (resume.stderr + resume.stdout)

    tree_a = _restore_tree(ckpt_a, 2)
    tree_b = _restore_tree(ckpt_b, 2)
    flat_a = jax_flat(tree_a)
    flat_b = jax_flat(tree_b)
    assert flat_a.keys() == flat_b.keys()
    for name in flat_a:
        np.testing.assert_array_equal(
            flat_a[name], flat_b[name],
            err_msg="resumed run diverged at %s" % name,
        )

    # metric accumulators were restored too: the epoch-2 console loss of
    # the resumed run equals the uninterrupted run's
    assert abs(_epoch_losses(ckpt_a)[2] - _epoch_losses(ckpt_b)[2]) < 1e-6

    # a third invocation ignores the now-stale mid checkpoint and trains on
    third = _run_trainer(
        _argv(base, ckpt_b, [
            "--train-max-epoch=3", "--tpu-ckpt-every-steps=2",
        ]),
    )
    assert "Ignoring stale mid-epoch checkpoint" in (
        third.stderr + third.stdout
    )
    assert _restore_tree(ckpt_b, 3) is not None


def jax_flat(tree):
    import jax

    return {
        jax.tree_util.keystr(p): np.asarray(v)
        for p, v in jax.tree_util.tree_flatten_with_path(tree)[0]
    }


def test_ema_matches_numpy_oracle():
    """state.ema_params tracks ema += (1-decay)*(params-ema) exactly."""
    import jax
    import jax.numpy as jnp
    import optax

    from srf_tpu.train.state import TrainState
    from srf_tpu.train.step import make_train_step

    D, V, B, T = 4, 6, 2, 7
    rng = jax.random.PRNGKey(0)

    def apply_fn(params, batch_stats, batch, training, rng):
        return jnp.einsum(
            "btd,dv->btv", batch["feats"], params["w"]
        ), batch_stats

    params = {"w": jax.random.normal(rng, (D, V)) * 0.1}
    tx = optax.adam(1e-2)
    decay = 0.9
    state = TrainState.create(params, tx, with_ema=True)
    assert state.ema_params is not None
    step = make_train_step(apply_fn, tx, 1, donate=False, ema_decay=decay)
    batch = {
        "feats": jax.random.normal(jax.random.PRNGKey(1), (B, T, D)),
        "labels": jnp.array([[1, 2, 0], [2, 1, 3]], jnp.int32),
        "inp_len": jnp.full((B,), T, jnp.int32),
        "tar_len": jnp.array([2, 3], jnp.int32),
    }
    ema = np.asarray(params["w"])
    for _ in range(5):
        state, _ = step(state, batch, rng)
        ema = ema + (1.0 - decay) * (np.asarray(state.params["w"]) - ema)
        np.testing.assert_allclose(
            np.asarray(state.ema_params["w"]), ema, rtol=1e-6, atol=1e-7
        )
    # EMA lags the raw params (it is a trailing average, not a copy)
    assert not np.allclose(
        np.asarray(state.ema_params["w"]), np.asarray(state.params["w"])
    )


def test_ema_cli_train_checkpoint_decode(written_corpus, capsys):
    """--tpu-ema-decay trains through the real CLI, the EMA subtree rides
    the checkpoint, and --tpu-decode-ema decodes with it."""
    from srf_tpu import trainer_sr

    base = written_corpus
    ckpt = base / "ckpt_ema"
    trainer_sr.main(_argv(base, ckpt, [
        "--train-max-epoch=2", "--tpu-ema-decay=0.98",
    ]))
    capsys.readouterr()

    tree = _restore_tree(ckpt, 2)
    assert "ema_params" in tree
    flat = jax_flat(tree)
    ema_leaves = [n for n in flat if n.startswith("['ema_params']")]
    assert ema_leaves
    # EMA differs from the raw params but stays in the same ballpark
    for name in ema_leaves:
        raw = flat[name.replace("['ema_params']", "['params']", 1)]
        assert np.all(np.isfinite(flat[name]))
        assert flat[name].shape == raw.shape

    trainer_sr.main(_argv(base, ckpt, [
        "--train-max-epoch=0", "--tpu-ema-decay=0.98",
        "--tpu-decode-ema=True",
    ]))
    out = capsys.readouterr().out
    assert 'UTTID: ["utt24"]' in out

    # a plain decode of the same checkpoint (no EMA flags) still works:
    # the extra ema_params subtree is ignored by the partial restore
    trainer_sr.main(_argv(base, ckpt, ["--train-max-epoch=0"]))
    out = capsys.readouterr().out
    assert 'UTTID: ["utt24"]' in out


def test_ema_decode_requires_ema_checkpoint(written_corpus):
    """--tpu-decode-ema against a non-EMA checkpoint fails loudly."""
    from srf_tpu import trainer_sr

    base = written_corpus
    ckpt = base / "ckpt_no_ema"
    trainer_sr.main(_argv(base, ckpt, ["--train-max-epoch=1"]))
    with pytest.raises(ValueError):
        trainer_sr.main(_argv(base, ckpt, [
            "--train-max-epoch=0", "--tpu-decode-ema=True",
        ]))
