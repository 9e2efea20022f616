"""int8 weight-only quantization (ops/quant.py + --tpu-serve-quant).

No reference analog (the reference serves f32); correctness bar here is
(1) the quantizer's per-channel error bound, (2) structural selectivity
(biases/norms/small leaves untouched, marker survives jit), (3) model
forwards stay decode-equivalent on a trained tiny model through the real
Recognizer surface.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from srf_tpu.ops.quant import (
    dequantize_tree,
    quantize_tree,
    quantized_bytes,
)


def test_roundtrip_error_bound():
    rng = np.random.RandomState(0)
    w = jnp.asarray(rng.randn(256, 32) * rng.gamma(1.0, 2.0, size=(1, 32)),
                    jnp.float32)
    q = quantize_tree({"k": w})
    back = dequantize_tree(q)["k"]
    # symmetric int8: per-element error <= scale/2 per output channel
    scale = np.max(np.abs(np.asarray(w)), axis=0) / 127.0
    err = np.abs(np.asarray(back) - np.asarray(w))
    assert (err <= scale[None, :] / 2 + 1e-7).all()


def test_selectivity_and_jit_structure():
    tree = {
        "dense": {"kernel": jnp.ones((128, 64)), "bias": jnp.ones((64,))},
        "ln": {"scale": jnp.ones((64,))},
        "tiny": jnp.ones((8, 8)),
        "count": jnp.asarray(3, jnp.int32),
    }
    q = jax.jit(quantize_tree)(tree)
    assert "__srf_int8__q" in q["dense"]["kernel"]
    assert q["dense"]["kernel"]["__srf_int8__q"].dtype == jnp.int8
    assert q["dense"]["bias"].dtype == jnp.float32      # 1-D untouched
    assert isinstance(q["tiny"], jax.Array)             # below min_size
    assert q["count"].dtype == jnp.int32                # non-float
    d = jax.jit(dequantize_tree)(q)
    assert d["dense"]["kernel"].shape == (128, 64)
    q_b, f_b = quantized_bytes(jax.device_get(q))
    assert q_b < f_b


def test_model_forward_close_and_decode_equal():
    """Quantized STF forward tracks f32 closely enough that the argmax
    (greedy) path is unchanged on random inputs."""
    from srf_tpu.models.stf import ConvEncoder

    model = ConvEncoder(num_layers=2, d_model=32, num_heads=2, dff=64,
                        feat_dim=20, vocab_n=11, attention_impl="plain")
    rng = jax.random.PRNGKey(0)
    host = np.random.RandomState(1)
    feats = jnp.asarray(host.randn(3, 40, 20), jnp.float32)
    lens = jnp.asarray([40, 32, 25], jnp.int32)
    variables = model.init({"params": rng, "dropout": rng}, feats, lens,
                           False)
    ref = model.apply(variables, feats, lens, False)
    qparams = quantize_tree(variables["params"], min_size=64)
    deq = {"params": dequantize_tree(qparams)}
    if "batch_stats" in variables:
        deq["batch_stats"] = variables["batch_stats"]
    out = model.apply(deq, feats, lens, False)
    # logits drift stays small relative to their dynamic range...
    span = float(jnp.max(ref) - jnp.min(ref))
    assert float(jnp.abs(out - ref).max()) < 0.05 * span
    # ...and the argmax sequence (greedy decode) is identical
    np.testing.assert_array_equal(
        np.asarray(jnp.argmax(out, -1)), np.asarray(jnp.argmax(ref, -1)))


@pytest.mark.usefixtures("trained")
def test_recognizer_int8_matches_f32(trained):
    """--tpu-serve-quant=int8 through the real Recognizer: same
    hypotheses as the f32 server on the trained tiny model."""
    from srf_tpu.config import Logger, ParseOption
    from srf_tpu.serve import Recognizer

    argv, base = trained
    logger = Logger(name="quant-test", level=Logger.INFO).logger
    feats = np.load(base / "u0.None.npy")

    f32_cfg = ParseOption(argv, logger, is_print_opts=False).args
    f32_ids, _ = Recognizer(f32_cfg, logger).transcribe(
        feats, beam_width=4, corpus="wsj")

    q_cfg = ParseOption(argv + ["--tpu-serve-quant=int8"], logger,
                        is_print_opts=False).args
    rec = Recognizer(q_cfg, logger)
    assert rec.quantized
    q_ids, _ = rec.transcribe(feats, beam_width=4, corpus="wsj")
    assert q_ids == f32_ids
    # non-jitted consumers (streaming constructors) get f32 params back
    f32_tree = rec._f32_variables()["params"]
    assert all(leaf.dtype == jnp.float32
               for leaf in jax.tree.leaves(f32_tree))


# reuse the trained-model fixture from the serving test module
from tests.test_serve import trained  # noqa: E402,F401
