"""DecoderBlock + prep_process parity shapes (reference block.py:224-233)."""

import numpy as np

import jax
import jax.numpy as jnp

from srf_tpu.models.decoder import DecoderBlock
from srf_tpu.train.prep import prep_process

KEY = jax.random.PRNGKey(0)


def test_decoder_block_shapes():
    blk = DecoderBlock(64, 8, 256, 0.1, 0.1, 0.1)
    dec_in = jax.random.uniform(KEY, (2, 50, 64))
    enc_out = jax.random.uniform(KEY, (2, 43, 64))
    variables = blk.init(
        {"params": KEY}, dec_in, None, enc_out, None, None, None, None, False
    )
    out, w1, w2 = blk.apply(
        variables, dec_in, None, enc_out, None, None, None, None, False
    )
    assert out.shape == (2, 50, 64)
    assert w1.shape == (2, 8, 50, 50)
    assert w2.shape == (2, 8, 50, 43)


def test_prep_process_shift_and_masks():
    labels = jnp.array([[6, 1, 2, 3, 5, 0], [6, 1, 5, 0, 0, 0]])  # @ a b c $
    feats = jnp.zeros((2, 16, 4))
    feat_len = jnp.array([16, 9])
    tar_len = jnp.array([5, 3])
    feats_o, tar_inp, tar_real, enc_mask, comb = prep_process(
        labels, feat_len, tar_len, feats, 4
    )
    np.testing.assert_array_equal(np.asarray(tar_inp), [[6, 1, 2, 3, 5],
                                                        [6, 1, 5, 0, 0]])
    np.testing.assert_array_equal(np.asarray(tar_real), [[1, 2, 3, 5, 0],
                                                         [1, 5, 0, 0, 0]])
    assert enc_mask.shape == (2, 1, 1, 4)
    # second utt: ceil(9/4)=3 valid frames -> last slot masked
    np.testing.assert_array_equal(np.asarray(enc_mask[1, 0, 0]), [0, 0, 0, 1])
    assert comb.shape == (2, 1, 5, 5)
    # look-ahead upper triangle is masked
    assert float(comb[0, 0, 0, 1]) == 1.0 and float(comb[0, 0, 1, 0]) == 0.0
