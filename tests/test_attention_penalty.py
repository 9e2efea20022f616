"""Attention-penalty closed form vs a direct band-accumulation oracle."""

import types

import numpy as np

from srf_tpu.ops.attention_penalty import AttentionPenalty, create_attention_penalty


def oracle_board(max_len, zero_width, stripe_width, scale):
    """Direct accumulation, the way the reference builds its board
    (model_helper.py:221-229): for each stripe i, add 1 outside band i."""
    board = np.zeros((max_len, max_len), np.float32)
    d = np.abs(np.arange(max_len)[:, None] - np.arange(max_len)[None, :])
    for i in range(zero_width - 1, max_len, stripe_width):
        board += (d > i).astype(np.float32)
    return board * scale


def test_closed_form_matches_band_accumulation():
    for zero_width, stripe, scale in [(1, 1, 1.0), (2, 3, 0.5), (5, 2, 2.0)]:
        pen = AttentionPenalty(max_len=40, num_head=4, zero_width=zero_width,
                               stripe_width=stripe, scale=scale)
        got = np.asarray(pen.penalty(40))[0]
        want = oracle_board(40, zero_width, stripe, scale)
        np.testing.assert_allclose(got, want, atol=1e-5)


def test_create_attention_penalty_gating():
    class Log:
        def info(self, *a, **k):
            pass

    config = types.SimpleNamespace(
        model_ap_encoder=True, model_ap_decoder=False, model_ap_encdec=False,
        model_ap_width_zero=1, model_ap_width_stripe=1, model_ap_scale=1.0,
        model_att_head_num=4,
    )
    assert create_attention_penalty(config, Log()) is not None
    config.model_ap_scale = None
    assert create_attention_penalty(config, Log()) is None


def test_plotting_saves_file(tmp_path):
    from srf_tpu.utils.plotting import plot_attention_weights

    att = np.random.RandomState(0).rand(1, 4, 6, 6)
    out = plot_attention_weights(att, str(tmp_path / "att.png"))
    import os

    assert os.path.exists(out)
