"""Config system tests: conf-file merge semantics (CLI wins)."""

import pytest

from srf_tpu.config import Logger, ParseOption


@pytest.fixture
def logger():
    return Logger(name="cfg-test", level=Logger.INFO).logger


def _write_conf(tmp_path, lines):
    conf = tmp_path / "test.conf"
    conf.write_text("\n".join(lines) + "\n")
    return str(conf)


def test_conf_file_provides_defaults(tmp_path, logger):
    conf = _write_conf(tmp_path, [
        "--feat-dim=123", "--model-encoder-num=7", "--train-batch-frame=7000",
    ])
    args = ParseOption(
        ["prog", "--config=%s" % conf, "--path-base=%s" % tmp_path],
        logger, is_print_opts=False,
    ).args
    assert args.feat_dim == 123
    assert args.model_encoder_num == 7
    assert args.train_batch_frame == 7000


def test_command_line_wins_over_conf(tmp_path, logger):
    conf = _write_conf(tmp_path, ["--feat-dim=123", "--train-warmup-n=25000"])
    args = ParseOption(
        ["prog", "--config=%s" % conf, "--path-base=%s" % tmp_path,
         "--feat-dim=80"],
        logger, is_print_opts=False,
    ).args
    assert args.feat_dim == 80        # CLI wins
    assert args.train_warmup_n == 25000  # conf fills the rest


def test_conf_extension_enforced(tmp_path, logger):
    bad = tmp_path / "test.cfg"
    bad.write_text("--feat-dim=1\n")
    with pytest.raises(SystemExit):
        ParseOption(
            ["prog", "--config=%s" % bad, "--path-base=%s" % tmp_path],
            logger, is_print_opts=False,
        )


def test_bool_and_list_coercion(tmp_path, logger):
    args = ParseOption(
        ["prog", "--path-base=%s" % tmp_path, "--train-batch-dynamic=True",
         "--model-caps-context=false", '--train-batch-buckets="[241,500,750]"'],
        logger, is_print_opts=False,
    ).args
    assert args.train_batch_dynamic is True
    assert args.model_caps_context is False
    assert args.train_batch_buckets == [241, 500, 750]


def test_invalid_caps_type_rejected(tmp_path, logger):
    with pytest.raises(SystemExit):
        ParseOption(
            ["prog", "--path-base=%s" % tmp_path, "--model-caps-type=bogus"],
            logger, is_print_opts=False,
        )


def test_reference_conf_files_parse(logger, tmp_path):
    """Our shipped egs confs parse with the full flag registry."""
    import os

    for conf in ("egs/conf/timit.conf", "egs/conf/wsj.conf"):
        args = ParseOption(
            ["prog", "--config=%s" % os.path.abspath(conf),
             "--path-base=%s" % tmp_path],
            logger, is_print_opts=False,
        ).args
        assert args.feat_dim == 123
        assert args.decoding_beam_width == 100


def test_stf_in_len_div_agrees_across_entry_paths(logger):
    """The STF subsampling divisor must be the front-end's true
    subsampling (stride ** layer_num) on BOTH dispatch paths, and warn
    when the reference's transposed formula (tfsr/trainer_tf.py:302,
    layer_num ** stride) would disagree (VERDICT r1 item 6)."""
    from types import SimpleNamespace

    from srf_tpu.models.registry import stf_in_len_div

    # defaults: both formulas = 4, no warning expected
    cfg = SimpleNamespace(model_conv_layer_num=2, model_conv_stride=2)
    assert stf_in_len_div(cfg, None) == 4

    # non-default geometry: true formula wins, warning fires
    cfg = SimpleNamespace(model_conv_layer_num=3, model_conv_stride=2)
    warned = []

    class L:
        def warning(self, *a):
            warned.append(a)

    assert stf_in_len_div(cfg, L()) == 8  # 2**3, not 3**2
    assert warned


def test_routing_bf16_flag_reaches_the_model(logger, tmp_path):
    """--tpu-routing-bf16 must actually flip the SDR body's compute dtype
    (the r2 numbers were retracted because a silent type-promotion made
    the flagless path f32 — the flag itself must not be a silent no-op)."""
    from srf_tpu.models.registry import build_model

    base = [
        "prog", "--path-base=%s" % tmp_path,
        "--feat-dim=8", "--model-type=srf",
        "--model-caps-type=lowmemory", "--model-caps-context=True",
        "--model-encoder-num=2", "--model-caps-primary-num=4",
        "--model-caps-primary-dim=2", "--model-caps-convolution-num=3",
        "--model-caps-convolution-dim=2", "--model-caps-class-dim=2",
        "--model-caps-iter=1", "--model-caps-window-lpad=1",
        "--model-caps-window-rpad=1",
    ]
    for flag, want in [("True", True), ("False", False)]:
        args = ParseOption(
            base + ["--tpu-routing-bf16=%s" % flag], logger,
            is_print_opts=False,
        ).args
        model, _ = build_model(args, 5, None)
        assert model.routing_bf16 is want
