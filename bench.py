"""Benchmark: canonical SRF-TIMIT training throughput (utterances/sec/chip).

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": "utt/s/chip", "vs_baseline": N}

The workload is the reference's canonical SRF-TIMIT recipe shape
(reference: egs/script/train_srf_timit.sh:5-12,50 — L=7, PH=60, CH=30, D=8,
window 1+1+1, SDR iter 1, 7000-frame bucket budget -> batch 29 x 241
frames), run as our full jitted data-parallel train step on synthetic data.

``vs_baseline`` compares against a measured reference throughput stored in
BASELINE_MEASURED.json (populated by bench_baseline.py, which runs the
original TF graph on this host's CPU — no GPU exists here; the file records
the hardware so the ratio is interpretable). Falls back to 1.0 when absent.
"""

import json
import os
import sys
import time

import numpy as np


def build_workload(batch=29, frames=241, feat_dim=123, vocab=62):
    import jax
    import jax.numpy as jnp
    import optax

    from srf_tpu.models.srf import SequenceRouter
    from srf_tpu.parallel.mesh import make_mesh, shard_batch
    from srf_tpu.train.optimizer import noam_schedule
    from srf_tpu.train.state import TrainState
    from srf_tpu.train.step import make_apply_fn, make_train_step

    model = SequenceRouter(
        feat_dim=feat_dim, class_n=vocab + 1, enc_num=7,
        caps_primary_num=60, caps_primary_dim=8,
        caps_conv_num=30, caps_conv_dim=8, caps_class_dim=8,
        caps_iter=1, lpad=1, rpad=1, is_context=True,
        conv_layer_num=2, conv_filter_num=64, caps_type="naive",
    )
    mesh = make_mesh()
    n_dev = mesh.shape["data"]
    batch = max(n_dev, batch // n_dev * n_dev)

    rng = jax.random.PRNGKey(0)
    host = np.random.RandomState(0)
    lens = host.randint(int(frames * 0.7), frames + 1, size=batch).astype(np.int32)
    tar_lens = np.maximum(2, lens // 8).astype(np.int32)
    max_tar = int(tar_lens.max())
    feats = host.randn(batch, frames, feat_dim).astype(np.float32)
    labels = host.randint(1, vocab, size=(batch, max_tar)).astype(np.int32)
    batch_data = {
        "feats": jnp.asarray(feats),
        "labels": jnp.asarray(labels),
        "inp_len": jnp.asarray(lens),
        "tar_len": jnp.asarray(tar_lens),
    }

    variables = jax.jit(
        lambda rngs, feats, lens: model.init(rngs, feats, lens, False)
    )({"params": rng, "dropout": rng}, batch_data["feats"][:1],
      batch_data["inp_len"][:1])
    tx = optax.adam(noam_schedule(0.5, 1, 1200))
    state = TrainState.create(variables["params"], tx,
                              variables.get("batch_stats", {}))
    state = jax.device_put(
        state, jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec())
    )
    train_step = make_train_step(make_apply_fn(model), tx, 4, mesh=mesh,
                                 donate=True)
    batch_data = shard_batch(mesh, batch_data)
    return train_step, state, batch_data, rng, batch, n_dev


def main():
    import jax

    from srf_tpu.utils.compilation_cache import enable_compilation_cache

    enable_compilation_cache()
    warmup = int(os.environ.get("BENCH_WARMUP", 3))
    iters = int(os.environ.get("BENCH_ITERS", 20))
    train_step, state, batch, rng, batch_size, n_dev = build_workload()

    # NOTE: synchronize by fetching a value, not block_until_ready — on the
    # remote-attached (axon) platform block_until_ready returns before
    # execution finishes and would overstate throughput ~50x.
    for _ in range(warmup):
        state, metrics = train_step(state, batch, rng)
    float(jax.device_get(metrics["loss_sum"]))

    start = time.perf_counter()
    for _ in range(iters):
        state, metrics = train_step(state, batch, rng)
    float(jax.device_get(metrics["loss_sum"]))
    elapsed = time.perf_counter() - start

    utts_per_sec = batch_size * iters / elapsed
    per_chip = utts_per_sec / n_dev

    # MFU: analytic model FLOPs (3x forward; remat recompute not credited)
    # against the v5e bf16 matmul peak — see srf_tpu/utils/flops.py for the
    # conventions and why XLA cost_analysis cannot be used (scan bodies
    # counted once).
    from srf_tpu.utils.flops import V5E_PEAK_BF16, srf_train_step_flops

    step_seconds = elapsed / iters
    flops_step = srf_train_step_flops(
        batch=batch_size, frames=241, feat_dim=123, enc_num=7, ph=60, pd=8,
        ch=30, cd=8, class_n=63, vd=8, lpad=1, rpad=1, num_iter=1,
    )
    mfu = flops_step / step_seconds / V5E_PEAK_BF16 / n_dev

    # The only measurable reference run in this environment is TF on a
    # single host-CPU thread (BASELINE_MEASURED.json records the hardware),
    # so the raw ratio is hardware-mismatched and NOT a like-for-like win;
    # it is labeled as such. The BASELINE.md north star (>=10x vs the TF
    # GPU reference at accuracy parity) is not evaluable without a GPU run.
    vs_baseline = 1.0
    baseline_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                 "BASELINE_MEASURED.json")
    if os.path.exists(baseline_path):
        try:
            measured = json.load(open(baseline_path))
            ref = measured.get("srf_timit_train_utts_per_sec")
            if ref:
                vs_baseline = per_chip / ref
        except (ValueError, OSError):
            pass

    print(json.dumps({
        "metric": "srf_timit_sdr_train_throughput",
        "value": round(per_chip, 3),
        "unit": "utt/s/chip",
        "vs_baseline": round(vs_baseline, 3),
        "vs_baseline_note": (
            "denominator is the TF reference on ONE host-CPU thread "
            "(hardware-mismatched; no GPU in this environment) — see "
            "BASELINE_MEASURED.json; the >=10x-vs-GPU north star is "
            "not evaluable here"
        ),
        "mfu": round(mfu, 5),
        "model_flops_per_step": flops_step,
        "ms_per_step": round(step_seconds * 1e3, 3),
    }))


if __name__ == "__main__":
    sys.exit(main())
