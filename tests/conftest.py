"""Test configuration: run JAX on 8 virtual CPU devices.

Multi-device sharding tests use a virtual CPU mesh
(XLA_FLAGS=--xla_force_host_platform_device_count=8), the standard way to
test pjit/shard_map layouts without real multi-chip hardware.

The environment pins JAX_PLATFORMS=axon (remote TPU) and a sitecustomize
imports jax at interpreter start, so the env var alone is snapshotted too
early; jax.config.update is the effective override. Tests force CPU so they
are fast, deterministic and runnable anywhere. Set SRF_TEST_PLATFORM=axon to
exercise the real chip instead.
"""

import os

# oneDNN's TF-CPU softmax kernel rejects the 6-D tensors of the reference
# DR path exercised by the parity tests; must be set before TF ever loads
os.environ.setdefault("TF_ENABLE_ONEDNN_OPTS", "0")
os.environ.setdefault("TF_USE_LEGACY_KERAS", "1")
# single-threaded TF: deterministic conv accumulation order, so the
# TF-vs-JAX parity tolerances can stay tight (ADVICE r2: threading drift
# was being absorbed by loosened tolerances in the deep conv stacks)
os.environ.setdefault("TF_NUM_INTRAOP_THREADS", "1")
os.environ.setdefault("TF_NUM_INTEROP_THREADS", "1")

_platform = os.environ.get("SRF_TEST_PLATFORM", "cpu")
os.environ["JAX_PLATFORMS"] = _platform
os.environ.setdefault("JAX_ENABLE_X64", "0")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", _platform)

# Persistent compilation cache: OFF for CPU suite runs. XLA:CPU AOT
# executable deserialization is machine-feature-sensitive and has
# SEGFAULTED the suite twice (jax compilation_cache
# get_executable_and_time -> backend.deserialize_executable, with
# cpu_aot_loader "machine type ... doesn't match" warnings — even on
# entries written moments earlier by this same process family). The
# remote-TPU platform keeps the cache (it saves minutes per compile and
# its serialized executables are not CPU-AOT objects); an explicit
# SRF_TEST_CACHE opts back in for CPU. Subprocess trainers get a
# per-run throwaway dir (below) so restart/resume tests keep their
# warm-start while nothing test-written ever reaches the default dir.
from srf_tpu.utils.compilation_cache import (  # noqa: E402
    DEFAULT_CACHE_DIR, enable_compilation_cache,
)

_test_cache = (os.environ.get("SRF_TEST_CACHE")
               or DEFAULT_CACHE_DIR + "_tests")
enable_compilation_cache(
    _test_cache, force=bool(os.environ.get("SRF_TEST_CACHE"))
)
# subprocess trainers inherit the test dir (their own
# enable_compilation_cache applies the same CPU no-op rule)
os.environ["SRF_JAX_CACHE"] = _test_cache

import pytest  # noqa: E402

# Test tiers (VERDICT r3 item 4): `pytest -m core` is the <5-minute
# contributor signal (numerics/data/decode/config); `slow` holds the
# subprocess trainers, TF-parity goldens, and heavy multi-device
# compiles. Marking is by module so the tier split stays auditable in
# one place; a module not listed here is core by default.
SLOW_MODULES = {
    # subprocess spawners (CLI trainers, daemons, multi-process runs)
    "test_distributed", "test_elastic", "test_lockstep_stress",
    "test_preempt", "test_supervise", "test_watchdog", "test_serve",
    "test_serve_daemon", "test_e2e", "test_stf_trainer", "test_packaging",
    # TF interop (loads tensorflow, runs reference-shaped golden models)
    "test_tf_parity", "test_tf_parity_more", "test_tf_grad_parity",
    "test_import_tf_ckpt", "test_export_tf_ckpt",
    # heavy multi-device / full-model compiles
    "test_parallel", "test_pipeline", "test_ring_attention",
    "test_blockwise_attention", "test_mwer_accum", "test_augment_accum",
    "test_quant", "test_streaming", "test_models", "test_routing_pallas",
    "test_dropout_pallas",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        module = item.module.__name__.rsplit(".", 1)[-1]
        if module in SLOW_MODULES or item.get_closest_marker("slow"):
            item.add_marker(pytest.mark.slow)
        else:
            item.add_marker(pytest.mark.core)
