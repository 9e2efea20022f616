"""Multi-host bootstrap gating: must be a no-op unless explicitly enabled."""

import srf_tpu.parallel.distributed as dist


def test_no_env_is_noop(monkeypatch):
    monkeypatch.delenv("SRF_COORDINATOR", raising=False)
    monkeypatch.delenv("SRF_MULTIHOST", raising=False)
    assert dist.maybe_initialize() is False


def test_coordinator_env_calls_initialize(monkeypatch):
    calls = {}

    class FakeDistributed:
        @staticmethod
        def initialize(**kw):
            calls.update(kw)

    import jax

    monkeypatch.setattr(jax, "distributed", FakeDistributed)
    monkeypatch.setenv("SRF_COORDINATOR", "10.0.0.1:1234")
    monkeypatch.setenv("SRF_NUM_PROCESSES", "4")
    monkeypatch.setenv("SRF_PROCESS_ID", "2")
    assert dist.maybe_initialize() is True
    assert calls == {
        "coordinator_address": "10.0.0.1:1234",
        "num_processes": 4,
        "process_id": 2,
    }


def test_multihost_flag_calls_autodetect(monkeypatch):
    called = []

    class FakeDistributed:
        @staticmethod
        def initialize(**kw):
            called.append(kw)

    import jax

    monkeypatch.delenv("SRF_COORDINATOR", raising=False)
    monkeypatch.setenv("SRF_MULTIHOST", "1")
    monkeypatch.setattr(jax, "distributed", FakeDistributed)
    assert dist.maybe_initialize() is True
    assert called == [{}]
