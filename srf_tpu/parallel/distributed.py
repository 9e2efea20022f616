"""Multi-host bootstrap.

The reference is strictly single-process (SURVEY.md §2.10: MirroredStrategy,
no multi-worker). For TPU pods, JAX needs ``jax.distributed.initialize()``
before first device use; this helper makes that a no-op on single-host
setups so the same entry points work everywhere:

- explicit env (SRF_COORDINATOR / SRF_NUM_PROCESSES / SRF_PROCESS_ID), or
- TPU pod metadata autodetection (initialize() with no args), gated behind
  SRF_MULTIHOST=1 so local runs never pay the probe.

Per-process data sharding then follows jax.process_index()/process_count()
(already wired through the loaders, the AutoShardPolicy.DATA analog).
"""

import os


def _already_initialized():
    """True once jax.distributed.initialize has run in this process —
    calling it twice raises, so library code and entry points can both
    call maybe_initialize safely (idempotent)."""
    import jax

    return (
        getattr(jax._src.distributed.global_state, "client", None) is not None
    )


def maybe_initialize(logger=None):
    if os.environ.get("SRF_COORDINATOR"):
        import jax

        if _already_initialized():
            return True
        jax.distributed.initialize(
            coordinator_address=os.environ["SRF_COORDINATOR"],
            num_processes=int(os.environ.get("SRF_NUM_PROCESSES", "1")),
            process_id=int(os.environ.get("SRF_PROCESS_ID", "0")),
        )
        if logger:
            logger.info(
                "jax.distributed initialized: process %s/%s via %s",
                os.environ.get("SRF_PROCESS_ID"),
                os.environ.get("SRF_NUM_PROCESSES"),
                os.environ.get("SRF_COORDINATOR"),
            )
        return True
    if os.environ.get("SRF_MULTIHOST") == "1":
        import jax

        if _already_initialized():
            return True
        jax.distributed.initialize()
        if logger:
            logger.info("jax.distributed initialized from TPU metadata")
        return True
    return False
