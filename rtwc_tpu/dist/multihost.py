"""Multi-host runtime bootstrap.

The reference's only 'communication backend' is cudaMemcpy +
cudaDeviceSynchronize inside one process (RayTracingManager.cu:83,137-143).
The TPU-native equivalent (SURVEY.md section 5) is the JAX distributed
runtime: every host calls initialize_multihost() first thing, then builds
one global mesh over all chips; collectives ride ICI within a slice and
DCN across hosts without further code.
"""
from __future__ import annotations

import logging

import jax

log = logging.getLogger("rtwc_tpu")


def initialize_multihost(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> bool:
    """Initialize jax.distributed when running multi-process.

    No-ops (returns False) when the environment is single-process and no
    coordinator is configured, so single-chip users never pay for it.
    TPU pod environments auto-discover all arguments.
    """
    import os

    configured = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS") or os.environ.get(
        "COORDINATOR_ADDRESS"
    )
    in_pod_env = any(k in os.environ for k in ("TPU_WORKER_HOSTNAMES", "MEGASCALE_COORDINATOR_ADDRESS"))
    if not configured and not in_pod_env:
        return False
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
        log.info(
            "multihost: process %d/%d, %d local / %d global devices",
            jax.process_index(), jax.process_count(),
            jax.local_device_count(), jax.device_count(),
        )
        return True
    except Exception as e:  # already initialized or single-process
        log.warning("jax.distributed.initialize skipped: %s", e)
        return False
