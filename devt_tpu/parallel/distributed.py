"""Multi-host / multi-slice initialisation.

The reference has no distributed runtime (SURVEY.md §2.8); its loss was
merely written DDP-ready.  Here multi-host runs initialise through
``jax.distributed`` (DCN for cross-slice coordination, ICI within a
slice); the data pipeline's per-host sharding (devt_tpu/data/pipeline.py)
keys off ``jax.process_index()`` automatically once this runs.

Call :func:`initialize` once at program start on every host.  On a single
host it is a no-op, so the same entry point serves laptop, single chip,
and pod.
"""

from __future__ import annotations

import os


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None) -> bool:
    """Initialise jax.distributed when a multi-process env is configured.

    Resolution order: explicit args → JAX_COORDINATOR_ADDRESS /
    JAX_NUM_PROCESSES / JAX_PROCESS_ID env → TPU pod auto-detection by
    ``jax.distributed.initialize()`` with no args.  Returns True when a
    multi-process runtime was started.
    """
    import jax

    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS")
    env_np = os.environ.get("JAX_NUM_PROCESSES")
    env_pid = os.environ.get("JAX_PROCESS_ID")
    if num_processes is None and env_np:
        num_processes = int(env_np)
    if process_id is None and env_pid:
        process_id = int(env_pid)

    if coordinator_address and num_processes and num_processes > 1:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id or 0)
        return True
    if os.environ.get("TPU_WORKER_HOSTNAMES", "localhost") != "localhost" \
            and os.environ.get("JAX_AUTO_DISTRIBUTED", "0") == "1":
        jax.distributed.initialize()
        return True
    return False


def runtime_info() -> dict:
    import jax

    return {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_devices": len(jax.local_devices()),
        "global_devices": len(jax.devices()),
        "backend": jax.default_backend(),
    }
