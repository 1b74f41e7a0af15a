"""Multi-host runtime initialization.

The reference has no distributed backend at all (SURVEY.md §5.8).  For real
pod slices this wraps `jax.distributed.initialize` with environment
auto-detection; on a single host it is a no-op so every entry point can call
it unconditionally.
"""

from __future__ import annotations

import os
from typing import Optional

from protgram_directgcn_tpu.utils.io import logger


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Initialize the multi-host JAX runtime when running under a launcher.

    Detection order: explicit args → JAX_COORDINATOR_ADDRESS /
    JAX_NUM_PROCESSES / JAX_PROCESS_ID env vars → TPU pod metadata (handled
    by jax.distributed.initialize() with no args).  Returns True when a
    multi-process runtime was started.
    """
    import jax

    coordinator_address = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    num_processes = num_processes or _int_env("JAX_NUM_PROCESSES")
    process_id = process_id if process_id is not None else _int_env("JAX_PROCESS_ID")

    if coordinator_address is None and num_processes is None:
        logger.info("single-host run (no coordinator configured)")
        return False
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
        logger.info(
            "jax.distributed initialized: process %d/%d, %d local / %d global devices",
            jax.process_index(), jax.process_count(),
            jax.local_device_count(), jax.device_count(),
        )
        return True
    except Exception as e:
        logger.warning("jax.distributed initialization failed: %s", e)
        return False


def _int_env(name: str) -> Optional[int]:
    val = os.environ.get(name)
    return int(val) if val is not None else None
