"""Multi-host pod entry (SURVEY.md §5 failure detection / §2.2 DP).

TPU-idiomatic fixed-topology pattern: every host runs the same program,
`jax.distributed.initialize` barriers the job at startup, the mesh spans all
processes' devices, and recovery is checkpoint-based restart (deterministic
data order + saved PRNG key make the resume exact; true elasticity is a
documented non-goal). Single-process runs skip initialization entirely, so
the same entry works on this box's 1-chip environment.
"""

from __future__ import annotations

import os

import jax


def initialize_multihost(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> dict:
    """Initialise JAX distributed if a multi-process env is configured.

    Resolution order: explicit args -> standard env vars
    (COORDINATOR_ADDRESS, NUM_PROCESSES, PROCESS_ID, or TPU pod metadata
    handled by jax.distributed.initialize() itself) -> single-process no-op.
    Returns a summary dict for logging.
    """
    coordinator_address = coordinator_address or os.environ.get("COORDINATOR_ADDRESS")
    if num_processes is None and "NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["NUM_PROCESSES"])
    if process_id is None and "PROCESS_ID" in os.environ:
        process_id = int(os.environ["PROCESS_ID"])

    if coordinator_address or num_processes:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    return {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_devices": len(jax.local_devices()),
        "global_devices": len(jax.devices()),
    }


def is_coordinator() -> bool:
    return jax.process_index() == 0


def sync_global_devices(tag: str = "barrier") -> None:
    """Cross-host barrier via a trivial collective (works on any mesh)."""
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices(tag)
