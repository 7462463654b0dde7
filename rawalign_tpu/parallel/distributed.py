"""Multi-host initialization and scaling helpers.

The reference is strictly single-node shared-memory (SURVEY §2 row 15);
this framework scales across hosts with ``jax.distributed`` + the mesh in
rawalign_tpu.parallel.mesh. Each host ingests its own shard of the signal
files (read-level data parallelism — the cross-host analog of kt_for) and
participates in the global device mesh for sharded-index lookups.

Usage (one process per host):

    from rawalign_tpu.parallel import distributed
    distributed.init()                      # env-driven (TPU pods: automatic)
    files = distributed.shard_files(files)  # this host's input shard
    ... build engine with a mesh over jax.devices() ...

Failure/elastic model (the reference has none; errors were fprintf+exit):
the index file is the unit of precomputation; mapping restarts are
read-granular via the CLI's --resume, so a failed host's shard can be
re-run on any other host against the same index and the PAFs
concatenated.
"""

from __future__ import annotations

import os


def init(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> None:
    """Initialize jax.distributed. On TPU pods all arguments are inferred
    from the environment; on other platforms pass them explicitly or via
    JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID."""
    import jax

    kwargs = {}
    if coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS"):
        kwargs["coordinator_address"] = coordinator_address or os.environ.get(
            "JAX_COORDINATOR_ADDRESS"
        )
    if num_processes or os.environ.get("JAX_NUM_PROCESSES"):
        kwargs["num_processes"] = int(
            num_processes or os.environ["JAX_NUM_PROCESSES"]
        )
    if process_id is not None or os.environ.get("JAX_PROCESS_ID"):
        kwargs["process_id"] = int(
            process_id
            if process_id is not None
            else os.environ["JAX_PROCESS_ID"]
        )
    jax.distributed.initialize(**kwargs)


def process_info() -> tuple[int, int]:
    """(process_id, num_processes); (0, 1) when not distributed."""
    import jax

    try:
        return jax.process_index(), jax.process_count()
    except Exception:
        return 0, 1


def shard_files(files: list[str]) -> list[str]:
    """Deterministic round-robin assignment of input files to this host."""
    pid, n = process_info()
    return [f for i, f in enumerate(files) if i % n == pid]
