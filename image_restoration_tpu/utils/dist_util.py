"""Multi-host helpers — parity with basicsr/utils/dist_util.py.

The reference's NCCL process-group bootstrap (init_dist :10-57) collapses to
`jax.distributed.initialize` (one process per host); rank helpers and the
@master_only decorator keep their API.
"""

from __future__ import annotations

import functools
from typing import Optional


def init_dist(coordinator_address: Optional[str] = None,
              num_processes: Optional[int] = None,
              process_id: Optional[int] = None) -> None:
    """Multi-host init (replaces NCCL/slurm launchers, ref :10-57).

    With no arguments JAX auto-detects the TPU pod environment.
    """
    import jax
    if num_processes is not None:
        jax.distributed.initialize(coordinator_address, num_processes,
                                   process_id)
    else:
        try:
            jax.distributed.initialize()
        except Exception:
            pass  # single-process


def get_dist_info():
    """(rank, world_size) — ref :60-71."""
    import jax
    return jax.process_index(), jax.process_count()


def master_only(func):
    """Run only on process 0 — ref :74-82."""

    @functools.wraps(func)
    def wrapper(*args, **kwargs):
        import jax
        if jax.process_index() == 0:
            return func(*args, **kwargs)
        return None

    return wrapper
