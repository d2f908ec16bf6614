"""Thin multi-host runtime harness.

The reference has no failure handling beyond print-and-continue
(SURVEY.md §5); robustness there is *algorithmic* (masks, gates,
RANSAC) and this framework keeps that.  Across hosts the policy is the
standard JAX one, wrapped thinly here:

- ``initialize_distributed``: ``jax.distributed.initialize`` with env
  autodetection and bounded retries (coordinator races at pod startup),
- ``checkpointed_loop``: drive a step function with periodic
  checkpointing (utils/checkpoint.py) and automatic resume, so a
  restarted worker re-joins from the last window state — the
  "heartbeat/restart as thin harness" of SURVEY.md §5; failure
  *detection* itself is the scheduler's job (a dead host fails the
  collective, the job restarts, this harness resumes).
"""

from __future__ import annotations

import os
import time
from typing import Callable, Optional

import jax


def initialize_distributed(coordinator: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None,
                           retries: int = 5, retry_delay_s: float = 5.0):
    """Bounded-retry wrapper over jax.distributed.initialize.

    With no arguments JAX autodetects (TPU pod metadata / env vars);
    single-process environments return immediately.

    The single-vs-multi-process decision is made from the environment
    alone (coordinator env vars / pod metadata hints), never by touching
    the JAX backend: ``jax.distributed.initialize`` must run *before*
    the backend is created, so probing ``jax.process_count()`` here
    would self-defeat the multi-host path.
    """
    if num_processes in (None, 1) and coordinator is None:
        strong_hints = (
            "JAX_COORDINATOR_ADDRESS", "COORDINATOR_ADDRESS",
            "JAX_NUM_PROCESSES", "MEGASCALE_COORDINATOR_ADDRESS",
        )
        # TPU_WORKER_HOSTNAMES counts only when it actually lists more
        # than one host (single-host runtimes set it to "localhost")
        worker_hosts = os.environ.get("TPU_WORKER_HOSTNAMES", "")
        multiproc = any(os.environ.get(k) for k in strong_hints) or \
            ("," in worker_hosts)
        if not multiproc:
            return False
    last = None
    for _ in range(retries):
        try:
            jax.distributed.initialize(
                coordinator_address=coordinator,
                num_processes=num_processes,
                process_id=process_id,
            )
            return True
        except Exception as e:  # coordinator not up yet, transient DNS, ...
            last = e
            time.sleep(retry_delay_s)
    raise RuntimeError(f"distributed init failed after {retries} tries: {last}")


def checkpointed_loop(step_fn: Callable[[dict, int], dict], state: dict,
                      num_steps: int, ckpt_path, every: int = 10,
                      resume: bool = True):
    """Run ``state = step_fn(state, i)`` with periodic checkpoints and
    resume-from-checkpoint.  ``state`` is a flat dict of arrays plus an
    integer ``"step"`` entry this loop maintains.
    """
    from invcompcamtrack_tpu.utils.checkpoint import (
        restore_checkpoint,
        save_checkpoint,
    )

    start = 0
    if resume:
        try:
            restored = restore_checkpoint(ckpt_path)
            start = int(restored.pop("step"))
            state = {**state, **restored}
        except (FileNotFoundError, KeyError, OSError):
            pass

    for i in range(start, num_steps):
        state = step_fn(state, i)
        if (i + 1) % every == 0 or i == num_steps - 1:
            save_checkpoint(ckpt_path, {**state, "step": i + 1})
    return state
