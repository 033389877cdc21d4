"""The convergence-loop driver — Spark analog of the reference's
``Iteration_Loop`` / ``Stop_Condition`` BSP machine
(gunrock/app/enactor_loop.cuh:49,151).

Each iteration: ``step(state, i) -> (new_state, metrics)`` where
``metrics`` is either a dict or a callable invoked with the
*materialized* (localCheckpointed) new state — use the callable form
when a metric (e.g. count of non-converged vertices) needs an action,
so the action runs against the snapshot instead of recomputing the
iteration's plan.
The driver owns what the reference's enactor owns:
  - the stop condition (``stop(metrics) -> bool``, evaluated on the
    metrics the step just produced — the analog of per-GPU
    ``Stop_Condition`` voting, pr_enactor.cuh:846-876),
  - lineage truncation (localCheckpoint per iteration; without it the
    Catalyst plan doubles every iteration and the driver dies ~iter 30),
  - durable checkpoint/resume via CheckpointManager every
    ``checkpoint_interval`` iterations,
  - per-iteration metrics (seconds, rows, caller metrics) -> the run
    manifest, matching the reference's JSON Info contract
    (gunrock/util/info.cuh:594-615).
"""

from __future__ import annotations

import time
from collections.abc import Callable
from dataclasses import dataclass, field
from typing import Union

from pyspark.sql import DataFrame

from gunrock_spark.engine.checkpoint import CheckpointManager


@dataclass
class IterationResult:
    state: DataFrame
    iterations: int
    converged: bool
    metrics: list[dict] = field(default_factory=list)
    elapsed_sec: float = 0.0

    def manifest(self, **extra) -> dict:
        """Per-run JSON record (reference: info.cuh elapsed/m_teps/
        search_depth contract, SURVEY.md §3.4). ``m_teps`` = total
        edges queued across iterations / elapsed / 1e6 (the
        reference's MTEPS, util/info.cuh:1297-1425), computed when
        steps reported ``edges_traversed``."""
        edges_queued = sum(
            it.get("edges_traversed", 0) for it in self.metrics
        )
        m = {
            "elapsed_sec": self.elapsed_sec,
            "search_depth": self.iterations,
            "converged": self.converged,
            "edges_queued": edges_queued,
            "m_teps": (
                round(edges_queued / self.elapsed_sec / 1e6, 4)
                if self.elapsed_sec > 0 and edges_queued
                else None
            ),
            "per_iteration": self.metrics,
        }
        m.update(extra)
        return m


def iterate(
    state: DataFrame,
    step: Callable[
        [DataFrame, int],
        tuple[DataFrame, Union[dict, Callable[[DataFrame], dict]]],
    ],
    stop: Callable[[dict], bool],
    max_iter: int = 50,
    checkpointer: CheckpointManager | None = None,
    checkpoint_interval: int = 5,
    start_iteration: int = 0,
    prior_metrics: list[dict] | None = None,
) -> IterationResult:
    """Run ``step`` until ``stop`` or ``max_iter``.

    ``state`` must be an already-materialized DataFrame (the caller
    localCheckpoints/caches its initial state). Resume: pass
    ``start_iteration``/``prior_metrics`` from
    ``CheckpointManager.load_latest``.
    """
    metrics_log: list[dict] = list(prior_metrics or [])
    t0 = time.monotonic()
    converged = False
    i = start_iteration
    # Resuming from a snapshot taken at/after convergence: don't
    # re-step (an extra iteration would move the state).
    if metrics_log and stop(metrics_log[-1]):
        return IterationResult(
            state=state, iterations=i, converged=True, metrics=metrics_log, elapsed_sec=0.0
        )
    prev_state: DataFrame | None = None
    last_saved: int | None = None
    while i < max_iter:
        it_t0 = time.monotonic()
        new_state, metrics = step(state, i)
        # Lineage cut: localCheckpoint truncates the plan. Lazy here so
        # the metrics action below both materializes the snapshot and
        # computes the metric in ONE job (iteration cost = 1 action).
        new_state = new_state.localCheckpoint(eager=False)
        if callable(metrics):
            metrics = metrics(new_state)
        else:
            new_state.count()  # materialize the lineage cut
        metrics = dict(metrics)
        metrics["iteration"] = i
        metrics["seconds"] = time.monotonic() - it_t0
        metrics_log.append(metrics)
        i += 1
        if checkpointer is not None and (i % checkpoint_interval == 0):
            new_state = checkpointer.save(new_state, i, metrics_log)
            last_saved = i
        if prev_state is not None:
            try:
                prev_state.unpersist()
            except Exception:
                pass
        prev_state, state = state, new_state
        if stop(metrics):
            converged = True
            break
    # tail save — but never re-save an iteration already on disk
    # (self-overwrite while reading from the same snapshot corrupts it).
    # A resumed run that stepped ZERO times (start_iteration already at
    # max_iter) is exactly that hazard: its state IS the loaded
    # snapshot, and prior_metrics witnesses the load.
    resumed_without_step = i == start_iteration and bool(prior_metrics)
    if checkpointer is not None and last_saved != i and not resumed_without_step:
        state = checkpointer.save(state, i, metrics_log)
    return IterationResult(
        state=state,
        iterations=i,
        converged=converged,
        metrics=metrics_log,
        elapsed_sec=time.monotonic() - t0,
    )
