"""Metrics / observability: JSONL event log + profiler hooks.

Capability parity: the reference prints per-iteration cost to console
(SURVEY.md §5); here it is structured JSONL (one event per line: cost,
‖g‖∞, λ, CG iterations, step wall-clock) plus optional ``jax.profiler``
traces for tensorboard (SURVEY.md §2.2 N12, §5 "Tracing/profiling" row).
"""

from __future__ import annotations

import contextlib
import json
import time


class MetricsLogger:
    """Append-only JSONL event logger with wall-clock stamps."""

    def __init__(self, path: str | None):
        self.path = path
        self._fh = open(path, "a") if path else None
        self.t0 = time.time()

    def log(self, event: str, **fields) -> None:
        if self._fh is None:
            return
        rec = {"event": event, "t": round(time.time() - self.t0, 6), **fields}
        self._fh.write(json.dumps(rec) + "\n")
        self._fh.flush()

    def log_lm_result(self, res, *, wall_s: float | None = None, label: str = "") -> None:
        """Record a finished LMResult, including the per-iteration cost trace."""
        import numpy as np

        self.log(
            "lm_solve", label=label,
            iterations=int(res.iterations), accepted=int(res.accepted),
            initial_cost=float(res.initial_cost), final_cost=float(res.cost),
            grad_inf_norm=float(res.grad_inf_norm), lam=float(res.lam),
            converged=bool(res.converged), wall_s=wall_s,
            cost_history=np.asarray(res.cost_history, np.float64).tolist(),
        )

    def close(self) -> None:
        if self._fh:
            self._fh.close()
            self._fh = None


@contextlib.contextmanager
def profile_trace(logdir: str | None):
    """``jax.profiler.trace`` context (no-op when logdir is None)."""
    if logdir is None:
        yield
        return
    import jax

    with jax.profiler.trace(logdir):
        yield
