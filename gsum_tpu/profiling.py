R"""Tracing and FLOP accounting (SURVEY.md §5: absent in the reference).

- :func:`trace` — context manager around ``jax.profiler`` writing a
  TensorBoard-compatible trace of device execution.
- :func:`flops_fit` / :func:`flops_lml` — analytic FLOP counts for the
  library's hot paths, for computing achieved FLOP/s from wall-clock (the
  convention used by ``bench.py``).
- :func:`time_fn` — robust wall-clock timing on this platform (host-fetch
  synchronization; ``block_until_ready`` does not synchronize through the
  tunneled TPU plugin).
"""
from __future__ import annotations

import contextlib
import time

import jax
import jax.numpy as jnp

from . import _config  # noqa: F401

__all__ = ['trace', 'flops_lml', 'flops_fit', 'time_fn']


@contextlib.contextmanager
def trace(log_dir, **kwargs):
    """Profiles device execution into ``log_dir`` (TensorBoard format)."""
    jax.profiler.start_trace(log_dir, **kwargs)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def flops_lml(n, n_curves=1, n_params=1):
    """FLOPs of one log-marginal-likelihood evaluation: kernel build +
    Cholesky + triangular solves + logdet (reference hot loop, SURVEY §3.1)."""
    cov = 2.0 * n * n * n_params + 6.0 * n * n
    chol = n ** 3 / 3.0
    solves = 2.0 * n * n * (n_curves + 2)
    return cov + chol + solves


def flops_fit(n, n_curves=1, n_params=1, lml_evals=30):
    """FLOPs of a MAP fit: optimizer iterations x (lml + gradient ~ 3x lml)."""
    return lml_evals * 4.0 * flops_lml(n, n_curves, n_params)


def time_fn(fn, *args, reps=3, chain=3):
    """Best-of wall-clock per call; synchronizes via host fetch."""
    def sync(x):
        # fetch one element of EVERY leaf: a fn composed of several
        # dispatches finishes its first executable before the others, so
        # syncing only leaves[0] stops the timer early (host fetch is the
        # only working sync on the tunneled TPU — block_until_ready is not)
        total = 0.0
        for leaf in jax.tree_util.tree_leaves(x):
            total += float(jnp.sum(jnp.ravel(leaf)[:1]))
        return total

    out = fn(*args)
    sync(out)
    best = float('inf')
    for _ in range(reps):
        sync(args[0] if args else out)
        t0 = time.perf_counter()
        for _ in range(chain):
            out = fn(*args)
        sync(out)
        best = min(best, (time.perf_counter() - t0) / chain)
    return best
