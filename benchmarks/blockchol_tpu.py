"""Headline-pipeline shootout on the real TPU: XLA vs blocked Cholesky.

Times the full BASELINE.md pipeline (covariance build + factorization +
triangular solve + logdet) at B=16, N=4096 f32 for each engine and
precision, cross-checking the log-densities between engines.

Run: python benchmarks/blockchol_tpu.py
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from micro_tpu import timed_loop  # noqa: E402


def flops(B, N, d, m):
    cov = B * (2.0 * N * N * d + 6.0 * N * N)
    chol = B * (N ** 3) / 3.0
    solve = B * (2.0 * N * N * m)
    return cov + chol + solve


def main():
    import jax
    import jax.numpy as jnp

    from gsum_tpu.ops import batched_chol_logpdf

    B, N, d, m = 16, 4096, 2, 8
    rng = np.random.RandomState(0)
    X = jnp.asarray(rng.rand(B, N, d), dtype=jnp.float32)
    y = jnp.asarray(rng.randn(B, N, m), dtype=jnp.float32)

    results = {}
    outs = {}
    per_iter = flops(B, N, d, m)

    for name, kw in [
        ('xla', dict(method='xla')),
        ('blocked_highest', dict(method='blocked',
                                 precision=jax.lax.Precision.HIGHEST)),
        ('blocked_highest_fori', dict(method='blocked', diag='pallas_fori',
                                      precision=jax.lax.Precision.HIGHEST)),
        ('blocked_high', dict(method='blocked',
                              precision=jax.lax.Precision.HIGH)),
    ]:
        def step(c, X_, y_, kw=kw):
            # carry -> input data edge: without it the loop body is
            # invariant and XLA may hoist the whole pipeline out of the
            # fori_loop (measuring 1 execution as iters)
            Xc = X_ + (1e-30 * jnp.sum(c)).astype(X_.dtype)
            out = batched_chol_logpdf(Xc, y_, 0.25, 1.0, 1e-2, **kw)
            return c + 1e-6 * jnp.sum(out) * jnp.ones_like(c)
        c0 = jnp.zeros((8, 8), dtype=jnp.float32)
        gf, dt = timed_loop(step, c0, per_iter, iters=4, consts=(X, y))
        results[name + '_gflops'] = round(gf, 1)
        results[name + '_ms'] = round(dt * 1e3, 2)
        outs[name] = np.asarray(batched_chol_logpdf(X, y, 0.25, 1.0, 1e-2,
                                                    **kw))

    ref = outs['xla']
    for name, v in outs.items():
        results[name + '_vs_xla_relerr'] = float(
            np.max(np.abs(v - ref) / np.abs(ref)))
    print(json.dumps(results, indent=1))


if __name__ == '__main__':
    main()
