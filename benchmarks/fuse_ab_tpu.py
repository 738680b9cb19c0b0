"""A/B decomposition of the post-de-concat headline pipeline on the TPU.

Isolates where the remaining time goes at B=16, N=4096 f32 HIGHEST:
  - bare blocked factorization at block 128 / 256 / 512 (unrolled diag)
  - the Pallas diagonal kernel alone (unrolled vs fori), 16 launches
  - blocked forward substitution vs XLA triangular_solve for the m=8 solve
  - single-matrix N=16384: does the 64-step dus-structured driver compile,
    and how does it compare to XLA's native Cholesky (109 ms in r2)?

Run: python benchmarks/fuse_ab_tpu.py [--skip16k]
"""
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from micro_tpu import timed_loop  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    from gsum_tpu.ops.batched import rbf_covariance
    from gsum_tpu.ops.blockchol import (batched_blocked_cholesky,
                                        blocked_chol_solve_logdet)
    from gsum_tpu.ops.pallas_chol import chol_inv_block

    B, N, d, m = 16, 4096, 2, 8
    rng = np.random.RandomState(0)
    X = jnp.asarray(rng.rand(B, N, d), dtype=jnp.float32)
    y = jnp.asarray(rng.randn(B, N, m), dtype=jnp.float32)
    results = {}

    def cov(Xc):
        return jax.vmap(rbf_covariance)(
            Xc, jnp.full((B,), 0.25, jnp.float32),
            jnp.ones((B,), jnp.float32), jnp.full((B,), 1e-2, jnp.float32))

    chol_flops = B * N ** 3 / 3.0

    # ---- bare factorization, block sweep -----------------------------
    for blk in (128, 256, 512):
        def step(c, X_, blk=blk):
            Xc = X_ + (1e-30 * jnp.sum(c)).astype(X_.dtype)
            L = batched_blocked_cholesky(cov(Xc), block=blk)
            return c + 1e-6 * jnp.sum(L) * jnp.ones_like(c)
        c0 = jnp.zeros((8, 8), jnp.float32)
        gf, dt = timed_loop(step, c0, chol_flops, iters=4, consts=(X,))
        results['factor_b%d_ms' % blk] = round(dt * 1e3, 2)
        results['factor_b%d_gflops' % blk] = round(gf, 1)

    # ---- diagonal kernel alone: 16 launches of (16, 256) -------------
    A1 = rng.randn(16, 256, 256).astype(np.float32)
    K1 = jnp.asarray(np.einsum('bij,bkj->bik', A1, A1)
                     + 256 * np.eye(256, dtype=np.float32))
    for name, unroll in (('unroll', True), ('fori', False)):
        def step(c, K_, unroll=unroll):
            Kc = K_ + (1e-30 * jnp.sum(c)).astype(K_.dtype)
            out = Kc
            for _ in range(16):
                L, M = chol_inv_block(out, unroll=unroll)
                out = out + 1e-12 * (L + M)
            return c + 1e-6 * jnp.sum(out) * jnp.ones_like(c)
        c0 = jnp.zeros((8, 8), jnp.float32)
        _, dt = timed_loop(step, c0, 1.0, iters=2, consts=(K1,))
        results['diag16_%s_ms' % name] = round(dt * 1e3, 2)

    # ---- solve variants on the headline pipeline ---------------------
    def step_blocked_solve(c, X_, y_):
        Xc = X_ + (1e-30 * jnp.sum(c)).astype(X_.dtype)
        w, logdet = blocked_chol_solve_logdet(cov(Xc), y_)
        out = jnp.sum(w * w, axis=-2) + logdet[..., None]
        return c + 1e-6 * jnp.sum(out) * jnp.ones_like(c)

    def step_xla_solve(c, X_, y_):
        from jax.lax.linalg import triangular_solve
        Xc = X_ + (1e-30 * jnp.sum(c)).astype(X_.dtype)
        L = batched_blocked_cholesky(cov(Xc))
        w = triangular_solve(L, y_, left_side=True, lower=True)
        logdet = 2.0 * jnp.sum(
            jnp.log(jnp.diagonal(L, axis1=-2, axis2=-1)), axis=-1)
        out = jnp.sum(w * w, axis=-2) + logdet[..., None]
        return c + 1e-6 * jnp.sum(out) * jnp.ones_like(c)

    pipe_flops = B * (2.0 * N * N * d + 6.0 * N * N) + chol_flops \
        + B * 2.0 * N * N * m
    for name, fn in (('pipe_blockedsolve', step_blocked_solve),
                     ('pipe_xlasolve', step_xla_solve)):
        c0 = jnp.zeros((8, 8), jnp.float32)
        gf, dt = timed_loop(fn, c0, pipe_flops, iters=4, consts=(X, y))
        results[name + '_ms'] = round(dt * 1e3, 2)
        results[name + '_gflops'] = round(gf, 1)

    # ---- N=16,384 single matrix --------------------------------------
    if '--skip16k' not in sys.argv:
        N16 = 16384
        X16 = jnp.asarray(rng.rand(1, N16, d), dtype=jnp.float32)

        def cov16(Xc):
            return jax.vmap(rbf_covariance)(
                Xc, jnp.full((1,), 0.25, jnp.float32),
                jnp.ones((1,), jnp.float32),
                jnp.full((1,), 1e-2, jnp.float32))

        def step16_xla(c, X_):
            Xc = X_ + (1e-30 * jnp.sum(c)).astype(X_.dtype)
            L = jnp.linalg.cholesky(cov16(Xc))
            return c + 1e-6 * jnp.sum(L) * jnp.ones_like(c)

        def step16_blocked(c, X_):
            Xc = X_ + (1e-30 * jnp.sum(c)).astype(X_.dtype)
            L = batched_blocked_cholesky(cov16(Xc), block=512)
            return c + 1e-6 * jnp.sum(L) * jnp.ones_like(c)

        f16 = N16 ** 3 / 3.0
        for name, fn in (('n16k_xla', step16_xla),
                         ('n16k_blocked_b512', step16_blocked)):
            try:
                c0 = jnp.zeros((8, 8), jnp.float32)
                gf, dt = timed_loop(fn, c0, f16, iters=2, consts=(X16,))
                results[name + '_ms'] = round(dt * 1e3, 2)
                results[name + '_gflops'] = round(gf, 1)
            except Exception as e:  # compile failure is a result here
                results[name + '_error'] = type(e).__name__ + ': ' + str(e)[:200]

    print(json.dumps(results, indent=1))


if __name__ == '__main__':
    main()
