"""A/B decomposition of the round-3 headline pipeline on the TPU.

Each leg prints its own JSON line as soon as it finishes (legs fail
independently — a compile OOM in one variant must not cost the others).

Legs, at B=16 N=4096 f32 HIGHEST unless stated:
  - full pipeline: blocked (XLA driver) vs fused (single Pallas kernel)
  - bare blocked factorization at block 128 / 256
  - the Pallas diagonal kernel alone (unrolled vs fori), 16 launches
  - blocked forward substitution vs XLA triangular_solve for the solve
  - single-matrix N=16384: XLA native vs blocked(b512, chunk-auto) vs
    fused(b256) — the large-single-N race (r2: XLA 109 ms)

Run: python benchmarks/fuse_ab_tpu.py [legs...]   (default: all)
"""
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from micro_tpu import timed_loop  # noqa: E402


def emit(name, **kw):
    print(json.dumps({'leg': name, **kw}), flush=True)


def leg(name):
    want = sys.argv[1:]
    return not want or any(w in name for w in want)


def run_leg(name, fn, flops, iters=4, consts=()):
    if not leg(name):
        return
    import jax.numpy as jnp
    try:
        c0 = jnp.zeros((8, 8), jnp.float32)
        gf, dt = timed_loop(fn, c0, flops, iters=iters, consts=consts)
        emit(name, ms=round(dt * 1e3, 2), gflops=round(gf, 1))
    except Exception as e:
        emit(name, error=type(e).__name__, msg=str(e)[:300])


def main():
    import jax
    import jax.numpy as jnp

    from gsum_tpu.ops.batched import batched_chol_logpdf, rbf_covariance
    from gsum_tpu.ops.blockchol import (batched_blocked_cholesky,
                                        blocked_chol_solve_logdet)
    from gsum_tpu.ops.pallas_chol import chol_inv_block

    B, N, d, m = 16, 4096, 2, 8
    rng = np.random.RandomState(0)
    X = jnp.asarray(rng.rand(B, N, d), dtype=jnp.float32)
    y = jnp.asarray(rng.randn(B, N, m), dtype=jnp.float32)

    def cov(Xc, BB=B):
        return jax.vmap(rbf_covariance)(
            Xc, jnp.full((BB,), 0.25, jnp.float32),
            jnp.ones((BB,), jnp.float32), jnp.full((BB,), 1e-2, jnp.float32))

    chol_flops = B * N ** 3 / 3.0
    pipe_flops = B * (2.0 * N * N * d + 6.0 * N * N) + chol_flops \
        + B * 2.0 * N * N * m

    # ---- full pipelines ----------------------------------------------
    for name, kw in (('blocked_b256', dict(method='blocked', block=256)),
                     ('blocked_b128', dict(method='blocked', block=128)),
                     ('fused', dict(method='fused'))):
        def step(c, X_, y_, kw=kw):
            Xc = X_ + (1e-30 * jnp.sum(c)).astype(X_.dtype)
            out = batched_chol_logpdf(Xc, y_, 0.25, 1.0, 1e-2, **kw)
            return c + 1e-6 * jnp.sum(out) * jnp.ones_like(c)
        run_leg('pipe_' + name, step, pipe_flops, consts=(X, y))

    # correctness cross-check of the fused pipeline vs blocked
    if leg('pipe_fused'):
        try:
            a = np.asarray(batched_chol_logpdf(X, y, 0.25, 1.0, 1e-2,
                                               method='blocked'))
            b = np.asarray(batched_chol_logpdf(X, y, 0.25, 1.0, 1e-2,
                                               method='fused'))
            emit('fused_vs_blocked_relerr',
                 relerr=float(np.max(np.abs(a - b) / np.abs(a))))
        except Exception as e:
            emit('fused_vs_blocked_relerr', error=type(e).__name__,
                 msg=str(e)[:300])

    # ---- bare factorization, block sweep -----------------------------
    for blk in (128, 256):
        def step(c, X_, blk=blk):
            Xc = X_ + (1e-30 * jnp.sum(c)).astype(X_.dtype)
            L = batched_blocked_cholesky(cov(Xc), block=blk)
            return c + 1e-6 * jnp.sum(L) * jnp.ones_like(c)
        run_leg('factor_b%d' % blk, step, chol_flops, consts=(X,))

    # ---- diagonal kernel alone: 16 chained launches of (16, 256) -----
    A1 = rng.randn(16, 256, 256).astype(np.float32)
    K1 = jnp.asarray(np.einsum('bij,bkj->bik', A1, A1)
                     + 256 * np.eye(256, dtype=np.float32))
    for dname, unroll in (('unroll', True), ('fori', False)):
        def step(c, K_, unroll=unroll):
            Kc = K_ + (1e-30 * jnp.sum(c)).astype(K_.dtype)
            out = Kc
            for _ in range(16):
                L, M = chol_inv_block(out, unroll=unroll)
                out = out + 1e-12 * (L + M)
            return c + 1e-6 * jnp.sum(out) * jnp.ones_like(c)
        run_leg('diag16_' + dname, step, 1.0, iters=2, consts=(K1,))

    # ---- solve variants ----------------------------------------------
    def step_xla_solve(c, X_, y_):
        from jax.lax.linalg import triangular_solve
        Xc = X_ + (1e-30 * jnp.sum(c)).astype(X_.dtype)
        L = batched_blocked_cholesky(cov(Xc))
        w = triangular_solve(L, y_, left_side=True, lower=True)
        logdet = 2.0 * jnp.sum(
            jnp.log(jnp.diagonal(L, axis1=-2, axis2=-1)), axis=-1)
        out = jnp.sum(w * w, axis=-2) + logdet[..., None]
        return c + 1e-6 * jnp.sum(out) * jnp.ones_like(c)

    run_leg('pipe_xlasolve', step_xla_solve, pipe_flops, consts=(X, y))

    # ---- B=1 N=4096: the model-class fit/lml regime ------------------
    # decides models._auto_chol's routing (a single matrix per lml eval)
    X1 = jnp.asarray(rng.rand(1, N, d), dtype=jnp.float32)

    def b1_step(engine):
        def step(c, X_):
            Xc = X_ + (1e-30 * jnp.sum(c)).astype(X_.dtype)
            K = cov(Xc, BB=1)
            if engine == 'xla':
                L = jnp.linalg.cholesky(K)
            else:
                L = batched_blocked_cholesky(K, block=128)
            return c + 1e-6 * jnp.sum(L) * jnp.ones_like(c)
        return step

    run_leg('b1_n4096_xla', b1_step('xla'), N ** 3 / 3.0, consts=(X1,))
    run_leg('b1_n4096_blocked_b128', b1_step('blocked'), N ** 3 / 3.0,
            consts=(X1,))

    # ---- N=16,384 single matrix --------------------------------------
    N16 = 16384
    X16 = jnp.asarray(rng.rand(1, N16, d), dtype=jnp.float32)
    f16 = N16 ** 3 / 3.0

    def cov16(Xc):
        return jax.vmap(rbf_covariance)(
            Xc, jnp.full((1,), 0.25, jnp.float32),
            jnp.ones((1,), jnp.float32), jnp.full((1,), 1e-2, jnp.float32))

    def step16_xla(c, X_):
        Xc = X_ + (1e-30 * jnp.sum(c)).astype(X_.dtype)
        L = jnp.linalg.cholesky(cov16(Xc))
        return c + 1e-6 * jnp.sum(L) * jnp.ones_like(c)

    def step16_blocked(c, X_):
        Xc = X_ + (1e-30 * jnp.sum(c)).astype(X_.dtype)
        L = batched_blocked_cholesky(cov16(Xc), block=512)
        return c + 1e-6 * jnp.sum(L) * jnp.ones_like(c)

    def step16_fused(c, X_):
        from gsum_tpu.ops.fusedchol import fused_blocked_cholesky
        Xc = X_ + (1e-30 * jnp.sum(c)).astype(X_.dtype)
        L, _ = fused_blocked_cholesky(cov16(Xc), block=256, chunk=1)
        return c + 1e-6 * jnp.sum(L) * jnp.ones_like(c)

    run_leg('n16k_xla', step16_xla, f16, iters=2, consts=(X16,))
    run_leg('n16k_blocked_b512', step16_blocked, f16, iters=2, consts=(X16,))
    run_leg('n16k_fused_b256', step16_fused, f16, iters=2, consts=(X16,))


if __name__ == '__main__':
    main()
