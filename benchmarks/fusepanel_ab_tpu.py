"""A/B: fused single-loop panel factor+inverse vs the two-loop kernel.

Round-4 headline experiment (docs/perf.md): the Pallas diagonal's serial
section is dispatch-bound, so producing L and M = L^-1 from ONE pb-step
recursion (small_chol_inv) instead of two should cut the ~10.5 ms
diagonal share of the 27.9 ms pipeline.  Legs, B=16 N=4096 f32 HIGHEST:

  - diag16: 16 chained (16, 128, 128) diagonal launches, fused vs not
  - factor: bare blocked factorization at block=128, fused vs not
  - pipe:   full cov+chol+solve+logdet pipeline, fused vs not
  - correctness: fused-vs-unfused max rel diff of L, M, and the logpdf

Run: python benchmarks/fusepanel_ab_tpu.py [legs...]
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
    from gsum_tpu.ops.blockchol import batched_blocked_cholesky
    from gsum_tpu.ops.pallas_chol import chol_inv_block

    B, N, d, m = 16, 4096, 2, 8
    rng = np.random.RandomState(0)
    X = jnp.asarray(rng.rand(B, N, d), dtype=jnp.float32)
    y = jnp.asarray(rng.randn(B, N, m), dtype=jnp.float32)

    def cov(Xc):
        return jax.vmap(rbf_covariance)(
            Xc, jnp.full((B,), 0.25, jnp.float32),
            jnp.ones((B,), jnp.float32), jnp.full((B,), 1e-2, jnp.float32))

    chol_flops = B * N ** 3 / 3.0
    pipe_flops = B * (2.0 * N * N * d + 6.0 * N * N) + chol_flops \
        + B * 2.0 * N * N * m

    # ---- diagonal kernel alone: 16 chained (16, 128) launches --------
    A1 = rng.randn(16, 128, 128).astype(np.float32)
    K1 = jnp.asarray(np.einsum('bij,bkj->bik', A1, A1)
                     + 128 * np.eye(128, dtype=np.float32))
    for dname, fp in (('fused', True), ('twoloop', False)):
        def step(c, K_, fp=fp):
            Kc = K_ + (1e-30 * jnp.sum(c)).astype(K_.dtype)
            out = Kc
            for _ in range(16):
                L, M = chol_inv_block(out, fuse_panel=fp)
                out = out + 1e-12 * (L + M)
            return c + 1e-6 * jnp.sum(out) * jnp.ones_like(c)
        run_leg('diag16_b128_' + dname, step, 1.0, iters=2, consts=(K1,))

    # ---- bare factorization at block=128 ------------------------------
    for dname, eng in (('fused', 'pallas_fused'), ('twoloop', 'pallas')):
        def step(c, X_, eng=eng):
            Xc = X_ + (1e-30 * jnp.sum(c)).astype(X_.dtype)
            L = batched_blocked_cholesky(cov(Xc), block=128, diag=eng)
            return c + 1e-6 * jnp.sum(L) * jnp.ones_like(c)
        run_leg('factor_b128_' + dname, step, chol_flops, consts=(X,))

    # ---- full pipeline -------------------------------------------------
    for dname, eng in (('fused', 'pallas_fused'), ('twoloop', 'pallas')):
        def step(c, X_, y_, eng=eng):
            Xc = X_ + (1e-30 * jnp.sum(c)).astype(X_.dtype)
            out = batched_chol_logpdf(Xc, y_, 0.25, 1.0, 1e-2,
                                      method='blocked', diag=eng)
            return c + 1e-6 * jnp.sum(out) * jnp.ones_like(c)
        run_leg('pipe_b128_' + dname, step, pipe_flops, consts=(X, y))

    # ---- correctness ---------------------------------------------------
    if leg('correct'):
        try:
            L1, M1 = chol_inv_block(K1, fuse_panel=False)
            L2, M2 = chol_inv_block(K1, fuse_panel=True)
            L1, M1, L2, M2 = map(np.asarray, (L1, M1, L2, M2))
            a = np.asarray(batched_chol_logpdf(X, y, 0.25, 1.0, 1e-2,
                                               method='blocked',
                                               diag='pallas'))
            b = np.asarray(batched_chol_logpdf(X, y, 0.25, 1.0, 1e-2,
                                               method='blocked',
                                               diag='pallas_fused'))
            emit('correct',
                 L_maxabs=float(np.abs(L1 - L2).max()),
                 M_maxabs=float(np.abs(M1 - M2).max()),
                 logpdf_relerr=float(np.max(np.abs(a - b) / np.abs(a))))
        except Exception as e:
            emit('correct', error=type(e).__name__, msg=str(e)[:300])


if __name__ == '__main__':
    main()
