"""Critical-path decomposition of the blocked factorization at block=128.

Measures, at B=16 N=4096 f32 HIGHEST, the achievable device time of each
structural component of the left-looking factorization SEPARATED from the
algorithm's data dependencies:

  - gemm_skeleton: the exact history-GEMM shape sequence
    (B, N-s, s) @ (B, s, 128) for s = 128k, k=1..31 — the N^3/3 MXU
    content at its real (shape-dependent) rate, not the square-GEMM
    ceiling
  - trsm_skeleton: the 31 panel GEMMs (B, N-s-128, 128) @ (B, 128, 128)
    (the k = 31 term has no rows below the diagonal block and is skipped)
  - diag32: 32 chained diagonal factor+inverse launches at (16, 128, 128)
  - store_skeleton: 32 dynamic_update_slice column-stripe writes into an
    HBM-resident (B, N, N) buffer
  - cov build, solve+logdet (from the pipe decomposition)

The sum is the no-dependency floor of the 27.7 ms pipeline; the gap
between the sum and the measured pipeline is scheduling/dependency cost.
Published in docs/perf.md as the round-4 bound argument.

Run: python benchmarks/skeleton_tpu.py [legs...]
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

    _HI = jax.lax.Precision.HIGHEST
    B, N, blk = 16, 4096, 128
    nb = N // blk
    rng = np.random.RandomState(0)
    Lbuf = jnp.asarray(rng.randn(B, N, N).astype(np.float32))

    # ---- history-GEMM shape sequence ----------------------------------
    gemm_flops = float(sum(2.0 * B * (N - k * blk) * (k * blk) * blk
                           for k in range(1, nb)))

    def gemm_skel(c, L):
        # NOTE the square-before-reduce: consuming out[:, :8, :8] (the
        # first version) lets XLA's algebraic simplifier rewrite
        # slice(dot) -> dot(slices) and DCE ~all of the GEMM — measured
        # 99.8 TF/s, 3.3x ABOVE the 6-pass ceiling, i.e. not a GEMM
        # measurement at all.  sum(out*out) has no such rewrite.
        Lc = L + (1e-30 * jnp.sum(c)).astype(L.dtype)
        acc = jnp.zeros((), jnp.float32)
        for k in range(1, nb):
            s = k * blk
            hist = jax.lax.dynamic_slice(
                Lc, (0, N - (N - s), 0), (B, N - s, s))   # rows s:, cols :s
            panl = jax.lax.dynamic_slice(Lc, (0, 0, 0), (B, s, blk))
            out = jnp.matmul(hist, panl, precision=_HI)
            acc = acc + jnp.sum(out * out)
        return c + 1e-6 * acc * jnp.ones_like(c)

    run_leg('gemm_skeleton', gemm_skel, gemm_flops, consts=(Lbuf,))

    # ---- panel-TRSM GEMMs ----------------------------------------------
    trsm_flops = float(sum(2.0 * B * (N - (k + 1) * blk) * blk * blk
                           for k in range(nb)))

    def trsm_skel(c, L):
        # square-before-reduce: see gemm_skel
        Lc = L + (1e-30 * jnp.sum(c)).astype(L.dtype)
        Minv = Lc[:, :blk, :blk]
        acc = jnp.zeros((), jnp.float32)
        for k in range(nb):
            s = (k + 1) * blk
            if s >= N:
                continue
            below = jax.lax.dynamic_slice(Lc, (0, 0, 0), (B, N - s, blk))
            out = jnp.matmul(below, Minv, precision=_HI)
            acc = acc + jnp.sum(out * out)
        return c + 1e-6 * acc * jnp.ones_like(c)

    run_leg('trsm_skeleton', trsm_skel, trsm_flops, consts=(Lbuf,))

    # ---- 32 chained diagonal launches ----------------------------------
    from gsum_tpu.ops.pallas_chol import chol_inv_block

    A1 = rng.randn(16, blk, blk).astype(np.float32)
    K1 = jnp.asarray(np.einsum('bij,bkj->bik', A1, A1)
                     + blk * np.eye(blk, dtype=np.float32))

    def diag32(c, K_):
        Kc = K_ + (1e-30 * jnp.sum(c)).astype(K_.dtype)
        out = Kc
        for _ in range(nb):
            L, M = chol_inv_block(out)
            out = out + 1e-12 * (L + M)
        return c + 1e-6 * jnp.sum(out) * jnp.ones_like(c)

    run_leg('diag32', diag32, 1.0, iters=2, consts=(K1,))

    # ---- 32 column-stripe stores into the HBM L buffer ------------------
    def store_skel(c, L):
        Lc = L * (1.0 + (1e-30 * jnp.sum(c)).astype(L.dtype))
        pan = Lc[:, :, :blk] * 1.0000001
        for k in range(nb):
            s = k * blk
            Lc = jax.lax.dynamic_update_slice(
                Lc, pan[:, :, :blk], (0, 0, s))
        return c + 1e-6 * jnp.sum(Lc[:, :1, :1]) * jnp.ones_like(c)

    run_leg('store_skeleton', store_skel, 1.0, iters=2, consts=(Lbuf,))

    # ---- cov build alone -------------------------------------------------
    from gsum_tpu.ops.batched import rbf_covariance

    X = jnp.asarray(rng.rand(B, N, 2), dtype=jnp.float32)

    def cov_leg(c, X_):
        Xc = X_ + (1e-30 * jnp.sum(c)).astype(X_.dtype)
        K = jax.vmap(rbf_covariance)(
            Xc, jnp.full((B,), 0.25, jnp.float32),
            jnp.ones((B,), jnp.float32), jnp.full((B,), 1e-2, jnp.float32))
        return c + 1e-6 * jnp.sum(K[:, :1, :1]) * jnp.ones_like(c)

    run_leg('cov_build', cov_leg, B * (2.0 * N * N * 2 + 6.0 * N * N),
            consts=(X,))


if __name__ == '__main__':
    main()
