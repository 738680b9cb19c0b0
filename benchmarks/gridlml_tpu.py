"""Small-N hyperparameter-grid lml throughput on the real TPU.

Quantifies the claims behind ``ops.smallchol`` / ``ops.gridlml``: XLA's
batched Cholesky/TRSM at small N (<= 512) is latency-bound far below its
large-N rate, so the explicitly-batched grid evaluator (one recursion over
batch-leading arrays, GEMM-dominated) wins by a large factor.  This is the
reference's (Q, ls) posterior-surface workload (8000 lml evaluations,
correlated_EFT_publication.ipynb cell 53) at production grid sizes.

Measures, per grid size:
  - cgp_lml_grid (explicit-batch engine, `small=True` path of
    parallel.batched_lml_grid): us/eval
  - the vmapped scalar-lml path (jnp.linalg.cholesky under vmap,
    the `small=False` fallback): us/eval
  - their ratio

Methodology as benchmarks/micro_tpu.py: dependent iterations inside one
jitted call, single scalar fetch, measured host-fetch floor subtracted.

Run: python benchmarks/gridlml_tpu.py   (~2-5 min cold cache)
"""
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from micro_tpu import timed_loop  # noqa: E402


def flops_per_eval(N, m, p=1, d=1):
    """cov build + Cholesky + (m+p) triangular-solve pairs."""
    return 2.0 * N * N * d + 6.0 * N * N + N ** 3 / 3.0 \
        + 2.0 * N * N * (m + p)


def main():
    import jax
    import jax.numpy as jnp

    from gsum_tpu.kernels import RBF
    from gsum_tpu.ops.gridlml import cgp_lml_grid
    from gsum_tpu.parallel import make_lml_fn

    rng = np.random.RandomState(0)
    results = {}
    kernel = RBF(0.5)
    m = 5  # EFT-order curves

    import itertools

    # the vmapped comparator runs at a smaller G with fewer dependent
    # iterations: the tunneled worker kills single executions that run
    # too long, and the vmapped path is exactly the slow one under test.
    # N=512 is omitted: the batched engine's unrolled recursion generates
    # HLO large enough that the remote compile helper is OOM-killed
    # (SIGKILL at G>=128); the production path (parallel.batched_lml_grid)
    # switches engines at N>256 accordingly.
    sizes = [(1024, 128, 128), (1024, 256, 128)]
    for dt, (G, N, Gv) in itertools.product(['f64', 'f32'], sizes):
        jdt = jnp.float64 if dt == 'f64' else jnp.float32
        X = jnp.asarray(rng.rand(N, 1), dtype=jdt)
        y = jnp.asarray(rng.randn(N, m), dtype=jdt)
        basis = jnp.ones((N, 1), dtype=jdt)
        thetas = jnp.asarray(np.log(np.linspace(0.2, 1.5, G))[:, None],
                             dtype=jdt)
        frozen = kernel.clone()
        nugget = 1e-8 if dt == 'f64' else 1e-5

        # ---- explicit-batch engine (ops.gridlml) -----------------------
        def grid_step(c, ths, Xc, yc, bc):
            Rs = jax.vmap(lambda th: frozen.value_fn(th, Xc, None))(
                ths + 1e-12 * jnp.sum(c))
            Rs = Rs + nugget * jnp.eye(N, dtype=Rs.dtype)
            Rs = jax.lax.optimization_barrier(Rs)
            out = cgp_lml_grid(Rs, yc, bc, np.zeros(1), np.zeros((1, 1)),
                               3.0, 1.0)
            # failed f32 factorizations yield -inf by design; keep the
            # timing carry finite without eliding the factorization work
            out = jnp.where(jnp.isfinite(out), out, 0.0)
            return c + (1e-9 * jnp.sum(out)).astype(c.dtype) * jnp.ones_like(c)

        c0 = jnp.zeros((1, 1), dtype=jdt)
        gf, dtm = timed_loop(grid_step, c0, G * flops_per_eval(N, m),
                             iters=4, consts=(thetas, X, y, basis))
        us_batched = dtm / G * 1e6
        results['gridlml_batched_%s_G%d_N%d_us_per_eval' % (dt, G, N)] = \
            round(us_batched, 2)
        results['gridlml_batched_%s_G%d_N%d_gflops' % (dt, G, N)] = \
            round(gf, 1)
        print(json.dumps(results), flush=True)  # survive worker crashes

        # ---- vmapped scalar path (XLA batched Cholesky) ----------------
        lml = make_lml_fn(kernel, center=0, disp=0, df=3, scale=1,
                          nugget=nugget)
        thetas_v = thetas[:Gv]

        def vmap_step(c, ths, Xc, yc, bc):
            out = jax.vmap(lambda th: lml(th, Xc, yc, bc))(
                ths + 1e-12 * jnp.sum(c))
            out = jnp.where(jnp.isfinite(out), out, 0.0)
            return c + (1e-9 * jnp.sum(out)).astype(c.dtype) * jnp.ones_like(c)

        gf2, dt2 = timed_loop(vmap_step, c0, Gv * flops_per_eval(N, m),
                              iters=2, consts=(thetas_v, X, y, basis))
        us_vmap = dt2 / Gv * 1e6
        results['gridlml_vmap_%s_G%d_N%d_us_per_eval' % (dt, Gv, N)] = \
            round(us_vmap, 2)
        results['gridlml_speedup_%s_N%d' % (dt, N)] = \
            round(us_vmap / us_batched, 1)
        print(json.dumps(results), flush=True)

    print(json.dumps(results, indent=1))


if __name__ == '__main__':
    main()
