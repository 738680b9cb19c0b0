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

    for G, N in [(1024, 128), (1024, 256), (256, 512)]:
        X = jnp.asarray(rng.rand(N, 1), dtype=jnp.float64)
        y = jnp.asarray(rng.randn(N, m), dtype=jnp.float64)
        basis = jnp.ones((N, 1), dtype=jnp.float64)
        thetas = jnp.asarray(np.log(np.linspace(0.2, 1.5, G))[:, None])
        frozen = kernel.clone()
        nugget = 1e-8

        # ---- explicit-batch engine (ops.gridlml) -----------------------
        def grid_step(c, ths, Xc, yc, bc):
            Rs = jax.vmap(lambda th: frozen.value_fn(th, Xc, None))(
                ths + 1e-12 * jnp.sum(c))
            Rs = Rs + nugget * jnp.eye(N, dtype=Rs.dtype)
            Rs = jax.lax.optimization_barrier(Rs)
            out = cgp_lml_grid(Rs, yc, bc, np.zeros(1), np.zeros((1, 1)),
                               3.0, 1.0)
            return c + 1e-9 * jnp.sum(out) * jnp.ones_like(c)

        c0 = jnp.zeros((1, 1), dtype=jnp.float64)
        gf, dt = timed_loop(grid_step, c0, G * flops_per_eval(N, m),
                            iters=4, consts=(thetas, X, y, basis))
        results['gridlml_batched_G%d_N%d_us_per_eval' % (G, N)] = \
            round(dt / G * 1e6, 2)
        results['gridlml_batched_G%d_N%d_gflops' % (G, N)] = round(gf, 1)

        # ---- vmapped scalar path (XLA batched Cholesky) ----------------
        lml = make_lml_fn(kernel, center=0, disp=0, df=3, scale=1,
                          nugget=nugget)

        def vmap_step(c, ths, Xc, yc, bc):
            out = jax.vmap(lambda th: lml(th, Xc, yc, bc))(
                ths + 1e-12 * jnp.sum(c))
            return c + 1e-9 * jnp.sum(out) * jnp.ones_like(c)

        gf2, dt2 = timed_loop(vmap_step, c0, G * flops_per_eval(N, m),
                              iters=4, consts=(thetas, X, y, basis))
        results['gridlml_vmap_G%d_N%d_us_per_eval' % (G, N)] = \
            round(dt2 / G * 1e6, 2)
        results['gridlml_speedup_G%d_N%d' % (G, N)] = round(dt2 / dt, 1)

    print(json.dumps(results, indent=1))


if __name__ == '__main__':
    main()
