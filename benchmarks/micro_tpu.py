"""Microbenchmarks of the blocked-Cholesky building blocks on the real TPU.

Measures the attainable rates that bound the headline pipeline
(covariance build + Cholesky + solve + logdet, BASELINE.md):

- batched GEMM at each MXU precision (the trailing-update ceiling)
- XLA's native batched Cholesky (the round-1 baseline)
- the batch-vectorized small Cholesky / triangular inverse used for the
  diagonal blocks of the blocked factorization

Methodology notes (both matter on this box):
- ``block_until_ready`` does not synchronize on the tunneled TPU; a host
  fetch does.  Every measurement times `iters` *data-dependent* iterations
  inside one jitted call (a fori_loop whose carry consumes the full result
  of each step) and ends with a single scalar fetch, so per-call launch
  latency amortizes away and XLA cannot dead-code-eliminate any part of
  the op under test (summing a slice of a dot lets XLA narrow the dot).

Run: python benchmarks/micro_tpu.py  (~3-6 min cold cache)
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timed_loop(step, x0, flops_per_iter, iters=8, repeats=3, consts=()):
    """Times `iters` dependent applications of step inside one jit call.

    ``consts`` are extra device arrays passed as jit arguments (closure
    capture would embed them as HLO literals, which the remote compile
    service rejects for large operands).

    The tunneled TPU runtime has a ~25-30 ms fixed round-trip per host
    fetch; it is measured with a do-nothing jitted call on the same
    operands and subtracted, so the result reflects device time only.
    """
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(x, *cs):
        x = jax.lax.fori_loop(0, iters, lambda i, v: step(v, *cs), x)
        return jnp.sum(x[..., :1, :1])

    @jax.jit
    def floor_run(x, *cs):
        return jnp.sum(x[..., :1, :1])

    s = float(np.asarray(run(x0, *consts)))   # compile + warmup
    assert np.isfinite(s), 'non-finite output'
    float(np.asarray(floor_run(x0, *consts)))

    floors = []
    for _ in range(repeats + 2):
        t0 = time.perf_counter()
        float(np.asarray(floor_run(x0, *consts)))
        floors.append(time.perf_counter() - t0)
    floor = min(floors)

    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        float(np.asarray(run(x0, *consts)))
        times.append(time.perf_counter() - t0)
    dt = max(min(times) - floor, 1e-9) / iters
    return flops_per_iter / dt / 1e9, dt


def main():
    import jax
    import jax.numpy as jnp

    from gsum_tpu.ops.smallchol import _cholesky_raw, _tri_inv_raw

    rng = np.random.RandomState(0)
    results = {}

    # ---- batched GEMM rate per precision --------------------------------
    B, N = 16, 2048
    A0 = jnp.asarray(rng.rand(B, N, N) / N, dtype=jnp.float32)
    Bm = jnp.asarray(rng.rand(B, N, N) / N, dtype=jnp.float32)
    for name, prec in [('default', None),
                       ('high', jax.lax.Precision.HIGH),
                       ('highest', jax.lax.Precision.HIGHEST)]:
        def gemm_step(x, b, p=prec):
            # consume the full product in the carry: no narrowing possible
            return 0.5 * x + jnp.matmul(x, b, precision=p)
        gf, dt = timed_loop(gemm_step, A0, 2.0 * B * N ** 3, consts=(Bm,))
        results['gemm_f32_%s_B%d_N%d' % (name, B, N)] = round(gf, 1)

    def gemm_bf16_step(x, b):
        y = jnp.matmul(x.astype(jnp.bfloat16), b.astype(jnp.bfloat16),
                       preferred_element_type=jnp.float32)
        return 0.5 * x + y
    gf, dt = timed_loop(gemm_bf16_step, A0, 2.0 * B * N ** 3, consts=(Bm,))
    results['gemm_bf16_B%d_N%d' % (B, N)] = round(gf, 1)

    # ---- SPD test matrices -----------------------------------------------
    def make_spd(B, N):
        X = rng.rand(B, N, 2).astype(np.float32)
        Xs = X / 0.25
        sq = np.sum(Xs * Xs, axis=-1)
        K = np.exp(-0.5 * np.maximum(
            sq[:, :, None] + sq[:, None, :]
            - 2.0 * np.einsum('bnd,bmd->bnm', Xs, Xs), 0.0))
        K[:, np.arange(N), np.arange(N)] += 1e-2
        return K

    # ---- XLA native batched Cholesky at the headline size ---------------
    B, N = 16, 4096
    K = make_spd(B, N)
    Kd = jnp.asarray(K, dtype=jnp.float32)

    def chol_step(x):
        L = jnp.linalg.cholesky(x)
        # feed the full factor back into the carry (keeps K SPD: K diag
        # grows negligibly, and the factorization cannot be elided)
        return x + 1e-6 * jnp.tril(L)
    gf, dt = timed_loop(chol_step, Kd, B * N ** 3 / 3.0, iters=4)
    results['xla_cholesky_B%d_N%d' % (B, N)] = round(gf, 1)
    results['xla_cholesky_B%d_N%d_ms' % (B, N)] = round(dt * 1e3, 2)

    # ---- diagonal-block candidates at blocked-factorization sizes -------
    for nb in (128, 256, 512):
        Kb = jnp.asarray(make_spd(B, nb), dtype=jnp.float32)

        def xla_step(x):
            return x + 1e-6 * jnp.tril(jnp.linalg.cholesky(x))
        gf, dt = timed_loop(xla_step, Kb, B * nb ** 3 / 3.0, iters=16)
        results['xla_cholesky_B%d_N%d_us' % (B, nb)] = round(dt * 1e6, 1)

        for leaf in (32, 64):
            def sc_step(x, lf=leaf):
                return x + 1e-6 * jnp.tril(_cholesky_raw(x, lf))
            gf, dt = timed_loop(sc_step, Kb, B * nb ** 3 / 3.0, iters=16)
            results['smallchol_leaf%d_B%d_N%d_us' % (leaf, B, nb)] = \
                round(dt * 1e6, 1)

            L0 = jnp.linalg.cholesky(Kb)

            def ti_step(x, lf=leaf):
                return x + 1e-6 * jnp.tril(_tri_inv_raw(x, lf))
            gf, dt = timed_loop(ti_step, L0, B * nb ** 3 / 3.0, iters=16)
            results['triinv_leaf%d_B%d_N%d_us' % (leaf, B, nb)] = \
                round(dt * 1e6, 1)

    print(json.dumps(results, indent=1))


if __name__ == '__main__':
    main()
