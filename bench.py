"""Benchmark: batched covariance-build + Cholesky + MVN-logpdf throughput.

The headline metric from BASELINE.md: batched N=4096 Cholesky + MVN-logpdf
GFLOP/s on TPU.  The baseline is the same workload executed the way the
reference library executes it — float64 NumPy/SciPy on LAPACK, one matrix
at a time (reference: gsum/models.py:957-1039 per-lml pipeline) — so
``vs_baseline`` is the end-to-end speedup of this library's TPU path over
the reference's compute stack.

Engine: the GEMM-dominated blocked factorization (gsum_tpu.ops.blockchol —
left-looking column blocks, Pallas diagonal-block kernel, inverse-based
TRSMs) at full-f32 MXU precision — ~12% over XLA's native batched
Cholesky at equal accuracy; see docs/perf.md for the roofline breakdown.

Methodology: the tunneled TPU here does not synchronize on
block_until_ready and has a ~25-30 ms host-fetch round trip, so the
pipeline is timed as `iters` executions inside ONE jitted call, ended by
a single scalar fetch, with the measured fetch floor subtracted.  Each
iteration's input consumes the previous carry — without that data edge
XLA hoists the loop-invariant body and one execution is counted as
`iters` (the bug behind an earlier 4x-inflated figure; docs/perf.md).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
import json
import os
import sys
import time

import numpy as np

os.environ.setdefault("GSUM_TPU_NO_X64", "")  # x64 on, but arrays are f32


def flops_chol_logpdf(B, N, d, m):
    """FLOP count for covariance build + Cholesky + triangular solve + logdet."""
    cov = B * (2.0 * N * N * d + 6.0 * N * N)   # sqdist matmul + elementwise+exp
    chol = B * (N ** 3) / 3.0
    solve = B * (2.0 * N * N * m)               # one triangular solve pair
    return cov + chol + solve


def _timed_carry_loop(step, consts, iters=4, repeats=3):
    """Seconds per iteration of `iters` carry-dependent applications of
    ``step`` inside one jitted call, with the host-fetch floor subtracted
    (see module docstring for why both matter on this box)."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(c, *cs):
        return jnp.sum(jax.lax.fori_loop(
            0, iters, lambda i, c: step(c, *cs), c)[:1, :1])

    @jax.jit
    def floor_run(c, *cs):
        return jnp.sum(c[:1, :1])

    c0 = jnp.zeros((8, 8), dtype=jnp.float32)
    s = float(np.asarray(run(c0, *consts)))       # compile + warmup
    assert np.isfinite(s), 'non-finite benchmark output'
    float(np.asarray(floor_run(c0, *consts)))

    floors = []
    for _ in range(repeats + 2):
        t0 = time.perf_counter()
        float(np.asarray(floor_run(c0, *consts)))
        floors.append(time.perf_counter() - t0)
    floor = min(floors)

    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        float(np.asarray(run(c0, *consts)))
        times.append(time.perf_counter() - t0)
    return max(min(times) - floor, 1e-9) / iters


def bench_tpu(B, N, d, m, iters=4, repeats=3, method='blocked', **kw):
    import jax.numpy as jnp

    from gsum_tpu.ops import batched_chol_logpdf

    rng = np.random.RandomState(0)
    X = jnp.asarray(rng.rand(B, N, d), dtype=jnp.float32)
    y = jnp.asarray(rng.randn(B, N, m), dtype=jnp.float32)

    def step(c, X_, y_):
        # carry -> input data edge: an invariant body could legally
        # be hoisted out of the fori_loop, timing 1 execution as
        # `iters` (the perturbation is exactly 0 in f32 arithmetic)
        Xc = X_ + (1e-30 * jnp.sum(c)).astype(X_.dtype)
        out = batched_chol_logpdf(Xc, y_, 0.25, 1.0, 1e-2, method=method,
                                  **kw)
        return c + 1e-6 * jnp.sum(out) * jnp.ones_like(c)

    dt = _timed_carry_loop(step, (X, y), iters, repeats)
    return flops_chol_logpdf(B, N, d, m) / dt / 1e9, dt


def bench_grid_lml(N=256, G=512, dtype='float32', iters=4):
    """Steady-state µs per lml evaluation of the hyperparameter-grid
    engine (docs/perf.md small-N table, driver-guarded)."""
    import jax.numpy as jnp

    from gsum_tpu.kernels import RBF
    from gsum_tpu.ops.gridlml import cgp_lml_grid

    dt_ = jnp.float64 if dtype == 'float64' else jnp.float32
    rng = np.random.RandomState(2)
    X = jnp.asarray(np.linspace(0, 1, N)[:, None], dtype=dt_)
    y = jnp.asarray(rng.randn(N, 1), dtype=dt_)
    kernel = RBF(0.3, (1e-2, 1e2))
    frozen = kernel.clone()
    thetas = jnp.asarray(np.linspace(-2, 0.5, G)[:, None], dtype=dt_)
    basis = jnp.ones((N, 1), dtype=dt_)
    c0 = np.atleast_1d(0.0)
    V0 = np.atleast_2d(0.0)
    import jax

    def step(c, ths, X_, y_):
        ths = ths + (1e-30 * jnp.sum(c)).astype(ths.dtype)
        Rs = jax.vmap(lambda th: frozen.value_fn(th, X_, None))(ths)
        Rs = Rs + 1e-4 * jnp.eye(N, dtype=Rs.dtype)
        Rs = jax.lax.optimization_barrier(Rs)
        out = cgp_lml_grid(Rs, y_, basis, c0, V0, 3.0, 1.0)
        # grid points that fail to factorize yield -inf by convention;
        # keep the timing carry finite
        s = jnp.sum(jnp.where(jnp.isfinite(out), out, 0.0))
        return c + 1e-6 * s.astype(jnp.float32) * jnp.ones_like(c)

    dt = _timed_carry_loop(step, (thetas, X, y), iters=iters)
    return dt / G * 1e6  # µs per evaluation


def bench_16k(iters=2):
    """Single-matrix N=16,384 cov build + Cholesky, ms.

    Engine: XLA native — at B=1 this size is not latency-bound and XLA's
    factorization measures 75.7 ms / 19.4 TF/s on this chip, while the
    blocked drivers' unrolled HLO (and, so far, the fused Pallas kernel)
    exceed the remote compile service's limits (docs/perf.md).
    """
    import jax
    import jax.numpy as jnp

    from gsum_tpu.ops.batched import rbf_covariance

    N16, d = 16384, 2
    rng = np.random.RandomState(3)
    X16 = jnp.asarray(rng.rand(1, N16, d), dtype=jnp.float32)

    def step(c, X_):
        Xc = X_ + (1e-30 * jnp.sum(c)).astype(X_.dtype)
        K = jax.vmap(rbf_covariance)(
            Xc, jnp.full((1,), 0.25, jnp.float32),
            jnp.ones((1,), jnp.float32), jnp.full((1,), 1e-2, jnp.float32))
        L = jnp.linalg.cholesky(K)
        return c + 1e-6 * jnp.sum(L) * jnp.ones_like(c)

    return _timed_carry_loop(step, (X16,), iters=iters) * 1e3


def bench_parity():
    """On-device f64 parity vs frozen reference outputs (BASELINE north
    star: rtol 1e-8).  Replays the pinned-theta pointwise-recap +
    TruncationGP-band flow (benchmarks/parity_flow.py) through gsum_tpu on
    whatever backend this process runs (the real TPU under the driver) and
    returns the max norm-relative deviation from the values frozen off the
    reference library (benchmarks/freeze_parity.py)."""
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                    'benchmarks'))
    from parity_flow import FROZEN, max_rel, run_flow

    import gsum_tpu as gm

    rec = np.load(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               'benchmarks', FROZEN))
    got = run_flow(gm, gm, rec['X'], rec['y'], rec['orders'], rec['Q'],
                   rec['ref_scale'])
    frozen = {k[4:]: rec[k] for k in rec.files if k.startswith('out_')}
    worst, per = max_rel(got, frozen)
    return worst


# Frozen baseline denominator for ``vs_baseline`` (VERDICT r4 #7): the
# reference-stack throughput re-measured per round on this shared 1-core
# host swung 3x round to round (vs_baseline 347 -> 352 -> 615 -> 1923 at
# a flat library number), carrying load noise, not signal.  Frozen
# 2026-08-21 as the median of 7 runs of bench_reference_stack(4096, 2, 8)
# on an idle host (runs: 4.0 cache-cold, then 8.4-11.5; median 9.93).
# The live number is still measured each round and reported as
# extra.baseline_live_gflops for drift visibility.
_FROZEN_BASELINE_GFLOPS = 9.93


def bench_reference_stack(N, d, m, repeats=2, n_mats=2):
    """The reference's execution model: sequential f64 LAPACK calls."""
    import scipy.linalg as sla

    rng = np.random.RandomState(1)
    X = rng.rand(n_mats, N, d)
    y = rng.randn(n_mats, N, m)

    def one(Xi, yi):
        Xs = Xi / 0.25
        sq = np.sum(Xs * Xs, axis=-1)
        d2 = sq[:, None] + sq[None, :] - 2.0 * Xs @ Xs.T
        K = np.exp(-0.5 * np.maximum(d2, 0.0))
        K[np.diag_indices_from(K)] += 1e-2
        L = np.linalg.cholesky(K)
        w = sla.solve_triangular(L, yi, lower=True)
        maha = np.sum(w * w, axis=0)
        logdet = 2.0 * np.sum(np.log(np.diag(L)))
        return -0.5 * (maha + logdet + N * np.log(2 * np.pi))

    # warmup
    one(X[0], y[0])
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        for i in range(n_mats):
            one(X[i], y[i])
        times.append(time.perf_counter() - t0)
    dt = min(times) / n_mats  # per matrix
    return flops_chol_logpdf(1, N, d, m) / dt / 1e9


def _stage(name):
    """Stage progress on stderr: the remote compile service can take
    minutes per fresh program, and without this a slow run is opaque
    (the JSON line only appears at the very end)."""
    print('[bench %s] %s' % (time.strftime('%H:%M:%S'), name),
          file=sys.stderr, flush=True)


def main():
    B, N, d, m = 16, 4096, 2, 8
    small = bool(os.environ.get('GSUM_BENCH_SMALL'))
    if small:
        B, N = 4, 1024

    # one bounded retry on the headline leg: the tunneled TPU worker
    # occasionally drops a single execution (observed crashes/hangs on
    # this box), and a transient failure here would cost the whole
    # benchmark record
    _stage('headline blocked pipeline')
    try:
        gflops, dt_blocked = bench_tpu(B, N, d, m, method='blocked')
    except Exception:
        time.sleep(10)
        gflops, dt_blocked = bench_tpu(B, N, d, m, method='blocked')
    # vs_baseline uses the FROZEN denominator (see _FROZEN_BASELINE_GFLOPS);
    # the live re-measurement is reported for drift visibility only.
    base_gflops = _FROZEN_BASELINE_GFLOPS if not small \
        else bench_reference_stack(N, d, m)

    # driver-visible regression guards for the rest of the perf story
    # (r2 verdict #6); each uses the same carry-dependent methodology
    extra = {'headline_ms': round(dt_blocked * 1e3, 2)}
    if not small:
        try:
            _stage('baseline live reference stack')
            extra['baseline_live_gflops'] = round(
                bench_reference_stack(N, d, m), 2)
        except Exception as e:
            extra['baseline_live_error'] = type(e).__name__
    try:
        _stage('xla comparison pipeline')
        gflops_xla, _ = bench_tpu(B, N, d, m, method='xla')
        extra['blocked_vs_xla'] = round(gflops / gflops_xla, 3)
    except Exception as e:
        extra['blocked_vs_xla_error'] = type(e).__name__
    try:
        # the documented bf16x3 optimizer-objective opt-in
        # (docs/perf.md round 3: ~1e-3 relative lml error)
        import jax as _jax

        _stage('bf16x3 HIGH pipeline')
        gflops_high, dt_high = bench_tpu(
            B, N, d, m, method='blocked',
            precision=_jax.lax.Precision.HIGH)
        extra['high_mxu_ms'] = round(dt_high * 1e3, 2)
    except Exception as e:
        extra['high_mxu_error'] = type(e).__name__
    try:
        _stage('grid lml f32')
        extra['grid_lml_N256_f32_us'] = round(bench_grid_lml(256, 512,
                                                             'float32'), 2)
        _stage('grid lml f64')
        extra['grid_lml_N256_f64_us'] = round(bench_grid_lml(256, 128,
                                                             'float64'), 1)
    except Exception as e:
        extra['grid_lml_error'] = type(e).__name__
    if not small:
        try:
            _stage('n16k factorization')
            extra['n16k_chol_ms'] = round(bench_16k(), 1)
        except Exception as e:
            extra['n16k_error'] = type(e).__name__
    try:
        # f64 parity vs frozen reference outputs, measured ON THE CHIP
        # each round (north star: <= 1e-8)
        _stage('f64 parity flow')
        extra['parity_max_rel'] = float('%.3g' % bench_parity())
    except Exception as e:
        extra['parity_error'] = type(e).__name__

    print(json.dumps({
        'metric': 'batched_cov_chol_logpdf_N%d_B%d' % (N, B),
        'value': round(gflops, 2),
        'unit': 'GFLOP/s',
        'vs_baseline': round(gflops / base_gflops, 2),
        'extra': extra,
    }))


if __name__ == '__main__':
    main()
