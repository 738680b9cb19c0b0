"""Scale proof for BASELINE config 5 on the real TPU.

BASELINE.json configs[4]: "Batched large-scale: vmapped 10k observables x
N=4096 grids, 2D kernels, blocked Cholesky + hyperparameter-grid logpdf
sweep".  This script measures each leg at production scale:

  1. batched MAP fit of 10,240 independent observables at N=128
     (chunked lockstep L-BFGS on the explicitly-batched grid engine;
     chunking respects the tunneled worker's single-execution limit.
     Auto routing: fits use 'grid' for N <= 192, 'scan' to N <= 640,
     the vmapped scalar engine to N <= 1024, 'blocked' to N <= 2048,
     scalar above — see parallel.batched_fit and
     benchmarks/fit_engines_tpu.py for the measurements)
  2. hyperparameter-grid logpdf sweep: 10,240 lml evaluations at N=512
     with a 2D kernel (scan engine, ops.scanchol: O(1) compile size;
     6.1 ms/eval steady-state, 8.8x the vmapped scalar path)
  3. batched MAP fit at N=4096 (B=8, vmapped scalar engine)
  4. one N=16,384 covariance-build + Cholesky + MVN-lml — the
     single-chip large-N latency point.  XLA's native Cholesky: at B=1
     it is not latency-bound, and the blocked driver's 64-step unrolled
     HLO OOM-kills the compile service at this N (the blocked engine is
     the batched-N=4096 winner, not the single-16k one).  The
     model-parallel sharded path for this regime is exercised on the CPU
     mesh in tests/test_parallel.py and __graft_entry__.dryrun_multichip

Wall-clock here is end-to-end (host dispatch + device + first-call
compile where noted), NOT floor-corrected: at these problem sizes the
~25-30 ms tunnel round trip is negligible and users experience the full
latency anyway.

Env: GSUM_SCALE_SMALL=1 -> tiny CPU smoke shapes;
     GSUM_SCALE_LEGS=234 -> run only those legs (re-run economy);
     leg "m" = the mixed-precision rerun of leg 1 (round 4).

Run: python benchmarks/scale_tpu.py   (~30-50 min cold cache)
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    import gsum_tpu  # noqa: F401 (x64 + compile cache)
    from gsum_tpu.kernels import RBF
    from gsum_tpu.ops.batched import rbf_covariance
    from gsum_tpu.parallel import batched_fit, batched_lml_grid

    rng = np.random.RandomState(0)
    results = {}
    small = bool(os.environ.get('GSUM_SCALE_SMALL'))  # CPU smoke mode
    legs = os.environ.get('GSUM_SCALE_LEGS', '1234')

    # ---- 1. 10k-observable batched MAP fit at N=128 ---------------------
    if '1' in legs:
        B, N = (64, 32) if small else (10240, 128)
        X = np.linspace(0.0, 1.0, N)[:, None]
        y_batch = (np.sin(3.0 * X.T + rng.rand(B, 1) * 6.28)
                   + 0.1 * rng.randn(B, N)).astype(np.float64)
        kernel = RBF(0.5, (1e-2, 1e2))

        t0 = time.time()
        # chunk=128: one chunk's lockstep L-BFGS (linesearch-widened to
        # ls_steps x chunk matrices per iteration) must stay under the
        # tunneled worker's single-execution limit
        post = batched_fit(kernel, X, y_batch, df=3, scale=1, maxiter=12,
                           chunk=128)
        lml = np.asarray(post.lml)  # host fetch = sync
        dt = time.time() - t0
        assert np.isfinite(lml).all()
        results['batched_fit_B10240_N128_s'] = round(dt, 1)
        results['batched_fit_B10240_N128_fits_per_s'] = round(B / dt, 1)
        print(json.dumps(results), flush=True)

    # ---- 1m. the same 10k-fit sweep under precision='mixed' -------------
    # (round 4): the f32 lockstep sweep (~30x cheaper per multiply than
    # emulated f64) followed by a per-fit f64 L-BFGS polish — the
    # library's own recipe for exactly this workload.  Reports fits/s
    # plus the achieved-lml agreement with the full-f64 engine on the
    # first chunk (the lml at the MAP is the quantity users consume; the
    # objective's flat top makes raw theta spread meaningless).
    if 'm' in legs:
        B, N = (64, 32) if small else (10240, 128)
        X = np.linspace(0.0, 1.0, N)[:, None]
        y_batch = (np.sin(3.0 * X.T + rng.rand(B, 1) * 6.28)
                   + 0.1 * rng.randn(B, N)).astype(np.float64)
        kernel = RBF(0.5, (1e-2, 1e2))

        t0 = time.time()
        post_m = batched_fit(kernel, X, y_batch, df=3, scale=1, maxiter=12,
                             chunk=128, precision='mixed')
        lml_m = np.asarray(post_m.lml)
        dt_m = time.time() - t0
        assert np.isfinite(lml_m).all()
        results['batched_fit_B10240_N128_mixed_s'] = round(dt_m, 1)
        results['batched_fit_B10240_N128_mixed_fits_per_s'] = \
            round(B / dt_m, 1)

        # full-f64 engine on the first chunk only (one compile + one
        # chunk execution: enough for the accuracy comparison without
        # paying the 1400 s full-f64 sweep again)
        Bc = min(128, B)
        post_64 = batched_fit(kernel, X, y_batch[:Bc], df=3, scale=1,
                              maxiter=12, chunk=128)
        lml_64 = np.asarray(post_64.lml)
        dlml = np.abs(lml_m[:Bc] - lml_64)
        results['mixed_vs_f64_lml_max_abs'] = float('%.3g' % dlml.max())
        results['mixed_vs_f64_lml_max_rel'] = float(
            '%.3g' % (dlml / np.abs(lml_64)).max())
        print(json.dumps(results), flush=True)

    # ---- 2. 10k-point hyperparameter-grid sweep at N=512, 2D kernel -----
    if '2' in legs:
        G, N2 = (128, 64) if small else (10240, 512)
        X2 = rng.rand(N2, 2)
        y2 = np.sin(4 * X2[:, 0]) * np.cos(3 * X2[:, 1]) \
            + 0.05 * rng.randn(N2)
        thetas = np.log(np.linspace(0.1, 2.0, G))[:, None]
        t0 = time.time()
        # sub-chunked so each device call stays under the worker's
        # execution limit; one compile serves all chunks
        outs = []
        step = 64 if small else 256
        for i in range(0, G, step):
            outs.append(np.asarray(batched_lml_grid(
                RBF(0.5), X2, y2, thetas[i:i + step], df=3, scale=1,
                nugget=1e-8)))
        lml_grid = np.concatenate(outs)
        dt = time.time() - t0
        assert np.isfinite(lml_grid).all()
        results['grid_lml_G10240_N512_2d_s'] = round(dt, 1)
        results['grid_lml_G10240_N512_2d_us_per_eval'] = \
            round(dt / G * 1e6, 1)
        print(json.dumps(results), flush=True)

    # ---- 3. batched MAP fit at N=4096 (f32) ------------------------------
    if '3' in legs:
        B3, N3 = (2, 128) if small else (8, 4096)
        X3 = np.linspace(0.0, 1.0, N3)[:, None].astype(np.float32)
        y3 = (np.sin(3.0 * X3.T + rng.rand(B3, 1) * 6.28)
              + 0.1 * rng.randn(B3, N3)).astype(np.float32)
        t0 = time.time()
        # f32 with a noise-scale nugget: a dense N=4096 RBF grid is far too
        # ill-conditioned for a tiny jitter at any precision, and the f64
        # path would run on the ~30x-slower emulated multiply; the lml
        # landscape is smooth and f32 suffices for MAP optimization
        # chunk=1, ls_steps=5: every linesearch trial's N=4096 covariance
        # + factorization is live at once — 10x2 trials needs ~32 GB HBM
        post3 = batched_fit(RBF(0.5, (1e-2, 1e2)), X3, y3, df=3, scale=1,
                            maxiter=6, chunk=1, nugget=1e-2, ls_steps=5)
        lml3 = np.asarray(post3.lml)
        dt = time.time() - t0
        assert np.isfinite(lml3).all()
        results['batched_fit_B8_N4096_f32_s'] = round(dt, 1)
        print(json.dumps(results), flush=True)

    # ---- 4. N=16k single-chip cov + blocked Cholesky + lml --------------
    if '4' in legs:
        N4 = 256 if small else 16384
        X4 = jnp.asarray(rng.rand(N4, 2), dtype=jnp.float32)
        y4 = jnp.asarray(rng.randn(N4, 1), dtype=jnp.float32)

        @jax.jit
        def big_lml(Xc, yc):
            K = rbf_covariance(Xc, 0.25, 1.0, 1e-2)
            L = jnp.linalg.cholesky(K)
            w = jax.lax.linalg.triangular_solve(L, yc, left_side=True,
                                                lower=True)
            logdet = 2.0 * jnp.sum(jnp.log(jnp.diagonal(L)))
            return -0.5 * (jnp.sum(w * w) + logdet
                           + N4 * np.log(2 * np.pi))

        v = float(np.asarray(big_lml(X4, y4)))  # compile + warmup
        assert np.isfinite(v)
        times = []
        for _ in range(3):
            t0 = time.time()
            float(np.asarray(big_lml(X4, y4)))
            times.append(time.time() - t0)
        dt = min(times)
        flops = 2.0 * N4 ** 2 * 2 + 6.0 * N4 ** 2 + N4 ** 3 / 3.0 \
            + 2.0 * N4 ** 2
        results['lml_N16384_ms'] = round(dt * 1e3, 1)
        results['lml_N16384_gflops'] = round(flops / dt / 1e9, 1)

    print(json.dumps(results, indent=1))


if __name__ == '__main__':
    main()
