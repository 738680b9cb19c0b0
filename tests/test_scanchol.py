"""Scan-based blocked Cholesky (ops.scanchol): compile size O(1) in N."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import gsum_tpu as gm
from gsum_tpu.ops.scanchol import scan_blocked_cholesky, scan_cho_solve


def _spd(rng, G, N):
    A = rng.randn(G, N, N)
    return A @ np.swapaxes(A, -1, -2) + N * np.eye(N)


@pytest.mark.parametrize('G,N,block', [(4, 96, 32), (3, 200, 64),
                                       (2, 520, 64), (2, 64, 64)])
def test_factor_and_solve_match_dense(G, N, block):
    rng = np.random.RandomState(0)
    K = _spd(rng, G, N)
    L, minvs = scan_blocked_cholesky(jnp.asarray(K), block=block)
    Lref = np.linalg.cholesky(K)
    np.testing.assert_allclose(np.asarray(L), Lref,
                               atol=1e-12 * np.abs(Lref).max())

    B = rng.randn(G, N, 3)
    X = np.asarray(scan_cho_solve(L, minvs, jnp.asarray(B), block=block))
    np.testing.assert_allclose(X, np.linalg.solve(K, B),
                               rtol=1e-9, atol=1e-11)


def test_non_pd_produces_nan_flagable_diag():
    rng = np.random.RandomState(1)
    K = _spd(rng, 2, 96)
    K[1] -= 3 * 96 * np.eye(96)  # make the second matrix indefinite
    L, _ = scan_blocked_cholesky(jnp.asarray(K), block=32)
    diag = np.diagonal(np.asarray(L), axis1=-2, axis2=-1)
    ok = np.all(np.isfinite(diag) & (diag > 0), axis=-1)
    assert ok[0] and not ok[1]


def test_gradient_matches_for_symmetric_perturbations():
    """Raw-entry gradients differ between engines by how off-diagonal mass
    is split (legitimate convention freedom); for symmetric inputs —
    covariances always are — the symmetrized gradients must agree."""
    rng = np.random.RandomState(2)
    K = jnp.asarray(_spd(rng, 2, 64))

    def loss(Km):
        L, _ = scan_blocked_cholesky(Km, block=32)
        return jnp.sum(jnp.log(jnp.diagonal(L, axis1=-2, axis2=-1)))

    def loss_ref(Km):
        L = jnp.linalg.cholesky(Km)
        return jnp.sum(jnp.log(jnp.diagonal(L, axis1=-2, axis2=-1)))

    g = jax.grad(loss)(K)
    gref = jax.grad(loss_ref)(K)
    sym = lambda M: 0.5 * (M + jnp.swapaxes(M, -1, -2))  # noqa: E731
    np.testing.assert_allclose(np.asarray(sym(g)), np.asarray(sym(gref)),
                               rtol=1e-10)


def test_grid_lml_scan_engine_matches_scalar():
    """batched_lml_grid at N=300 (auto -> scan engine) equals the scalar
    path; explicit engine='scan' equals engine='scalar' too."""
    from gsum_tpu.parallel import batched_lml_grid

    rng = np.random.RandomState(3)
    N = 300
    X = np.linspace(0, 1, N)[:, None]
    yv = np.sin(3 * X[:, 0]) + 0.1 * rng.randn(N)
    thetas = np.log(np.linspace(0.3, 0.9, 5))[:, None]
    kernel = gm.RBF(0.5)

    auto = np.asarray(batched_lml_grid(kernel, X, yv, thetas, df=3, scale=1,
                                       nugget=1e-6))
    scal = np.asarray(batched_lml_grid(kernel, X, yv, thetas, df=3, scale=1,
                                       nugget=1e-6, engine='scalar'))
    np.testing.assert_allclose(auto, scal, rtol=1e-8)

    scan = np.asarray(batched_lml_grid(kernel, X, yv, thetas, df=3, scale=1,
                                       nugget=1e-6, engine='scan'))
    np.testing.assert_allclose(scan, scal, rtol=1e-8)


def test_batched_fit_scan_engine():
    """Explicit engine='scan' fit at moderate N matches the scalar engine."""
    from gsum_tpu.parallel import batched_fit

    rng = np.random.RandomState(4)
    B, N = 2, 200
    X = np.linspace(0, 1, N)[:, None]
    y_batch = np.sin(3 * X.T) + 0.1 * rng.randn(B, N)
    kernel = gm.RBF(0.5, (1e-2, 1e2))

    p_scan = batched_fit(kernel, X, y_batch, df=3, scale=1, maxiter=25,
                         nugget=1e-6, engine='scan')
    p_scal = batched_fit(kernel, X, y_batch, df=3, scale=1, maxiter=25,
                         nugget=1e-6, engine='scalar')
    # the two engines run the same optimizer on numerically different
    # objectives (scan block-inverse solves vs scalar XLA); near the MAP
    # the lml is flat, so theta agreement is objective-curvature limited
    # (8e-5 observed after the r3 trust-cap change) while the achieved
    # lml — the actual fit criterion — must agree tightly
    np.testing.assert_allclose(np.asarray(p_scan.theta),
                               np.asarray(p_scal.theta), atol=1e-3)
    np.testing.assert_allclose(np.asarray(p_scan.lml),
                               np.asarray(p_scal.lml), rtol=1e-7)
