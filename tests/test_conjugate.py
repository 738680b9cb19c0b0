"""Conjugate posterior updates vs the reference's closed forms and
hand-derived gradients (the autodiff cross-check promised in
gsum_tpu/conjugate.py)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import gsum_tpu.conjugate as conj
from gsum_tpu.linalg import solve_sqrt
from _reference import import_reference

gref = import_reference()
RefBase = gref.models.BaseConjugateProcess

rng = np.random.RandomState(7)
N, NC, P = 8, 3, 2
X = rng.rand(N, 1)
y = rng.randn(N, NC)
basis = np.hstack([np.ones((N, 1)), X])  # 2-column basis
A = rng.randn(N, N)
R = A @ A.T + N * np.eye(N)
chol = np.linalg.cholesky(R)
eig, Q = np.linalg.eigh(R)

center0 = np.array([0.1, -0.2])
disp0 = np.array([[2.0, 0.3], [0.3, 1.5]])
df0, scale0 = 1.5, 1.2

# kernel gradient direction for the hand-derived-gradient cross-check
dR = np.stack([R * rng.rand(N, N), np.eye(N)], axis=-1)
dR = (dR + dR.transpose(1, 0, 2)) / 2  # symmetric directions


@pytest.mark.parametrize('decomp,sqrt_R', [
    ('cholesky', chol), ('eig', (eig, Q)),
], ids=['cholesky', 'eig'])
def test_updates_match_reference(decomp, sqrt_R):
    ours = {
        'center': conj.compute_center(jnp.asarray(y), sqrt_R, jnp.asarray(basis),
                                      center0, disp0, decomposition=decomp),
        'disp': conj.compute_disp(jnp.asarray(y), sqrt_R, jnp.asarray(basis),
                                  disp0, decomposition=decomp),
        'df': conj.compute_df(y, df0),
        'scale_sq': conj.compute_scale_sq(jnp.asarray(y), sqrt_R,
                                          jnp.asarray(basis), center0, disp0,
                                          df0, scale0, decomposition=decomp),
    }
    theirs = {
        'center': RefBase.compute_center(y, sqrt_R if decomp == 'cholesky' else (eig, Q),
                                         basis, center0, disp0, decomp),
        'disp': RefBase.compute_disp(y, sqrt_R if decomp == 'cholesky' else (eig, Q),
                                     basis, disp0, decomp),
        'df': RefBase.compute_df(y, df0),
        'scale_sq': RefBase.compute_scale_sq(y, sqrt_R if decomp == 'cholesky' else (eig, Q),
                                             basis, center0, disp0, df0, scale0, decomp),
    }
    for k in theirs:
        np.testing.assert_allclose(np.asarray(ours[k]), np.asarray(theirs[k]),
                                   atol=1e-10, err_msg=k)


def test_scale_sq_v2_agrees():
    v1 = float(conj.compute_scale_sq(jnp.asarray(y), chol, jnp.asarray(basis),
                                     center0, disp0, df0, scale0))
    v2 = float(conj.compute_scale_sq_v2(jnp.asarray(y), chol, jnp.asarray(basis),
                                        center0, disp0, df0, scale0))
    np.testing.assert_allclose(v1, v2, rtol=1e-10)


def test_limit_cases():
    # V0 = 0: delta prior on the mean
    c = conj.compute_center(jnp.asarray(y), chol, jnp.asarray(basis),
                            center0, np.zeros((2, 2)))
    np.testing.assert_allclose(np.asarray(c), center0)
    d = conj.compute_disp(jnp.asarray(y), chol, jnp.asarray(basis),
                          np.zeros((2, 2)))
    np.testing.assert_allclose(np.asarray(d), 0.0)
    # nu0 = inf: known scale
    s = conj.compute_scale_sq(jnp.asarray(y), chol, jnp.asarray(basis),
                              center0, disp0, np.inf, 1.7)
    np.testing.assert_allclose(float(s), 1.7 ** 2)
    # cov factor at nu=inf
    assert conj.compute_cov_factor(4.0, np.inf) == 4.0
    np.testing.assert_allclose(conj.compute_cov_factor(4.0, 10.0), 5.0)

    # reference agrees on the limits
    np.testing.assert_allclose(
        np.asarray(RefBase.compute_scale_sq(y, chol, basis, center0, disp0,
                                            np.inf, 1.7, 'cholesky')), 1.7 ** 2)


def test_zero_disp_scale_sq_matches_reference():
    z = np.zeros((2, 2))
    ours = float(conj.compute_scale_sq(jnp.asarray(y), chol, jnp.asarray(basis),
                                       center0, z, df0, scale0))
    theirs = float(RefBase.compute_scale_sq(y, chol, basis, center0, z, df0,
                                            scale0, 'cholesky'))
    np.testing.assert_allclose(ours, theirs, rtol=1e-10)
    # v2 limit form too
    ours2 = float(conj.compute_scale_sq_v2(jnp.asarray(y), chol, jnp.asarray(basis),
                                           center0, z, df0, scale0))
    theirs2 = float(RefBase.compute_scale_sq_v2(y, chol, basis, center0, z, df0,
                                                scale0, 'cholesky'))
    np.testing.assert_allclose(ours2, theirs2, rtol=1e-10)


def _autodiff_grad(fn):
    """Gradient of fn(R) in the dR directions, via jvp through cholesky."""
    def g(R_):
        L = jnp.linalg.cholesky(jnp.asarray(R_))
        return fn(L)

    grads = []
    for p in range(dR.shape[-1]):
        _, tangent = jax.jvp(g, (jnp.asarray(R),), (jnp.asarray(dR[..., p]),))
        grads.append(np.asarray(tangent))
    return np.stack(grads, axis=-1)


def test_autodiff_matches_hand_derived_center_grad():
    _, d_center_ref = RefBase.compute_center(
        y, chol, basis, center0, disp0, 'cholesky', eval_gradient=True, dR=dR)

    d_center_auto = _autodiff_grad(
        lambda L: conj.compute_center(jnp.asarray(y), L, jnp.asarray(basis),
                                      center0, disp0))
    np.testing.assert_allclose(d_center_auto, d_center_ref, atol=1e-8)


def test_autodiff_matches_hand_derived_disp_grad():
    _, d_disp_ref = RefBase.compute_disp(
        y, chol, basis, disp0, 'cholesky', eval_gradient=True, dR=dR)
    d_disp_auto = _autodiff_grad(
        lambda L: conj.compute_disp(jnp.asarray(y), L, jnp.asarray(basis), disp0))
    np.testing.assert_allclose(d_disp_auto, d_disp_ref, atol=1e-8)


def test_autodiff_matches_hand_derived_scale_sq_grad():
    _, d_ref = RefBase.compute_scale_sq(
        y, chol, basis, center0, disp0, df0, scale0, 'cholesky',
        eval_gradient=True, dR=dR)
    d_auto = _autodiff_grad(
        lambda L: conj.compute_scale_sq(jnp.asarray(y), L, jnp.asarray(basis),
                                        center0, disp0, df0, scale0))
    np.testing.assert_allclose(d_auto, d_ref, atol=1e-8)


def test_avg_num_y():
    assert conj.num_y(y) == NC
    assert conj.num_y(y[:, 0]) == 1
    np.testing.assert_allclose(np.asarray(conj.avg_y(jnp.asarray(y))),
                               y.mean(axis=1))
