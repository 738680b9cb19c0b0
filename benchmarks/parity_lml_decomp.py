"""Piece-level TPU-vs-CPU decomposition of the parity flow's lml corner.

gp_lml_grid is the one quantity of the driver parity leg above 1e-8
(1.26e-8, a fixed ~1.25e-6 absolute error independent of conditioning).
This script runs the EXACT lml computation of
models.ConjugateGaussianProcess._make_lml_fn — rebuilt here to return
every intermediate — jitted on the TPU and on the in-process CPU
backend, and prints each piece's deviation.  Whatever piece moves is
the op with f32-accurate lowering.
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import gsum_tpu as gm
import jax
import jax.numpy as jnp

from gsum_tpu import conjugate as _conj
from gsum_tpu.helpers import coefficients
from gsum_tpu.linalg import f64_precision, logdet_sqrt, solve_sqrt
from gsum_tpu.models import _LOG_2PI, _safe_sqrt_R
from parity_flow import FROZEN

rec = np.load(os.path.join(os.path.dirname(os.path.abspath(__file__)), FROZEN))
X, y, orders, Q, ref_scale = (rec['X'], rec['y'], rec['orders'], rec['Q'],
                              rec['ref_scale'])
Xg, yg, Qg, refg = X[::3], y[::3], Q[::3], ref_scale[::3]

kernel = gm.kernels.RBF(0.5, (1e-2, 1e2))
frozen_k = kernel.clone()
value_fn = frozen_k.value_fn
nugget = 1e-8
center0, disp0, df0, scale0 = 0, 0, 3, 1


def pieces_fn(theta, Xa, ya, basis):
    N = Xa.shape[0]
    out = {}
    R = value_fn(theta, Xa, None)
    R_reg = R + nugget * jnp.eye(N, dtype=R.dtype)
    out['R_reg'] = R_reg
    sqrt_R, ok = _safe_sqrt_R(R_reg, 'cholesky', None)
    out['Ldiag'] = jnp.diagonal(sqrt_R)
    df = _conj.compute_df(y=ya, df0=df0)
    center = _conj.compute_center(ya, sqrt_R, basis, center0=center0,
                                  disp0=disp0, decomposition='cholesky')
    out['center'] = center
    scale2 = _conj.compute_scale_sq(
        y=ya, sqrt_R=sqrt_R, basis=basis, center0=center0, disp0=disp0,
        df0=df0, scale0=scale0, decomposition='cholesky')
    out['scale2'] = scale2
    with f64_precision(R.dtype):
        mean = basis @ center
        var = _conj.compute_cov_factor(scale_sq=scale2, df=df)
        out['var'] = var
        out['logvar'] = jnp.log(var)
        logdet_R = logdet_sqrt(sqrt_R, 'cholesky')
        out['logdet_R'] = logdet_R
        logdet_K = N * jnp.log(var) + logdet_R
        y_train = ya - mean[:, None]
        alpha = solve_sqrt(sqrt_R, y_train, decomposition='cholesky') / var
        out['alpha'] = alpha
        quad = -0.5 * jnp.einsum('ik,ik->k', y_train, alpha)
        out['quad'] = quad
    ll_dims = quad - 0.5 * logdet_K - N / 2 * _LOG_2PI
    out['lml'] = ll_dims.sum(-1)
    return out


orders_mask = ~np.isin(orders, ())
lam, ls = 0.9, 0.3
ratio = float(np.mean(Qg)) / lam * np.ones(Xg.shape[0])
ref = float(np.mean(refg)) * np.ones(Xg.shape[0])
coeffs = np.asarray(coefficients(y=jnp.asarray(yg), ratio=jnp.asarray(ratio),
                                 ref=jnp.asarray(ref),
                                 orders=orders))
theta = np.log(np.array([ls]))
basis = np.ones((Xg.shape[0], 1))

args = (jnp.asarray(theta), jnp.asarray(Xg), jnp.asarray(coeffs),
        jnp.asarray(basis))

cpu = jax.devices('cpu')[0]
with jax.default_device(cpu):
    args_cpu = tuple(jax.device_put(np.asarray(a), cpu) for a in args)
    ref_out = {k: np.asarray(v)
               for k, v in jax.jit(pieces_fn)(*args_cpu).items()}

tpu_out = {k: np.asarray(v) for k, v in jax.jit(pieces_fn)(*args).items()}

print('backend:', jax.default_backend(), 'x64:', jax.config.jax_enable_x64)
rows = []
for k in ref_out:
    a, b = tpu_out[k], ref_out[k]
    scale = max(np.max(np.abs(b)), 1e-300)
    rows.append((float(np.max(np.abs(a - b))),
                 float(np.max(np.abs(a - b)) / scale), k))
for absd, reld, k in sorted(rows, reverse=True):
    print('%-10s abs %.3e  rel %.3e' % (k, absd, reld))
print('lml tpu %.15g cpu %.15g' % (float(tpu_out['lml']),
                                   float(ref_out['lml'])))

# det_factor piece (theta-independent)
n = len(orders)


def detf(ratio_a, ref_a):
    return jnp.sum(n * jnp.log(jnp.abs(ref_a))
                   + np.sum(orders) * jnp.log(jnp.abs(ratio_a)))


d_tpu = float(jax.jit(detf)(jnp.asarray(ratio), jnp.asarray(ref)))
with jax.default_device(cpu):
    d_cpu = float(jax.jit(detf)(jax.device_put(ratio, cpu),
                                jax.device_put(ref, cpu)))
print('det_factor tpu %.15g cpu %.15g  absd %.3e' % (d_tpu, d_cpu,
                                                     abs(d_tpu - d_cpu)))
