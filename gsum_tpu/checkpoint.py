R"""Checkpoint / resume for fitted models.

The reference has no persistence story beyond pickling attribute-laden
objects (SURVEY.md §5).  Here the fitted state of a conjugate process is an
explicit pytree of arrays plus a static config dict, so it serializes with
any array store.  Two backends:

- ``save`` / ``load``: single-file ``numpy .npz`` + JSON sidecar metadata —
  no extra dependencies, portable.
- ``save_orbax`` / ``load_orbax``: orbax-checkpoint directories for
  ecosystem interop (sharded/async checkpointing), if orbax is installed.
"""
from __future__ import annotations

import json
import re

import jax.numpy as jnp
import numpy as np

from . import _config  # noqa: F401

__all__ = ['state_dict', 'restore_state', 'save', 'load',
           'save_orbax', 'load_orbax']


def _kernel_sig(kernel_repr):
    """Structural signature of a kernel repr: float literals normalized
    to 6 significant digits (see the kernel check in restore_state)."""
    return re.sub(r'-?\d+(?:\.\d*)?(?:[eE][+-]?\d+)?',
                  lambda m: '%.6g' % float(m.group(0)), kernel_repr)

# Fitted attributes that form the array state (reference models.py:124-137)
_ARRAY_FIELDS = [
    'X_train_', 'y_train_', 'corr_', 'corr_sqrt_', 'center_', 'disp_',
    'scale_', 'cov_factor_', 'cbar_sq_mean_', 'basis_train_',
]
_EIGH_FIELDS = ['_eigh_eig', '_eigh_Q']


_TRUNC_ARRAY_FIELDS = ['X_train_', 'y_train_', 'coeffs_', 'dX_', 'dy_',
                       'dderivs_']


def state_dict(gp):
    """Extracts the fitted state of a conjugate process as plain arrays.

    Also accepts the TruncationGP/TruncationTP wrappers: their state is
    the fitted coefficient process plus the extracted coefficients and
    any (dX, dy) constraint data.  (TruncationPointwise refits in closed
    form in O(N*k) — persist the inputs instead.)

    Returns (arrays, meta): a dict of numpy arrays and a JSON-serializable
    metadata dict (kernel structure + hyperparameters + priors).
    """
    if not getattr(gp, '_fit', False):
        raise ValueError('Model must be fitted before checkpointing')
    if type(gp).__name__ == 'TruncationPointwise':
        raise ValueError(
            'TruncationPointwise has no expensive fitted state — refit in '
            'closed form (O(N*k)) from the persisted inputs instead')
    if hasattr(gp, 'coeffs_process'):
        inner_arrays, inner_meta = state_dict(gp.coeffs_process)
        arrays = {'cp.' + k: v for k, v in inner_arrays.items()}
        for f in _TRUNC_ARRAY_FIELDS:
            v = getattr(gp, f, None)
            if v is not None:
                arrays[f] = np.asarray(v)
        meta = {
            'class': type(gp).__name__,
            'orders_': np.asarray(gp.orders_).tolist(),
            'excluded': (None if gp.excluded is None
                         else np.atleast_1d(gp.excluded).tolist()),
            'coeffs_process': inner_meta,
        }
        return arrays, meta
    arrays = {}
    for f in _ARRAY_FIELDS:
        v = getattr(gp, f, None)
        if v is not None:
            arrays[f] = np.asarray(v)
    if gp._eigh_tuple_ is not None:
        arrays['_eigh_eig'] = np.asarray(gp._eigh_tuple_[0])
        arrays['_eigh_Q'] = np.asarray(gp._eigh_tuple_[1])

    meta = {
        'class': type(gp).__name__,
        'kernel_repr': repr(gp.kernel_),
        'kernel_theta': np.asarray(gp.kernel_.theta).tolist(),
        'df_': float(gp.df_),
        'log_marginal_likelihood_value_': (
            float(np.asarray(gp.log_marginal_likelihood_value_))
            if gp.log_marginal_likelihood_value_ is not None else None),
        'priors': {
            'center0': np.asarray(gp.center0).tolist(),
            'disp0': np.asarray(gp.disp0).tolist(),
            'df0': 'inf' if np.isinf(gp.df0) else float(gp.df0),
            'scale0': float(gp.scale0),
        },
        'nugget': float(gp.nugget),
        'decomposition': gp.decomposition,
        'dorders_': (None if getattr(gp, 'dorders_', None) is None
                     else np.asarray(gp.dorders_).tolist()),
    }
    return arrays, meta


def _check_restore_compat(gp, meta):
    """Raise if ``gp`` was constructed with different priors / nugget /
    decomposition than the checkpoint: the stored posterior state would be
    silently inconsistent with accessors that recompute from the priors
    (e.g. ``center()`` / ``scale()``)."""
    mismatches = []
    p = meta.get('priors', {})

    def near(a, b):
        return np.allclose(np.asarray(a, dtype=float),
                           np.asarray(b, dtype=float), rtol=0, atol=0)

    if 'center0' in p and not near(gp.center0, p['center0']):
        mismatches.append('center0: instance %r vs checkpoint %r'
                          % (np.asarray(gp.center0).tolist(), p['center0']))
    if 'disp0' in p and not near(gp.disp0, p['disp0']):
        mismatches.append('disp0: instance %r vs checkpoint %r'
                          % (np.asarray(gp.disp0).tolist(), p['disp0']))
    if 'df0' in p:
        df0_ckpt = np.inf if p['df0'] == 'inf' else float(p['df0'])
        if not (np.isinf(gp.df0) and np.isinf(df0_ckpt)) \
                and float(gp.df0) != df0_ckpt:
            mismatches.append('df0: instance %r vs checkpoint %r'
                              % (gp.df0, df0_ckpt))
    if 'scale0' in p and float(gp.scale0) != float(p['scale0']):
        mismatches.append('scale0: instance %r vs checkpoint %r'
                          % (gp.scale0, p['scale0']))
    if 'nugget' in meta and float(gp.nugget) != float(meta['nugget']):
        mismatches.append('nugget: instance %r vs checkpoint %r'
                          % (gp.nugget, meta['nugget']))
    if 'decomposition' in meta and gp.decomposition != meta['decomposition']:
        mismatches.append('decomposition: instance %r vs checkpoint %r'
                          % (gp.decomposition, meta['decomposition']))
    if 'class' in meta and type(gp).__name__ != meta['class']:
        mismatches.append('class: instance %s vs checkpoint %s'
                          % (type(gp).__name__, meta['class']))
    if mismatches:
        raise ValueError(
            'checkpoint is incompatible with this instance:\n  '
            + '\n  '.join(mismatches))


def restore_state(gp, arrays, meta):
    """Restores fitted state into a compatible (unfitted) model instance.

    The caller constructs ``gp`` with the same constructor arguments
    (kernel structure, priors, and — for truncation models — the same
    ratio/ref callables, which are code and cannot be serialized); this
    validates what it can and fills in the fitted attributes, marking the
    model as fitted.
    """
    if 'coeffs_process' in meta:
        if type(gp).__name__ != meta['class']:
            raise ValueError('checkpoint is a %s, instance is a %s'
                             % (meta['class'], type(gp).__name__))
        exc_ckpt = meta.get('excluded')
        exc_inst = (None if gp.excluded is None
                    else np.atleast_1d(gp.excluded).tolist())
        if exc_ckpt != exc_inst:
            raise ValueError('excluded orders differ: instance %r vs '
                             'checkpoint %r' % (exc_inst, exc_ckpt))
        inner = {k[3:]: v for k, v in arrays.items() if k.startswith('cp.')}
        restore_state(gp.coeffs_process, inner, meta['coeffs_process'])
        for f in _TRUNC_ARRAY_FIELDS:
            if f in arrays:
                setattr(gp, f, jnp.asarray(arrays[f]))
        gp.orders_ = np.asarray(meta['orders_'])
        gp._fit = True
        return gp

    _check_restore_compat(gp, meta)
    kernel = gp.kernel if gp.kernel is not None else gp._default_kernel
    gp.kernel_ = kernel.clone()
    theta = np.asarray(meta['kernel_theta'], dtype=float)
    n_theta = np.asarray(gp.kernel_.theta).size
    if theta.size != n_theta:
        raise ValueError(
            'checkpoint kernel theta has %d entries but this instance\'s '
            'kernel %r expects %d — kernel structure mismatch'
            % (theta.size, gp.kernel_, n_theta))
    if theta.size:
        gp.kernel_.theta = theta
    # kernel STRUCTURE must match the checkpoint: restoring e.g. an
    # RBF-trained posterior into a Matern instance silently produces
    # wrong predictions (theta sizes can coincide).  Compare reprs at
    # the restored theta with float literals normalized to 6 significant
    # digits — the exp/log theta round-trip may perturb last-ulp digits,
    # but class names, composition, and fixed shape parameters (Matern
    # nu, periodicity) must agree.
    want = meta.get('kernel_repr')
    if want is not None:
        got = repr(gp.kernel_)
        if _kernel_sig(got) != _kernel_sig(want):
            raise ValueError(
                'checkpoint kernel %s does not match this instance\'s '
                'kernel %s' % (want, got))
    for f in _ARRAY_FIELDS:
        if f in arrays:
            setattr(gp, f, jnp.asarray(arrays[f]))
    gp.corr_L_ = gp.corr_sqrt_
    if '_eigh_eig' in arrays:
        gp._eigh_tuple_ = (jnp.asarray(arrays['_eigh_eig']),
                           jnp.asarray(arrays['_eigh_Q']))
    gp.df_ = meta['df_']
    if meta.get('log_marginal_likelihood_value_') is not None:
        gp.log_marginal_likelihood_value_ = meta['log_marginal_likelihood_value_']
    gp.dorders_ = (None if meta.get('dorders_') is None
                   else np.asarray(meta['dorders_'], dtype=int))
    gp._fit = True
    return gp


def save(path, gp):
    """Saves a fitted model to ``<path>.npz`` (arrays + embedded metadata)."""
    arrays, meta = state_dict(gp)
    np.savez_compressed(path, __meta__=json.dumps(meta), **arrays)


def load(path, gp):
    """Loads fitted state saved by :func:`save` into model instance ``gp``."""
    with np.load(path if str(path).endswith('.npz') else str(path) + '.npz',
                 allow_pickle=False) as data:
        meta = json.loads(str(data['__meta__']))
        arrays = {k: data[k] for k in data.files if k != '__meta__'}
    return restore_state(gp, arrays, meta)


def save_orbax(path, gp):
    """Saves via orbax-checkpoint (directory format)."""
    import orbax.checkpoint as ocp

    arrays, meta = state_dict(gp)
    ckpt = ocp.PyTreeCheckpointer()
    ckpt.save(path, {'arrays': {k: jnp.asarray(v) for k, v in arrays.items()},
                     'meta_json': json.dumps(meta)}, force=True)


def load_orbax(path, gp):
    """Loads an orbax checkpoint saved by :func:`save_orbax`."""
    import orbax.checkpoint as ocp

    ckpt = ocp.PyTreeCheckpointer()
    data = ckpt.restore(path)
    meta = json.loads(data['meta_json'])
    return restore_state(gp, data['arrays'], meta)
