R"""Scan-based blocked Cholesky: compile size O(block), independent of N.

The explicitly-batched factorization in ``ops.smallchol`` unrolls its
recursion into the HLO, which is what makes it fast at small N — and what
makes it uncompilable at larger N: the forward graph OOM-kills the remote
compile service at N=512, and the L-BFGS adjoint already at N=256
(docs/perf.md).  This module trades FLOPs for compile size: a
``lax.scan`` over column slabs whose body is a handful of full-height
batched GEMMs, so the HLO is constant in N and reverse-mode
differentiation scans the same body backwards.

Left-looking invariant that removes all masking from the history GEMM:
the carry ``L`` starts at zero and column slab k is written only at step
k, so at step k every column >= k*block of ``L`` is still zero and

    (L @ L[rows_k]^T)[i, r] = sum_j L[i, j] L[s+r, j] = (L[:, :s] @ L[rows_k, :s]^T)[i, r]

exactly — the zero columns contribute nothing.  Rows above the diagonal
of the new slab are likewise zeroed by construction before the write.

Cost: each step's history GEMM is full-height (N x s_effective padded to
N), so the factorization does ~2GN^3 FLOPs versus the optimal GN^3/3 —
a deliberate 6x FLOP trade for O(1) compile size.  At the N=256-1024
sizes this engine targets, the alternative (the vmapped scalar path) is
latency-bound far above that cost, and the unrolled engine does not
compile at all.

reference: no counterpart — gsum runs LAPACK ``dpotrf`` once per matrix
(gsum/models.py:969); this is the TPU path for *grids* of such solves at
sizes the unrolled engine cannot reach.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .. import _config  # noqa: F401
from .smallchol import batched_small_cholesky, batched_small_tri_inv

__all__ = ['scan_blocked_cholesky', 'scan_cho_solve']

_HI = jax.lax.Precision.HIGHEST


def _pad_to_block(A, block):
    N = A.shape[-1]
    nb = -(-N // block)
    pad = nb * block - N
    if not pad:
        return A, 0
    G = A.shape[0]
    top = jnp.concatenate(
        [A, jnp.zeros((G, N, pad), A.dtype)], axis=-1)
    bot = jnp.concatenate(
        [jnp.zeros((G, pad, N), A.dtype),
         jnp.broadcast_to(jnp.eye(pad, dtype=A.dtype), (G, pad, pad))],
        axis=-1)
    return jnp.concatenate([top, bot], axis=-2), pad


@partial(jax.jit, static_argnames=('block', 'leaf'))
def scan_blocked_cholesky(A, block=64, leaf=16):
    R"""Cholesky of (G, N, N) SPD matrices via a column-slab ``lax.scan``.

    Returns ``(L, minvs)``: the (G, N, N) lower factor and the stacked
    (nb, G, block, block) inverses of its diagonal blocks (consumed by
    :func:`scan_cho_solve`, whose solves are then pure GEMMs).

    Same factor as ``jnp.linalg.cholesky`` up to round-off; a failed
    (non-PD) factorization produces NaNs in the corresponding diagonal
    block, detectable exactly as with the other engines.
    """
    A = jnp.asarray(A)
    G, N0, _ = A.shape
    A, pad = _pad_to_block(A, block)
    N = A.shape[-1]
    nb = N // block
    rows = jax.lax.broadcasted_iota(jnp.int32, (N, 1), 0)

    _z = jnp.int32(0)

    def step(L, k):
        s = k * block
        A_col = jax.lax.dynamic_slice(A, (_z, _z, s), (G, N, block))
        L_row = jax.lax.dynamic_slice(L, (_z, s, _z), (G, block, N))
        # exact history update: columns >= s of L are still zero
        A_col = A_col - jnp.matmul(L, jnp.swapaxes(L_row, -1, -2),
                                   precision=_HI)
        diag = jax.lax.dynamic_slice(A_col, (_z, s, _z), (G, block, block))
        Ld = batched_small_cholesky(diag, leaf)
        Minv = batched_small_tri_inv(Ld, leaf)
        # panel below the diagonal: P = A_col @ Minv^T, valid rows > s+b
        P = jnp.matmul(A_col, jnp.swapaxes(Minv, -1, -2), precision=_HI)
        below = (rows >= (s + block))
        col = jnp.where(below[None], P, 0.0)
        col = jax.lax.dynamic_update_slice(col, Ld, (_z, s, _z))
        L = jax.lax.dynamic_update_slice(L, col, (_z, _z, s))
        return L, Minv

    L0 = jnp.zeros_like(A)
    L, minvs = jax.lax.scan(step, L0, jnp.arange(nb, dtype=jnp.int32))
    if pad:
        L = L[:, :N0, :N0]
    return L, minvs


@partial(jax.jit, static_argnames=('block',))
def scan_cho_solve(L, minvs, B, block=None):
    R"""Solves ``L L^T X = B`` using the scan factor and its diagonal-block
    inverses — every step is a batched GEMM, compile size O(1) in N.

    Parameters
    ----------
    L : (G, N, N) lower factor from :func:`scan_blocked_cholesky`
    minvs : (nb, G, block, block) diagonal-block inverses
    B : (G, N, m) right-hand sides
    block : inferred from ``minvs`` (its trailing dimension); passing it
        explicitly is allowed but must agree — a mismatch used to surface
        as an opaque shape/padding error downstream.
    """
    if block is None:
        block = minvs.shape[-1]
    elif block != minvs.shape[-1]:
        raise ValueError('block=%d does not match the factorization block '
                         '%d (minvs.shape[-1])' % (block, minvs.shape[-1]))
    L = jnp.asarray(L)
    B = jnp.asarray(B)
    G, N0, m = B.shape
    pad = minvs.shape[0] * block - N0
    if pad:
        eye_ext = jnp.broadcast_to(jnp.eye(pad, dtype=L.dtype),
                                   (G, pad, pad))
        L = jnp.concatenate([
            jnp.concatenate([L, jnp.zeros((G, N0, pad), L.dtype)], -1),
            jnp.concatenate([jnp.zeros((G, pad, N0), L.dtype), eye_ext],
                            -1)], -2)
        B = jnp.concatenate([B, jnp.zeros((G, pad, m), B.dtype)], -2)
    N = L.shape[-1]
    nb = N // block

    _z = jnp.int32(0)

    # forward: L w = B, blocks in order; rows of w not yet written are zero
    def fwd(w, inp):
        k, Minv = inp
        s = k * block
        L_row = jax.lax.dynamic_slice(L, (_z, s, _z), (G, block, N))
        rhs = jax.lax.dynamic_slice(B, (_z, s, _z), (G, block, m)) \
            - jnp.matmul(L_row, w, precision=_HI)
        wk = jnp.matmul(Minv, rhs, precision=_HI)
        return jax.lax.dynamic_update_slice(w, wk, (_z, s, _z)), None

    ks = jnp.arange(nb, dtype=jnp.int32)
    w, _ = jax.lax.scan(fwd, jnp.zeros_like(B), (ks, minvs))

    # backward: L^T x = w, blocks in reverse; unwritten rows of x are zero
    def bwd(x, inp):
        k, Minv = inp
        s = k * block
        L_col = jax.lax.dynamic_slice(L, (_z, _z, s), (G, N, block))
        rhs = jax.lax.dynamic_slice(w, (_z, s, _z), (G, block, m)) \
            - jnp.matmul(jnp.swapaxes(L_col, -1, -2), x, precision=_HI)
        xk = jnp.matmul(jnp.swapaxes(Minv, -1, -2), rhs, precision=_HI)
        return jax.lax.dynamic_update_slice(x, xk, (_z, s, _z)), None

    x, _ = jax.lax.scan(bwd, jnp.zeros_like(B), (ks, minvs), reverse=True)
    return x[:, :N0, :] if pad else x
