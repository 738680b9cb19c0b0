R"""Pallas diagonal-block factorizer: Cholesky + triangular inverse in VMEM.

The blocked large-N factorization (``ops.blockchol``) needs, per column
step, the diagonal block's Cholesky factor AND its triangular inverse
(its TRSMs are GEMMs against the inverse).  This kernel produces both in
one Pallas launch (~0.8 ms at (16, 256), carry-dependent timing): about
what ``jnp.linalg.cholesky`` alone costs (~0.7 ms), with the inverse
included — the separate XLA factor+invert sequence is the slower and
more launch-heavy formulation.  Structure (two-level blocking):

- the column recursion runs panel-by-panel (panel = 32 columns); the
  masked rank-1 updates inside a panel touch only the (G, nb, 32) slab,
  so the serial part is O(nb²·panel) VPU work instead of O(nb³);
- cross-panel trailing updates and the triangular-inverse assembly are
  in-kernel batched MXU matmuls;
- the triangular inverse (the blocked driver's TRSM operand) comes from
  the same launch: per-panel leaf inverses by masked substitution, glued
  rows via ``M[q,:] = Mqq (I[q,:] − L[q,:j0] M[:j0,:])``.

Mosaic quirks encoded here (all verified on this toolchain):
- loop indices must be born int32 — int64→int32 converts recurse forever;
- ``iota == j`` on a 3-D iota SIGABRTs — compare 2-D iotas by subtraction
  and ``broadcast_to`` the mask;
- index-map constants must be ``np.int32`` (plain 0 traces as int64 under
  x64 and the index function fails to legalize);
- batched *vector*-matrix dot_general is rejected — use multiply+reduce
  or keep operands ≥ 2-D per batch element.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .. import _config  # noqa: F401

__all__ = ['chol_inv_block']


def _make_kernel(nb, pb, unroll=False, fuse_panel=False):
    """Kernel factory: nb = block size, pb = panel width (static).

    ``unroll=True`` replaces the two pb-step ``fori_loop``s with Python
    loops: the serial rank-1 work is loop-overhead-bound (each step is a
    handful of vector ops on a (G, pb, pb) slab), so paying compile size
    for zero per-step loop control is a measurable win on the chip.
    """
    npan = nb // pb
    _HI = jax.lax.Precision.HIGHEST

    def _loop(n, body, init):
        if not unroll:
            return jax.lax.fori_loop(jnp.int32(0), jnp.int32(n), body, init)
        carry = init
        for jj in range(n):
            carry = body(jnp.int32(jj), carry)
        return carry

    def kernel(a_ref, l_ref, m_ref):
        import jax.lax as lax

        A = a_ref[...]                     # (G, nb, nb)
        G = A.shape[0]
        dt = A.dtype
        # 2-D iotas (3-D iota comparisons crash this Mosaic version)
        rows_pp = lax.broadcasted_iota(jnp.int32, (pb, pb), 0)
        lanes_pp = lax.broadcasted_iota(jnp.int32, (1, pb), 1)

        def bc(mask2d, shape):
            return jnp.broadcast_to(mask2d, shape)

        def mm(a, b):
            return jnp.matmul(a, b, precision=_HI,
                              preferred_element_type=jnp.float32).astype(dt)

        # The only sequential work runs on tiny (G, pb, pb) diagonals —
        # a handful of vector registers per step; everything that scales
        # with nb is a batched MXU matmul.
        def small_chol(D):
            """Masked rank-1 Cholesky of (G, pb, pb)."""
            def stp(jj, carry):
                D, Ld = carry
                cmask = (lanes_pp - jj) == 0                    # (1, pb)
                colj = jnp.sum(jnp.where(bc(cmask, D.shape), D, 0.0),
                               axis=2)                          # (G, pb)
                d = jnp.sqrt(jnp.sum(jnp.where(bc(cmask, colj.shape),
                                               colj, 0.0), axis=1))
                col = colj / d[:, None]
                col = jnp.where(bc((lanes_pp - jj) >= 0, col.shape),
                                col, 0.0)
                Ld = jnp.where(bc(cmask, Ld.shape), col[:, :, None], Ld)
                D = D - col[:, :, None] * col[:, None, :]
                return D, Ld
            return _loop(pb, stp, (D, jnp.zeros_like(D)))[1]

        def small_inv(Ld):
            """(G, pb, pb) lower-triangular inverse by substitution."""
            def stp(jj, M):
                rmask = (rows_pp - jj) == 0                     # (pb, pb)
                Lrow = jnp.sum(jnp.where(bc(rmask, Ld.shape), Ld, 0.0),
                               axis=1)                          # (G, pb)
                dmask = bc((lanes_pp - jj) == 0, Lrow.shape)
                d = jnp.sum(jnp.where(dmask, Lrow, 0.0), axis=1)
                Lrow_lt = jnp.where(bc((lanes_pp - jj) < 0, Lrow.shape),
                                    Lrow, 0.0)
                acc = jnp.sum(Lrow_lt[:, :, None] * M, axis=1)  # (G, pb)
                Mrow = (dmask.astype(dt) - acc) / d[:, None]
                return jnp.where(bc(rmask, M.shape), Mrow[:, None, :], M)
            return _loop(pb, stp, jnp.zeros_like(Ld))

        def small_chol_inv(D):
            """Fused factor+inverse: ONE pb-step recursion for both.

            At column step jj, every row < jj of L is final, so the
            substitution row jj of M = L⁻¹ can be produced immediately
            after column jj of L — one serial chain of pb steps instead
            of two, sharing the column mask and the pivot d (the serial
            section is dispatch-overhead-bound on this chip, so halving
            the step count is the win; A/B'd in benchmarks/fuse_ab_tpu.py).
            """
            def stp(jj, carry):
                D, Ld, M = carry
                cmask = (lanes_pp - jj) == 0                    # (1, pb)
                colj = jnp.sum(jnp.where(bc(cmask, D.shape), D, 0.0),
                               axis=2)                          # (G, pb)
                d = jnp.sqrt(jnp.sum(jnp.where(bc(cmask, colj.shape),
                                               colj, 0.0), axis=1))
                col = colj / d[:, None]
                col = jnp.where(bc((lanes_pp - jj) >= 0, col.shape),
                                col, 0.0)
                Ld = jnp.where(bc(cmask, Ld.shape), col[:, :, None], Ld)
                D = D - col[:, :, None] * col[:, None, :]
                # inverse row jj: L[jj, <jj] is final in Ld; pivot is d
                rmask = (rows_pp - jj) == 0                     # (pb, pb)
                Lrow = jnp.sum(jnp.where(bc(rmask, Ld.shape), Ld, 0.0),
                               axis=1)                          # (G, pb)
                Lrow_lt = jnp.where(bc((lanes_pp - jj) < 0, Lrow.shape),
                                    Lrow, 0.0)
                acc = jnp.sum(Lrow_lt[:, :, None] * M, axis=1)  # (G, pb)
                Mrow = (bc(cmask, acc.shape).astype(dt) - acc) / d[:, None]
                M = jnp.where(bc(rmask, M.shape), Mrow[:, None, :], M)
                return D, Ld, M
            _, Ld, M = _loop(pb, stp, (D, jnp.zeros_like(D),
                                       jnp.zeros_like(D)))
            return Ld, M

        # ---------------- factorization, panel by panel ----------------
        # Finished column blocks stream straight into l_ref (static-slice
        # stores): holding all panels + a final concat doubles VMEM and
        # OOMs the 16M scoped limit at chunk=8.
        diag_invs = []  # (G, pb, pb) inverses of the diagonal blocks
        Arest = A       # columns p*pb.. of the (updated) matrix
        for p in range(npan):
            j0 = p * pb
            D = Arest[:, j0:j0 + pb, :pb]                       # (G, pb, pb)
            if fuse_panel:
                Ld, Md = small_chol_inv(D)
            else:
                Ld = small_chol(D)
                Md = small_inv(Ld)
            diag_invs.append(Md)
            if j0:
                l_ref[:, :j0, j0:j0 + pb] = jnp.zeros((G, j0, pb), dt)
            l_ref[:, j0:j0 + pb, j0:j0 + pb] = Ld
            if j0 + pb < nb:
                below = Arest[:, j0 + pb:, :pb]                 # (G, r, pb)
                Lp = mm(below, jnp.swapaxes(Md, -1, -2))
                l_ref[:, j0 + pb:, j0:j0 + pb] = Lp
                if p < npan - 1:
                    # trailing update (rows < j0 contribute zero)
                    col_lower = jnp.concatenate([Ld, Lp], axis=1)
                    Ct = jnp.swapaxes(Lp, -1, -2)               # (G, pb, r)
                    upd = mm(col_lower, Ct)                     # (G, nb-j0, r)
                    if j0:
                        upd = jnp.concatenate(
                            [jnp.zeros((G, j0, nb - j0 - pb), dt), upd],
                            axis=1)
                    Arest = Arest[:, :, pb:] - upd

        # ---------------- triangular inverse, row-panel by row-panel ----
        # Row panels also stream into m_ref; earlier rows are read back
        # from the ref for the cross-panel GEMM.  The identity rows are
        # built per panel from iotas ((pb, nb), not a full (nb, nb) eye —
        # that 256 KB was enough to tip the 16M VMEM limit at chunk=8).
        rg = lax.broadcasted_iota(jnp.int32, (pb, nb), 0)
        cg = lax.broadcasted_iota(jnp.int32, (pb, nb), 1)

        for q in range(npan):
            j0 = q * pb
            Mqq = diag_invs[q]
            Iq = jnp.broadcast_to(((cg - rg) == j0).astype(dt), (G, pb, nb))
            if q:
                M_above = m_ref[:, :j0, :]                      # (G, j0, nb)
                Lrow_left = l_ref[:, j0:j0 + pb, :j0]           # (G, pb, j0)
                rhs = Iq - mm(Lrow_left, M_above)
            else:
                rhs = Iq
            m_ref[:, j0:j0 + pb, :] = mm(Mqq, rhs)

    return kernel


@partial(jax.jit, static_argnames=('chunk', 'panel', 'interpret', 'unroll',
                                   'fuse_panel'))
def chol_inv_block(A, chunk=None, panel=32, interpret=False, unroll=True,
                   fuse_panel=False):
    R"""Cholesky factor and its inverse for a batch of SPD blocks.

    Parameters
    ----------
    A : (B, nb, nb) SPD matrices, float32; nb a multiple of ``panel``
    chunk : batch elements per grid step.  The scoped-VMEM budget is
        ~6·chunk·nb² floats (in + 2 outs, double-buffered across the
        grid, plus kernel temporaries); default scales as 6·(256/nb)²
        capped at 16 — 6 at nb=256 fits the 16 MB limit with headroom
        even inside larger fused programs, nb=512 needs chunk=1, and at
        nb=128 the uncapped 24 overshoots the limit by ~1%
        (measured 16.14M at batch 48 inside the L-BFGS objective) while
        16 is the proven headline-bench configuration
    panel : in-kernel panel width (multiple of the 8-sublane tile)
    interpret : run in Pallas interpreter mode (for CPU tests)
    unroll : unroll the per-panel rank-1 loops (default True — the serial
        steps are loop-overhead-bound on the chip; see ``_make_kernel``)
    fuse_panel : produce the factor and its inverse from ONE pb-step
        recursion per panel instead of two (the serial section is
        dispatch-bound, so halving its step count is the candidate win;
        default False until A/B-confirmed on chip)

    Returns
    -------
    (L, Minv): both (B, nb, nb); ``L @ Minv = I`` per batch element.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, nb, _ = A.shape
    if nb % panel:
        raise ValueError('block size %d must be a multiple of panel %d'
                         % (nb, panel))
    if chunk is None:
        chunk = max(2, min(int(6 * (256 / nb) ** 2), 16))
    # chunk >= 2: a degenerate (1, nb, nb) grid block crashes this
    # toolchain's TPU compiler (see ops.fusedchol); B=1 pads to 2
    chunk = max(2, min(chunk, B))
    grid = -(-B // chunk)
    pad = grid * chunk - B
    if pad:
        eye = jnp.broadcast_to(jnp.eye(nb, dtype=A.dtype), (pad, nb, nb))
        A = jnp.concatenate([A, eye], axis=0)

    # index-map constants must be int32: under x64 a literal 0 traces as
    # int64 and Mosaic fails to legalize the index function's return
    spec = pl.BlockSpec((chunk, nb, nb),
                        lambda i: (i, np.int32(0), np.int32(0)),
                        memory_space=pltpu.VMEM)
    L, M = pl.pallas_call(
        _make_kernel(nb, panel, unroll, fuse_panel),
        grid=(grid,),
        in_specs=[spec],
        out_specs=(spec, spec),
        out_shape=(jax.ShapeDtypeStruct(A.shape, A.dtype),
                   jax.ShapeDtypeStruct(A.shape, A.dtype)),
        interpret=interpret,
    )(A)
    if pad:
        L, M = L[:B], M[:B]
    return L, M
