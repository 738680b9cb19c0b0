R"""Single-kernel HBM-resident blocked Cholesky (Pallas).

The XLA blocked driver (``ops.blockchol``) runs the B=16, N=4096 headline
factorization as ~50 separate ops per column step: history GEMM, Pallas
diagonal launch, panel GEMM, slice/update-slice plumbing.  This module is
the whole factorization as ONE ``pallas_call``:

- **L and K stay in HBM** (``memory_space=ANY``); every (chunk, b, b)
  tile moves through VMEM by explicit async DMA, with the j-stream of
  history tiles double-buffered so tile reads overlap the MXU GEMMs;
- the grid is ``(batch_chunks, nb)`` — TPU grid steps execute
  **sequentially**, which is exactly the dependency order of the
  left-looking algorithm (step k reads only columns j<k written by
  earlier grid steps; every write DMA is waited before its step ends);
- the diagonal factor + triangular inverse run **in the same kernel**
  between the history and panel GEMMs (the value-level port of
  ``ops.pallas_chol``'s two-level panel scheme, leaf loops unrolled), so
  there are nb fused grid steps per chunk instead of ~50 ops each;
- FLOPs are the exact left-looking count: per (r, k) tile the history
  contribution is accumulated by k tile GEMMs of (chunk, b, b) —
  sum(r>=k) k = N³/(6b³) tile-GEMMs = N³/6 MACs.

The factor's strict upper triangle is NOT written (the solve, logdet and
adjoint paths never read it); ``fused_blocked_cholesky(..., tril=True)``
zeroes it for ``jnp.linalg.cholesky`` drop-in parity.

reference hot loop being replaced: gsum/models.py:957-1039 (one LAPACK
``dpotrf`` per lml evaluation).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .. import _config  # noqa: F401

__all__ = ['fused_blocked_cholesky', 'fused_chol_solve_logdet']

_HI = jax.lax.Precision.HIGHEST
_LOG_2PI = float(np.log(2 * np.pi))


def _mm(a, b):
    return jnp.matmul(a, b, precision=_HI,
                      preferred_element_type=jnp.float32).astype(a.dtype)


def _mmT(a, b):
    return _mm(a, jnp.swapaxes(b, -1, -2))


def _factor_inv_values(A, pb):
    """(L, Minv) of a (G, nb, nb) SPD block, all in registers/VMEM.

    Value-level port of ``ops.pallas_chol._make_kernel`` (same two-level
    panel scheme and Mosaic workarounds: 2-D iotas compared by
    subtraction, int32-born loop indices, unrolled leaf loops).
    """
    import jax.lax as lax

    G, nbk, _ = A.shape
    npan = nbk // pb
    dt = A.dtype
    rows_pp = lax.broadcasted_iota(jnp.int32, (pb, pb), 0)
    lanes_pp = lax.broadcasted_iota(jnp.int32, (1, pb), 1)

    def bc(mask2d, shape):
        return jnp.broadcast_to(mask2d, shape)

    def small_chol(D):
        Ld = jnp.zeros_like(D)
        for jj in range(pb):
            cmask = (lanes_pp - jj) == 0                      # (1, pb)
            colj = jnp.sum(jnp.where(bc(cmask, D.shape), D, 0.0), axis=2)
            d = jnp.sqrt(jnp.sum(jnp.where(bc(cmask, colj.shape),
                                           colj, 0.0), axis=1))
            col = colj / d[:, None]
            col = jnp.where(bc((lanes_pp - jj) >= 0, col.shape), col, 0.0)
            Ld = jnp.where(bc(cmask, Ld.shape), col[:, :, None], Ld)
            D = D - col[:, :, None] * col[:, None, :]
        return Ld

    def small_inv(Ld):
        M = jnp.zeros_like(Ld)
        for jj in range(pb):
            rmask = (rows_pp - jj) == 0
            Lrow = jnp.sum(jnp.where(bc(rmask, Ld.shape), Ld, 0.0), axis=1)
            dmask = bc((lanes_pp - jj) == 0, Lrow.shape)
            d = jnp.sum(jnp.where(dmask, Lrow, 0.0), axis=1)
            Lrow_lt = jnp.where(bc((lanes_pp - jj) < 0, Lrow.shape),
                                Lrow, 0.0)
            acc = jnp.sum(Lrow_lt[:, :, None] * M, axis=1)
            Mrow = (dmask.astype(dt) - acc) / d[:, None]
            M = jnp.where(bc(rmask, M.shape), Mrow[:, None, :], M)
        return M

    # ---- factorization, panel by panel (value-level) -----------------
    diag_invs = []
    cols = []                      # full-height (G, nbk, pb) column panels
    Arest = A
    for p in range(npan):
        j0 = p * pb
        D = Arest[:, j0:j0 + pb, :pb]
        Ld = small_chol(D)
        Md = small_inv(Ld)
        diag_invs.append(Md)
        if j0 + pb < nbk:
            below = Arest[:, j0 + pb:, :pb]
            Lp = _mmT(below, Md)
            col_lower = jnp.concatenate([Ld, Lp], axis=1)
            if p < npan - 1:
                upd = _mmT(col_lower, Lp)                  # (G, nbk-j0, r)
                if j0:
                    upd = jnp.concatenate(
                        [jnp.zeros((G, j0, nbk - j0 - pb), dt), upd],
                        axis=1)
                Arest = Arest[:, :, pb:] - upd
        else:
            col_lower = Ld
        if j0:
            col_lower = jnp.concatenate(
                [jnp.zeros((G, j0, pb), dt), col_lower], axis=1)
        cols.append(col_lower)
    L = jnp.concatenate(cols, axis=-1)

    # ---- triangular inverse, row panel by row panel ------------------
    rg = jax.lax.broadcasted_iota(jnp.int32, (pb, nbk), 0)
    cg = jax.lax.broadcasted_iota(jnp.int32, (pb, nbk), 1)
    mrows = []
    for q in range(npan):
        j0 = q * pb
        Iq = jnp.broadcast_to(((cg - rg) == j0).astype(dt), (G, pb, nbk))
        if q:
            M_above = jnp.concatenate(mrows, axis=1)       # (G, j0, nbk)
            Lrow_left = L[:, j0:j0 + pb, :j0]
            rhs = Iq - _mm(Lrow_left, M_above)
        else:
            rhs = Iq
        mrows.append(_mm(diag_invs[q], rhs))
    Minv = jnp.concatenate(mrows, axis=1)
    return L, Minv


def _make_fused_kernel(chunk, nb, b, pb, db=True):
    """Kernel factory.  Grid (batch_chunks, nb); refs in ANY (HBM).

    ``db=False`` disables the double-buffered j-stream (each history tile
    DMA is started and waited at its use) — slower, but a smaller Mosaic
    program for compile-service-limited configurations."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(k_ref, l_ref, m_ref, acc, tk, tr, kst, ld, mi,
               s_acc, s_tk, s_tr, s_kst, s_w):
        c = pl.program_id(0)
        k = pl.program_id(1)
        c0 = c * np.int32(chunk)
        kk = k * np.int32(b)

        def tile(ref, row0, col0):
            return ref.at[pl.ds(c0, chunk), pl.ds(row0, b), pl.ds(col0, b)]

        # ---------------- diagonal tile -------------------------------
        dma = pltpu.make_async_copy(tile(k_ref, kk, kk), acc, s_acc)
        dma.start()
        dma.wait()

        def start_tk(slot, j):
            pltpu.make_async_copy(tile(l_ref, kk, j * np.int32(b)),
                                  tk.at[slot], s_tk.at[slot]).start()

        if db:
            @pl.when(k > 0)
            def _():
                start_tk(jnp.int32(0), jnp.int32(0))

        def dbody(j, _):
            j = j.astype(jnp.int32)
            if db:
                slot = jax.lax.rem(j, jnp.int32(2))

                @pl.when(j + 1 < k)
                def _():
                    start_tk(jax.lax.rem(j + jnp.int32(1), jnp.int32(2)),
                             j + 1)
            else:
                slot = jnp.int32(0)
                start_tk(slot, j)

            pltpu.make_async_copy(tile(l_ref, kk, j * np.int32(b)),
                                  tk.at[slot], s_tk.at[slot]).wait()
            t = tk[slot]
            acc[...] = acc[...] - _mmT(t, t)
            return 0

        jax.lax.fori_loop(jnp.int32(0), k, dbody, 0)

        Lv, Mv = _factor_inv_values(acc[...], pb)
        ld[...] = Lv
        mi[...] = Mv
        wl = pltpu.make_async_copy(ld, tile(l_ref, kk, kk), s_w)
        wl.start()
        wl.wait()
        wm = pltpu.make_async_copy(
            mi, m_ref.at[pl.ds(c0, chunk), k], s_w)
        wm.start()
        wm.wait()

        # ---------------- panel rows ----------------------------------
        def rbody(r, _):
            r = r.astype(jnp.int32)
            rr = r * np.int32(b)
            dk = pltpu.make_async_copy(tile(k_ref, rr, kk), kst, s_kst)
            dk.start()

            def start_pair(slot, j):
                jb = j * np.int32(b)
                pltpu.make_async_copy(tile(l_ref, rr, jb),
                                      tr.at[slot], s_tr.at[slot]).start()
                pltpu.make_async_copy(tile(l_ref, kk, jb),
                                      tk.at[slot], s_tk.at[slot]).start()

            if db:
                @pl.when(k > 0)
                def _():
                    start_pair(jnp.int32(0), jnp.int32(0))

            dk.wait()
            acc[...] = kst[...]

            def pbody(j, _):
                j = j.astype(jnp.int32)
                if db:
                    slot = jax.lax.rem(j, jnp.int32(2))

                    @pl.when(j + 1 < k)
                    def _():
                        start_pair(jax.lax.rem(j + jnp.int32(1),
                                               jnp.int32(2)), j + 1)
                else:
                    slot = jnp.int32(0)
                    start_pair(slot, j)

                jb = j * np.int32(b)
                pltpu.make_async_copy(tile(l_ref, rr, jb),
                                      tr.at[slot], s_tr.at[slot]).wait()
                pltpu.make_async_copy(tile(l_ref, kk, jb),
                                      tk.at[slot], s_tk.at[slot]).wait()
                acc[...] = acc[...] - _mmT(tr[slot], tk[slot])
                return 0

            jax.lax.fori_loop(jnp.int32(0), k, pbody, 0)

            # L[r,k] = acc @ Minv^T — stage through kst (done with it)
            kst[...] = _mmT(acc[...], mi[...])
            w = pltpu.make_async_copy(kst, tile(l_ref, rr, kk), s_w)
            w.start()
            w.wait()
            return 0

        jax.lax.fori_loop(k + 1, jnp.int32(nb), rbody, 0)

    return kernel


@partial(jax.jit, static_argnames=('block', 'chunk', 'panel', 'tril',
                                   'db', 'interpret'))
def fused_blocked_cholesky(K, block=256, chunk=None, panel=32, tril=False,
                           db=True, interpret=False):
    R"""Cholesky of (B, N, N) SPD float32 matrices in one Pallas kernel.

    Returns ``(L, minvs)``: the factor and the (B, nb, block, block)
    diagonal-block inverses (consumed by :func:`fused_chol_solve_logdet`).
    With ``tril=False`` (default) the strict upper triangle of L is
    unwritten memory — the solve/logdet/adjoint paths never read it; pass
    ``tril=True`` for a ``jnp.linalg.cholesky`` drop-in.

    Requires N % block == 0 and float32 (the in-kernel diagonal
    factorization is f32; use ``ops.blockchol`` otherwise).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    K = jnp.asarray(K)
    if K.dtype != jnp.float32:
        raise ValueError('fused_blocked_cholesky is float32-only')
    B, N, _ = K.shape
    if N % block:
        raise ValueError('N=%d must be a multiple of block=%d' % (N, block))
    nb = N // block
    if chunk is None:
        # chunk=2 is the empirically safe point on this toolchain: chunk=1
        # (degenerate (1, b, b) batch dim) and chunk=4 at b=256 both crash
        # the remote TPU compiler (subprocess exit; bisected at
        # N=512..4096), chunk=2 compiles and runs through N=4096.
        chunk = 2
    if chunk == 1 and not interpret:
        raise ValueError('chunk=1 crashes the TPU compiler on this '
                         'toolchain (degenerate batch dim); use chunk>=2')
    chunk = min(chunk, max(B, 2))
    gB = -(-B // chunk)
    pad = gB * chunk - B
    if pad:
        eye = jnp.broadcast_to(jnp.eye(N, dtype=K.dtype), (pad, N, N))
        K = jnp.concatenate([K, eye], axis=0)
    Bp = K.shape[0]

    anyspec = pl.BlockSpec(memory_space=pltpu.ANY)
    vm = pltpu.VMEM
    L, minvs = pl.pallas_call(
        _make_fused_kernel(chunk, nb, block, panel, db),
        grid=(gB, nb),
        in_specs=[anyspec],
        out_specs=(anyspec, anyspec),
        out_shape=(jax.ShapeDtypeStruct((Bp, N, N), K.dtype),
                   jax.ShapeDtypeStruct((Bp, nb, block, block), K.dtype)),
        scratch_shapes=[
            vm((chunk, block, block), jnp.float32),       # acc
            vm((2, chunk, block, block), jnp.float32),    # tk
            vm((2, chunk, block, block), jnp.float32),    # tr
            vm((chunk, block, block), jnp.float32),       # kst
            vm((chunk, block, block), jnp.float32),       # ld
            vm((chunk, block, block), jnp.float32),       # mi
            pltpu.SemaphoreType.DMA(()),                  # s_acc
            pltpu.SemaphoreType.DMA((2,)),                # s_tk
            pltpu.SemaphoreType.DMA((2,)),                # s_tr
            pltpu.SemaphoreType.DMA(()),                  # s_kst
            pltpu.SemaphoreType.DMA(()),                  # s_w
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(K)
    if pad:
        L, minvs = L[:B], minvs[:B]
    if tril:
        L = jnp.tril(L)
    return L, minvs


@partial(jax.jit, static_argnames=('block', 'chunk', 'panel', 'interpret'))
def fused_chol_solve_logdet(K, Y, block=256, chunk=None, panel=32,
                            interpret=False):
    R"""Factor K with the fused kernel, solve ``L w = Y``, return
    ``(w, logdet K)`` — the headline pipeline's factor+solve stage.

    The blocked forward substitution reuses the kernel's diagonal-block
    inverses (GEMMs, nb sequential steps) and reads only the written
    lower triangle of L.
    """
    N = K.shape[-1]
    L, minvs = fused_blocked_cholesky(K, block=block, chunk=chunk,
                                      panel=panel, interpret=interpret)
    nb = N // block
    w = jnp.zeros_like(Y)
    for k in range(nb):
        s = k * block
        rhs = Y[..., s:s + block, :]
        if k:
            L_row = L[..., s:s + block, :s]
            rhs = rhs - jnp.matmul(L_row, w[..., :s, :], precision=_HI)
        w = w.at[..., s:s + block, :].set(
            jnp.matmul(minvs[..., k, :, :], rhs, precision=_HI))
    logdet = 2.0 * jnp.sum(
        jnp.log(jnp.diagonal(L, axis1=-2, axis2=-1)), axis=-1)
    return w, logdet
