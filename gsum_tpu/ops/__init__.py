R"""Performance core: fused/batched TPU kernels (XLA + Pallas).

This package holds the throughput path of the library — batched covariance
build, blocked Cholesky, and fused MVN log-pdf — sized for the MXU and
VMEM rather than for API parity.  The correctness path lives in
``gsum_tpu.linalg``; everything here is validated against it.
"""
from .batched import (
    batched_chol_logpdf,
    batched_cholesky,
    batched_mvn_logpdf,
    rbf_covariance,
)
from .smallchol import (
    batched_grid_lml,
    batched_small_cholesky,
    batched_small_solve_triangular,
    batched_small_tri_inv,
)
from .gridlml import batched_cho_solve, cgp_lml_grid, cgp_lml_grid2, csp_lml_grid
from .pallas_cov import rbf_covariance_pallas
from .blockchol import (
    batched_blocked_cholesky,
    blocked_chol_solve_logdet,
    blocked_solve_lower,
)

__all__ = [
    'batched_cholesky', 'batched_mvn_logpdf', 'batched_chol_logpdf',
    'rbf_covariance', 'rbf_covariance_pallas', 'batched_small_cholesky',
    'batched_small_solve_triangular', 'batched_small_tri_inv',
    'batched_grid_lml', 'cgp_lml_grid', 'cgp_lml_grid2', 'csp_lml_grid',
    'batched_cho_solve', 'batched_blocked_cholesky', 'blocked_solve_lower',
    'blocked_chol_solve_logdet',
]
