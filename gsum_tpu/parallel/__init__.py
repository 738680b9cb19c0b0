R"""Multi-chip execution: mesh construction and sharded batched fits.

The reference is single-process NumPy (SURVEY.md §2c); its implicit
parallelism axes — curves, observables, hyperparameter grids, and blocked
linear algebra within one large N — become explicit here as a
``jax.sharding.Mesh`` with a data axis (independent fits/grid points) and a
model axis (sharded covariance rows), with XLA inserting the collectives.
"""
from .mesh import make_mesh, shard_batch
from .batched import (BatchedPosterior, batched_fit, batched_lml_grid,
                      batched_posterior_at, batched_predict, make_lml_fn,
                      pointwise_evidence_grid, truncation_lml_grid)
from .pchol import (sharded_cgp_lml, sharded_cholesky, sharded_fit,
                    sharded_gram_logdet, sharded_kernel_lml,
                    sharded_mvn_lml)

__all__ = ['make_mesh', 'shard_batch', 'batched_fit', 'batched_predict',
           'batched_posterior_at', 'batched_lml_grid', 'truncation_lml_grid',
           'pointwise_evidence_grid', 'make_lml_fn', 'BatchedPosterior',
           'sharded_cholesky', 'sharded_kernel_lml', 'sharded_mvn_lml',
           'sharded_gram_logdet', 'sharded_cgp_lml', 'sharded_fit']
