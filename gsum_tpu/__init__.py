R"""gsum_tpu — TPU-native Bayesian truncation-error models (JAX/XLA/Pallas).

A from-scratch rebuild of the capabilities of ``buqeye/gsum`` (conjugacy-
based GP/Student-t models of series convergence, Melendez et al.,
arXiv:1904.10581) designed for TPU: pure-functional jit/vmap/grad-compatible
internals, autodiff gradients, batched/blocked linear algebra, and sharded
execution over device meshes.  The flat namespace mirrors the reference
(``import gsum_tpu as gm`` is a drop-in for ``import gsum as gm``).
"""
from . import _config  # noqa: F401  — x64 + compilation cache setup

from .helpers import cartesian
from .helpers import toy_data
from .helpers import generate_coefficients
from .helpers import coefficients
from .helpers import partials
from .helpers import predictions
from .helpers import stabilize
from .helpers import gaussian
from .helpers import hpd
from .helpers import hpd_pdf
from .helpers import median_pdf
from .helpers import kl_gauss
from .helpers import rbf
from .helpers import default_attributes
from .helpers import cholesky_errors
from .helpers import mahalanobis
from .helpers import lazy_property
from .helpers import lazy
from .helpers import VariogramFourthRoot
from .helpers import geometric_sum
from .helpers import pivoted_cholesky

from .kernels import (
    RBF, ConstantKernel, WhiteKernel, Matern, RationalQuadratic,
    ExpSineSquared, DotProduct, Sum, Product, Exponentiation, Kernel,
    Hyperparameter,
)

from .models import ConjugateGaussianProcess
from .models import ConjugateStudentProcess
from .models import TruncationGP
from .models import TruncationTP
from .models import TruncationPointwise
from .models import BaseConjugateProcess
from .models import TruncationProcess

from .diagnostics import Diagnostic
from .diagnostics import GraphicalDiagnostic

from .datasets import make_gaussian_partial_sums
from .datasets import make_gaussian_partial_sums_on_grid
from .datasets import make_gaussian_partial_sums_uniform

from .pdfmeta import add_pdf_metadata, get_pdf_metadata

from .derivs import deriv_cov, deriv_mean, kernel_deriv_cov

from .sample import (hmc, posterior_predictive, sample_theta_posterior,
                     sample_truncation_posterior,
                     truncation_posterior_predictive)

from . import derivs
from . import sample
from . import stats
from . import linalg
from . import checkpoint
from . import profiling
from . import ops
from . import parallel

__version__ = '0.1.0'
