R"""Hyperparameter-posterior sampling (beyond-reference).

The reference explores hyperparameter posteriors with dense Python grid
loops (``correlated_EFT_publication.ipynb`` cell 53: an 80x100 (Q, ls)
grid of full lml evaluations; ``truncation_recap.ipynb`` cells 37-42:
Lambda_b evidence sweeps).  This module adds the proper MCMC counterpart:
Hamiltonian Monte Carlo over the kernel's log-hyperparameters with the
jitted conjugate lml as the target, designed TPU-first —

- the whole warmup + sampling run is jitted ``lax.scan`` programs with
  no per-step host round trips through the TPU tunnel — on TPU split
  into bounded segment executions (``steps_per_call``, bit-identical to
  the single program: the tunneled worker kills overly long single
  executions, see CLAUDE.md), one program elsewhere;
- chains are ``vmap``-ed, so 4 or 4096 chains cost one program;
- box bounds are removed with the same sigmoid/softplus reparameterization
  the bounded L-BFGS uses (``optimize._to_bounded``), with the exact
  log-Jacobian added to the density, so samples respect the kernel's
  bounds without rejections;
- step size is tuned by dual averaging (Nesterov/NUTS-style) during
  warmup, inside the same scan.

``sample_theta_posterior`` gives the posterior over a fitted (or
unfitted) conjugate process's kernel hyperparameters under a
flat-within-bounds prior (any extra log-prior can be supplied); the
returned diagnostics include per-chain acceptance and split-R̂.
"""
from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from .optimize import _to_bounded, _to_unbounded

__all__ = ['hmc', 'sample_theta_posterior', 'sample_truncation_posterior',
           'posterior_predictive', 'truncation_posterior_predictive',
           'split_rhat', 'effective_sample_size']


def _log_jac_bounded(z, lo, hi):
    """log |d theta / d z| of :func:`optimize._to_bounded`, elementwise.

    two-sided: theta = lo + span*sigmoid(z)  -> log span - sp(z) - sp(-z)
    one-sided: theta = lo + softplus(z)      -> log sigmoid(z) = -sp(-z)
    unbounded: identity                      -> 0
    (sp = softplus; softplus' = sigmoid, sigmoid' = sig*(1-sig).)
    """
    lo_f, hi_f = jnp.isfinite(lo), jnp.isfinite(hi)
    both = lo_f & hi_f
    span = jnp.where(both, hi - lo, 1.0)
    lj_box = jnp.log(span) - jax.nn.softplus(z) - jax.nn.softplus(-z)
    lj_one = -jax.nn.softplus(-z)
    return jnp.where(both, lj_box,
                     jnp.where(lo_f | hi_f, lj_one, 0.0))


def _make_hmc_programs(logdensity, d, n_leapfrog, init_step_size,
                       target_accept):
    """Per-chain warmup / sampling segment programs.

    ``warmup_seg(carry, i0, n)`` advances ``n`` dual-averaging warmup
    steps starting at step index ``i0``; ``sample_seg(carry, n)``
    advances ``n`` sampling steps and returns their draws.  Both are pure
    fixed-trip ``lax.scan`` programs, so scanning the same total in one
    call or several identical-carry segments is the SAME computation —
    which is what lets :func:`_run_bounded_hmc` split long chains into
    bounded device executions (the tunneled TPU worker here kills single
    executions that run too long; see CLAUDE.md and docs/perf.md).
    """
    grad_fn = jax.value_and_grad(logdensity)

    def leapfrog(z, p, eps):
        def body(carry, _):
            z, p = carry
            _, g = grad_fn(z)
            p_half = p + 0.5 * eps * g
            z_new = z + eps * p_half
            _, g_new = grad_fn(z_new)
            p_new = p_half + 0.5 * eps * g_new
            return (z_new, p_new), None

        (z_T, p_T), _ = jax.lax.scan(body, (z, p), None, length=n_leapfrog)
        return z_T, p_T

    def proposal(z, lp, eps, key):
        key, kp, ku, kj = jax.random.split(key, 4)
        # Jitter the step size (hence trajectory length) uniformly over
        # [0.5, 1.5]*eps per proposal (Neal 2011 §3.2): a FIXED length
        # eps*L can resonate with a harmonic period of the target —
        # observed on the (ls, Lambda_b) truncation posterior, where the
        # trajectory matched the Lambda_b period and every proposal
        # carried that coordinate back to its start (ESS ~ 2/1000).
        # Randomizing the length breaks every such resonance; detailed
        # balance holds because the jitter is independent of the state.
        eps = eps * (0.5 + jax.random.uniform(kj, dtype=z.dtype))
        p = jax.random.normal(kp, (d,), dtype=z.dtype)
        z_new, p_new = leapfrog(z, p, eps)
        lp_new = logdensity(z_new)
        # failed factorizations (-inf lml) or NaNs reject deterministically
        log_alpha = (lp_new - lp
                     - 0.5 * jnp.sum(p_new ** 2) + 0.5 * jnp.sum(p ** 2))
        log_alpha = jnp.where(jnp.isfinite(log_alpha), log_alpha, -jnp.inf)
        accept_p = jnp.minimum(1.0, jnp.exp(log_alpha))
        accept = jnp.log(jax.random.uniform(ku, dtype=z.dtype)) < log_alpha
        z = jnp.where(accept, z_new, z)
        lp = jnp.where(accept, lp_new, lp)
        return z, lp, accept_p, key

    # dual averaging (Hoffman & Gelman 2014, Algorithm 5 constants)
    mu = jnp.log(10.0 * init_step_size)
    gamma, t0, kappa = 0.05, 10.0, 0.75

    def warmup_step(carry, i):
        z, lp, key, log_eps, log_eps_bar, h_bar = carry
        eps = jnp.exp(log_eps)
        z, lp, accept_p, key = proposal(z, lp, eps, key)
        t = i + 1.0
        h_bar = (1 - 1 / (t + t0)) * h_bar \
            + (target_accept - accept_p) / (t + t0)
        log_eps = mu - jnp.sqrt(t) / gamma * h_bar
        w = t ** (-kappa)
        log_eps_bar = w * log_eps + (1 - w) * log_eps_bar
        return (z, lp, key, log_eps, log_eps_bar, h_bar), None

    def warmup_seg(carry, i0, n):
        idx = i0 + jnp.arange(n, dtype=carry[0].dtype)
        carry, _ = jax.lax.scan(warmup_step, carry, idx)
        return carry

    def sample_step(carry, _):
        z, lp, eps, key = carry
        z, lp, accept_p, key = proposal(z, lp, eps, key)
        return (z, lp, eps, key), (z, accept_p)

    def sample_seg(carry, n):
        carry, (samples, accept_ps) = jax.lax.scan(sample_step, carry, None,
                                                   length=n)
        return carry, samples, accept_ps

    return warmup_seg, sample_seg


def hmc(logdensity, z0, key, n_samples=1000, n_warmup=500, n_leapfrog=16,
        init_step_size=0.1, target_accept=0.8):
    """Single-chain HMC as one jitted two-scan program; ``vmap`` for chains.

    ``logdensity(z) -> scalar`` must be JAX-traceable on the unconstrained
    vector ``z``.  A fixed number of leapfrog steps per proposal keeps the
    program free of data-dependent trip counts (the TPU rule: fixed-trip
    ``lax.scan``, never ``while_loop`` — see CLAUDE.md).  Warmup adapts
    the step size by dual averaging toward ``target_accept``; sampling
    runs at the adapted (averaged) step size.

    Returns ``(samples, info)``: samples ``(n_samples, d)`` and a dict
    with ``accept_rate`` (mean over the sampling phase), ``step_size``,
    and the final ``logdensity`` value.

    NOTE: as one program this runs ``(n_warmup + n_samples) * n_leapfrog``
    gradient evaluations in a single device execution — on this box's
    tunneled TPU, long chains must instead go through the segmented
    driver used by :func:`sample_theta_posterior` (``steps_per_call``).
    """
    z0 = jnp.asarray(z0, dtype=jnp.result_type(float))
    d = z0.shape[0]
    warmup_seg, sample_seg = _make_hmc_programs(
        logdensity, d, n_leapfrog, init_step_size, target_accept)

    def run(z0, key):
        lp0 = logdensity(z0)
        carry = (z0, lp0, key, jnp.log(init_step_size),
                 jnp.log(init_step_size), 0.0)
        carry = warmup_seg(carry, jnp.asarray(0.0, z0.dtype), n_warmup)
        z, lp, key = carry[0], carry[1], carry[2]
        eps = jnp.exp(carry[4])  # averaged step size
        (z, lp, eps, key), samples, accept_ps = sample_seg(
            (z, lp, eps, key), n_samples)
        return samples, {'accept_rate': jnp.mean(accept_ps),
                         'step_size': eps, 'final_logdensity': lp}

    return run(z0, key)


def split_rhat(chains):
    """Split-R̂ convergence diagnostic (Gelman et al., BDA3 eq. 11.4).

    ``chains``: (n_chains, n_samples, d).  Each chain is split in half;
    values near 1 indicate between/within-chain agreement.  Returns (d,).
    """
    c = np.asarray(chains, dtype=float)
    n_chains, n, d = c.shape
    half = n // 2
    c = np.concatenate([c[:, :half], c[:, half:2 * half]], axis=0)
    m, n = c.shape[0], c.shape[1]
    chain_means = c.mean(axis=1)                      # (m, d)
    chain_vars = c.var(axis=1, ddof=1)                # (m, d)
    B = n * chain_means.var(axis=0, ddof=1)           # (d,)
    W = chain_vars.mean(axis=0)                       # (d,)
    var_plus = (n - 1) / n * W + B / n
    return np.sqrt(var_plus / np.where(W > 0, W, 1.0))


def effective_sample_size(chains):
    R"""Multi-chain effective sample size (BDA3 §11.5 / Stan's estimator).

    ``chains``: (n_chains, n_samples, d).  Per-lag autocovariances are
    averaged over chains and combined with the between-chain variance
    (``var_plus``, as in :func:`split_rhat`); the sum over lags uses
    Geyer's initial-monotone-positive-pair truncation.  Returns (d,)
    estimated counts of independent draws; host-side NumPy (FFT
    autocovariance), like the other sampling diagnostics.
    """
    c = np.asarray(chains, dtype=float)
    m, n, d = c.shape
    cc = c - c.mean(axis=1, keepdims=True)
    # FFT autocovariance per (chain, dim), biased normalization (1/n)
    nfft = int(2 ** np.ceil(np.log2(2 * n)))
    f = np.fft.rfft(cc, n=nfft, axis=1)
    acov = np.fft.irfft(f * np.conj(f), n=nfft, axis=1)[:, :n].real / n
    chain_vars = c.var(axis=1, ddof=1)                       # (m, d)
    W = chain_vars.mean(axis=0)                              # (d,)
    B_over_n = c.mean(axis=1).var(axis=0, ddof=1) if m > 1 else 0.0
    var_plus = (n - 1) / n * W + B_over_n                    # (d,)

    rho = 1.0 - (W - acov.mean(axis=0)) / np.where(var_plus > 0, var_plus,
                                                   1.0)      # (n, d)
    ess = np.empty(d)
    for j in range(d):
        # Geyer: sum consecutive-lag pairs while positive and decreasing
        pair = rho[:-1 if n % 2 else None, j].reshape(-1, 2).sum(axis=1)
        run = np.minimum.accumulate(pair)
        keep = run > 0
        tau = -1.0 + 2.0 * np.cumsum(np.where(keep, run, 0.0))[-1] \
            if keep.any() else 1.0
        ess[j] = m * n / max(tau, 1.0 / (m * n))
    return ess


_TPU_STEPS_PER_CALL = 128  # (x n_leapfrog gradient evals) per execution


def _run_bounded_hmc(loglike, bounds, x0_center, n_chains, n_samples,
                     n_warmup, n_leapfrog, init_step_size, target_accept,
                     random_state, extra_log_prior=None,
                     steps_per_call=None):
    """Shared driver: vmapped-chain HMC on a box-bounded vector.

    ``loglike(x) -> scalar`` on the BOUNDED vector; the box is removed by
    the sigmoid/softplus reparameterization with its exact log-Jacobian
    added to the density, so the target in x-space is
    ``exp(loglike(x)) * exp(extra_log_prior(x))`` times a flat prior
    within the bounds.  Chain inits jitter around ``x0_center``.
    Returns (samples_in_x_space (n_chains, n_samples, d), info dict).

    ``steps_per_call`` bounds how many HMC steps one device execution
    scans (None: 128 on TPU, unsegmented elsewhere).  The tunneled TPU
    worker on this box kills single executions that run too long — a
    4-chain 2500-step run at n_leapfrog=16 (40k lml+gradient evaluations
    in one program) crashed it — so long chains run as a host loop of
    identical-carry segment dispatches: same scan math, same RNG stream,
    bit-identical samples, with nothing fetched until the end (dispatches
    are async; only the final transfer synchronizes).
    """
    bounds = np.asarray(bounds, dtype=float)
    d = bounds.shape[0]
    lo = jnp.asarray(bounds[:, 0])
    hi = jnp.asarray(bounds[:, 1])

    def logdensity(z):
        x = _to_bounded(z, lo, hi)
        lp = loglike(x) + jnp.sum(_log_jac_bounded(z, lo, hi))
        if extra_log_prior is not None:
            lp = lp + extra_log_prior(x)
        return jnp.squeeze(lp)

    rng = np.random.RandomState(
        random_state if isinstance(random_state, (int, np.integer)) else None)
    inits = np.asarray(x0_center, dtype=float)[None, :] \
        + 0.1 * rng.randn(n_chains, d)
    fin = np.isfinite(bounds)
    lo_np = np.where(fin[:, 0], bounds[:, 0], -np.inf)
    hi_np = np.where(fin[:, 1], bounds[:, 1], np.inf)
    span = np.where(fin.all(axis=1), hi_np - lo_np, 1.0)
    inits = np.clip(inits, lo_np + 1e-3 * span, hi_np - 1e-3 * span)
    z0 = jax.vmap(lambda th: _to_unbounded(th, lo, hi))(jnp.asarray(inits))

    keys = jax.random.split(jax.random.PRNGKey(
        random_state if isinstance(random_state, (int, np.integer)) else 0),
        n_chains)

    if steps_per_call is None:
        steps_per_call = (_TPU_STEPS_PER_CALL
                          if jax.default_backend() == 'tpu' else 0)

    if not steps_per_call:
        run = jax.jit(jax.vmap(lambda z, k: hmc(
            logdensity, z, k, n_samples=n_samples, n_warmup=n_warmup,
            n_leapfrog=n_leapfrog, init_step_size=init_step_size,
            target_accept=target_accept)))
        zs, info = run(z0, keys)
    else:
        zs, info = _segmented_chains(
            logdensity, z0, keys, n_samples, n_warmup, n_leapfrog,
            init_step_size, target_accept, int(steps_per_call))

    xs = jax.vmap(jax.vmap(lambda z: _to_bounded(z, lo, hi)))(zs)
    info = {k: np.asarray(v) for k, v in info.items()}
    xs_np = np.asarray(xs)
    info['rhat'] = split_rhat(xs_np)
    info['ess'] = effective_sample_size(xs_np)
    return xs, info


def _segmented_chains(logdensity, z0, keys, n_samples, n_warmup, n_leapfrog,
                      init_step_size, target_accept, steps_per_call):
    """Vmapped chains as a host loop of bounded segment executions.

    Identical math to the one-program path (the scans compose over the
    carried state and the per-proposal RNG keys live in the carry), just
    split into executions of at most ``steps_per_call`` HMC steps each.
    At most two distinct segment lengths occur per phase, so at most four
    programs compile.
    """
    d = z0.shape[-1]
    dtype = z0.dtype
    warmup_seg, sample_seg = _make_hmc_programs(
        logdensity, d, n_leapfrog, init_step_size, target_accept)

    progs = {}

    def call(kind, carry, i0, n):
        fn = progs.get((kind, n))
        if fn is None:
            if kind == 'warm':
                fn = jax.jit(jax.vmap(
                    lambda c, j0: warmup_seg(c, j0, n), in_axes=(0, None)))
            else:
                fn = jax.jit(jax.vmap(lambda c: sample_seg(c, n)))
            progs[(kind, n)] = fn
        if kind == 'warm':
            return fn(carry, jnp.asarray(i0, dtype))
        return fn(carry)

    def segments(total):
        done = 0
        while done < total:
            n = min(steps_per_call, total - done)
            yield done, n
            done += n

    lp0 = jax.jit(jax.vmap(logdensity))(z0)
    C = z0.shape[0]
    le0 = jnp.full((C,), jnp.log(init_step_size), dtype)
    carry = (z0, lp0, keys, le0, le0, jnp.zeros((C,), dtype))
    for i0, n in segments(n_warmup):
        carry = call('warm', carry, i0, n)

    eps = jnp.exp(carry[4])  # averaged step size
    scarry = (carry[0], carry[1], eps, carry[2])
    zs_parts, ap_parts = [], []
    for _, n in segments(n_samples):
        scarry, z_seg, ap_seg = call('sample', scarry, 0, n)
        zs_parts.append(z_seg)
        ap_parts.append(ap_seg)

    zs = jnp.concatenate(zs_parts, axis=1)             # (C, n_samples, d)
    accept = jnp.mean(jnp.concatenate(ap_parts, axis=1), axis=1)
    info = {'accept_rate': accept, 'step_size': scarry[2],
            'final_logdensity': scarry[1]}
    return zs, info


def sample_theta_posterior(gp, X=None, y=None, n_chains=4, n_samples=1000,
                           n_warmup=500, n_leapfrog=16, init_step_size=0.1,
                           target_accept=0.8, random_state=0,
                           extra_log_prior=None, steps_per_call=None,
                           mesh=None, mesh_axis='model'):
    R"""HMC posterior over a conjugate process's kernel log-hyperparameters.

    The target is :math:`p(\theta\mid y) \propto \exp(\mathrm{lml}(\theta))`
    times a flat prior within the kernel's bounds (the same improper-
    uniform-in-:math:`\log\theta` convention as the reference's MAP
    optimization and grid posteriors — reference models.py:884-900 and
    the (Q, ls) grids of correlated_EFT_publication.ipynb cell 53), times
    ``exp(extra_log_prior(theta))`` if supplied (traceable, log-θ input).

    ``gp``: any conjugate process (CGP/CSP).  If fitted, its training data
    (including derivative observations) and fitted-kernel structure are
    used; otherwise pass ``X``/``y`` explicitly.  All chains run in ONE
    jitted vmapped program on the default backend.

    Returns ``(thetas, info)``: ``thetas`` is (n_chains, n_samples, n_dims)
    in log space (apply ``np.exp`` for natural parameters), ``info`` has
    per-chain ``accept_rate``, adapted ``step_size``, ``rhat`` (d,), and
    ``ess`` (d,) effective sample sizes.

    ``steps_per_call``: maximum HMC steps per device execution (None:
    128 on TPU — the tunneled worker here kills overly long single
    executions — unsegmented elsewhere; 0 forces one program).
    Segmentation is an execution detail: the samples are identical.

    ``mesh``/``mesh_axis``: model-parallel large-N path.  With a
    :class:`jax.sharding.Mesh`, every lml (and each leapfrog gradient —
    the forward-mode custom VJP is p JVP passes of the same program)
    evaluates through :func:`gsum_tpu.parallel.sharded_cgp_lml`: the
    (N, N) correlation matrix is built and factorized row-sharded over
    ``mesh[mesh_axis]`` and never materialized on one device, so
    full-Bayes hyperparameter posteriors stay available at the N=8k-16k
    scales where the dense objective exceeds a single chip
    (ConjugateGaussianProcess only; the reference has no counterpart —
    its grids re-evaluate one dense LAPACK lml per point,
    gsum/models.py:912-1057).
    """
    kernel = gp._kernel_for_lml()
    if kernel.n_dims == 0:
        raise ValueError('kernel has no free hyperparameters to sample')
    if X is None and gp.X_train_ is None:
        raise ValueError('pass X/y or fit the model first')

    X_arr = jnp.atleast_2d(jnp.asarray(gp.X_train_ if X is None else X))
    y_arr = jnp.asarray(gp.y_train_ if y is None else y)
    y2 = y_arr[:, None] if y_arr.ndim == 1 else y_arr
    if X is None and getattr(gp, 'dorders_', None) is not None:
        basis = jnp.asarray(gp.basis_train_)
    else:
        basis = gp.basis(X_arr)

    if mesh is not None:
        from .models import (ConjugateGaussianProcess as _CGP,
                             ConjugateStudentProcess as _CSP)
        from .parallel.pchol import sharded_cgp_lml

        if not isinstance(gp, _CGP) or isinstance(gp, _CSP):
            raise TypeError('mesh-sharded sampling targets the '
                            'ConjugateGaussianProcess lml')
        if X is None and getattr(gp, 'dorders_', None) is not None:
            raise ValueError('derivative training data is not supported '
                             'in the sharded lml path')
        value_fn = kernel.value_fn
        c0 = np.atleast_1d(gp.center0)
        V0 = np.atleast_2d(gp.disp0)
        df0, scale0, nugget = gp.df0, gp.scale0, gp.nugget

        def loglike(theta):
            return sharded_cgp_lml(value_fn, theta, X_arr, y2, basis,
                                   c0, V0, df0, scale0, mesh,
                                   axis=mesh_axis, nugget=nugget)
    else:
        value, _ = gp._lml_closure(kernel)

        def loglike(theta):
            return value(theta, X_arr, y2, basis)

    return _run_bounded_hmc(
        loglike, np.asarray(kernel.bounds, dtype=float),
        np.asarray(kernel.theta, dtype=float), n_chains, n_samples,
        n_warmup, n_leapfrog, init_step_size, target_accept, random_state,
        extra_log_prior=extra_log_prior, steps_per_call=steps_per_call)


def posterior_predictive(gp, Xnew, thetas, X=None, y=None, thin=1,
                         chunk=128, return_draws=False):
    R"""Full-Bayes predictive at ``Xnew``: the mixture over hyperparameter
    posterior draws, completing :func:`sample_theta_posterior`.

    The reference (and this library's ``predict``) conditions on ONE
    kernel — the MAP fit.  Given posterior draws ``thetas`` (from
    :func:`sample_theta_posterior`, or any (B, n_dims) log-θ array such as
    quadrature nodes), this computes each draw's conjugate posterior state
    and predictive moments in device batches
    (:func:`gsum_tpu.parallel.batched_posterior_at` →
    :func:`gsum_tpu.parallel.batched_predict`) and mixes them exactly by
    the law of total variance:

    .. math::
        m(x) = E_\theta[m_\theta(x)], \qquad
        s^2(x) = E_\theta[s_\theta^2(x) + m_\theta(x)^2] - m(x)^2.

    The mixture moments are exact; treating the band as Gaussian at
    ``m ± z s`` is the usual approximation (the exact mixture is available
    from the per-draw moments via ``return_draws=True``).

    Parameters
    ----------
    gp : fitted ConjugateGaussianProcess or ConjugateStudentProcess
        (``decomposition='cholesky'``).  For the Student process each
        per-draw predictive includes the conditional-basis
        mean-uncertainty term, entered variance-additively
        (``std_draw = sqrt(sigma^2 + mu_var)``, the class
        ``return_cov`` diagonal) so the law-of-total-variance mixture
        below is exact; note this differs from the class
        ``return_std`` convention ``sigma + sqrt(mu_var)``.
    Xnew : (N_new, d) prediction points
    thetas : (B, n_dims) or (n_chains, n_samples, n_dims) log-space draws
    X, y : optional training-data override (default: the fitted data)
    thin : keep every ``thin``-th draw (HMC draws are autocorrelated;
        the mixture converges at the effective sample size anyway)
    chunk : draws per device call (see :func:`batched_posterior_at`)
    return_draws : also return the per-draw ``(means, stds)`` arrays

    Returns
    -------
    (mean, std) arrays of shape (N_new, m) — or
    (mean, std, means_draws, stds_draws) with ``return_draws=True``.
    """
    from .models import (ConjugateGaussianProcess as _CGP,
                         ConjugateStudentProcess as _CSP)
    from .parallel import batched_posterior_at, batched_predict

    if not isinstance(gp, (_CGP, _CSP)):
        raise TypeError('posterior_predictive supports the conjugate '
                        'Gaussian and Student processes')
    student = isinstance(gp, _CSP)
    if getattr(gp, 'decomposition', 'cholesky') != 'cholesky':
        raise ValueError("posterior_predictive needs decomposition="
                         "'cholesky'")
    if X is None and gp.X_train_ is None:
        raise ValueError('pass X/y or fit the model first')
    if X is not None and y is None and gp.y_train_ is None:
        raise ValueError('X was overridden on an unfitted model — pass y '
                         'as well')
    if X is None and getattr(gp, 'dorders_', None) is not None:
        raise ValueError('derivative training data is not supported in '
                         'the batched predictive path')

    thetas = np.asarray(thetas, dtype=float)
    if thetas.ndim == 3:
        thetas = thetas.reshape(-1, thetas.shape[-1])
    thetas = thetas[::max(int(thin), 1)]
    kernel_chk = gp._kernel_for_lml()
    if thetas.shape[-1] != kernel_chk.n_dims:
        raise ValueError('thetas have %d columns but the kernel has %d '
                         'free dimensions'
                         % (thetas.shape[-1], kernel_chk.n_dims))

    X_arr = jnp.atleast_2d(jnp.asarray(gp.X_train_ if X is None else X))
    y_arr = jnp.asarray(gp.y_train_ if y is None else y)
    y2 = y_arr[:, None] if y_arr.ndim == 1 else y_arr

    kernel = gp._kernel_for_lml()
    Xn = jnp.atleast_2d(jnp.asarray(Xnew))
    B = thetas.shape[0]
    step = int(chunk) if chunk else B
    # chunk the predict pass too (the tunneled TPU worker kills overlong
    # single executions); at most two program shapes compile per pass
    means_parts, stds_parts = [], []
    for i in range(0, B, step):
        t_i = thetas[i:i + step]
        post = batched_posterior_at(
            kernel, X_arr, y2, t_i, center=gp.center0, disp=gp.disp0,
            df=gp.df0, scale=gp.scale0, nugget=gp.nugget, basis=gp.basis,
            chunk=None)
        y_b = jnp.broadcast_to(y2, (t_i.shape[0],) + y2.shape)
        # student_mode='variance': the LTV mixture below needs TRUE per-draw
        # predictive stds (sigma^2 + mu_var), not the class return_std
        # convention sigma + sqrt(mu_var) — squaring the latter would
        # inject a spurious 2*sigma*sqrt(mu_var) cross term
        m_i, s_i = batched_predict(kernel, post, X_arr, y_b, Xn,
                                   basis=gp.basis, student=student,
                                   student_mode='variance')
        means_parts.append(m_i)
        stds_parts.append(s_i)
    means = jnp.concatenate(means_parts, axis=0)
    stds = jnp.concatenate(stds_parts, axis=0)

    mean_mix = jnp.mean(means, axis=0)                     # (N_new, m)
    var_mix = jnp.mean(stds[:, :, None] ** 2 + means ** 2,
                       axis=0) - mean_mix ** 2
    std_mix = jnp.sqrt(jnp.clip(var_mix, 0.0))
    if return_draws:
        return mean_mix, std_mix, means, stds
    return mean_mix, std_mix


def truncation_posterior_predictive(tgp, Xnew, order, draws, ratio_param,
                                    thin=1, chunk=128, return_draws=False):
    R"""Full-Bayes truncation-error band at ``Xnew``: the mixture of the
    per-draw bands over joint (θ, q) posterior draws — the physics
    deliverable of :func:`sample_truncation_posterior`.

    The reference reports truncation bands conditioned on ONE (θ, Λ_b)
    point (the MAP or a grid summary).  Here every draw gets its own
    band: coefficients are re-extracted at the draw's expansion parameter
    (``c_n = Δy_n/(ref·ratio^n)``, reference helpers.py:71-101), the
    conjugate posterior is recomputed at the draw's θ, and the truncation
    prior band ``ref·Σ_{n>k} ratio^n`` scales it (the ``kind='trunc'``
    branch of ``TruncationProcess.predict``, reference models.py:1474-1477)
    — all as ONE vmapped device program per chunk, then mixed exactly by
    the law of total variance.

    Scope: the unconstrained Gaussian case — TruncationGP without
    ``dX/dy`` constraint data (the constrained branch's jitter-ladder
    solves and the Student process's basis-dispersion term stay on the
    per-draw class path).

    Parameters
    ----------
    tgp : fitted TruncationGP whose ``ratio`` callable takes the keyword
        ``ratio_param`` (jnp-traceable in it) — the same contract as
        :func:`sample_truncation_posterior`
    Xnew : (N_new, d) prediction points
    order : highest order included in the partial sum; the band is for
        ``y_inf - y_order``
    draws : (B, n_theta + 1) or (n_chains, n_samples, n_theta + 1) with
        q in the LAST column — the layout
        :func:`sample_truncation_posterior` returns
    ratio_param : keyword of ``tgp.ratio`` the q column feeds
    thin, chunk, return_draws : as in :func:`posterior_predictive`

    Returns
    -------
    (mean, std) arrays of shape (N_new,) — or
    (mean, std, means_draws, stds_draws) with ``return_draws=True``.
    """
    from . import conjugate as _conj
    from .helpers import coefficients, geometric_sum
    from .models import ConjugateGaussianProcess as _CGP

    if not getattr(tgp, '_fit', False):
        raise ValueError('fit the truncation process first')
    cp = tgp.coeffs_process
    if type(cp).__name__ == 'ConjugateStudentProcess' or \
            not isinstance(cp, _CGP):
        raise TypeError('truncation_posterior_predictive supports '
                        'TruncationGP (Gaussian coefficient process)')
    if tgp.dX_ is not None:
        raise ValueError('constrained truncation (dX/dy) is not supported '
                         'in the batched predictive path — mix per-draw '
                         'class predict calls instead')

    draws = np.asarray(draws, dtype=float)
    if draws.ndim == 3:
        draws = draws.reshape(-1, draws.shape[-1])
    draws = draws[::max(int(thin), 1)]
    n_t = draws.shape[1] - 1

    kernel = cp._kernel_for_lml()
    if kernel.n_dims != n_t:
        raise ValueError('draws have %d theta columns, kernel has %d '
                         'free dimensions' % (n_t, kernel.n_dims))
    frozen = kernel.clone()
    X_tr = jnp.atleast_2d(jnp.asarray(tgp.X_train_))
    Xn = jnp.atleast_2d(jnp.asarray(Xnew))
    y_tr = jnp.asarray(tgp.y_train_)
    orders = np.asarray(tgp.orders_)
    mask = ~np.isin(orders, tgp.excluded)
    basis_tr = jnp.asarray(cp.basis(X_tr))
    basis_n = jnp.asarray(cp.basis(Xn))
    c0 = np.atleast_1d(cp.center0)
    V0 = np.atleast_2d(cp.disp0)
    df0, scale0, nugget = cp.df0, cp.scale0, cp.nugget
    N = X_tr.shape[0]
    ref_tr = jnp.asarray(tgp.ref(X_tr))
    ref_n = jnp.asarray(tgp.ref(Xn))
    start = int(order) + 1
    excluded = tgp.excluded

    def one(theta, q):
        kws = {ratio_param: q}
        ratio_tr = tgp.ratio(X_tr, **kws)
        coeffs = coefficients(y=y_tr, ratio=ratio_tr, ref=ref_tr,
                              orders=orders)[:, mask]
        R = frozen.value_fn(theta, X_tr, None)
        L = jnp.linalg.cholesky(R + nugget * jnp.eye(N, dtype=R.dtype))
        center = _conj.compute_center(coeffs, L, basis_tr, c0, V0)
        df_ = _conj.compute_df(coeffs, df0)
        scale_sq = _conj.compute_scale_sq(coeffs, L, basis_tr, c0, V0,
                                          df0, scale0)
        cov_factor = _conj.compute_cov_factor(scale_sq, df_)

        ratio_n = tgp.ratio(Xn, **kws)
        gs_mean = geometric_sum(x=ratio_n, start=start, end=np.inf,
                                excluded=excluded)
        m = ref_n * gs_mean * (basis_n @ center)
        gs_var = geometric_sum(x=ratio_n * ratio_n, start=start, end=np.inf,
                               excluded=excluded)
        # per-point (x, x) kernel values, NOT diagonal(value_fn(Xn)): the
        # class trunc band evaluates kernel_(X, X), which for e.g.
        # WhiteKernel components differs from kernel_(X) (models.py:301-303)
        # — and the scalar form avoids a (B, N_new, N_new) intermediate
        R_nn_diag = jax.vmap(
            lambda x: frozen.value_fn(theta, x[None, :], x[None, :])[0, 0])(Xn)
        var = ref_n ** 2 * gs_var * cov_factor * R_nn_diag
        return m, jnp.sqrt(jnp.clip(var, 0.0))

    fn = jax.jit(jax.vmap(one))
    B = draws.shape[0]
    step = int(chunk) if chunk else B
    means_parts, stds_parts = [], []
    for i in range(0, B, step):
        d_i = jnp.asarray(draws[i:i + step], dtype=X_tr.dtype)
        m_i, s_i = fn(d_i[:, :n_t], d_i[:, n_t])
        means_parts.append(m_i)
        stds_parts.append(s_i)
    means = jnp.concatenate(means_parts, axis=0)       # (B, N_new)
    stds = jnp.concatenate(stds_parts, axis=0)

    mean_mix = jnp.mean(means, axis=0)
    var_mix = jnp.mean(stds ** 2 + means ** 2, axis=0) - mean_mix ** 2
    std_mix = jnp.sqrt(jnp.clip(var_mix, 0.0))
    if return_draws:
        return mean_mix, std_mix, means, stds
    return mean_mix, std_mix


def sample_truncation_posterior(tgp, ratio_param, q_bounds, q0=None,
                                n_chains=4, n_samples=1000, n_warmup=500,
                                n_leapfrog=16, init_step_size=0.1,
                                target_accept=0.8, random_state=0,
                                extra_log_prior=None, steps_per_call=None):
    R"""Joint HMC posterior over (kernel θ, expansion parameter q) of a
    fitted truncation process — the flagship cell-53 workflow as MCMC.

    The reference computes this posterior as an 80×100 (Q, ls) grid of
    8000 sequential ``TruncationProcess.log_marginal_likelihood`` calls
    (correlated_EFT_publication.ipynb cell 53; the change-of-variables
    determinant makes the joint density over (θ, q) proper —
    reference models.py:1485-1507).  Here the same density — the model's
    own ``log_marginal_likelihood(theta, **{ratio_param: q})``, traced
    end-to-end through coefficient extraction — is sampled by the
    vmapped-chain HMC of :func:`hmc`.

    Parameters
    ----------
    tgp : fitted TruncationGP/TruncationTP whose ``ratio`` callable takes
        the keyword ``ratio_param`` (jnp-traceable in it), e.g.
        ``ratio=lambda X, breakdown: p(X) / breakdown`` with
        ``ratio_param='breakdown'``.
    q_bounds : (lo, hi) box for q (NATURAL scale — pass log-scale bounds
        and a log-scale ratio callable if you want log sampling).
    q0 : starting value (default: box midpoint).
    extra_log_prior : callable ``x -> scalar`` on the full sampled vector
        ``x = [theta..., q]`` — e.g. the 1/Λ_b prior
        ``lambda x: -jnp.log(x[-1])``.

    Returns (samples, info): samples (n_chains, n_samples, n_theta + 1)
    with q in the LAST column; info as in :func:`sample_theta_posterior`.
    """
    if not getattr(tgp, '_fit', False):
        raise ValueError('fit the truncation process first (any ratio '
                         'value works; it is resampled here)')
    kernel = tgp.coeffs_process._kernel_for_lml()
    n_t = kernel.n_dims
    if n_t == 0:
        raise ValueError('kernel has no free hyperparameters to sample')
    lo_q, hi_q = float(q_bounds[0]), float(q_bounds[1])
    if q0 is None:
        q0 = 0.5 * (lo_q + hi_q)

    def loglike(x):
        theta, q = x[:n_t], x[n_t]
        return tgp.log_marginal_likelihood(theta, **{ratio_param: q})

    bounds = np.vstack([np.asarray(kernel.bounds, dtype=float),
                        [[lo_q, hi_q]]])
    x0 = np.concatenate([np.asarray(kernel.theta, dtype=float), [q0]])
    return _run_bounded_hmc(
        loglike, bounds, x0, n_chains, n_samples, n_warmup, n_leapfrog,
        init_step_size, target_accept, random_state,
        extra_log_prior=extra_log_prior, steps_per_call=steps_per_call)
