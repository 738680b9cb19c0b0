R"""Breakdown-scale (Lambda_b) posterior from truncation evidence.

Reproduces the flow of the reference's ``truncation_recap.ipynb`` cells
37-42 (Melendez et al., arXiv:1704.03308 Sec. IV B) on real NN
total-cross-section data: fit the pointwise truncation model with the
scale-invariant prior (nu0 = 0), sweep the evidence ``log p(y | Lambda_b)``
over a grid of breakdown scales, multiply by the 1/Lambda_b prior, and
summarize the posterior with HPD intervals and the median.

The reference evaluates the sweep as a Python loop of per-Lambda_b
``log_likelihood`` calls (1500 per observable); here the entire sweep is
ONE jitted device program (`gsum_tpu.parallel.pointwise_evidence_grid`).

Run:  python examples/lambda_b_posterior.py [--data path.csv] [--out dir]
"""
import argparse
import os
import sys
import time

import matplotlib

matplotlib.use('Agg')
import matplotlib.pyplot as plt
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import gsum_tpu as gm  # noqa: E402
from gsum_tpu.parallel import pointwise_evidence_grid  # noqa: E402

DEFAULT_DATA = '/root/reference/examples/data/cross_sec_kvnn_41.csv'

# Proton/neutron masses [MeV/c^2] and the pion mass [MeV] that set the
# momentum scale of the chiral expansion parameter (arXiv:1704.03308 Eq. 9).
M_P, M_N, M_PI = 938.27208, 939.56541, 138.0


def lab_momentum(E_lab):
    """Relativistic np relative momentum [MeV] from lab energy [MeV]."""
    m1, m2 = M_N, M_P
    return np.sqrt(E_lab * m2 ** 2 * (E_lab + 2 * m1)
                   / ((m1 + m2) ** 2 + 2 * m2 * E_lab))


def expansion_parameter(E_lab, Lambda_b, n=8):
    """Q(E; Lambda_b): smooth max of m_pi and p over the breakdown scale."""
    p = lab_momentum(np.asarray(E_lab, dtype=float))
    return (M_PI ** n + p ** n) / (M_PI ** (n - 1) + p ** (n - 1)) / Lambda_b


def lb_logprior(Lb):
    """Uninformative 1/Lambda_b prior on [300, 1500] MeV (Eq. 31)."""
    return np.where((Lb >= 300) & (Lb <= 1500), -np.log(Lb), -np.inf)


def posterior_summary(log_post, Lb):
    """Normalize on the grid; HPD 68/95 bounds and median."""
    post = np.exp(log_post - np.max(log_post))
    post /= np.trapezoid(post, x=Lb)
    bounds = np.array([gm.hpd_pdf(pdf=post, alpha=p, x=Lb)
                       for p in (0.68, 0.95)])
    return post, bounds, float(gm.median_pdf(pdf=post, x=Lb))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--data', default=DEFAULT_DATA)
    ap.add_argument('--out', default='/tmp/gsum_tpu_example')
    ap.add_argument('--fast', action='store_true',
                    help='coarse grid for the suite smoke test')
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)

    import pandas as pd

    df = pd.read_csv(args.data)
    orders = np.array([0, 2, 3, 4, 5])
    excluded = [0]  # LO is not part of the convergence-pattern evidence

    # Evidence data: a handful of well-separated energies, as in the
    # notebook's t_lab_Lb = [96, 143, 200, 300].
    energies = np.array([96, 143, 200, 300])
    sub = df[df['Energy'].isin(energies) & (df['theta'] == 0)]
    y = sub[['0', '2', '3', '4', '5']].to_numpy()        # (N, n_orders)
    E = sub['Energy'].to_numpy()
    ref = y[:, 0]                                        # LO as the scale

    Lb_grid = np.arange(300.0, 1501.0, 40.0 if args.fast else 2.0)
    ratios = np.stack([expansion_parameter(E, Lb) for Lb in Lb_grid])
    logprior = lb_logprior(Lb_grid)

    fig, ax = plt.subplots(figsize=(5.5, 3.4))
    results = {}
    for max_idx, label, color in [(3, r'N$^3$LO', 'C0'), (4, r'N$^4$LO', 'C1')]:
        t0 = time.time()
        # scale-invariant prior: df=0 — the posterior is driven by the data
        log_ev = np.asarray(pointwise_evidence_grid(
            y[:, :max_idx + 1], orders[:max_idx + 1], ratios, ref=ref,
            df=0, scale=1, excluded=excluded))
        dt = time.time() - t0
        post, bounds, median = posterior_summary(log_ev + logprior, Lb_grid)
        results[label] = (post, bounds, median)
        print(f'{label}: {len(Lb_grid)} evidence evaluations in {dt:.3f}s '
              f'(one device program); median Lambda_b = {median:.0f} MeV, '
              f'68% HPD = [{bounds[0, 0]:.0f}, {bounds[0, 1]:.0f}] MeV')

        ax.plot(Lb_grid, post, color=color, label=label)
        ax.fill_between(Lb_grid, 0, post, color=color, alpha=0.2)
        h = -0.08 * (2 if max_idx == 4 else 1) * post.max()
        ax.plot(bounds[0], [h, h], c=color, lw=5, solid_capstyle='round')
        ax.plot(bounds[1], [h, h], c=color, lw=1.5, solid_capstyle='round')
        ax.plot([median], [h], c='white', marker='o', markersize=3, zorder=10)

    ax.set_xlabel(r'$\Lambda_b$ [MeV]')
    ax.set_ylabel(r'pr$(\Lambda_b \mid \mathbf{y})$')
    ax.set_xlim(300, 1200)
    ax.legend()
    ax.set_title('Breakdown-scale posterior, np total cross section')
    fig.tight_layout()
    out = os.path.join(args.out, 'lambda_b_posterior.png')
    fig.savefig(out, dpi=100)
    print(f'saved {out}')


if __name__ == '__main__':
    main()
