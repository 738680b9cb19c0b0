R"""End-to-end truncation-error analysis — the library's flagship workflow.

Reproduces the computational flow of the reference's
``correlated_EFT_publication.ipynb`` on real NN-scattering cross-section
data: extract EFT coefficients, MAP-fit a ConjugateGaussianProcess, plot
order-by-order predictions with correlated truncation-error bands, run the
model-checking diagnostics, and compute the (Q, ls) joint posterior on a
grid — the grid evaluated as ONE jitted, vmapped program on the accelerator
instead of the notebook's 8000-iteration Python loop.

Run:  python examples/truncation_analysis.py [--data path.csv] [--out dir]
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

DEFAULT_DATA = '/root/reference/examples/data/cross_sec_kvnn_41.csv'


def load_data(path):
    import pandas as pd

    df = pd.read_csv(path)
    sub = df[df['theta'] == 0].iloc[4:100:2]
    orders = np.array([0, 2, 3, 4, 5])
    y = sub[['0', '2', '3', '4', '5']].to_numpy()
    Q = sub['Q'].to_numpy()
    E = sub['Energy'].to_numpy()
    return E, (E / E.max())[:, None], y, orders, Q


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--data', default=DEFAULT_DATA)
    ap.add_argument('--out', default='/tmp/gsum_tpu_example')
    ap.add_argument('--fast', action='store_true',
                    help='tiny sizes for the suite smoke test')
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)

    E, X, y, orders, Q = load_data(args.data)
    if args.fast:
        E, X, y, Q = E[::2], X[::2], y[::2], Q[::2]
    ref_scale = y[:, 0]
    print(f'{len(E)} energies, orders {orders}')

    # ------------------------------------------------------------------
    # 1. MAP fit of the correlated truncation model
    # ------------------------------------------------------------------
    kernel = gm.RBF(0.5, (1e-2, 1e2))
    tgp = gm.TruncationGP(kernel=kernel, ratio=Q.mean(), ref=float(ref_scale.mean()),
                          center=0, disp=0, df=3, scale=1, nugget=1e-8)
    t0 = time.time()
    tgp.fit(X, y, orders=orders)
    print(f'MAP fit in {time.time() - t0:.2f}s: '
          f'{tgp.coeffs_process.kernel_}, '
          f'cbar^2 = {float(np.asarray(tgp.coeffs_process.cbar_sq_mean_)):.4f}')

    # ------------------------------------------------------------------
    # 2. Order-by-order predictions with truncation bands
    # ------------------------------------------------------------------
    fig, ax = plt.subplots(figsize=(7, 4.5))
    colors = plt.cm.viridis(np.linspace(0, 0.9, len(orders)))
    for i, k in enumerate(orders):
        m, std = tgp.predict(X, order=int(k), return_std=True)
        m, std = np.asarray(m), np.asarray(std)
        ax.plot(E, m, color=colors[i], lw=1, label=f'order {k}')
        ax.fill_between(E, m - 2 * std, m + 2 * std, color=colors[i], alpha=0.25)
    ax.set_xlabel('Energy [MeV]')
    ax.set_ylabel('Cross section [mb]')
    ax.set_yscale('log')
    ax.legend(fontsize=8)
    ax.set_title('Order-by-order predictions with 2σ truncation bands')
    fig.tight_layout()
    fig.savefig(os.path.join(args.out, 'bands.png'), dpi=100)
    print('saved bands.png')

    # ------------------------------------------------------------------
    # 3. Model-checking diagnostics on the extracted coefficients
    # ------------------------------------------------------------------
    coeffs = np.asarray(tgp.coeffs_)
    cov = np.asarray(tgp.coeffs_process.cov(X))
    cov = cov + 1e-6 * np.max(np.diag(cov)) * np.eye(len(X))
    gd = gm.GraphicalDiagnostic(coeffs, np.zeros(len(X)), cov,
                                nref=50 if args.fast else 500)
    fig, axes = gd.essentials()
    fig.savefig(os.path.join(args.out, 'diagnostics.png'), dpi=100)
    print('saved diagnostics.png')

    # ------------------------------------------------------------------
    # 4. (Lambda, ls) joint posterior — the entire surface is ONE device
    #    program (the reference notebook's 8000-iteration Python loop)
    # ------------------------------------------------------------------
    from gsum_tpu.parallel import truncation_lml_grid

    n_g = 5 if args.fast else 24
    lams = np.linspace(0.6, 1.6, n_g)
    lss = np.linspace(0.2, 1.2, n_g)
    ratios = np.stack([Q / lam for lam in lams])        # (R, N)
    thetas = np.log(lss)[:, None]
    t0 = time.time()
    post = np.asarray(truncation_lml_grid(
        gm.RBF(0.5), X, y, orders, ratios, thetas, ref=ref_scale,
        center=0, disp=0, df=3, scale=1, nugget=1e-8)).T   # (lam, ls)
    print(f'{len(lams) * len(lss)} joint-posterior lml evaluations in '
          f'{time.time() - t0:.2f}s (single fused device program)')

    post = np.exp(post - post.max())
    fig, ax = plt.subplots(figsize=(5, 4))
    ax.contourf(lss, lams, post, levels=20, cmap='Blues')
    ax.set_xlabel('length scale')
    ax.set_ylabel(r'$\Lambda$ scale factor')
    ax.set_title(r'Joint $(\Lambda, \ell)$ posterior')
    fig.tight_layout()
    fig.savefig(os.path.join(args.out, 'joint_posterior.png'), dpi=100)
    print('saved joint_posterior.png')


if __name__ == '__main__':
    main()
