"""One-off freezer: run the parity flow through the REFERENCE gsum on CPU
f64 and record inputs + outputs into benchmarks/parity_frozen.npz.

The frozen record is what bench.py compares against each round, so the
driver-time parity leg never imports or executes /root/reference.

Run from the repo root: python benchmarks/freeze_parity.py
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, '/root/repo/tests')

from parity_flow import FROZEN, run_flow, scattering_inputs  # noqa: E402


def main():
    import _reference  # installs docrep/statsmodels shims, numpy-2 patch
    gref = _reference.import_reference()
    import sklearn.gaussian_process.kernels as sk

    X, y, orders, Q, ref_scale = scattering_inputs()
    out = run_flow(gref, sk, X, y, orders, Q, ref_scale)

    path = os.path.join(os.path.dirname(os.path.abspath(__file__)), FROZEN)
    np.savez(path, X=X, y=y, orders=orders, Q=Q, ref_scale=ref_scale,
             **{'out_' + k: v for k, v in out.items()})
    for k, v in out.items():
        print(k, np.asarray(v).shape,
              float(np.max(np.abs(np.asarray(v, dtype=np.float64)))))
    print('frozen ->', path)


if __name__ == '__main__':
    main()
