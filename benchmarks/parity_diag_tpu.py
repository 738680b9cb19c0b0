"""Per-quantity breakdown of the on-TPU f64 parity leg (round-4 diagnosis).

Runs benchmarks/parity_flow.run_flow through gsum_tpu on the default
backend (the real TPU under the driver) and prints each quantity's
norm-relative deviation from the frozen reference values, worst first.
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from parity_flow import FROZEN, max_rel, run_flow

import jax
import gsum_tpu as gm

print('backend:', jax.default_backend(), 'x64:', jax.config.jax_enable_x64)

rec = np.load(os.path.join(os.path.dirname(os.path.abspath(__file__)), FROZEN))
got = run_flow(gm, gm, rec['X'], rec['y'], rec['orders'], rec['Q'],
               rec['ref_scale'])
frozen = {k[4:]: rec[k] for k in rec.files if k.startswith('out_')}
worst, per = max_rel(got, frozen)
for name, r in sorted(per.items(), key=lambda kv: -kv[1]):
    print('%-18s %.3e' % (name, r))
print('WORST %.3e' % worst)
