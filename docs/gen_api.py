"""Markdown API-reference generator (docs/api/).

The reference ships a Sphinx/nbsphinx site (reference docs/conf.py,
docs/api.rst, docs/api/models.rst autodoc); Sphinx is not installable in
this environment, so this script generates the same autodoc surface as
plain markdown from the live docstrings: one page per module, every
public class with its public methods, every public function, with
signatures.

Run from the repo root:  python docs/gen_api.py
Output is committed (docs/api/*.md) so the reference reads without
running anything; re-run after changing public docstrings.
"""
import importlib
import inspect
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), 'api')

#: (module, blurb) pages, in reading order.
MODULES = [
    ('gsum_tpu', 'Top-level namespace (drop-in for ``import gsum as gm``)'),
    ('gsum_tpu.kernels', 'Kernels with the sklearn log-theta protocol'),
    ('gsum_tpu.models', 'Conjugate GP/Student processes and truncation models'),
    ('gsum_tpu.conjugate', 'Pure-function conjugate posterior updates'),
    ('gsum_tpu.linalg', 'SPD linear algebra (TPU-safe solves, pivoted Cholesky)'),
    ('gsum_tpu.helpers', 'Series algebra, interval statistics, variogram'),
    ('gsum_tpu.datasets', 'Synthetic partial-sum dataset factories'),
    ('gsum_tpu.diagnostics', 'Numeric and graphical model checking'),
    ('gsum_tpu.viz', 'Matplotlib renderers behind GraphicalDiagnostic'),
    ('gsum_tpu.stats', 'Jit-able distributions (t, beta, binom, chi2, F, MVN, MVT)'),
    ('gsum_tpu.sample', 'HMC hyperparameter posteriors and predictive mixtures'),
    ('gsum_tpu.optimize', 'Bounded L-BFGS engines (scipy bridge and fixed-trip jit)'),
    ('gsum_tpu.derivs', 'Derivative-observation GP machinery'),
    ('gsum_tpu.parallel', 'Mesh construction, batched fits/grids, sharded linalg'),
    ('gsum_tpu.parallel.pchol', 'Model-parallel blocked Cholesky and sharded lml/fit'),
    ('gsum_tpu.ops', 'Performance kernels (blocked/scan/fused Cholesky, grid lml)'),
    ('gsum_tpu.checkpoint', 'Fitted-state serialization (.npz and orbax)'),
    ('gsum_tpu.profiling', 'FLOP counters and trace helpers'),
    ('gsum_tpu.pdfmeta', 'PDF figure metadata (incremental-update writer)'),
    ('gsum_tpu._accmath', 'Accurate f64 transcendentals for the TPU backend'),
]


def _sig(obj):
    try:
        return str(inspect.signature(obj))
    except (ValueError, TypeError):
        return '(...)'


def _doc(obj, indent=''):
    doc = inspect.getdoc(obj)
    if not doc:
        return indent + '*(no docstring)*\n'
    return '\n'.join(indent + line for line in doc.splitlines()) + '\n'


def _is_public(name):
    return not name.startswith('_')


def _own_members(mod):
    """Public classes/functions defined in (or re-exported by) ``mod``."""
    names = getattr(mod, '__all__', None)
    if names is None:
        names = [n for n in vars(mod) if _is_public(n)]
    classes, functions = [], []
    for n in sorted(names):
        obj = getattr(mod, n, None)
        if inspect.isclass(obj):
            classes.append((n, obj))
        elif inspect.isfunction(obj) or inspect.isbuiltin(obj):
            functions.append((n, obj))
    return classes, functions


def render_module(modname, blurb):
    mod = importlib.import_module(modname)
    lines = ['# `%s`' % modname, '', blurb + '.', '']
    mdoc = inspect.getdoc(mod)
    if mdoc:
        lines += [mdoc, '']
    classes, functions = _own_members(mod)

    if classes:
        lines += ['## Classes', '']
        for name, cls in classes:
            lines += ['### `%s%s`' % (name, _sig(cls)), '', _doc(cls)]
            for mname in sorted(vars(cls)):
                meth = inspect.getattr_static(cls, mname)
                if isinstance(meth, (staticmethod, classmethod)):
                    meth = meth.__func__
                if not (_is_public(mname) and inspect.isfunction(meth)):
                    continue
                if not inspect.getdoc(meth):
                    continue
                lines += ['#### `%s.%s%s`' % (name, mname, _sig(meth)), '',
                          _doc(meth)]
    if functions:
        lines += ['## Functions', '']
        for name, fn in functions:
            lines += ['### `%s%s`' % (name, _sig(fn)), '', _doc(fn)]
    return '\n'.join(lines) + '\n'


def main():
    os.makedirs(OUT, exist_ok=True)
    index = ['# gsum_tpu API reference', '',
             'Generated from the live docstrings by `docs/gen_api.py`.', '',
             '| Module | Contents |', '|---|---|']
    for modname, blurb in MODULES:
        fname = modname.replace('.', '_') + '.md'
        text = render_module(modname, blurb)
        with open(os.path.join(OUT, fname), 'w') as f:
            f.write(text)
        index.append('| [`%s`](%s) | %s |' % (modname, fname, blurb))
        print('wrote', fname, len(text.splitlines()), 'lines')
    with open(os.path.join(OUT, 'index.md'), 'w') as f:
        f.write('\n'.join(index) + '\n')
    print('wrote index.md')


if __name__ == '__main__':
    main()
