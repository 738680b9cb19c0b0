"""PDF figure-metadata stamping (reference docs/notebooks/pdf_metadata.py)."""
import os

import matplotlib

matplotlib.use('Agg')
import matplotlib.pyplot as plt
import numpy as np
import pytest

from gsum_tpu.pdfmeta import (add_pdf_metadata, get_pdf_metadata,
                              save_figure_with_metadata)


@pytest.fixture
def figure_pdf(tmp_path):
    fig, ax = plt.subplots(figsize=(2, 2))
    ax.plot([0, 1], [0, 1])
    path = str(tmp_path / 'fig.pdf')
    fig.savefig(path)
    plt.close(fig)
    return path


def test_add_and_get_roundtrip(figure_pdf):
    meta = {'orders': '0 2 3 4 5', 'Lambda_b': '600',
            'script': 'examples/lambda_b_posterior.py'}
    add_pdf_metadata(figure_pdf, meta)
    got = get_pdf_metadata(figure_pdf)
    for k, v in meta.items():
        assert got[k] == v
    # standard keys excluded by default, present with exclude=False
    full = get_pdf_metadata(figure_pdf, exclude=False)
    assert 'Producer' in full or 'Creator' in full


def test_update_preserves_and_overrides(figure_pdf):
    add_pdf_metadata(figure_pdf, {'a': '1', 'b': '2'})
    add_pdf_metadata(figure_pdf, {'b': '3', 'c': '4'})
    got = get_pdf_metadata(figure_pdf)
    assert got['a'] == '1' and got['b'] == '3' and got['c'] == '4'


def test_incremental_update_keeps_pdf_loadable(figure_pdf):
    """The stamped file must still be a readable PDF (matplotlib can
    rasterize it via pdftoppm if available; at minimum the structure
    markers survive and the original bytes are untouched)."""
    with open(figure_pdf, 'rb') as fh:
        original = fh.read()
    add_pdf_metadata(figure_pdf, {'key': 'value with (parens) and \\ slash'})
    with open(figure_pdf, 'rb') as fh:
        updated = fh.read()
    assert updated.startswith(original.rstrip(b'\n'))  # incremental update
    assert updated.count(b'%%EOF') >= 2
    assert get_pdf_metadata(figure_pdf)['key'] == \
        'value with (parens) and \\ slash'


def test_save_figure_with_metadata(tmp_path):
    fig, ax = plt.subplots(figsize=(2, 2))
    ax.plot(np.arange(3))
    path = str(tmp_path / 'fig2.pdf')
    save_figure_with_metadata(fig, path, {'Title': 'bands',
                                          'ratio': '0.5', 'seed': '7'})
    plt.close(fig)
    got = get_pdf_metadata(path)
    assert got['ratio'] == '0.5' and got['seed'] == '7'
    assert get_pdf_metadata(path, exclude=False).get('Title') == 'bands'


def test_invalid_key_rejected(figure_pdf):
    with pytest.raises(ValueError):
        add_pdf_metadata(figure_pdf, {'bad key': 'x'})
    with pytest.raises(TypeError):
        add_pdf_metadata(figure_pdf, ['not', 'a', 'dict'])


def test_unicode_metadata_roundtrip(figure_pdf):
    """Non-Latin-1 values (the library's own domain vocabulary) are
    written as UTF-16BE hex strings and read back intact."""
    meta = {'label': 'Λ_b = 600 MeV', 'obs': 'σ_tot, χ²'}
    add_pdf_metadata(figure_pdf, meta)
    got = get_pdf_metadata(figure_pdf)
    assert got['label'] == 'Λ_b = 600 MeV'
    assert got['obs'] == 'σ_tot, χ²'
    # non-ASCII keys are rejected with a clear error
    with pytest.raises(ValueError):
        add_pdf_metadata(figure_pdf, {'Λkey': 'x'})


def test_key_validation_rejects_all_pdf_delimiters():
    """%, #, {, } are PDF delimiters/escapes: '%' starts a comment, '#'
    is the name-escape compliant readers decode ('a#20b' -> 'a b')."""
    from gsum_tpu.pdfmeta import _validate_key

    for bad in ('a%b', 'a#20b', 'a{b', 'a}b', 'a b', 'a/b', 'a(b'):
        with pytest.raises(ValueError):
            _validate_key(bad)
    _validate_key('BUQEYE-provenance')


def test_add_metadata_preserves_nonstring_info_entries(tmp_path):
    """Name values (/Trapped /False), indirect refs, and balanced-paren
    literals in an existing Info dict must survive the rewrite verbatim
    instead of being dropped or re-typed as strings."""
    from gsum_tpu.pdfmeta import (_parse_info_entries, add_pdf_metadata,
                                  get_pdf_metadata)

    path = str(tmp_path / 'doc.pdf')
    # minimal single-page PDF with a rich Info dict
    objs = [
        b'1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n',
        b'2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n',
        b'3 0 obj\n<< /Type /Page /Parent 2 0 R /MediaBox [0 0 10 10] >>\n'
        b'endobj\n',
        b'4 0 obj\n<< /Title (a(b)c) /Trapped /False /Priority 3 >>\n'
        b'endobj\n',
    ]
    head = b'%PDF-1.4\n'
    offsets, body = [], head
    for o in objs:
        offsets.append(len(body))
        body += o
    xref_at = len(body)
    xref = b'xref\n0 5\n0000000000 65535 f \n' + b''.join(
        b'%010d 00000 n \n' % off for off in offsets)
    trailer = (b'trailer\n<< /Size 5 /Root 1 0 R /Info 4 0 R >>\n'
               b'startxref\n%d\n%%%%EOF\n' % xref_at)
    with open(path, 'wb') as fh:
        fh.write(body + xref + trailer)

    add_pdf_metadata(path, {'Custom': 'value'})
    meta = get_pdf_metadata(path, exclude=False)
    assert meta['Custom'] == 'value'
    assert meta['Title'] == 'a(b)c'        # balanced-paren literal intact
    assert meta['Trapped'] == '/False'     # name value preserved
    assert meta['Priority'] == '3'         # number preserved

    # the rewritten Info object still carries the raw tokens verbatim
    with open(path, 'rb') as fh:
        data = fh.read()
    start = data.rindex(b' 0 obj', 0, data.rindex(b'endobj'))
    tail = data[data.rindex(b'0 obj'):]
    entries = dict((k, (kind, v))
                   for k, kind, v in _parse_info_entries(tail))
    assert entries['Trapped'] == ('raw', b'/False')
    assert entries['Priority'] == ('raw', b'3')
