"""Filter-bank correctness: literature values, QMF structure, orthogonality."""

import numpy as np
import pytest

from latent_feature_grid_compression_tpu.wavelets import (
    get_filter_bank, dwt_max_level, daubechies_scaling_filter)

# Literature values (Daubechies, Ten Lectures; identical to pywt output).
DB2_DEC_LO = [-0.12940952255092145, 0.22414386804185735,
              0.836516303737469, 0.48296291314469025]
DB2_DEC_HI = [-0.48296291314469025, 0.836516303737469,
              -0.22414386804185735, -0.12940952255092145]
DB2_REC_LO = [0.48296291314469025, 0.836516303737469,
              0.22414386804185735, -0.12940952255092145]
DB2_REC_HI = [-0.12940952255092145, -0.22414386804185735,
              0.836516303737469, -0.48296291314469025]
DB4_REC_LO = [0.23037781330885523, 0.7148465705525415, 0.6308807679295904,
              -0.02798376941698385, -0.18703481171888114, 0.030841381835986965,
              0.032883011666982945, -0.010597401784997278]
SYM4_REC_LO = [0.03222310060404270, -0.012603967262037833, -0.09921954357684722,
               0.29785779560527736, 0.8037387518059161, 0.49761866763201545,
               -0.02963552764599851, -0.07576571478927333]


def test_db2_matches_literature():
    fb = get_filter_bank('db2')
    np.testing.assert_allclose(fb.dec_lo, DB2_DEC_LO, atol=1e-12)
    np.testing.assert_allclose(fb.dec_hi, DB2_DEC_HI, atol=1e-12)
    np.testing.assert_allclose(fb.rec_lo, DB2_REC_LO, atol=1e-12)
    np.testing.assert_allclose(fb.rec_hi, DB2_REC_HI, atol=1e-12)


def test_db4_matches_literature():
    np.testing.assert_allclose(get_filter_bank('db4').rec_lo, DB4_REC_LO, atol=1e-10)


def test_sym4_matches_literature():
    np.testing.assert_allclose(get_filter_bank('sym4').rec_lo, SYM4_REC_LO, atol=1e-10)


def test_haar_is_db1():
    np.testing.assert_allclose(get_filter_bank('haar').rec_lo,
                               get_filter_bank('db1').rec_lo)


@pytest.mark.parametrize('order', [1, 2, 3, 5, 8, 10, 16, 20])
def test_daubechies_orthogonality(order):
    h = daubechies_scaling_filter(order)
    assert len(h) == 2 * order
    assert abs(h.sum() - np.sqrt(2)) < 1e-9
    for k in range(order):
        ip = sum(h[n] * h[n + 2 * k] for n in range(len(h) - 2 * k))
        np.testing.assert_allclose(ip, 1.0 if k == 0 else 0.0, atol=1e-9)


@pytest.mark.parametrize('name', ['db2', 'db3', 'sym4', 'coif1', 'coif2'])
def test_perfect_reconstruction_1d(name):
    """encode->decode a 1-D signal through the filter bank (conv domain)."""
    fb = get_filter_bank(name)
    rng = np.random.default_rng(0)
    n = 64
    x = rng.standard_normal(n)
    L = fb.filter_length
    pad = L - 1
    xp = np.pad(x, pad, mode='wrap')  # periodic extension for clean algebra
    lo = np.convolve(xp, fb.dec_lo)[:: 1]
    hi = np.convolve(xp, fb.dec_hi)[:: 1]
    # downsample odd positions, upsample, reconstruct
    lo_d = lo[1::2]
    hi_d = hi[1::2]
    lo_u = np.zeros(2 * len(lo_d)); lo_u[1::2] = lo_d
    hi_u = np.zeros(2 * len(hi_d)); hi_u[1::2] = hi_d
    rec = np.convolve(lo_u, fb.rec_lo) + np.convolve(hi_u, fb.rec_hi)
    core = rec[2 * pad: 2 * pad + n]
    np.testing.assert_allclose(core, x, atol=1e-8)


# CDF biorthogonal lowpass pairs (published values; bior2.2 = CDF 5/3 spline,
# bior4.4 = CDF 9/7 / JPEG2000, x sqrt(2) in the pywt normalization).
BIOR22_DEC_LO = [0.0, -0.17677669529663687, 0.3535533905932738,
                 1.0606601717798214, 0.3535533905932738,
                 -0.17677669529663687]
BIOR22_REC_LO = [0.0, 0.3535533905932738, 0.7071067811865476,
                 0.3535533905932738, 0.0, 0.0]
BIOR44_DEC_LO = [0.0, 0.03782845550726404, -0.023849465019556843,
                 -0.11062440441843718, 0.37740285561283066,
                 0.8526986790088938, 0.37740285561283066,
                 -0.11062440441843718, -0.023849465019556843,
                 0.03782845550726404]
BIOR44_REC_LO = [0.0, -0.06453888262869706, -0.04068941760916406,
                 0.41809227322161724, 0.7884856164055829,
                 0.41809227322161724, -0.04068941760916406,
                 -0.06453888262869706, 0.0, 0.0]


def test_bior22_matches_cdf53_literature():
    fb = get_filter_bank('bior2.2')
    np.testing.assert_allclose(fb.dec_lo, BIOR22_DEC_LO, atol=1e-10)
    np.testing.assert_allclose(fb.rec_lo, BIOR22_REC_LO, atol=1e-10)


def test_bior44_matches_cdf97_literature():
    fb = get_filter_bank('bior4.4')
    np.testing.assert_allclose(fb.dec_lo, BIOR44_DEC_LO, atol=1e-9)
    np.testing.assert_allclose(fb.rec_lo, BIOR44_REC_LO, atol=1e-9)


def test_rbio_swaps_analysis_synthesis():
    b = get_filter_bank('bior2.2')
    r = get_filter_bank('rbio2.2')
    # lowpass roles swap (up to the storage alignment, which re-centers)
    assert sorted(np.round(np.abs(r.rec_lo[np.abs(r.rec_lo) > 1e-12]), 9)) \
        == sorted(np.round(np.abs(b.dec_lo[np.abs(b.dec_lo) > 1e-12]), 9))


@pytest.mark.parametrize('name', ['bior2.2', 'bior2.4', 'bior2.6', 'bior4.4',
                                  'rbio2.2', 'rbio4.4', 'db2', 'sym4'])
def test_two_channel_pr_identity(name):
    """Two-channel filter-bank PR in coefficient space (pins alignment and
    alternation-sign conventions):

      H~(z)H(z) + G~(z)G(z) = 2 z^-(L-1)     (distortion-free)
      H~(-z)H(z) + G~(-z)G(z) = 0            (alias cancellation)
    """
    fb = get_filter_bank(name)
    L = fb.filter_length
    k = np.arange(L)
    total = (np.convolve(fb.dec_lo, fb.rec_lo)
             + np.convolve(fb.dec_hi, fb.rec_hi))
    alias = (np.convolve(fb.dec_lo * (-1.0) ** k, fb.rec_lo)
             + np.convolve(fb.dec_hi * (-1.0) ** k, fb.rec_hi))
    expect = np.zeros_like(total)
    expect[L - 1] = 2.0
    np.testing.assert_allclose(total, expect, atol=1e-9)
    np.testing.assert_allclose(alias, 0.0, atol=1e-9)


@pytest.mark.parametrize('name', ['bior2.2', 'bior4.4', 'rbio2.2'])
def test_biorthogonal_bank_sums(name):
    fb = get_filter_bank(name)
    assert abs(fb.dec_lo.sum() - np.sqrt(2)) < 1e-9
    assert abs(fb.rec_lo.sum() - np.sqrt(2)) < 1e-9
    assert abs(fb.dec_hi.sum()) < 1e-9
    assert abs(fb.rec_hi.sum()) < 1e-9


def test_odd_order_bior_raises():
    with pytest.raises(ValueError):
        get_filter_bank('bior1.3')


def test_dwt_max_level():
    # pywt.dwt_max_level reference values
    assert dwt_max_level(15, 4) == 2
    assert dwt_max_level(16, 4) == 2
    assert dwt_max_level(32, 4) == 3
    assert dwt_max_level(150, 4) == 5
    assert dwt_max_level(255, 4) == 6
    assert dwt_max_level(2, 4) == 0


def test_unknown_wavelet_raises():
    with pytest.raises(ValueError):
        get_filter_bank('nosuchwavelet')
