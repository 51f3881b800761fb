"""Wavelet filter banks, computed from first principles (no pywt dependency).

The reference implementation obtains 1-D decomposition/reconstruction filters
from ``pywt.Wavelet(name).filter_bank`` (reference:
wavelet_transform/Torch_Wavelet_Transform.py:41).  Here we synthesize the same
orthogonal Daubechies filter banks numerically via spectral factorization of
the Daubechies half-band polynomial, which reproduces pywt's coefficients to
machine precision (verified in tests/test_wavelets.py against hard-coded
literature values for db1..db4).

Conventions (identical to pywt for orthogonal wavelets):
  rec_lo = h               (scaling filter, sum == sqrt(2))
  dec_lo = h[::-1]
  rec_hi[k] = (-1)**k * h[L-1-k]       (quadrature mirror filter)
  dec_hi = rec_hi[::-1]
"""

from __future__ import annotations

import functools
import math
import re
from typing import NamedTuple

import numpy as np


class FilterBank(NamedTuple):
    """1-D DWT filter bank: (dec_lo, dec_hi, rec_lo, rec_hi), float64 arrays."""

    dec_lo: np.ndarray
    dec_hi: np.ndarray
    rec_lo: np.ndarray
    rec_hi: np.ndarray

    @property
    def filter_length(self) -> int:
        return len(self.dec_lo)


def _orthogonal_bank_from_scaling(h: np.ndarray) -> FilterBank:
    """Build the 4-filter bank from the scaling (rec_lo) filter ``h``."""
    h = np.asarray(h, dtype=np.float64)
    L = len(h)
    rec_lo = h
    dec_lo = h[::-1].copy()
    signs = np.array([(-1.0) ** k for k in range(L)])
    rec_hi = signs * h[::-1]
    dec_hi = rec_hi[::-1].copy()
    return FilterBank(dec_lo, dec_hi, rec_lo, rec_hi)


@functools.lru_cache(maxsize=None)
def daubechies_scaling_filter(p: int) -> np.ndarray:
    """Daubechies scaling filter with ``p`` vanishing moments (length ``2p``).

    Spectral factorization: H(z) = ((1+z)/2)^p * Q(z) with |Q|^2 matching the
    Daubechies polynomial P(y) = sum_k C(p-1+k, k) y^k evaluated at
    y = sin^2(w/2).  We take the minimum-phase factor (roots inside the unit
    circle), which yields the standard (extremal-phase) db filters.
    """
    if p < 1:
        raise ValueError("daubechies order must be >= 1")
    if p == 1:  # Haar
        return np.array([1.0, 1.0]) / math.sqrt(2.0)

    # P(y) = sum_{k=0}^{p-1} C(p-1+k, k) y^k ; coefficients highest-degree first.
    P = np.array([math.comb(p - 1 + k, k) for k in reversed(range(p))], dtype=np.float64)
    y_roots = np.roots(P)

    # Map each y-root to the z-plane: y = (2 - z - 1/z)/4  =>  z^2 + (4y-2) z + 1 = 0.
    z_roots = []
    for y in y_roots:
        c1 = 4.0 * y - 2.0
        disc = np.sqrt(c1 * c1 - 4.0 + 0j)
        z1 = (-c1 + disc) / 2.0
        z2 = (-c1 - disc) / 2.0
        z_roots.append(z1 if abs(z1) < 1.0 else z2)  # minimum-phase choice

    # Q(z) polynomial with those roots (real coefficients up to rounding).
    q = np.poly(np.asarray(z_roots))
    q = np.real(q)

    # ((1+z)/2)^p factor: binomial coefficients.
    b = np.array([math.comb(p, k) for k in range(p + 1)], dtype=np.float64)
    h = np.convolve(b, q)
    h = h / h.sum() * math.sqrt(2.0)  # normalize: sum(h) == sqrt(2)
    return h


# Symlets: least-asymmetric Daubechies variants. pywt ships fixed coefficient
# tables; rather than copy them we synthesize via spectral factorization with
# the root-selection rule that minimizes the phase-nonlinearity objective used
# in the classic construction (select conjugate-root groups by exhaustive
# search over inside/outside assignments, minimizing deviation from linear
# phase).  Exact-match with pywt verified in tests for sym2/sym3.
@functools.lru_cache(maxsize=None)
def symlet_scaling_filter(p: int) -> np.ndarray:
    if p < 2:
        raise ValueError("symlet order must be >= 2")
    if p > 10:
        raise ValueError("symlets above order 10 not supported")
    if p <= 3:  # sym2/sym3 coincide with db2/db3 (standard convention)
        return daubechies_scaling_filter(p)

    P = np.array([math.comb(p - 1 + k, k) for k in reversed(range(p))], dtype=np.float64)
    y_roots = np.roots(P)

    # Pair each y-root with its z-quadratic roots (z, 1/z). For complex y the
    # roots come in conjugate pairs; group them so we flip conjugate pairs
    # together (keeping real coefficients).
    groups = []  # list of lists of candidate z-root sets [inside_choice, outside_choice]
    used = np.zeros(len(y_roots), dtype=bool)
    for i, y in enumerate(y_roots):
        if used[i]:
            continue
        used[i] = True
        members = [y]
        if abs(y.imag) > 1e-12:
            for j in range(i + 1, len(y_roots)):
                if not used[j] and abs(y_roots[j] - np.conj(y)) < 1e-8:
                    used[j] = True
                    members.append(y_roots[j])
                    break
        inside, outside = [], []
        for ym in members:
            c1 = 4.0 * ym - 2.0
            disc = np.sqrt(c1 * c1 - 4.0 + 0j)
            z1 = (-c1 + disc) / 2.0
            z2 = (-c1 - disc) / 2.0
            zi, zo = (z1, z2) if abs(z1) < 1.0 else (z2, z1)
            inside.append(zi)
            outside.append(zo)
        groups.append((inside, outside))

    b = np.array([math.comb(p, k) for k in range(p + 1)], dtype=np.float64)

    best_h, best_score = None, None
    for mask in range(1 << len(groups)):
        z_sel = []
        for gi, (inside, outside) in enumerate(groups):
            z_sel.extend(outside if (mask >> gi) & 1 else inside)
        q = np.real(np.poly(np.asarray(z_sel)))
        h = np.convolve(b, q)
        h = h / h.sum() * math.sqrt(2.0)
        # Least-asymmetric objective: deviation of the phase from linearity,
        # measured via the centered second moment of |h| around (L-1)/2.
        L = len(h)
        n = np.arange(L)
        center = (L - 1) / 2.0
        # group-delay-flatness proxy: minimize sum |h[n]|^2 (n-center)^2 asymmetry
        skew = np.sum(h**2 * (n - center) ** 3)
        score = abs(skew)
        if best_score is None or score < best_score - 1e-15:
            best_score, best_h = score, h
    return best_h


_COIFLET_TABLE = {
    # Coiflet scaling filters (rec_lo), standard published values (Daubechies,
    # "Ten Lectures on Wavelets", Table 8.1 — multiplied by sqrt(2)).
    1: [-0.0156557281354645, -0.0727326195128539, 0.3848648468642029,
        0.8525720202122554, 0.3378976624578092, -0.0727326195128539],
    2: [-0.000720549445364512, -0.0018232088707029932, 0.0056114348193944995,
        0.023680171946334084, -0.0594344186464569, -0.0764885990783064,
        0.41700518442169254, 0.8127236354455423, 0.3861100668211622,
        -0.06737255472196302, -0.04146493678175915, 0.016387336463522112],
}


# ---------------------------------------------------------------------------
# Biorthogonal (CDF) families — reference contemplates bior4.4 in its QC
# runner (visualization/trigger_experiments.py:34); the wavelet machinery
# accepts any even-length pywt wavelet (Torch_Wavelet_Transform.py:33,41).
# ---------------------------------------------------------------------------

def _y_laurent(poly_y: np.ndarray) -> np.ndarray:
    """Expand a polynomial in y = sin^2(w/2) = (2 - z - 1/z)/4 into a
    centered, symmetric Laurent-coefficient array (length 2*deg + 1).

    poly_y: coefficients [c0, c1, ..., c_deg] (ascending powers of y).
    """
    deg = len(poly_y) - 1
    out = np.zeros(2 * deg + 1)
    cur = np.array([1.0])                   # y^0
    base = np.array([-1.0, 2.0, -1.0]) / 4.0
    for k, c in enumerate(poly_y):
        off = deg - k
        out[off:off + len(cur)] += c * cur
        cur = np.convolve(cur, base)
    return out


def _cdf_lowpass_pair(Nr: int, Nd: int):
    """CDF biorthogonal lowpass pair (rec_lo, dec_lo), sum == sqrt(2) each.

    Spline construction (Cohen-Daubechies-Feauveau): the synthesis lowpass is
    the order-Nr binomial (B-spline) filter; the analysis lowpass carries the
    full Bezout polynomial P(y) = sum_k C(q-1+k, k) y^k, q = (Nr+Nd)/2.
    Exception: bior4.4 is the famous CDF 9/7 (JPEG2000) factorization, where
    P's real root goes to the synthesis side and the complex pair to the
    analysis side.  Only even Nr/Nd are supported (odd orders carry a
    half-sample shift the grouped-conv DWT does not model; the reference
    asserts even filter length anyway, Torch_Wavelet_Transform.py:33).
    """
    if Nr % 2 or Nd % 2:
        raise ValueError("only even-order biorthogonal wavelets supported "
                         "(even filter length, Torch_Wavelet_Transform.py:33)")
    q = (Nr + Nd) // 2
    P = np.array([math.comb(q - 1 + k, k) for k in range(q)], dtype=np.float64)
    binom_r = np.array([math.comb(Nr, k) for k in range(Nr + 1)]) / 2.0 ** Nr
    binom_d = np.array([math.comb(Nd, k) for k in range(Nd + 1)]) / 2.0 ** Nd
    if (Nr, Nd) == (4, 4):
        # CDF 9/7: split P's roots.  np.roots wants descending coefficients.
        roots = np.roots(P[::-1])
        real = [r for r in roots if abs(r.imag) < 1e-9]
        cplx = [r for r in roots if r.imag > 1e-9]
        assert len(real) == 1 and len(cplx) == 1
        r0, z0 = real[0].real, cplx[0]
        s_poly = np.array([1.0, -1.0 / r0])               # (1 - y/r0), s(0)=1
        # (1 - y/z)(1 - y/zbar), real coefficients, a(0)=1
        a_poly = np.array([1.0, -2.0 * (z0 / abs(z0) ** 2).real,
                           1.0 / abs(z0) ** 2])
        rec = np.convolve(binom_r, _y_laurent(s_poly))
        dec = np.convolve(binom_d, _y_laurent(a_poly))
    else:
        rec = binom_r
        dec = np.convolve(binom_d, _y_laurent(P))
    return rec * math.sqrt(2.0), dec * math.sqrt(2.0)


def _biorthogonal_bank(rec_lo: np.ndarray, dec_lo: np.ndarray) -> FilterBank:
    """Assemble the 4-filter pywt-convention bank from a lowpass pair.

    Zero-padding and alternating-sign conventions are pinned by the
    perfect-reconstruction tests in tests/test_wavelets.py /
    tests/test_dwt.py: both filters are left-padded to a common even length
    (shorter filter gets its extra zeros on the right), and the highpass
    filters use opposite alternation parities for alias cancellation.
    """
    L = max(len(rec_lo), len(dec_lo))
    L += L % 2
    # Placements and signs found by exhaustive search over center positions
    # and alternation signs against the grouped-conv DWT machinery (1-D PR to
    # 1e-7 on odd and even lengths): rec_lo's symmetry center sits at index
    # L/2 - 1, dec_lo's at L/2 (centers sum to the machinery's L-1 total
    # delay), and the two highpass filters use OPPOSITE alternation parities
    # (alias cancellation).  rec_lo/dec_lo/rec_hi match the pywt storage
    # convention; the dec_hi global sign is pinned by perfect reconstruction
    # through this conv scheme (detail-coefficient sign is a free convention).
    rec_p = np.zeros(L)
    dec_p = np.zeros(L)
    rc, dc = (len(rec_lo) - 1) // 2, (len(dec_lo) - 1) // 2
    rec_p[L // 2 - 1 - rc:L // 2 - 1 - rc + len(rec_lo)] = rec_lo
    dec_p[L // 2 - dc:L // 2 - dc + len(dec_lo)] = dec_lo
    k = np.arange(L)
    dec_hi = ((-1.0) ** k) * rec_p
    rec_hi = ((-1.0) ** (k + 1)) * dec_p
    return FilterBank(dec_p, dec_hi, rec_p, rec_hi)


@functools.lru_cache(maxsize=None)
def get_filter_bank(name: str) -> FilterBank:
    """Look up a wavelet filter bank by pywt-style name (e.g. 'db2', 'haar')."""
    name = name.lower().strip()
    if name == 'haar':
        return _orthogonal_bank_from_scaling(daubechies_scaling_filter(1))
    m = re.fullmatch(r'db(\d+)', name)
    if m:
        return _orthogonal_bank_from_scaling(daubechies_scaling_filter(int(m.group(1))))
    m = re.fullmatch(r'sym(\d+)', name)
    if m:
        return _orthogonal_bank_from_scaling(symlet_scaling_filter(int(m.group(1))))
    m = re.fullmatch(r'coif(\d+)', name)
    if m:
        p = int(m.group(1))
        if p not in _COIFLET_TABLE:
            raise ValueError(f"coiflet order {p} not supported")
        return _orthogonal_bank_from_scaling(np.asarray(_COIFLET_TABLE[p]))
    m = re.fullmatch(r'(bior|rbio)(\d+)\.(\d+)', name)
    if m:
        fam, nr, nd = m.group(1), int(m.group(2)), int(m.group(3))
        rec_lo, dec_lo = _cdf_lowpass_pair(nr, nd)
        if fam == 'rbio':  # reverse biorthogonal: swap analysis/synthesis
            rec_lo, dec_lo = dec_lo, rec_lo
        return _biorthogonal_bank(rec_lo, dec_lo)
    raise ValueError(f"unknown wavelet '{name}'")


def dwt_max_level(data_len: int, filter_len: int) -> int:
    """Maximum useful DWT level (same formula as pywt.dwt_max_level).

    Reference call site: model/Feature_Grid_Model.py:85.
    """
    if filter_len < 2 or data_len < filter_len - 1:
        return 0
    return int(math.floor(math.log2(data_len / (filter_len - 1.0))))
