"""Slow, obviously-correct numpy models written DIRECTLY from TS38.211/212.

Golden-value generators for the parity tests (SURVEY §4.1): the reference's
MATLAB-generated .dat vectors are absent from the mount, so the framework
regenerates goldens from these independent implementations — bit-serial
LFSRs, long-division CRCs, per-sample DFT sums, Kronecker-product polar
matrices, parity-check-equation LDPC verification.  None of the index-plan
or matmul machinery of srsran_tpu.ops is used here; a bug shared between
the two sides would have to be a shared misreading of the spec itself.
"""

from __future__ import annotations

import numpy as np

# --------------------------------------------------------------- sequences


def gold(c_init: int, length: int, advance: int = 0) -> np.ndarray:
    """TS38.211 §5.2.1 by direct LFSR stepping (Nc = 1600)."""
    nc = 1600
    n = nc + advance + length
    x1 = np.zeros(n + 31, np.uint8)
    x2 = np.zeros(n + 31, np.uint8)
    x1[0] = 1
    for i in range(31):
        x2[i] = (c_init >> i) & 1
    for i in range(n):
        x1[i + 31] = x1[i + 3] ^ x1[i]
        x2[i + 31] = x2[i + 3] ^ x2[i + 2] ^ x2[i + 1] ^ x2[i]
    s = nc + advance
    return (x1[s:s + length] ^ x2[s:s + length]).astype(np.int8)


# --------------------------------------------------------------------- CRC

# TS38.212 §5.1 generator polynomials as their exponent sets (the form the
# spec prints them in), e.g. gCRC24A(D) = D^24 + D^23 + D^18 + ... + D + 1.
_CRC_POLY_EXPONENTS = {
    "crc24A": [24, 23, 18, 17, 14, 11, 10, 7, 6, 5, 4, 3, 1, 0],
    "crc24B": [24, 23, 6, 5, 1, 0],
    "crc24C": [24, 23, 21, 20, 17, 15, 13, 12, 8, 4, 2, 1, 0],
    "crc16": [16, 12, 5, 0],
    "crc11": [11, 10, 9, 5, 0],
    "crc6": [6, 5, 0],
}


def crc(bits, poly_name: str) -> np.ndarray:
    """Remainder of bits·x^L mod g(x) by long division (MSB-first)."""
    exps = _CRC_POLY_EXPONENTS[poly_name]
    l = max(exps)
    g = np.zeros(l + 1, np.uint8)
    for e in exps:
        g[l - e] = 1
    buf = np.concatenate([np.asarray(bits, np.uint8) % 2,
                          np.zeros(l, np.uint8)])
    for i in range(len(buf) - l):
        if buf[i]:
            buf[i:i + l + 1] ^= g
    return buf[-l:].astype(np.int8)



# -------------------------------------------------------------- modulation

_SQRT2 = np.sqrt(2.0)
_SQRT10 = np.sqrt(10.0)
_SQRT42 = np.sqrt(42.0)
_SQRT170 = np.sqrt(170.0)


def modulate(bits, scheme: str) -> np.ndarray:
    """TS38.211 §5.1 exact closed-form constellation formulas."""
    b = np.asarray(bits, np.int64)
    if scheme == "bpsk":
        return ((1 - 2 * b) * (1 + 1j) / _SQRT2).astype(np.complex64)
    if scheme == "qpsk":
        b = b.reshape(-1, 2)
        return (((1 - 2 * b[:, 0]) + 1j * (1 - 2 * b[:, 1])) / _SQRT2
                ).astype(np.complex64)
    if scheme == "qam16":
        b = b.reshape(-1, 4)
        i = (1 - 2 * b[:, 0]) * (2 - (1 - 2 * b[:, 2]))
        q = (1 - 2 * b[:, 1]) * (2 - (1 - 2 * b[:, 3]))
        return ((i + 1j * q) / _SQRT10).astype(np.complex64)
    if scheme == "qam64":
        b = b.reshape(-1, 6)
        i = (1 - 2 * b[:, 0]) * (4 - (1 - 2 * b[:, 2]) * (2 - (1 - 2 * b[:, 4])))
        q = (1 - 2 * b[:, 1]) * (4 - (1 - 2 * b[:, 3]) * (2 - (1 - 2 * b[:, 5])))
        return ((i + 1j * q) / _SQRT42).astype(np.complex64)
    if scheme == "qam256":
        b = b.reshape(-1, 8)
        i = (1 - 2 * b[:, 0]) * (8 - (1 - 2 * b[:, 2]) * (
            4 - (1 - 2 * b[:, 4]) * (2 - (1 - 2 * b[:, 6]))))
        q = (1 - 2 * b[:, 1]) * (8 - (1 - 2 * b[:, 3]) * (
            4 - (1 - 2 * b[:, 5]) * (2 - (1 - 2 * b[:, 7]))))
        return ((i + 1j * q) / _SQRT170).astype(np.complex64)
    raise ValueError(scheme)


# --------------------------------------------------------------------- OFDM


def ofdm_modulate_symbol(grid_symbol: np.ndarray, dft_size: int,
                         cp_len: int, phase_comp: complex = 1.0,
                         scale: float = 1.0) -> np.ndarray:
    """One OFDM symbol by the direct §5.3.1 sum (O(N·K), no FFT):

    s(t) = scale * pc * sum_k a_k exp(j 2 pi k_rel (t) / N), with the
    half-spectrum mapping (subcarrier k of K centered on DC), then the
    last cp_len samples prepended as CP.
    """
    k_total = len(grid_symbol)
    t = np.arange(dft_size)
    body = np.zeros(dft_size, np.complex128)
    for k in range(k_total):
        k_rel = k - k_total // 2          # centered on DC
        freq = k_rel % dft_size
        body += grid_symbol[k] * np.exp(2j * np.pi * freq * t / dft_size)
    body *= scale * phase_comp
    return np.concatenate([body[-cp_len:], body]).astype(np.complex128)


def ofdm_demodulate_symbol(samples: np.ndarray, nof_sc: int, dft_size: int,
                           cp_len: int, window_offset: int = 0,
                           phase_comp: complex = 1.0) -> np.ndarray:
    """Inverse: FFT window starting window_offset early into the CP, the
    linear phase ramp removed per bin, conjugate phase compensation."""
    start = cp_len - window_offset
    win = samples[start:start + dft_size]
    t = np.arange(dft_size)
    out = np.zeros(nof_sc, np.complex128)
    for k in range(nof_sc):
        k_rel = (k - nof_sc // 2) % dft_size
        bin_val = np.sum(win * np.exp(-2j * np.pi * k_rel * t / dft_size))
        bin_val *= np.exp(2j * np.pi * window_offset * k_rel / dft_size)
        out[k] = bin_val / dft_size
    return (out * np.conj(phase_comp)).astype(np.complex128)


# -------------------------------------------------------------------- polar


def polar_encode(u: np.ndarray) -> np.ndarray:
    """x = u G_N with G_N = F^{(x)n}, F = [[1,0],[1,1]], by np.kron."""
    n = len(u)
    g = np.array([[1]], np.uint8)
    f = np.array([[1, 0], [1, 1]], np.uint8)
    while g.shape[0] < n:
        g = np.kron(g, f)
    return (np.asarray(u, np.uint8) @ g % 2).astype(np.int8)


# --------------------------------------------------------------------- LDPC


def ldpc_parity_check(codeword: np.ndarray, bg: int, z: int,
                      bg_table) -> bool:
    """Verify H c^T = 0 for a full (un-punctured) codeword [N + 2Z... i.e.
    66Z/50Z] directly from the base-graph table rows.

    bg_table: iterable of (row, col, shift) entries of the base graph at
    this lifting-set index (the 3GPP table itself, not any derived plan).
    """
    c = np.asarray(codeword, np.uint8) % 2
    nof_rows = 46 if bg == 1 else 42
    ok = True
    acc = np.zeros((nof_rows, z), np.uint8)
    for (r, col, shift) in bg_table:
        seg = c[col * z:(col + 1) * z]
        acc[r] ^= np.roll(seg, -(shift % z))
    return bool((acc == 0).all())


# ------------------------------------------------------------ PSS/SSS


def pss(n_id2: int) -> np.ndarray:
    x = np.zeros(134, np.uint8)
    x[:7] = [0, 1, 1, 0, 1, 1, 1]
    for i in range(127):
        x[i + 7] = x[i + 4] ^ x[i]
    m = (np.arange(127) + 43 * n_id2) % 127
    return (1.0 - 2.0 * x[m].astype(np.float64))


def sss(n_id1: int, n_id2: int) -> np.ndarray:
    x0 = np.zeros(134, np.uint8)
    x1 = np.zeros(134, np.uint8)
    x0[0] = x1[0] = 1
    for i in range(127):
        x0[i + 7] = x0[i + 4] ^ x0[i]
        x1[i + 7] = x1[i + 1] ^ x1[i]
    m0 = 15 * (n_id1 // 112) + 5 * n_id2
    m1 = n_id1 % 112
    n = np.arange(127)
    return ((1.0 - 2.0 * x0[(n + m0) % 127]) *
            (1.0 - 2.0 * x1[(n + m1) % 127]))


# ----------------------------------------------------------- Zadoff-Chu


def zc_base_sequence(u: int, v: int, m_sc: int) -> np.ndarray:
    """TS38.211 §5.2.2 for M >= 36 by the direct formula."""
    assert m_sc >= 36
    nzc = m_sc - 1
    while True:
        if all(nzc % d for d in range(2, int(nzc ** 0.5) + 1)):
            break
        nzc -= 1
    q_bar = nzc * (u + 1) / 31.0
    q = int(np.floor(q_bar + 0.5)) + v * (1 if int(np.floor(2 * q_bar)) % 2 == 0 else -1)
    out = np.zeros(m_sc, np.complex128)
    for n in range(m_sc):
        m = n % nzc
        out[n] = np.exp(-1j * np.pi * q * m * (m + 1) / nzc)
    return out


# ------------------------------------------------ receive-chain goldens
# Spec-direct numpy models for the UL receive chain (round-trip tests can
# hide calibrated-in-pairs bugs; these pin VALUES independently).


def maxlog_llr(symbols: np.ndarray, noise_var: np.ndarray,
               scheme: str) -> np.ndarray:
    """Exact max-log LLRs by brute force over the FULL 2-D constellation:
    llr_b = (min_{s: b=1} |y-s|^2 - min_{s: b=0} |y-s|^2) / noise_var.
    LLR > 0 means bit 0 (matches ops.modulation.demodulate)."""
    qm = {"qpsk": 2, "qam16": 4, "qam64": 6, "qam256": 8}[scheme]
    msgs = np.array([[(v >> (qm - 1 - b)) & 1 for b in range(qm)]
                     for v in range(1 << qm)], np.int8)
    points = modulate(msgs.reshape(-1), scheme)          # [2^Qm]
    nv = np.broadcast_to(np.asarray(noise_var, np.float64), symbols.shape)
    out = np.empty(symbols.shape + (qm,), np.float64)
    for i, y in np.ndenumerate(symbols):
        d2 = np.abs(y - points) ** 2
        for b in range(qm):
            d0 = d2[msgs[:, b] == 0].min()
            d1 = d2[msgs[:, b] == 1].min()
            out[i + (b,)] = (d1 - d0) / max(nv[i], 1e-12)
    return out.reshape(symbols.shape[:-1] + (-1,))


def zf_equalize(y: np.ndarray, h: np.ndarray, noise_var: float):
    """Per-RE ZF: x = (H^H H)^-1 H^H y; out_nv = nv * diag((H^H H)^-1).

    y [RE, P], h [RE, P, L] -> (x [RE, L], out_nv [RE, L])."""
    hh = np.conj(np.swapaxes(h, -1, -2))                 # [RE, L, P]
    gram = hh @ h                                        # [RE, L, L]
    ginv = np.linalg.inv(gram)
    x = np.einsum("rlm,rmp,rp->rl", ginv, hh, y)
    out_nv = noise_var * np.real(np.einsum("rll->rl", ginv))
    return x, out_nv


def mmse_equalize(y: np.ndarray, h: np.ndarray, noise_var: float):
    """Per-RE MMSE: x = (H^H H + nv I)^-1 H^H y; effective noise
    nv * [A^-1 G A^-1]_ll (unbiased-equivalent form)."""
    hh = np.conj(np.swapaxes(h, -1, -2))
    gram = hh @ h
    a = gram + noise_var * np.eye(h.shape[-1])
    ainv = np.linalg.inv(a)
    x = np.einsum("rlm,rmp,rp->rl", ainv, hh, y)
    eff = np.einsum("rlm,rmn,rnk->rlk", ainv, gram, ainv)
    out_nv = noise_var * np.real(np.einsum("rll->rl", eff))
    return x, out_nv


def ls_estimate(rx_pilots: np.ndarray, expected: np.ndarray) -> np.ndarray:
    """LS channel estimate averaged over DM-RS symbols (no smoothing):
    rx [P, S, K], expected [L, S, K] -> h [P, L, K]."""
    ls = rx_pilots[:, None] * np.conj(expected)[None]    # [P, L, S, K]
    return ls.mean(axis=2)


# --------------------------------------------------- LDPC encode (numpy)


def _bg_shift_matrix(bg: int, z: int):
    """Dense lifted parity-check matrix H [m*z, n*z] from the BG tables."""
    from ..ops.ldpc_graph import get_graph
    g = get_graph(bg, z)
    h = np.zeros((g.nof_rows * z, g.nof_cols * z), np.uint8)
    eye = np.eye(z, dtype=np.uint8)
    for r, row in enumerate(g.rows):
        for c, shift in row:
            # row i of the block selects c[(i + shift) mod z], matching
            # parity_check_np's np.roll(c, -shift) convention
            h[r * z:(r + 1) * z, c * z:(c + 1) * z] = np.roll(
                eye, int(shift) % z, axis=1)
    return h


def ldpc_encode(info: np.ndarray, bg: int, z: int) -> np.ndarray:
    """Systematic LDPC encode by direct GF(2) solve of the core parities
    (independent of ops.ldpc_encode's gather-plan formulation).

    info [K] -> full codeword [n*z] (2z punctured bits INCLUDED)."""
    h = _bg_shift_matrix(bg, z)
    m_all, n_all = h.shape
    k = info.shape[0]
    cw = np.zeros(n_all, np.uint8)
    cw[:k] = info
    # core: first 4 rows involve parities p0..p3 (cols k..k+4z)
    core = h[: 4 * z]
    lam = (core[:, :k].astype(np.int64) @ cw[:k].astype(np.int64)) % 2
    a = core[:, k:k + 4 * z] % 2                         # [4z, 4z]
    # GF(2) Gaussian elimination solve a p = lam
    aa = np.concatenate([a.astype(np.uint8),
                         lam[:, None].astype(np.uint8)], axis=1)
    nr = aa.shape[0]
    row = 0
    for col in range(4 * z):
        piv = np.nonzero(aa[row:, col])[0]
        if len(piv) == 0:
            continue
        piv = piv[0] + row
        if piv != row:
            aa[[row, piv]] = aa[[piv, row]]
        sel = np.nonzero(aa[:, col])[0]
        sel = sel[sel != row]
        aa[sel] ^= aa[row]
        row += 1
        if row == nr:
            break
    p_core = aa[:4 * z, -1]
    cw[k:k + 4 * z] = p_core
    # extension rows: each row r >= 4 has identity at parity col k + r*z
    m_rows = m_all // z
    for r in range(4, m_rows):
        blk = h[r * z:(r + 1) * z].astype(np.int64)
        lam_r = (blk[:, :k + 4 * z] @ cw[:k + 4 * z].astype(np.int64)) % 2
        cw[k + r * z:k + (r + 1) * z] = lam_r
    assert np.all((h.astype(np.int64) @ cw.astype(np.int64)) % 2 == 0), \
        "numpy LDPC encode failed parity"
    return cw
