"""NZP-CSI-RS rows 13-18 (24/32 ports) — beyond the reference's row<=12."""

import numpy as np
import jax.numpy as jnp
import pytest

from srsran_tpu.phy.upper import csi_rs


@pytest.mark.parametrize("row,ports,nk,need_l1", [
    (13, 24, 3, True), (14, 24, 3, True), (15, 24, 3, False),
    (16, 32, 4, True), (17, 32, 4, True), (18, 32, 4, False)])
def test_row_structure(row, ports, nk, need_l1):
    assert csi_rs.nof_csi_rs_ports(row) == ports
    k_ref = tuple(2 * i for i in range(nk))
    if need_l1:
        with pytest.raises(ValueError):
            csi_rs._cdm_groups(row, k_ref, 4, -1)
    groups, cdm, fd, td = csi_rs._cdm_groups(row, k_ref, 4, 8)
    assert len(groups) * fd * td == ports
    # every CDM group of one row sits on a distinct (k, l) anchor
    assert len(set(groups)) == len(groups)


@pytest.mark.parametrize("row", [13, 14, 15, 16, 17, 18])
def test_map_re_count_and_energy(row):
    ports = csi_rs.nof_csi_rs_ports(row)
    nk = csi_rs._ROWS[row][2]
    cfg = csi_rs.CsiRsConfig(row=row, rb_start=1, rb_count=3, symbol=4,
                             symbol2=8, k_ref=tuple(2 * i for i in range(nk)),
                             scrambling_id=11, slot_in_frame=3)
    grid = jnp.zeros((ports, 14, 6 * 12), dtype=jnp.complex64)
    out = np.asarray(csi_rs.process(grid, cfg))
    # with identity precoding each CSI-RS port occupies fd*td REs per PRB
    # (QPSK, |v|=1): total energy = ports * fd * td * n_rb
    _, _, fd, td = csi_rs._cdm_groups(cfg.row, cfg.resolved_k_ref(),
                                      cfg.symbol, cfg.symbol2)
    expected = ports * fd * td * 3
    assert np.isclose((np.abs(out) ** 2).sum(), expected, rtol=1e-3)
    # used symbols stay within the slot and include l1's block for the
    # two-symbol-group rows
    syms = np.nonzero((np.abs(out) ** 2).sum(axis=(0, 2)))[0]
    if row in (13, 14, 16, 17):
        assert 8 in syms
    assert syms.max() < 14


def test_cdm8_orthogonality_row18():
    """Despreading one port's CDM8 cover recovers only that port."""
    cfg = csi_rs.CsiRsConfig(row=18, rb_start=0, rb_count=2, symbol=2,
                             k_ref=(0, 2, 4, 6), scrambling_id=5)
    ports = 32
    grid = jnp.zeros((ports, 14, 3 * 12), dtype=jnp.complex64)
    out = np.asarray(csi_rs.process(grid, cfg))
    wf_tab, wt_tab = csi_rs._CDM_TABLES["cdm8_FD2_TD4"]
    groups, _, fd, td = csi_rs._cdm_groups(18, (0, 2, 4, 6), 2)
    # take CDM group 0 (k=0..1, l=2..5) on the first PRB
    block = out[:, 2:6, 0:2]                     # [32, td, fd]
    # port 0's cover is all-ones, so its plane IS the raw pilot sequence;
    # removing it reduces every plane to its cover, and the covers are
    # orthogonal over the td x fd block.
    pilot = block[0]
    assert np.all(np.abs(pilot) > 0.7)           # QPSK pilots present
    for ci in range(8):
        w = np.outer(wt_tab[ci], wf_tab[ci])     # [td, fd]
        corr = (block * np.conj(pilot)[None] * w[None]).sum(axis=(1, 2))
        assert abs(corr[ci] - 8.0) < 1e-3        # sum of |pilot|^2 * w^2
        others = [p for p in range(8) if p != ci]
        assert np.abs(corr[others]).max() < 1e-3
