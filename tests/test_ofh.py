"""OFH stack: BFP compression, eCPRI/U-plane serdes, grid loopback."""

import numpy as np
import jax.numpy as jnp

from srsran_tpu.ofh import bfp_compress, bfp_decompress
from srsran_tpu.ofh import ecpri
from srsran_tpu.ofh.compression import pack_section, unpack_section
from srsran_tpu.ofh.uplane import UplaneHeader, build_uplane, parse_uplane
from srsran_tpu.ru.ofh import RuOfh, InMemoryCable


def test_bfp_roundtrip_snr():
    rng = np.random.default_rng(0)
    iq = (rng.normal(size=(4, 24)) + 1j * rng.normal(size=(4, 24))
          ).astype(np.complex64) * 0.3
    exp, mant = bfp_compress(jnp.asarray(iq), 9)
    out = np.asarray(bfp_decompress(exp, mant))
    err = np.mean(np.abs(out - iq) ** 2) / np.mean(np.abs(iq) ** 2)
    # 9-bit BFP gives ~45+ dB SQNR on Gaussian IQ
    assert 10 * np.log10(1 / err) > 40.0
    # mantissas respect the signed 9-bit range
    assert np.asarray(mant).max() <= 255 and np.asarray(mant).min() >= -256


def test_bfp_full_scale_and_zero_prb():
    iq = np.zeros((1, 24), np.complex64)
    iq[0, 0] = 1.0          # +32767 full scale
    iq[0, 12] = -1.0
    exp, mant = bfp_compress(jnp.asarray(iq), 9)
    out = np.asarray(bfp_decompress(exp, mant))
    assert abs(out[0, 0] - 1.0) < 2 ** -7            # quantized, close
    z = bfp_compress(jnp.zeros((1, 12), jnp.complex64), 9)
    assert int(np.asarray(z[0])[0, 0]) == 0
    assert np.all(np.asarray(z[1]) == 0)


def test_pack_unpack_section_bits():
    rng = np.random.default_rng(1)
    exp = rng.integers(0, 8, 5).astype(np.uint8)
    mant = rng.integers(-256, 256, (5, 24)).astype(np.int32)
    blob = pack_section(exp, mant, 9)
    assert len(blob) == 5 * (1 + (24 * 9 + 7) // 8)
    e2, m2 = unpack_section(blob, 5, 9)
    np.testing.assert_array_equal(e2, exp)
    np.testing.assert_array_equal(m2, mant)


def test_ecpri_and_uplane_headers():
    pdu = ecpri.build_ecpri(ecpri.MSG_TYPE_IQ_DATA, pc_id=3, seq_id=77,
                            payload=b"abc")
    mtype, pc, seq, payload = ecpri.parse_ecpri(pdu)
    assert (mtype, pc, seq, payload[:3]) == (0, 3, 77, b"abc")
    eth = ecpri.build_eth(b"\x01" * 6, b"\x02" * 6, 5, pdu)
    dst, src, tci, inner = ecpri.parse_eth(eth)
    assert tci == 5 and inner == pdu

    hdr = UplaneHeader(direction=1, frame=7, subframe=3, slot=13, symbol=9,
                       start_prb=260, nof_prb=2, iq_width=9, section_id=4)
    exp = np.array([2, 0], np.uint8)
    mant = np.zeros((2, 24), np.int32)
    msg = build_uplane(hdr, exp, mant)
    h2, e2, m2 = parse_uplane(msg)
    assert h2 == hdr
    np.testing.assert_array_equal(e2, exp)


def test_ru_ofh_grid_loopback():
    """DU grid -> compressed frames -> O-RU emulator echo -> UL grid."""
    rng = np.random.default_rng(2)
    nof_prb = 52
    grid = (rng.normal(size=(2, 14, nof_prb * 12))
            + 1j * rng.normal(size=(2, 14, nof_prb * 12))
            ).astype(np.complex64) * 0.2
    cable = InMemoryCable()
    du = RuOfh(cable.endpoint_a(), nof_ports=2, nof_prb=nof_prb)
    ru = RuOfh(cable.endpoint_b(), nof_ports=2, nof_prb=nof_prb)
    du.send_dl_grid(jnp.asarray(grid), slot=1)
    echoed = ru.receive_ul_grid(14)             # the O-RU's view of DL
    assert echoed is not None
    ru.send_dl_grid(jnp.asarray(echoed), slot=1, direction=0)
    back = du.receive_ul_grid(14)
    err = np.mean(np.abs(back - grid) ** 2) / np.mean(np.abs(grid) ** 2)
    assert 10 * np.log10(1 / err) > 35.0        # two BFP hops
    assert du.metrics["tx_frames"] == 2 * 14
    assert du.metrics["dropped_seq"] == 0


def test_ru_ofh_seq_gap_applies_good_frame():
    """A lost frame counts as a gap but the frame that DID arrive is used."""
    cable = InMemoryCable()
    du = RuOfh(cable.endpoint_a(), nof_ports=1, nof_prb=4)
    ru = RuOfh(cable.endpoint_b(), nof_ports=1, nof_prb=4)
    g = np.ones((1, 1, 48), np.complex64) * 0.1
    du.send_dl_grid(jnp.asarray(g), slot=0)       # seq 0 establishes stream
    assert ru.receive_ul_grid(1) is not None
    du.send_dl_grid(jnp.asarray(g), slot=0)       # seq 1 — lost in flight
    du.send_dl_grid(jnp.asarray(g), slot=0)       # seq 2 — arrives after gap
    del cable.a_to_b[1]      # drop seq 1's U-plane (index 0 is its C-plane)
    out = ru.receive_ul_grid(1)
    assert out is not None                        # the good frame is applied
    assert ru.metrics["dropped_seq"] == 1         # the gap is still counted
    # next in-order frame (seq 3) flows with no further drops
    du.send_dl_grid(jnp.asarray(g), slot=0)
    assert ru.receive_ul_grid(1) is not None
    assert ru.metrics["dropped_seq"] == 1


def test_ru_ofh_drops_stale_frames():
    """A frame older than the expected sequence number is discarded."""
    cable = InMemoryCable()
    du = RuOfh(cable.endpoint_a(), nof_ports=1, nof_prb=4)
    ru = RuOfh(cable.endpoint_b(), nof_ports=1, nof_prb=4)
    g = np.ones((1, 1, 48), np.complex64) * 0.1
    du.send_dl_grid(jnp.asarray(g), slot=0)       # seq 0
    stale = cable.a_to_b[1]                       # seq 0's U-plane frame
    assert ru.receive_ul_grid(1) is not None
    du.send_dl_grid(jnp.asarray(g), slot=0)       # seq 1
    cable.a_to_b.append(stale)                    # replay seq 0 after seq 1
    assert ru.receive_ul_grid(1) is not None      # seq 1 applied
    assert ru.metrics["dropped_seq"] == 1         # the replayed stale frame
    assert ru.metrics["rx_frames"] == 2


# ----------------------------------------------------- C-plane (serdes)

def test_cplane_type1_roundtrip():
    from srsran_tpu.ofh import cplane
    msg = cplane.CplaneType1(
        direction=cplane.DIRECTION_DL, sfn=137, subframe=7, slot=1,
        start_symbol=2,
        section=cplane.CplaneSection(section_id=0x123, prb_start=260,
                                     nof_prb=13, nof_symbols=12,
                                     re_mask=0xABC),
        iq_width=9)
    blob = cplane.build_type1(msg)
    back = cplane.parse(blob)
    assert back == msg


def test_cplane_type3_roundtrip():
    from srsran_tpu.ofh import cplane
    msg = cplane.CplaneType3(
        direction=cplane.DIRECTION_UL, sfn=9, subframe=3, slot=2,
        start_symbol=0,
        section=cplane.CplaneSection(section_id=7, prb_start=0,
                                     nof_prb=12, nof_symbols=12),
        time_offset=1024, scs_hz=1_250, fft_size=12, cp_length=3168,
        frequency_offset=-4096, iq_width=9)
    blob = cplane.build_type3(msg)
    back = cplane.parse(blob)
    assert back == msg


def test_ru_ofh_cplane_scheduling_loopback():
    """DL grids ride C-plane + U-plane pairs; the receiver validates the
    U-plane against the schedule and flags out-of-schedule sections."""
    from srsran_tpu.ofh import cplane
    rng = np.random.default_rng(5)
    nof_prb = 24
    grid = (rng.normal(size=(2, 14, nof_prb * 12))
            + 1j * rng.normal(size=(2, 14, nof_prb * 12))
            ).astype(np.complex64) * 0.2
    cable = InMemoryCable()
    du = RuOfh(cable.endpoint_a(), nof_ports=2, nof_prb=nof_prb)
    ru = RuOfh(cable.endpoint_b(), nof_ports=2, nof_prb=nof_prb)
    du.send_dl_grid(jnp.asarray(grid), slot=1)
    assert du.metrics["cplane_tx"] == 2          # one per eAxC
    out = ru.receive_ul_grid(14)
    assert out is not None
    assert ru.metrics["cplane_rx"] == 2
    assert ru.metrics["unscheduled_uplane"] == 0
    sched = ru.rx_schedule[0]
    assert isinstance(sched, cplane.CplaneType1)
    assert sched.section.nof_prb == nof_prb and sched.slot == 1
    # now shrink the schedule to 4 symbols: later-symbol U-plane frames are
    # flagged as unscheduled
    ru.rx_schedule = {p: cplane.CplaneType1(
        direction=1, sfn=0, subframe=0, slot=1, start_symbol=0,
        section=cplane.CplaneSection(section_id=p, prb_start=0,
                                     nof_prb=nof_prb, nof_symbols=4))
        for p in range(2)}
    du.send_dl_grid(jnp.asarray(grid), slot=1)
    # drop the fresh C-plane messages so the stale 4-symbol schedule rules
    kept = [f for f in list(cable.a_to_b)]
    cable.a_to_b.clear()
    for f in kept:
        _, _, _, pdu = __import__(
            "srsran_tpu.ofh.ecpri", fromlist=["parse_eth"]).parse_eth(f)
        if pdu[1] == 2:          # eCPRI msg type RT_CONTROL
            continue
        cable.a_to_b.append(f)
    ru.receive_ul_grid(14)
    assert ru.metrics["unscheduled_uplane"] == 2 * 10   # symbols 4..13
