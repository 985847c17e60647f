"""Per-block device metrics: HLO op_name join against profiler traces."""

import jax
import jax.numpy as jnp
import numpy as np

from srsran_tpu.utils import device_metrics


def test_scope_map_parses_hlo_metadata():
    hlo = '''
HloModule jit_f

ENTRY main {
  %p0 = f32[256,256]{1,0} parameter(0)
  %sine = f32[256,256]{1,0} sine(%p0), metadata={op_name="jit(f)/ldpc_decode/sin" source_file="x.py" source_line=7}
  ROOT %dot = f32[256,256]{1,0} dot(%sine, %p0), metadata={op_name="jit(f)/equalize/dot_general"}
}
'''
    m = device_metrics.scope_map(hlo)
    assert m["sine"] == "ldpc_decode"
    assert m["dot"] == "equalize"


def test_profile_blocks_attributes_device_time(tmp_path):
    @jax.jit
    def f(x):
        with jax.named_scope("ldpc_decode"):
            y = jnp.sin(x) @ x
        with jax.named_scope("equalize"):
            z = jnp.tanh(y) * 2.0
        return z

    x = jnp.ones((512, 512))
    agg = device_metrics.profile_blocks(f, x, iters=3, log_dir=str(tmp_path))
    assert "ldpc_decode" in agg, sorted(agg)
    assert agg["ldpc_decode"]["time_us"] > 0
    # the matmul dominates the elementwise block
    eq = agg.get("equalize", {"time_us": 0.0})
    assert agg["ldpc_decode"]["time_us"] > eq["time_us"]
    lines = device_metrics.report_lines(agg, iters=3)
    assert any("ldpc_decode" in ln for ln in lines)


def test_slot_program_blocks_visible(tmp_path):
    from srsran_tpu.phy.slot_programs import CellConfig, ul_slot_fn
    from srsran_tpu.phy.upper.pusch import PuschConfig
    from srsran_tpu.ran.ldpc_params import segment_tb, select_base_graph

    cell = CellConfig(nof_ports=2, nof_rb=6, dft_size=128, numerology=1,
                      center_freq_hz=0.0)
    pusch = PuschConfig(rnti=0x11, rb_start=0, rb_count=6, first_symbol=0,
                        nof_symbols=14, modulation="qpsk",
                        target_code_rate=0.3, tbs=352, nof_layers=1,
                        n_id=0, dmrs_symbols=(2, 7, 11))
    ul = ul_slot_fn(cell, ((pusch,), (), (), (), ()))
    seg = segment_tb(352, select_base_graph(352, 0.3))
    softs = (jnp.zeros((seg.nof_codeblocks, seg.codeword_bits), jnp.float32),)
    samples = jnp.zeros((2, cell.slot_samples()), jnp.complex64)
    agg = device_metrics.profile_blocks(ul, samples, (), softs,
                                        log_dir=str(tmp_path))
    found = set(agg)
    # the big UL stages must be attributable on the device timeline
    for scope in ("pusch/channel_estimate", "pusch/sch_decode"):
        assert any(s.startswith(scope) for s in found), (scope, sorted(found))
