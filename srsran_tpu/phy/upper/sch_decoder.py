"""Shared-channel (DL/UL-SCH) decoder: rate dematch + LDPC decode + CRC.

TPU-native analogue of pusch_decoder_impl
(lib/phy/upper/channel_processors/pusch/pusch_decoder_impl.cpp:71-105):
per-codeblock LLRs are dematched (with soft combining into an optional HARQ
buffer), decoded by the batched layered min-sum LDPC decoder, and checked
with CB CRC24B + TB CRC.  The codeblock axis is the batch axis.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

from ...ops import ldpc_decode, ldpc_rate_match
from ...ops.crc import crc_check
from ...ran.ldpc_params import SegmentParams


@dataclasses.dataclass
class SchDecodeResult:
    tb_bits: jnp.ndarray        # int8 [tbs]
    tb_crc_ok: jnp.ndarray      # bool scalar
    cb_crc_ok: jnp.ndarray      # bool [C]
    new_soft: jnp.ndarray       # f32 [C, N] combined LLRs (HARQ buffer state)
    nof_iterations: jnp.ndarray = None  # i32 scalar: sweeps used (early stop)


def decode(llrs: jnp.ndarray, seg: SegmentParams, e_sizes: list, rv: int,
           qm: int, tbs: int, soft_buffer: jnp.ndarray | None = None,
           nof_iterations: int = 6) -> SchDecodeResult:
    """Decode a codeword's LLRs [G] into a transport block.

    soft_buffer: f32 [C, N] previous-transmission combined LLRs (HARQ).
    """
    bg, z, c = seg.base_graph, seg.lifting_size, seg.nof_codeblocks
    k_prime, k, n = seg.cb_info_bits, seg.full_block_bits, seg.codeword_bits
    buf = ldpc_rate_match.rate_dematch_batch(
        llrs, c, e_sizes, rv, qm, bg, z, k_prime, k, n)         # [C, N]
    if soft_buffer is not None:
        buf = buf + soft_buffer
    full = jnp.concatenate(
        [jnp.zeros((c, 2 * z), dtype=buf.dtype), buf], axis=-1)  # punctured
    # Active layers cover the filled extent of the (combined) buffer, like
    # the reference's trim-to-last-nonzero (ldpc_decoder_impl.cpp:105-117).
    # With a HARQ soft buffer or rv > 0 the extent can reach the full N.
    if soft_buffer is not None or rv != 0:
        nof_layers = bg_rows(bg)
    else:
        nof_layers = max(4, min(seg_layers(seg, e_sizes), bg_rows(bg)))
    # CRC early stop (ldpc_decoder.h:73): sweeps end once every CB passes
    # its attached CRC — CRC24B per CB, or the TB CRC when C == 1.
    es_poly = "crc24B" if seg.cb_crc_bits else (
        "crc24A" if seg.tb_crc_bits == 24 else "crc16")
    bits, _, nof_iter_used = ldpc_decode.decode_early_stop(
        full, bg, z, nof_layers, nof_iterations,
        ldpc_decode.DEFAULT_SCALING, es_poly, k_prime)
    info = bits[:, :k_prime]                                     # [C, K']
    if seg.cb_crc_bits:
        cb_ok = crc_check(info, "crc24B")
        payload = info[:, :k_prime - seg.cb_crc_bits].reshape(-1)
    else:
        cb_ok = jnp.ones((c,), dtype=bool)
        payload = info.reshape(-1)
    tb_with_crc = payload[: tbs + seg.tb_crc_bits]
    poly = "crc24A" if seg.tb_crc_bits == 24 else "crc16"
    tb_ok = crc_check(tb_with_crc[None], poly)[0] & jnp.all(cb_ok)
    return SchDecodeResult(tb_bits=tb_with_crc[:tbs], tb_crc_ok=tb_ok,
                           cb_crc_ok=cb_ok, new_soft=buf,
                           nof_iterations=nof_iter_used)


def bg_rows(bg: int) -> int:
    return 46 if bg == 1 else 42


def seg_layers(seg: SegmentParams, e_sizes: list) -> int:
    """Active decoder layers adapted to the received length
    (ldpc_decoder_impl.cpp:117: nof_layers = cb_len/Z - bg_K)."""
    z = seg.lifting_size
    bg_k = 22 if seg.base_graph == 1 else 10
    max_e = max(e_sizes)
    cb_len = min(seg.codeword_bits + 2 * z,
                 ((max_e + 2 * z + z - 1) // z) * z)
    return max(4, cb_len // z - bg_k)
