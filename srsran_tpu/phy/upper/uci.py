"""UCI codec: encode/decode for any payload size (TS38.212 §6.3).

Analogue of uci_decoder_impl (lib/phy/upper/channel_processors/uci/):
<=11 bits -> short-block (RM/simplex/repetition) with ML detection;
12..19 -> polar with CRC6 + 3 PC bits; >=20 -> polar with CRC11.
Shared by PUCCH F2/F3/F4 and UCI-on-PUSCH.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ...ops import short_block, polar as polar_ops
from ...ops.crc import crc, crc_check
from ...ran import polar_params


def _polar_cfg(o_bits: int, e: int):
    crc_len = 6 if o_bits < 20 else 11
    n_pc = 3 if (o_bits + crc_len) <= 22 and o_bits < 20 else 0
    code = polar_params.polar_code(o_bits + crc_len, e, nmax=10, ibil=True,
                                   n_pc=n_pc)
    return code, crc_len


def encode_uci(bits: jnp.ndarray, e: int, qm: int) -> jnp.ndarray:
    """[K] -> [E] coded bits."""
    k = bits.shape[-1]
    if k <= 11:
        return short_block.encode(bits[None], e, qm)[0]
    code, crc_len = _polar_cfg(k, e)
    with_crc = jnp.concatenate([bits[None], crc(bits[None], f"crc{crc_len}")],
                               axis=-1)
    u = polar_ops.allocate(with_crc, code)
    return polar_ops.rate_match(polar_ops.encode(u, code.n), code)[0]


def decode_uci(llrs: jnp.ndarray, o_bits: int, qm: int):
    """[E] LLRs -> (bits [K], valid bool, metric f32)."""
    if o_bits <= 11:
        bits, metric = short_block.detect(llrs[None], o_bits, qm)
        return bits[0], metric[0] > 0.25, metric[0]
    code, crc_len = _polar_cfg(o_bits, llrs.shape[-1])
    lm = polar_ops.rate_dematch(llrs[None], code)
    dec = polar_ops.sc_decode(lm, code)
    ok = crc_check(dec, f"crc{crc_len}")[0]
    return dec[0, :o_bits], ok, jnp.float32(1.0)
