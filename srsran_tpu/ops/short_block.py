"""Short-block UCI codes (TS38.212 §5.3.3): encode + ML detection.

TPU-native replacement for short_block_encoder_impl /
short_block_detector_impl (lib/phy/upper/channel_coding/short/): 1-bit
repetition, 2-bit simplex, and the Reed-Muller (32, K<=11) code.  Detection
is maximum-likelihood correlation — on TPU a single [B, 32] x [32, 2^K]
matmul against all candidate codewords, then argmax (exactly the
reference's detector strategy, vectorized on the MXU).

Placeholder bits: 1-bit/2-bit encodings contain 'x'/'y' placeholders that
scrambling must repair (reference ulsch_demultiplex handles this); encoders
here emit x=1, y=repetition per the spec tables and detectors ignore those
positions.
"""

from __future__ import annotations

import functools
from pathlib import Path

import jax.numpy as jnp
import numpy as np

_DATA = Path(__file__).resolve().parent.parent / "data" / "short_block_tables.npz"


@functools.lru_cache(maxsize=None)
def rm_basis() -> np.ndarray:
    return np.load(_DATA)["rm_basis"]  # int8 [11, 32]


def encode(bits: jnp.ndarray, e: int, qm: int = 1) -> jnp.ndarray:
    """Encode [B, K] (K<=11) -> [B, E].

    K=1: c = [b, x(=1), ...] repeated to E with Qm-spaced placeholders.
    K=2: c = [b0, b1, b0^b1] (+ placeholders for Qm>1), cycled to E.
    K>=3: RM(32,K) then repeated to E.
    """
    k = bits.shape[-1]
    b = bits.astype(jnp.int8)
    if k >= 3:
        m = jnp.asarray(rm_basis()[:k])          # [K, 32]
        code = (jnp.matmul(b, m, preferred_element_type=jnp.int32) & 1).astype(jnp.int8)
        reps = -(-e // 32)
        return jnp.tile(code, (1, reps))[:, :e]
    if k == 1:
        # TS38.212 Table 5.3.3.1-1: [b, y, ...] with Qm-1 placeholders; the
        # placeholder y repeats b (so QPSK carries b twice), x bits = 1.
        sym = jnp.concatenate([b, jnp.tile(b, (1, qm - 1))], axis=-1) if qm > 1 else b
        reps = -(-e // qm)
        return jnp.tile(sym, (1, reps))[:, :e]
    # k == 2, Table 5.3.3.1-2: c = [b0, b1, b2=b0^b1] with placeholders for Qm>1.
    b2 = (b[:, 0:1] ^ b[:, 1:2])
    if qm == 1:
        base = jnp.concatenate([b, b2], axis=-1)  # length 3
    else:
        ones = jnp.ones_like(b[:, :1])
        # [b0, b1, x.., b2, b0, x.., b1, b2, x..] pattern per spec; compact
        # form: three Qm-sized groups [bi, bj, 1...].
        g0 = jnp.concatenate([b[:, 0:1], b[:, 1:2], jnp.tile(ones, (1, qm - 2))], -1)
        g1 = jnp.concatenate([b2, b[:, 0:1], jnp.tile(ones, (1, qm - 2))], -1)
        g2 = jnp.concatenate([b[:, 1:2], b2, jnp.tile(ones, (1, qm - 2))], -1)
        base = jnp.concatenate([g0, g1, g2], axis=-1)
    reps = -(-e // base.shape[-1])
    return jnp.tile(base, (1, reps))[:, :e]


@functools.lru_cache(maxsize=None)
def _candidates(k: int, e: int, qm: int) -> np.ndarray:
    """All 2^K codewords as +-1 rows: [2^K, E] (+1 for bit 0)."""
    import itertools
    import jax
    msgs = np.array(list(itertools.product([0, 1], repeat=k)), dtype=np.int8)
    # must stay host-side even when first reached inside a jit trace
    with jax.ensure_compile_time_eval():
        cw = np.asarray(encode(jnp.asarray(msgs), e, qm))
    return (1.0 - 2.0 * cw).astype(np.float32)


def detect(llrs: jnp.ndarray, k: int, qm: int = 1):
    """ML detection.  llrs f32 [B, E] -> (bits int8 [B, K], metric f32 [B]).

    metric = normalized correlation of the best candidate (detection
    confidence, analogous to the reference's detector metric).
    """
    e = llrs.shape[-1]
    cands = jnp.asarray(_candidates(k, e, qm))       # [2^K, E]
    corr = jnp.matmul(llrs, cands.T, preferred_element_type=jnp.float32)
    best = jnp.argmax(corr, axis=-1)
    shifts = jnp.arange(k - 1, -1, -1, dtype=jnp.int32)
    bits = ((best[:, None] >> shifts) & 1).astype(jnp.int8)
    norm = jnp.linalg.norm(llrs, axis=-1) * jnp.sqrt(float(e)) + 1e-9
    metric = jnp.take_along_axis(corr, best[:, None], axis=-1)[:, 0] / norm
    return bits, metric
