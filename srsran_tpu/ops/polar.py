"""Polar encode / SC decode / rate (de)matching (TS38.212 §5.3.1, §5.4.1).

TPU-native replacement for the reference's polar chain
(lib/phy/upper/channel_coding/polar/): the encoder is the F^{(x)n} butterfly
as log2(N) vectorized XOR stages; the decoder is the same tree-pruned
simplified successive-cancellation of polar_decoder_impl.h:36-143
(node classes RATE_0 / RATE_1 / RATE_R — SC, not list), but unrolled at
trace time against the static frozen mask and batched over codewords.
Rate matching (sub-block interleaver, puncture/shorten/repeat, triangular
channel interleaver) is host-precomputed index plans + gathers.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..ran.polar_params import PolarCode, subblock_interleave_map, input_interleave_map


# ---------------------------------------------------------------- encoding

def encode(u: jnp.ndarray, n: int) -> jnp.ndarray:
    """x = u F^{(x)n}, natural order (no bit reversal in NR).  [B, N] int8."""
    big_n = 1 << n
    x = u.astype(jnp.uint8)
    batch = x.shape[0]
    for s in range(n):
        half = 1 << s
        x = x.reshape(batch, big_n // (2 * half), 2, half)
        left = x[:, :, 0] ^ x[:, :, 1]
        x = jnp.stack([left, x[:, :, 1]], axis=2)
    return x.reshape(batch, big_n).astype(jnp.int8)


def allocate(msg: jnp.ndarray, code: PolarCode) -> jnp.ndarray:
    """Place K message bits into the encoder input (frozen = 0).

    Applies the DL input interleaver (i_IL) when enabled.  [B, K] -> [B, N].
    """
    batch = msg.shape[0]
    if code.iil:
        perm = jnp.asarray(input_interleave_map(code.k))
        msg = jnp.take(msg, perm, axis=-1)
    u = jnp.zeros((batch, code.big_n), dtype=jnp.int8)
    u = u.at[:, jnp.asarray(code.info_set)].set(msg.astype(jnp.int8))
    if code.n_pc > 0:
        u = _set_pc_bits(u, code)
    return u


def _set_pc_bits(u: jnp.ndarray, code: PolarCode) -> jnp.ndarray:
    """TS38.212 §5.3.1.2 parity-check bits via length-5 cyclic shift register.

    Walk positions 0..N-1; info bits feed/update y = reg[0]; at PC positions
    write y.  Vectorized over batch with a host-unrolled scan (N <= 1024).
    """
    # Host-side: simulate which info bits XOR into each PC bit.
    big_n = code.big_n
    pc_pos = set(code.pc_set.tolist())
    info_pos = set(code.info_set.tolist())
    # reg holds sets of info-positions whose XOR is the register value.
    reg = [set() for _ in range(5)]
    pc_sources = {}
    for i in range(big_n):
        reg = reg[1:] + [reg[0]]  # cyclic left shift
        if i in pc_pos:
            pc_sources[i] = frozenset(reg[0])
        elif i in info_pos:
            reg[0] = reg[0] ^ {i}
    out = u
    for pos, src in pc_sources.items():
        if src:
            idx = jnp.asarray(sorted(src))
            val = (jnp.sum(u[:, idx].astype(jnp.int32), axis=-1) % 2).astype(jnp.int8)
        else:
            val = jnp.zeros(u.shape[0], dtype=jnp.int8)
        out = out.at[:, pos].set(val)
    return out


_ENCODE_MATRIX_CACHE: dict = {}


def encode_matrix(code: PolarCode) -> np.ndarray:
    """GF(2) matrix M [K, E] of the whole encode chain (host, numpy).

    allocate (incl. i_IL) -> u F^{(x)n} -> rate match (+i_BIL) is linear
    over GF(2) for n_pc == 0, so msg @ M (&1) reproduces
    rate_match(encode(allocate(msg))) with ONE device matmul — this is how
    the slot programs fuse the reference's whole polar TX chain
    (polar_{allocator,encoder,rate_matcher}_impl) into a single MXU op.
    """
    assert code.n_pc == 0, "PC-polar (UCI 12..19 bits) is not linear"
    key = (code.k, code.e, code.n, code.mode, code.ibil, code.iil,
           code.info_set.tobytes())
    hit = _ENCODE_MATRIX_CACHE.get(key)
    if hit is not None:
        return hit
    k, big_n = code.k, code.big_n
    placed = np.eye(k, dtype=np.uint8)
    if code.iil:
        # allocate() takes msg' = msg[perm]; on basis rows that is a
        # column reorder: placed[r, i] = (perm[i] == r).
        placed = placed[:, input_interleave_map(code.k)]
    u = np.zeros((k, big_n), dtype=np.uint8)
    u[:, code.info_set] = placed
    # butterfly x = u F^{(x)n}
    x = u
    n = code.n
    for s in range(n):
        half = 1 << s
        x = x.reshape(k, big_n // (2 * half), 2, half)
        left = x[:, :, 0] ^ x[:, :, 1]
        x = np.stack([left, x[:, :, 1]], axis=2)
    x = x.reshape(k, big_n)
    plan = _rm_plan(code.big_n, code.e, code.mode)
    out = x[:, plan]
    if code.ibil:
        out = out[:, _triangle_perm(code.e)]
    out = out.astype(np.uint8)
    _ENCODE_MATRIX_CACHE[key] = out
    return out


# ------------------------------------------------------------ rate matching

@functools.lru_cache(maxsize=None)
def _rm_plan(big_n: int, e: int, mode: str) -> np.ndarray:
    """src index in mother codeword for each of the E transmitted bits."""
    jmap = subblock_interleave_map(big_n)
    if mode == "puncture":
        sel = np.arange(big_n - e, big_n)
    elif mode == "shorten":
        sel = np.arange(e)
    else:  # none / repeat
        sel = np.arange(e) % big_n
    return jmap[sel].astype(np.int32)


@functools.lru_cache(maxsize=None)
def _triangle_perm(e: int) -> np.ndarray:
    """TS38.212 §5.4.1.3 triangular channel interleaver: out[i] = in[perm[i]]."""
    t = 1
    while t * (t + 1) // 2 < e:
        t += 1
    rows = []
    k = 0
    mat = -np.ones((t, t), dtype=np.int64)
    for r in range(t):
        for c in range(t - r):
            if k < e:
                mat[r, c] = k
                k += 1
    perm = mat.T.reshape(-1)
    return perm[perm >= 0].astype(np.int32)


def rate_match(x: jnp.ndarray, code: PolarCode) -> jnp.ndarray:
    """Mother codeword [B, N] -> transmitted bits [B, E]."""
    plan = jnp.asarray(_rm_plan(code.big_n, code.e, code.mode))
    out = jnp.take(x, plan, axis=-1)
    if code.ibil:
        out = jnp.take(out, jnp.asarray(_triangle_perm(code.e)), axis=-1)
    return out


def rate_dematch(llrs: jnp.ndarray, code: PolarCode,
                 shorten_llr: float = 1e4) -> jnp.ndarray:
    """Transmitted-bit LLRs [B, E] -> mother-codeword LLRs [B, N].

    Punctured bits get 0, shortened bits get a strong known-zero LLR,
    repeated bits accumulate.
    """
    if code.ibil:
        perm = jnp.asarray(_triangle_perm(code.e))
        buf = jnp.zeros_like(llrs)
        llrs = buf.at[..., perm].set(llrs)  # inverse of gather-perm
    plan = jnp.asarray(_rm_plan(code.big_n, code.e, code.mode))
    out = jnp.zeros(llrs.shape[:-1] + (code.big_n,), dtype=llrs.dtype)
    out = out.at[..., plan].add(llrs)
    if code.mode == "shorten":
        jmap = subblock_interleave_map(code.big_n)
        frozen_out = jnp.asarray(jmap[code.e:].copy())
        out = out.at[..., frozen_out].set(shorten_llr)
    return out


# ----------------------------------------------------------------- decoding

def _f(a, b):
    """Check-node (min-sum box-plus approximation)."""
    return jnp.sign(a) * jnp.sign(b) * jnp.minimum(jnp.abs(a), jnp.abs(b))


def _g(a, b, x_left):
    return b + (1.0 - 2.0 * x_left) * a


def sc_decode(llrs: jnp.ndarray, code: PolarCode):
    """Successive-cancellation decode, batched.

    llrs: f32 [B, N] mother-codeword LLRs (LLR > 0 -> bit 0).
    Returns msg bits int8 [B, K] (input interleaver inverted if DL).
    Tree-pruned at trace time: all-frozen segments return zeros (RATE_0);
    all-info segments hard-decide and re-encode (RATE_1), matching the
    reference's simplified SC (polar_decoder_impl.h node classes).
    """
    frozen = code.frozen_mask.astype(bool)
    batch = llrs.shape[0]

    def rec(seg: jnp.ndarray, fro: np.ndarray):
        m = seg.shape[-1]
        if fro.all():
            z = jnp.zeros((batch, m), dtype=jnp.float32)
            return z, z  # u (unused beyond type), x
        if not fro.any():
            x = (seg < 0).astype(jnp.float32)
            return _unencode(x), x
        if m == 1:
            u = (seg[:, 0] < 0).astype(jnp.float32)[:, None]
            return u, u
        h = m // 2
        a, b = seg[:, :h], seg[:, h:]
        u_l, x_l = rec(_f(a, b), fro[:h])
        u_r, x_r = rec(_g(a, b, x_l), fro[h:])
        x = jnp.concatenate([_xor_f(x_l, x_r), x_r], axis=-1)
        u = jnp.concatenate([u_l, u_r], axis=-1)
        return u, x

    u_hat, _ = rec(llrs.astype(jnp.float32), frozen)
    msg = jnp.take(u_hat, jnp.asarray(code.info_set), axis=-1).astype(jnp.int8)
    if code.iil:
        perm = input_interleave_map(code.k)
        inv = np.empty_like(perm)
        inv[perm] = np.arange(code.k, dtype=np.int32)
        msg = jnp.take(msg, jnp.asarray(inv), axis=-1)
    return msg


def _xor_f(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """XOR of {0.,1.}-valued float arrays."""
    return jnp.abs(a - b)


def _unencode(x: jnp.ndarray) -> jnp.ndarray:
    """Invert the polar butterfly on hard bits (float {0,1}): self-inverse."""
    batch, m = x.shape
    n = int(np.log2(m))
    u = x
    for s in range(n):
        half = 1 << s
        u = u.reshape(batch, m // (2 * half), 2, half)
        left = _xor_f(u[:, :, 0], u[:, :, 1])
        u = jnp.stack([left, u[:, :, 1]], axis=2)
    return u.reshape(batch, m)
