"""LDPC encoder: every codeword must satisfy H @ c = 0 for all base graphs."""

import numpy as np
import jax.numpy as jnp
import pytest

from srsran_tpu.ops import ldpc_encode, ldpc_graph


@pytest.mark.parametrize("bg", [1, 2])
@pytest.mark.parametrize("z", [2, 13, 52, 112, 384])
def test_parity_check(bg, z):
    g = ldpc_graph.get_graph(bg, z)
    rng = np.random.default_rng(bg * 1000 + z)
    k = g.nof_info_cols * z
    bits = rng.integers(0, 2, size=(3, k)).astype(np.int8)
    code = np.asarray(ldpc_encode.encode(jnp.asarray(bits), bg, z))
    assert code.shape == (3, g.nof_cols * z)
    # systematic part preserved
    np.testing.assert_array_equal(code[:, :k], bits)
    for b in range(3):
        syn = ldpc_graph.parity_check_np(g, code[b].astype(np.uint8))
        assert not syn.any(), f"syndrome nonzero bg={bg} z={z}"
