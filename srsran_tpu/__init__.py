"""srsran_tpu — a TPU-native 5G NR PHY framework in JAX/XLA/Pallas.

Built from scratch with the capabilities of the srsRAN Project gNB PHY
(reference: hypermagik/srsRAN-5G, surveyed in SURVEY.md).  The entire DL/UL
signal chain is expressed as pure, jit-compiled array programs; cells and
antenna ports shard across TPU chips via jax.sharding meshes, and a host-side
slot conductor speaks a FAPI-shaped request API mirroring the reference's
MAC<->PHY boundary (include/srsran/fapi/messages/).
"""

__version__ = "0.1.0"
