"""Device kernels (jnp/XLA + Pallas) for the NR PHY signal chain.

TPU-native replacement for the reference's lib/srsvec SIMD kernels and
lib/phy/upper channel-coding/modulation blocks.  Every op is a pure function
(config, arrays) -> arrays with static shapes, designed to batch over
codeblocks / layers / ports so the MXU and VPU stay fed.
"""
