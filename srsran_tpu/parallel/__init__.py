"""Multi-chip parallelism: cell/port sharding over jax.sharding meshes.

TPU-native replacement for the reference's parallelism dimensions
(SURVEY §2.6): per-cell executors -> cells sharded across chips; per-port
loops -> port axis sharding; slot pipelining -> async dispatch + multi-host
pipelines.  XLA inserts the collectives.
"""
