"""Upper PHY channel processors (per-slot, per-cell DSP).

TPU-native analogue of the reference's lib/phy/upper/channel_processors/:
SSB, PDSCH, PDCCH, PUSCH, PUCCH, PRACH, SRS — each a pure function from a
static config + input arrays to resource-grid contributions or decoded
results, designed to be fused into one jit-compiled slot program.
"""
