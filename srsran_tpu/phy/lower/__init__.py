"""Lower PHY: OFDM baseband processing between slot grids and sample streams.

TPU-native analogue of the reference's lib/phy/lower/: the OFDM modulator/
demodulator kernels live in ops.ofdm; this package adds the PRACH occasion
demodulator, amplitude control and the baseband stream framer that the
sample-level runtime (radio / file IO) drives.
"""
