"""Sample-level I/O runtime (native C++ core + ctypes bindings).

Replaces the reference's radio/baseband-gateway layer for this framework's
deployment model: timestamped ring buffers between the sample source
(file replay, network, or a future SDR bridge) and the slot conductor.
"""

from .sampio import SampleRing, SampleFileWriter, SampleFileReader  # noqa: F401
