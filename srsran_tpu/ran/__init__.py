"""3GPP-derived parameter math (host-side, pure Python/numpy).

TPU-native analogue of the reference's lib/ran/ + include/srsran/ran/: slot
timing, cyclic-prefix lengths, PRB/RE indexing, LDPC segmentation parameters,
polar code construction, MCS/TBS determination.  Everything here is static
per-configuration scalar math that feeds static shapes to the jit-compiled
slot programs in srsran_tpu.phy.
"""

from .slot_point import SlotPoint  # noqa: F401
from .cyclic_prefix import CyclicPrefix, cp_lengths, symbols_per_slot  # noqa: F401
from .constants import NRE, MAX_RB, NSYMB_PER_SLOT_NORMAL  # noqa: F401
