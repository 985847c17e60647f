"""O-RAN fronthaul (split 7.2) essentials — TPU-native analogue of lib/ofh.

The reference's OFH stack (SURVEY §2.3: eCPRI packetization lib/ofh/ecpri/,
VLAN Ethernet framing lib/ofh/ethernet/, C/U-plane serdes lib/ofh/serdes/,
BFP IQ compression with AVX kernels lib/ofh/compression/) moves IQ between
DU and RU over a NIC.  In the TPU deployment the IQ fabric between chips is
ICI collectives (SURVEY §2.7), but the *fronthaul boundary* itself — grid
REs <-> compressed U-plane sections <-> eCPRI frames — is re-implemented
here so a split-7.2 peer can be served: the compression math runs batched
on the TPU (one VPU program over [sections, PRBs]), the byte-level framing
on the host.

Modules: compression (BFP), ecpri (+Ethernet framing), uplane (section
serdes), and ru.ofh (the grid-plane radio unit over an in-memory cable).
"""

from .compression import bfp_compress, bfp_decompress  # noqa: F401
