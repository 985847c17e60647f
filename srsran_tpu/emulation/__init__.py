"""Emulation utilities: fading channel emulator, UE-side transmitters.

Analogue of the reference's closed-loop test infrastructure
(tests/integrationtests/phy/upper/channel_processors/pxsch_bler_test*):
lets the framework validate BLER end-to-end without radio hardware.
"""
