"""PHY layer: upper (channel processors), lower (OFDM/baseband), support."""
