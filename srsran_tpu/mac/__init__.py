"""Host-side L2 drivers: test-mode MAC generating FAPI-shaped slot requests.

The reference treats L2 as out of PHY scope for this framework (SURVEY
north-star note); this package provides the thin drivers that feed the PHY
the same FAPI-shaped requests a real MAC would — in particular a test-mode
MAC mirroring mac_test_mode_adapter (lib/du/du_high/test_mode/) that runs
full-rate traffic without a UE.
"""
