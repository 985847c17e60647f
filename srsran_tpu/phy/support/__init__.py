"""PHY support: resource grid storage types and pools."""
