"""FAPI-shaped MAC<->PHY interface (host side).

Mirror of the reference's include/srsran/fapi/messages/ slot messages and
lib/fapi_adaptor: dataclass requests in, dataclass indications out, with a
slot conductor that compiles/launches the jitted slot programs.
"""
