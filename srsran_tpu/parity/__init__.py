"""Reference-parity harness: parse the reference's vectortest descriptor
headers (tests/unittests/phy/**/ *_test_data.h) and exercise this
framework's implementations over the exact parameter grids the reference
tests ship with (SURVEY.md §4.1).  The golden .dat archives are not in the
mount, so value comparisons are done against this framework's own spec
models; what the headers give us is the enumerated configuration coverage
and the derived quantities they embed (e.g. each PUSCH case's LDPC base
graph), which are checked exactly.
"""
