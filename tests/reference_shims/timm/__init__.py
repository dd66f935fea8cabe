"""Vendored mini-shim of the timm surface the reference code imports.

Lives under tests/ only; never shipped with the package. See
tests/test_reference_diff.py for why this exists (running the ACTUAL
reference code as the parity oracle).
"""
