"""Vendored mini-shim of the autoattack surface semseg/attacker.py imports."""

from autoattack import other_utils  # noqa: F401
