"""Native (C++) host-side runtime components, loaded via ctypes.

Built on demand with g++ (cached next to the source); every native entry
point has a pure-Python fallback so the package works without a toolchain.
"""

from robseg_tpu.native.build import load_library, native_available  # noqa: F401
