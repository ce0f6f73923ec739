"""Native (C++) runtime kernels, loaded via ctypes.

The shared library is built on demand from ``dtc_native.cpp`` with g++
(cached next to the source); all entry points have NumPy fallbacks in
``deltapq_tpu.tree.serialize`` / ``layout`` so the package works without
a toolchain.
"""

from .build import get_lib, have_native
from .api import (dtc_decode_native, dtc_parse_native, dfs_layout_native,
                  scan_query_native, diff_index_decode_native)

__all__ = ["get_lib", "have_native", "dtc_decode_native",
           "dtc_parse_native", "dfs_layout_native", "scan_query_native",
           "diff_index_decode_native"]
