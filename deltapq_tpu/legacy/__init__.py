from .prefix_tree import (BitVecsStore, dichotomize_codewords,
                          interleave_codes, deinterleave_codes,
                          prefix_tree_query)

__all__ = ["BitVecsStore", "dichotomize_codewords", "interleave_codes",
           "deinterleave_codes", "prefix_tree_query"]
