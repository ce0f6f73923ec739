"""deltapq-tpu: a TPU-native (JAX/XLA/Pallas/pjit) quantized similarity
search engine with the capabilities of RunhuiWang/DeltaPQ (VLDB'20).

See SURVEY.md for the structural analysis of the reference this build
follows.  Layers:

- ``deltapq_tpu.io``       dataset / artifact I/O (reference-compatible formats)
- ``deltapq_tpu.ops``      JAX/Pallas compute kernels (k-means, encode, ADC, top-k)
- ``deltapq_tpu.tree``     DeltaTree construction, layout and serialization
- ``deltapq_tpu.eval``     groundtruth + recall/mAP metrics
- ``deltapq_tpu.parallel`` mesh sharding, multi-chip query execution
"""

import os as _os

if _os.environ.get("DELTAPQ_COMPCACHE", "1") != "0":
    # Persistent XLA compilation cache: the fused query path compiles
    # a kernel per (shape, ns-rung) and a remote-backend compile runs
    # tens of seconds each — a cold 2M-row first query measured 910 s
    # of compilation (BIGRUN r2).  Caching makes every later process
    # (serving restart, bench re-run, bigrun) hit warm.  Off:
    # DELTAPQ_COMPCACHE=0.
    try:  # pragma: no cover - trivial config
        import jax as _jax

        if _jax.config.jax_compilation_cache_dir is None:
            # don't clobber a cache dir the embedding application (or
            # JAX_COMPILATION_CACHE_DIR) already configured
            _cache = _os.environ.get(
                "DELTAPQ_COMPCACHE_DIR",
                _os.path.expanduser("~/.cache/deltapq_xla"))
            _os.makedirs(_cache, exist_ok=True)
            _jax.config.update("jax_compilation_cache_dir", _cache)
            _jax.config.update(
                "jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception as _e:
        import logging as _logging

        _logging.getLogger(__name__).debug(
            "compilation cache setup skipped: %s", _e)

from .config import (PQConfig, TreeConfig, QueryConfig, ShardConfig)
from .index import DeltaPQIndex

__version__ = "0.1.0"

__all__ = ["PQConfig", "TreeConfig", "QueryConfig", "ShardConfig",
           "DeltaPQIndex", "__version__"]
