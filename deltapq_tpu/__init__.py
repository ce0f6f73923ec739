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

from .config import (PQConfig, TreeConfig, QueryConfig, ShardConfig)
from .index import DeltaPQIndex

__version__ = "0.1.0"

__all__ = ["PQConfig", "TreeConfig", "QueryConfig", "ShardConfig",
           "DeltaPQIndex", "__version__"]
