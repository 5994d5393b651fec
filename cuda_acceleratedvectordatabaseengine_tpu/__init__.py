"""TPU-native vector database engine.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of the CUDA
reference engine (wedevxer/CUDA-AcceleratedVectorDatabaseEngine): IVF-Flat and
IVF-PQ approximate-nearest-neighbor indices with k-means coarse quantization,
L2 / inner-product / cosine metrics, fused distance + top-k search over
HBM-resident packed inverted lists, multi-chip sharded search over a device
mesh, epoch-versioned persistence, and a gRPC serving layer.

Everything device-side is expressed as batched matmuls (MXU), vectorized
elementwise ops (VPU), and fixed-shape gathers, compiled once under ``jit`` —
not a translation of the reference's CUDA kernels/streams/pinned pools, which
have no TPU analogs (see SURVEY.md §7).
"""

from cuda_acceleratedvectordatabaseengine_tpu.ops.distance import (
    Metric,
    pairwise_distance,
)
from cuda_acceleratedvectordatabaseengine_tpu.models.flat import FlatIndex
from cuda_acceleratedvectordatabaseengine_tpu.models.ivf_flat import (
    IVFFlatIndex,
    IVFFlatConfig,
    SearchParams,
)
from cuda_acceleratedvectordatabaseengine_tpu.models.ivf_pq import (
    IVFPQIndex,
    IVFPQConfig,
)

__version__ = "0.1.0"

__all__ = [
    "Metric",
    "pairwise_distance",
    "FlatIndex",
    "IVFFlatIndex",
    "IVFFlatConfig",
    "IVFPQIndex",
    "IVFPQConfig",
    "SearchParams",
    "__version__",
]
