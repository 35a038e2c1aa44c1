from weaksuppointcloudseg_tpu.propagate.laplacian import (
    product_kernel_weights,
    laplacian_xyz_rgb,
)
from weaksuppointcloudseg_tpu.propagate.label_prop import (
    entropy_confidence,
    label_propagation,
    label_propagation_matfree,
    propagate_batch,
)
from weaksuppointcloudseg_tpu.propagate.sharded import (
    label_propagation_sharded,
)

__all__ = [
    "product_kernel_weights",
    "laplacian_xyz_rgb",
    "entropy_confidence",
    "label_propagation",
    "label_propagation_matfree",
    "propagate_batch",
    "label_propagation_sharded",
]
