from weaksuppointcloudseg_tpu.propagate.laplacian import (
    product_kernel_weights,
    laplacian_xyz_rgb,
    inner_prod,
    pair_dist2,
    pair_weight2,
    laplacian_from_weights,
    laplacian_sym_direct,
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
    "inner_prod",
    "pair_dist2",
    "pair_weight2",
    "laplacian_from_weights",
    "laplacian_sym_direct",
    "entropy_confidence",
    "label_propagation",
    "label_propagation_matfree",
    "propagate_batch",
    "label_propagation_sharded",
]
