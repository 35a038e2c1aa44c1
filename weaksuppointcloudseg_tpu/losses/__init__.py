from weaksuppointcloudseg_tpu.losses.weaksup import (
    masked_softmax_ce,
    siamese_consistency,
    mil_inexact,
    smooth_knn_laplacian,
    total_weaksup_loss,
)
from weaksuppointcloudseg_tpu.losses import alternates
from weaksuppointcloudseg_tpu.losses import smooth_variants

__all__ = [
    "masked_softmax_ce",
    "siamese_consistency",
    "mil_inexact",
    "smooth_knn_laplacian",
    "total_weaksup_loss",
    "alternates",
    "smooth_variants",
]
