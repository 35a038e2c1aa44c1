from weaksuppointcloudseg_tpu.losses.weaksup import (
    masked_softmax_ce,
    siamese_consistency,
    mil_inexact,
    smooth_knn_laplacian,
    total_weaksup_loss,
)

__all__ = [
    "masked_softmax_ce",
    "siamese_consistency",
    "mil_inexact",
    "smooth_knn_laplacian",
    "total_weaksup_loss",
]
