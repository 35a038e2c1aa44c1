from weaksuppointcloudseg_tpu.models.dgcnn import (
    init_dgcnn_seg,
    apply_dgcnn_seg,
)

__all__ = ["init_dgcnn_seg", "apply_dgcnn_seg"]
