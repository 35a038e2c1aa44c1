from weaksuppointcloudseg_tpu.metrics.iou import (
    eval_iou,
    batch_iou,
    ConfusionAccumulator,
    category_biased_argmax,
)

__all__ = ["eval_iou", "batch_iou", "ConfusionAccumulator", "category_biased_argmax"]
