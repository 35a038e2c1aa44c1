from weaksuppointcloudseg_tpu.ops.neighbors import (
    pairwise_sqdist,
    knn,
    gather_neighbors,
    edge_feature,
    edge_feature_auto,
    knn_graph,
    knn_graph_fused,
)
from weaksuppointcloudseg_tpu.ops.schedules import (
    learning_rate_schedule,
    bn_decay_schedule,
)

__all__ = [
    "pairwise_sqdist",
    "knn",
    "gather_neighbors",
    "edge_feature",
    "edge_feature_auto",
    "knn_graph",
    "knn_graph_fused",
    "learning_rate_schedule",
    "bn_decay_schedule",
]
