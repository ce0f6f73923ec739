from .groundtruth import exact_topk, groundtruth_from_file
from .metrics import (recall_at_k, top1_accuracy, mean_average_precision,
                      epsilon_recall, true_distances)

__all__ = [
    "exact_topk", "groundtruth_from_file", "recall_at_k", "top1_accuracy",
    "mean_average_precision", "epsilon_recall", "true_distances",
]
