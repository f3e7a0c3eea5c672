"""TPU-native compute primitives (the reference's CUDA kernels, re-thought
as fused JAX/XLA ops; see SURVEY.md §7 step 2)."""
from .geometry import (masked_pose_bbox, pose_centers, pose_area,
                       boxes_iou_matrix, centers_iou_matrix)
from .oks import (oks_matrix, torso_oks_matrix, oks_distance_matrix,
                  combine_costs)
from .gating import spatial_gate
from .assignment import (auction_assign, greedy_assign, auction_iterations,
                         filter_matches_by_threshold)
from .kalman import cv_predict, cv_update, Kalman136
from .decode import decode_yolo_output, decode_yolo_output_batch
from .nms import pose_nms, nms_overlap_matrix
from .legacy_nms import legacy_pose_nms, legacy_oks_pair_matrix
from .preprocess import (letterbox_image, letterbox_flat,
                         letterbox_flat_nhwc, letterbox_params,
                         unletterbox_coords)

__all__ = [
    "masked_pose_bbox", "pose_centers", "pose_area", "boxes_iou_matrix",
    "centers_iou_matrix", "oks_matrix", "torso_oks_matrix",
    "oks_distance_matrix", "combine_costs", "spatial_gate",
    "auction_assign", "greedy_assign", "auction_iterations",
    "filter_matches_by_threshold", "cv_predict", "cv_update", "Kalman136",
    "decode_yolo_output", "decode_yolo_output_batch", "pose_nms",
    "nms_overlap_matrix", "legacy_pose_nms", "legacy_oks_pair_matrix",
    "letterbox_image", "letterbox_flat", "letterbox_flat_nhwc",
    "letterbox_params",
    "unletterbox_coords",
]
