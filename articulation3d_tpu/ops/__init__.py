from .box_ops import (box_area, pairwise_iou, pairwise_intersection,
                      encode_deltas, decode_deltas, clip_boxes, nonempty,
                      smooth_l1_loss)
from .roi_align import roi_align_level, multilevel_roi_align, assign_boxes_to_levels
from .nms import nms_mask, batched_nms_mask, select_top
from .mask_paste import paste_masks
from .preprocess import preprocess_images, resize_bilinear, sem_seg_postprocess
