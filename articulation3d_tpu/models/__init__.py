from .resnet import ResNet, FrozenBatchNorm
from .fpn import FPN, FPN_STRIDES
from .rpn import RPN, RPNHead, anchors_for_level, generate_cell_anchors
from .heads import (BoxHead, MaskHead, PlaneHead, AxisHead, double_angle,
                    fast_rcnn_inference_single)
from .depth_head import DepthHead, depth_l1_loss_masked
from .planercnn import PlaneRCNN, build_model, init_params
