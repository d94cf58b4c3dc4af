from dawn_tpu.models.face3d.pose import (
    P2sRt, matrix2angle, angle2matrix, pose_from_param, get_pose,
    calculate_eye, calculate_bbox,
)
from dawn_tpu.models.face3d.bfm import parse_param_62, BFMReconstructor, similar_transform
from dawn_tpu.models.face3d.priors import prior_boxes, decode_boxes
from dawn_tpu.models.face3d.nms import nms
