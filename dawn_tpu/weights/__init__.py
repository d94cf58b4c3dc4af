from dawn_tpu.weights.torch_convert import (
    convert_unet3d,
    convert_lfg_generator,
    convert_region_predictor,
    convert_bg_predictor,
    convert_dawn_checkpoint,
    convert_lfg_checkpoint,
)
from dawn_tpu.weights.torch_convert import (
    convert_pbnet,
    convert_pbnet_checkpoint,
)
from dawn_tpu.weights.torch_convert import convert_face_loc
