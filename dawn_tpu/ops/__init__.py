from dawn_tpu.ops.resample import (
    grid_sample,
    interpolate_bilinear,
    interpolate_nearest,
    avg_pool_2x2,
)
from dawn_tpu.ops.norms import (
    group_norm,
    channel_layer_norm,
    layer_norm,
    batch_norm_inference,
)
from dawn_tpu.ops.rotary import rotary_cos_sin, apply_rotary
from dawn_tpu.ops.t5bias import (
    relative_position_bucket,
    t5_bias_matrix,
    t5_bias_windowed_vector,
    window_mask,
)
from dawn_tpu.ops.schedule import cosine_beta_schedule, diffusion_buffers
from dawn_tpu.ops.convs import conv2d_torch, conv_transpose2d_torch, depthwise_conv2d
