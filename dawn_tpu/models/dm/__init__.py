from dawn_tpu.models.dm.unet3d import Unet3D
from dawn_tpu.models.dm.diffusion import GaussianDiffusion
