"""DAWN-TPU: a TPU-native JAX reimplementation of the DAWN talking-head pipeline.

DAWN (arXiv 2410.13726, reference implementation Hanbo-Cheng/DAWN-pytorch) is a
non-autoregressive diffusion pipeline that turns one portrait image + one speech
WAV into a talking-head video. This package rebuilds every layer of that
pipeline TPU-first:

- ``dawn_tpu.ops``       -- core numerics: PyTorch-exact grid_sample/interpolate,
                            norms, rotary embeddings, T5 relative-position bias,
                            diffusion schedules, and the Pallas sliding-window
                            temporal-attention kernel.
- ``dawn_tpu.models``    -- the four model families: LFG flow autoencoder,
                            DM flow-diffusion UNet3D + Gaussian diffusion,
                            PBnet pose/blink CVAE, HuBERT audio encoder.
- ``dawn_tpu.weights``   -- torch-checkpoint -> JAX parameter conversion for the
                            released DAWN_128/DAWN_256/LFG/PBnet checkpoints.
- ``dawn_tpu.pipeline``  -- the unified end-to-end VideoGenerator API + CLI
                            (reference: unified_video_generator.py).
- ``dawn_tpu.train``     -- LFG / DM stage-1/2 / PBnet training loops on pjit
                            data(+spatial) parallelism.
- ``dawn_tpu.parallel``  -- mesh/sharding helpers; psum cross-replica batch norm.
- ``dawn_tpu.runtime``   -- native (C++) host-side components: NMS, rasterizer,
                            prefetching chunked-npy reader.
"""

__version__ = "0.1.0"
