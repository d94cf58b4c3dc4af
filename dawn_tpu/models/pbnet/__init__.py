from dawn_tpu.models.pbnet.cvae import CVAE, build_pbnet, PBnetParams
from dawn_tpu.models.pbnet.architectures import (
    EncoderTransformerReemb6,
    DecoderTransformerReemb6,
)
