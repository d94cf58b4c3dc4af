from dawn_tpu.models.pbnet.cvae import (
    ARCHINAMES, CVAE, MODELTYPES, PBnetParams, build_pbnet, get_model,
    parse_modelname,
)
from dawn_tpu.models.pbnet.architectures import (
    DecoderFC,
    DecoderGRU,
    DecoderTransformerReemb6,
    EncoderFC,
    EncoderGRU,
    EncoderTransformerReemb6,
)
from dawn_tpu.models.pbnet import losses
from dawn_tpu.models.pbnet.stgcn import STGCN, build_graph
