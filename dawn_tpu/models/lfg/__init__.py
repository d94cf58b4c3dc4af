from dawn_tpu.models.lfg.generator import LFGGenerator
from dawn_tpu.models.lfg.region_predictor import RegionPredictor
from dawn_tpu.models.lfg.bg_predictor import BGMotionPredictor
from dawn_tpu.models.lfg.pixelwise_flow import PixelwiseFlowPredictor
