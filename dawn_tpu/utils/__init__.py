from dawn_tpu.utils.misc import (
    Logger, AverageMeter, setup_seed, grid2fig, flow2fig, conf2fig,
)
