from xpt_mde_tpu.losses.photometric import (
    photometric_loss_l1,
    photometric_loss_l2,
    photometric_loss_ssim,
)
from xpt_mde_tpu.losses.total import TotalLoss, loss_factory, check_loss_dependency
