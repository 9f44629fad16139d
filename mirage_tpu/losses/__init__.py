from mirage_tpu.losses.masked import masked_ce_loss, masked_mse_loss  # noqa: F401
from mirage_tpu.losses.gdice import (  # noqa: F401
    ce_gdice_loss,
    cross_entropy_loss,
    generalized_dice_loss,
)
