from mirage_tpu.losses.masked import masked_ce_loss, masked_mse_loss  # noqa: F401
