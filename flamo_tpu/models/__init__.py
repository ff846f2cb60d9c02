from flamo_tpu.models.colorless_fdn import (
    build_colorless_fdn, colorless_loss, colorless_train_step,
)
