from facegantts_tpu.train.state import Batch, TrainState  # noqa: F401
from facegantts_tpu.train.step import (  # noqa: F401
    build_models,
    init_state,
    make_gan_train_step,
    make_plain_train_step,
)
