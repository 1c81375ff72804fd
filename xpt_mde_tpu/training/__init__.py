from xpt_mde_tpu.training.augmentation import augmentation_factory, TotalAugment
from xpt_mde_tpu.training.train_step import (
    TrainState,
    create_train_state,
    make_train_step,
    make_eval_step,
    make_predict_step,
)
from xpt_mde_tpu.training.optimizers import optimizer_factory
