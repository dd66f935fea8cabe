"""Training: optimizers, schedules, sharded train/eval steps, checkpoints."""

from robseg_tpu.train.optim import (  # noqa: F401
    make_optimizer, decay_mask, freeze_mask, layerwise_lr_scales,
    pspnet_lr_scales, scale_by_leaf)
from robseg_tpu.train.schedules import (  # noqa: F401
    get_scheduler, warmup_poly_lr, warmup_cosine_lr, poly_lr,
    polynomial_lr_timm, poly_learning_rate)
from robseg_tpu.train.trainer import (  # noqa: F401
    TrainState, AttackConfig, make_train_step, make_eval_step,
    make_loss_fn, metrics_from_hist)
from robseg_tpu.train.checkpoint import (  # noqa: F401
    CheckpointManager, save_params_npz, load_params_npz)
