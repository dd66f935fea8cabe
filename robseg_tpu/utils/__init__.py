"""Utilities: logging, class weights, palettes, seeds, profiling."""

from robseg_tpu.utils.class_weights import (  # noqa: F401
    ADE_WTS, VOC_WTS, class_balance_weights)
from robseg_tpu.utils.logger import Logger  # noqa: F401
from robseg_tpu.utils.misc import fix_seeds, model_param_count  # noqa: F401
