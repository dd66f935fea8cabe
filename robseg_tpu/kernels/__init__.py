"""Pallas TPU kernels for the hot ops.

Import-guarded: every kernel has an XLA fallback in ``robseg_tpu.ops``; the
fallbacks are used automatically off-TPU.
"""

from robseg_tpu.kernels.confusion import confusion_matrix_pallas  # noqa: F401
from robseg_tpu.kernels.apgd_step import apgd_linf_step_pallas  # noqa: F401
