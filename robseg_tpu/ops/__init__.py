"""Core jittable ops: metrics, losses, projections, resize."""

from robseg_tpu.ops.metrics import (  # noqa: F401
    confusion_matrix,
    iou_from_hist,
    f1_from_hist,
    pixel_acc_from_hist,
    per_image_intersect_union,
    iou_acc_summary,
)
from robseg_tpu.ops.losses import (  # noqa: F401
    cross_entropy_pixelwise,
    masked_cross_entropy,
    masked_cross_entropy_balanced,
    js_loss,
    margin_loss,
    dlr_loss,
    pixel_to_img_loss,
    make_attack_criterion,
    ATTACK_CRITERIA,
    segmentation_cross_entropy,
    ohem_cross_entropy,
    dice_loss,
    get_train_loss,
)
from robseg_tpu.ops.projections import (  # noqa: F401
    project_linf,
    project_l2,
    project_l1_ball_box,
)
from robseg_tpu.ops.resize import (  # noqa: F401
    resize_bilinear,
    adaptive_avg_pool,
)
