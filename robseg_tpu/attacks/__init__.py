"""Attack engine: PGD, APGD, SEA ensemble and worst-case aggregation."""

from robseg_tpu.attacks.apgd import (  # noqa: F401
    apgd_attack, apgd_largereps, apgd_restarts, APGDResult)
from robseg_tpu.attacks.pgd import (  # noqa: F401
    pgd_attack, pgd_attack_rs, segpgd_loss, TRAIN_ATTACK_LOSSES)
from robseg_tpu.attacks.filters import pgd_filters  # noqa: F401
from robseg_tpu.attacks.sea import (  # noqa: F401
    SEA_LOSSES, run_sea, run_attack_over_loader, eval_performance,
    evaluate, check_imgs)
from robseg_tpu.attacks.worst_case import (  # noqa: F401
    worst_case_aacc, worst_case_miou, sea_intersect_union)
