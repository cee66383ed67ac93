from .autoattack import (
    EPS_DICT,
    SHORT_ATTACKS,
    STANDARD_ATTACKS,
    AutoAttack,
    AutoAttackConfig,
    global_robust_accuracy,
    shard_for_process,
)
from .square import square_attack

__all__ = [
    "EPS_DICT",
    "SHORT_ATTACKS",
    "STANDARD_ATTACKS",
    "AutoAttack",
    "AutoAttackConfig",
    "global_robust_accuracy",
    "shard_for_process",
    "square_attack",
]
