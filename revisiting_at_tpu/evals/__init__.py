from .autoattack import (
    EPS_DICT,
    SHORT_ATTACKS,
    STANDARD_ATTACKS,
    AutoAttack,
    AutoAttackConfig,
)
from .square import square_attack

__all__ = [
    "EPS_DICT",
    "SHORT_ATTACKS",
    "STANDARD_ATTACKS",
    "AutoAttack",
    "AutoAttackConfig",
    "square_attack",
]
