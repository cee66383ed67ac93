from .apgd import ApgdResult, apgd_attack, apgd_train
from .fgsm import fgsm_train
from .pgd import pgd_attack
from .wrapped import AdversarialModel

__all__ = [
    "ApgdResult",
    "apgd_attack",
    "apgd_train",
    "fgsm_train",
    "pgd_attack",
    "AdversarialModel",
]
