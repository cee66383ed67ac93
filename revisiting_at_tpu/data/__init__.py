from .augment import RandAugmentConfig, augment_batch, rand_augment_single
from .folder import FolderConfig, list_image_folder, make_folder_dataset
from .mixup import MixupConfig, mixup_cutmix, one_hot_smooth
from .synthetic import SyntheticData

__all__ = [
    "RandAugmentConfig",
    "augment_batch",
    "rand_augment_single",
    "FolderConfig",
    "list_image_folder",
    "make_folder_dataset",
    "MixupConfig",
    "mixup_cutmix",
    "one_hot_smooth",
    "SyntheticData",
]
