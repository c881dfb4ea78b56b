from .mv_rgb_dataset import (MvRgbDatasetBase, MvRgbDatasetAvatarReX,
                             MvRgbDatasetTHuman4, MvRgbDatasetActorsHQ,
                             get_dataset_class)

__all__ = ["MvRgbDatasetBase", "MvRgbDatasetAvatarReX",
           "MvRgbDatasetTHuman4", "MvRgbDatasetActorsHQ",
           "get_dataset_class"]
