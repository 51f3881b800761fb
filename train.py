#!/usr/bin/env python
"""Training CLI (reference: Feature_Grid_Training.py).

Usage:
    python train.py --config experiment-config-files/test_impl_test.txt \
        [--lr 0.008 --drop_type smallify ...]

Accepts the reference's flat ``key = value`` config files unchanged.
"""

from latent_feature_grid_compression_tpu.config import config_from_args
from latent_feature_grid_compression_tpu.train import training
from latent_feature_grid_compression_tpu.utils.compilation_cache import (
    enable_compilation_cache)

enable_compilation_cache()

if __name__ == '__main__':
    cfg = config_from_args()
    print("Finished parsing arguments, starting training")
    training(cfg)
