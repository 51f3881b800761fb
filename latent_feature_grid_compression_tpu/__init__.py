"""latent_feature_grid_compression_tpu — TPU-native latent-feature-grid volume
compression framework (JAX/XLA/Pallas), re-designed from scratch with the
capabilities of the reference fV-SRN-style pruning/compression codebase.
"""

__version__ = "0.1.0"
