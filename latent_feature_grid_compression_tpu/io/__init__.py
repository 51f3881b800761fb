from .checkpoint import save_checkpoint, load_checkpoint
from .container import (store_model_parameters, restore_model,
                        kmeans_quantization, ints_to_bits_to_bytes,
                        write_mask_bnr, read_mask_bnr)
