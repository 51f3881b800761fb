from .dwt import WaveletFilter3d, WaveletFilterNd, encode_pyramid, decode_pyramid
from .interpolation import (grid_sample_3d, trilinear_interpolate,
                            gather_volume, finite_difference_gradient)
from .embedding import fourier_embed, fourier_out_dim
from .mlp import snake_alt, init_mlp, mlp_apply, init_linear
