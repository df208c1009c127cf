"""Numerics bedrock: PyTorch-parity resampling and spectral ops, TPU-first."""

from .bicubic import cubic_kernel, cubic_weights_from_frac, resize_matrix  # noqa: F401
from .fft_conv import (  # noqa: F401
    blur_circular,
    blur_circular_adjoint,
    ct_like_filter,
    inverse_filter,
    psf_to_otf,
)
from .kernels import get_kernel, kernel_names  # noqa: F401
from .resize import resize, resize_np, resize_shorter_side, resize_shorter_side_np  # noqa: F401
from .scaling import (  # noqa: F401
    normal_scaling_transform,
    padded_scaling_transform,
    scaling_sample_matrix_1d,
)
