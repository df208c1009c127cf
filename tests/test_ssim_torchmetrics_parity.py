"""SSIM parity vs torchmetrics' exact computation pipeline.

The reference computes SSIM with torchmetrics
``structural_similarity_index_measure`` defaults on the YCbCr Y channel
(ref src/metrics.py:16-19).  torchmetrics is not installed here, so the
oracle below transcribes its pipeline step by step (torchmetrics
``functional/image/ssim.py::_ssim_update``, defaults ``gaussian_kernel=True,
sigma=1.5, kernel_size=11, k1=0.01, k2=0.03, data_range=1.0``):

  1. gaussian kernel from ``dist = arange((1-k)/2, (1+k)/2)``,
     ``exp(-(dist/sigma)^2 / 2)``, normalized, outer product;
  2. reflect-pad both images by (k-1)//2;
  3. VALID F.conv2d (torch's real kernel) of
     (pred, target, pred^2, target^2, pred*target);
  4. SSIM formula with biased variances;
  5. crop the pad margin off the map and mean over the rest.

The padding/conv/crop arithmetic is torch's own; only the published formula
(Wang et al. 2004) is transcribed.  This pins the repo's valid-interior
reduction (sei_tpu/metrics) to torchmetrics semantics bit-for-bit in f32.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as TF

import jax.numpy as jnp

from sei_tpu.metrics import psnr_y, rgb_to_y, ssim, ssim_y


def torchmetrics_ssim_oracle(
    pred: torch.Tensor,
    target: torch.Tensor,
    *,
    kernel_size: int = 11,
    sigma: float = 1.5,
    data_range: float = 1.0,
    k1: float = 0.01,
    k2: float = 0.03,
) -> float:
    dist = torch.arange(
        start=(1 - kernel_size) / 2, end=(1 + kernel_size) / 2, step=1,
        dtype=torch.float64,
    )
    g = torch.exp(-((dist / sigma) ** 2) / 2)
    g = (g / g.sum()).to(torch.float32)
    kernel = (g[:, None] @ g[None, :])[None, None]

    pad = (kernel_size - 1) // 2
    c = pred.shape[1]
    kernel = kernel.expand(c, 1, -1, -1)
    pred_p = TF.pad(pred, (pad, pad, pad, pad), mode="reflect")
    targ_p = TF.pad(target, (pad, pad, pad, pad), mode="reflect")

    stack = torch.cat(
        [pred_p, targ_p, pred_p * pred_p, targ_p * targ_p, pred_p * targ_p]
    )
    out = TF.conv2d(stack, kernel, groups=c)
    mu_p, mu_t, s_pp, s_tt, s_pt = out.chunk(5)
    var_p = s_pp - mu_p * mu_p
    var_t = s_tt - mu_t * mu_t
    cov = s_pt - mu_p * mu_t
    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2
    num = (2 * mu_p * mu_t + c1) * (2 * cov + c2)
    den = (mu_p**2 + mu_t**2 + c1) * (var_p + var_t + c2)
    full = num / den
    inner = full[..., pad:-pad, pad:-pad]
    return float(inner.reshape(inner.shape[0], -1).mean(-1))


@pytest.mark.parametrize("hw", [(64, 64), (57, 63), (96, 41)])
@pytest.mark.parametrize("corr", [0.0, 0.7, 0.98])
def test_ssim_matches_torchmetrics_pipeline(hw, corr):
    h, w = hw
    rng = np.random.default_rng(11)
    x = rng.random((1, 1, h, w)).astype(np.float32)
    y = np.clip(
        corr * x + (1 - corr) * rng.random((1, 1, h, w)).astype(np.float32), 0, 1
    )

    want = torchmetrics_ssim_oracle(torch.from_numpy(x), torch.from_numpy(y))
    got = float(ssim(jnp.asarray(x[0, 0]), jnp.asarray(y[0, 0])))
    np.testing.assert_allclose(got, want, atol=2e-6)


def test_y_channel_metrics_reference_protocol():
    """ssim_fn/psnr_fn protocol: kornia Y channel, data_range=1.0."""
    rng = np.random.default_rng(5)
    x = rng.random((3, 48, 48)).astype(np.float32)
    xh = np.clip(x + 0.05 * rng.standard_normal((3, 48, 48)).astype(np.float32), 0, 1)

    # kornia rgb_to_ycbcr channel 0 == BT.601 luma
    y_t = 0.299 * xh[0] + 0.587 * xh[1] + 0.114 * xh[2]
    np.testing.assert_allclose(
        np.asarray(rgb_to_y(jnp.asarray(xh))), y_t, atol=1e-6
    )

    want_ssim = torchmetrics_ssim_oracle(
        torch.from_numpy(y_t[None, None]),
        torch.from_numpy((0.299 * x[0] + 0.587 * x[1] + 0.114 * x[2])[None, None]),
    )
    got_ssim = float(ssim_y(jnp.asarray(xh), jnp.asarray(x)))
    np.testing.assert_allclose(got_ssim, want_ssim, atol=2e-6)

    mse = np.mean(
        (y_t - (0.299 * x[0] + 0.587 * x[1] + 0.114 * x[2])) ** 2
    )
    np.testing.assert_allclose(
        float(psnr_y(jnp.asarray(xh), jnp.asarray(x))),
        10 * np.log10(1.0 / mse),
        atol=1e-4,
    )
