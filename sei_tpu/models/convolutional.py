"""ConvNeXt-style UNet with ideal (spectral) resampling, in flax.

Capability parity with ref src/models/convolutional.py (the "Convolutional"
architecture of ProposedModel): 7x7 depthwise ConvBlocks with channels-last
LayerNorm, spectral up/downsampling between scales, skip connections, inner
and outer residuals, reflect-padding of the input to a multiple of
2^(scales-1).

Deviation (documented): the reference's IdealUpsample/IdealDownsample call
``torch.fft.ifftshift`` and discard the result (src/models/convolutional.py:89,131),
and apply ``fftshift`` to an rfft2 half-spectrum, so its "ideal" resampler
scrambles the spectrum it means to center.  We implement the mathematically
correct ideal resampler (full fft2 -> centered crop/pad -> ifft2.real).  This
only affects the non-default Convolutional architecture.

TPU notes: convs run in NHWC (the TPU-native conv layout); the public API is
NCHW to match the reference's tensors.  FFTs run in f32.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


# Init parity with torch Conv2d defaults (kaiming_uniform(a=sqrt(5)) =
# Uniform with variance 1/(3*fan_in)); flax's lecun_normal is 3x wider,
# which measurably inflates this residual UNet's output at init (the
# reference model starts ~= identity, ours started ~60x off).
conv_torch_init = nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform")


def _fft_crop_or_pad(xf: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """Center-crop or zero-pad a centered (fftshifted) spectrum (NHWC axes 1,2)."""
    _, h, w, _ = xf.shape
    # pad
    ph0 = max(0, (out_h - h) // 2)
    pw0 = max(0, (out_w - w) // 2)
    if out_h > h or out_w > w:
        xf = jnp.pad(
            xf,
            ((0, 0), (ph0, out_h - h - ph0), (pw0, out_w - w - pw0), (0, 0)),
        )
        h, w = out_h, out_w
    # crop
    if out_h < h or out_w < w:
        ch0 = (h - out_h) // 2
        cw0 = (w - out_w) // 2
        xf = xf[:, ch0 : ch0 + out_h, cw0 : cw0 + out_w, :]
    return xf


def ideal_resample(x: jnp.ndarray, rate: float) -> jnp.ndarray:
    """Ideal spectral resample of NHWC by integer rate (up) or 1/rate (down)."""
    b, h, w, c = x.shape
    if rate >= 1:
        out_h, out_w = h * int(rate), w * int(rate)
    else:
        r = int(round(1 / rate))
        out_h, out_w = h // r, w // r
    xf = jnp.fft.fft2(x.astype(jnp.float32), axes=(1, 2))
    xf = jnp.fft.fftshift(xf, axes=(1, 2))
    xf = _fft_crop_or_pad(xf, out_h, out_w)
    xf = jnp.fft.ifftshift(xf, axes=(1, 2))
    out = jnp.fft.ifft2(xf, axes=(1, 2)).real
    # energy scaling so a constant image stays constant
    out = out * (out_h * out_w) / (h * w)
    return out.astype(x.dtype)


class ChannelLayerNorm(nn.Module):
    """LayerNorm over the channel axis (NHWC last axis), eps 1e-6."""

    @nn.compact
    def __call__(self, x):
        return nn.LayerNorm(epsilon=1e-6)(x)


class ConvBlock(nn.Module):
    """7x7 depthwise -> LN -> 1x1 x4 -> GELU -> 1x1, residual (ConvNeXt)."""

    dim: int

    @nn.compact
    def __call__(self, x):
        h = nn.Conv(self.dim, (7, 7), padding=3, feature_group_count=self.dim, kernel_init=conv_torch_init)(x)
        h = ChannelLayerNorm()(h)
        h = nn.Conv(4 * self.dim, (1, 1), kernel_init=conv_torch_init)(h)
        h = nn.gelu(h, approximate=False)
        h = nn.Conv(self.dim, (1, 1), kernel_init=conv_torch_init)(h)
        return x + h


class SpectralDownsample(nn.Module):
    """LN -> 1x1 conv (C -> C*rate^2) -> ideal low-pass downsample."""

    in_channels: int
    rate: int = 2

    @nn.compact
    def __call__(self, x):
        x = ChannelLayerNorm()(x)
        x = nn.Conv(self.in_channels * self.rate**2, (1, 1), kernel_init=conv_torch_init)(x)
        return ideal_resample(x, 1.0 / self.rate)


class SpectralUpsample(nn.Module):
    """Ideal zero-pad upsample -> LN -> 1x1 conv (C -> out)."""

    in_channels: int
    out_channels: int | None = None
    rate: int = 2

    @nn.compact
    def __call__(self, x):
        out_ch = self.out_channels or self.in_channels // self.rate**2
        x = ideal_resample(x, float(self.rate))
        x = ChannelLayerNorm()(x)
        return nn.Conv(out_ch, (1, 1), kernel_init=conv_torch_init)(x)


class UNet(nn.Module):
    in_channels: int
    hidden_channels: int
    inout_convs: bool
    scales: int
    num_conv_blocks: int
    rate: int
    residual: bool
    inner_residual: bool

    @nn.compact
    def __call__(self, x):
        x0 = x
        if self.inout_convs:
            x = nn.Conv(self.hidden_channels, (3, 3), padding="SAME", kernel_init=conv_torch_init)(x)
            ch = self.hidden_channels
        else:
            ch = self.in_channels

        def conv_seq(x, ch):
            for _ in range(self.num_conv_blocks):
                x = ConvBlock(dim=ch)(x)
            return x

        skips = []
        for _ in range(self.scales - 1):
            xb = x
            x = conv_seq(x, ch)
            if self.inner_residual:
                x = x + xb
            skips.append(x)
            x = SpectralDownsample(in_channels=ch, rate=self.rate)(x)
            ch = ch * self.rate**2

        x = conv_seq(x, ch)

        for _ in range(self.scales - 1):
            x = SpectralUpsample(in_channels=ch, rate=self.rate)(x)
            ch = ch // self.rate**2
            x = x + skips.pop()
            x = conv_seq(x, ch)

        if self.inout_convs:
            x = nn.Conv(self.in_channels, (3, 3), padding="SAME", kernel_init=conv_torch_init)(x)
        if self.residual:
            x = x + x0
        return x


class ConvolutionalModel(nn.Module):
    """The reference's Convolutional architecture (NCHW public API)."""

    in_channels: int = 3
    upsampling_rate: int = 1
    residual: bool = True
    inner_residual: bool = True
    num_conv_blocks: int = 1
    hidden_channels: int = 32
    inout_convs: bool = True
    scales: int = 5

    @nn.compact
    def __call__(self, y):
        # NCHW -> NHWC
        y = jnp.transpose(y, (0, 2, 3, 1))

        if self.upsampling_rate != 1:
            y = SpectralUpsample(
                in_channels=self.in_channels,
                out_channels=self.in_channels,
                rate=self.upsampling_rate,
            )(y)

        div = 2 ** (self.scales - 1)
        h, w = y.shape[1], y.shape[2]
        pad_h = (div - h % div) % div
        pad_w = (div - w % div) % div
        if pad_h or pad_w:
            y = jnp.pad(y, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)), mode="reflect")

        x_hat = UNet(
            in_channels=self.in_channels,
            hidden_channels=self.hidden_channels,
            inout_convs=self.inout_convs,
            scales=self.scales,
            num_conv_blocks=self.num_conv_blocks,
            rate=2,
            residual=self.residual,
            inner_residual=self.inner_residual,
        )(y)

        if pad_h or pad_w:
            x_hat = x_hat[:, : x_hat.shape[1] - pad_h, : x_hat.shape[2] - pad_w, :]
        return jnp.transpose(x_hat, (0, 3, 1, 2))
