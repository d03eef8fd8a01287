"""Training losses and image metrics, matching the reference formulas.

`/root/reference/include/loss_utils.h`: L1 (:31-34), two PSNR variants
(:39-52), SSIM via an 11×11 σ=1.5 Gaussian window depthwise conv (:54-129).
Images here are (C, H, W) float32 in [0, 1] — channels-first like the
reference; on TPU a channels-minor image lane-pads 3 → 128 and every op on
it moves 42× the bytes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def l1_loss(pred: jnp.ndarray, gt: jnp.ndarray) -> jnp.ndarray:
    return jnp.abs(pred - gt).mean()


def psnr(img1: jnp.ndarray, img2: jnp.ndarray) -> jnp.ndarray:
    """Mean-over-pixels PSNR (`loss_utils.h:39-43`)."""
    mse = jnp.mean((img1 - img2) ** 2)
    return 10.0 * jnp.log10(1.0 / mse)


def psnr_gaussian_splatting(img1: jnp.ndarray, img2: jnp.ndarray) -> jnp.ndarray:
    """3DGS-style per-channel PSNR (`loss_utils.h:48-52`).

    The reference views a CHW tensor as (C, -1): per-channel MSE, then the
    mean of the per-channel 20·log10(1/√mse).
    """
    mse = jnp.mean((img1 - img2) ** 2, axis=(-2, -1))  # per channel (CHW)
    return jnp.mean(20.0 * jnp.log10(1.0 / jnp.sqrt(mse)))


@functools.lru_cache(maxsize=None)
def _gaussian_1d(window_size: int = 11, sigma: float = 1.5) -> np.ndarray:
    x = np.arange(window_size) - window_size // 2
    g = np.exp(-(x * x) / (2.0 * sigma * sigma))
    return (g / g.sum()).astype(np.float32)


@functools.lru_cache(maxsize=None)
def _gaussian_window(window_size: int = 11, sigma: float = 1.5) -> np.ndarray:
    g = _gaussian_1d(window_size, sigma)
    return np.outer(g, g).astype(np.float32)


@functools.lru_cache(maxsize=None)
def _band_matrix(n: int, window_size: int = 11, sigma: float = 1.5):
    """(n, n) banded Gaussian B with B[i, j] = g(j − i): B @ x ≡ the 1-D
    SAME-zero-padded Gaussian conv along an axis of length n."""
    g = _gaussian_1d(window_size, sigma)
    h = window_size // 2
    B = np.zeros((n, n), np.float32)
    for d in range(-h, h + 1):
        idx = np.arange(max(0, -d), min(n, n - d))
        B[idx, idx + d] = g[d + h]
    return B


def _depthwise_conv(img: jnp.ndarray, win: jnp.ndarray) -> jnp.ndarray:
    """(C, H, W) ⊛ (k, k) depthwise with same-padding (groups=C conv2d).

    The Gaussian window is an outer product g·gᵀ, so the conv separates;
    and on TPU each 1-D pass runs as a BANDED MATMUL on the MXU instead of
    a conv: grouped/single-feature `conv_general_dilated` lowers
    catastrophically here — the 11×11 grouped version's fwd+VJP cost
    ~147 ms/step at 1920×960, separable single-feature convs still ~55 ms,
    the banded matmuls ~4 ms (round-3 kernel_bench finding; this was the
    single biggest line of the protocol training step). Identical math up
    to rounding.
    """
    k = win.shape[0]
    c, H, W = img.shape
    Bv = jnp.asarray(_band_matrix(H, k))
    Bh = jnp.asarray(_band_matrix(W, k))
    t = jnp.einsum(
        "hy,cyx->chx", Bv, img, precision=jax.lax.Precision.HIGHEST
    )
    return jnp.einsum(
        "chx,xw->chw", t, Bh, precision=jax.lax.Precision.HIGHEST
    )


def ssim(
    img1: jnp.ndarray,
    img2: jnp.ndarray,
    window_size: int = 11,
    size_average: bool = True,
) -> jnp.ndarray:
    """Differentiable SSIM, identical to `loss_utils.h:54-129`.

    Note the reference's padded conv2d: border pixels use zero-padding (no
    crop), reproduced by SAME padding here.
    """
    win = jnp.asarray(_gaussian_window(window_size))
    mu1 = _depthwise_conv(img1, win)
    mu2 = _depthwise_conv(img2, win)
    mu1_sq = mu1 * mu1
    mu2_sq = mu2 * mu2
    mu1_mu2 = mu1 * mu2
    sigma1_sq = _depthwise_conv(img1 * img1, win) - mu1_sq
    sigma2_sq = _depthwise_conv(img2 * img2, win) - mu2_sq
    sigma12 = _depthwise_conv(img1 * img2, win) - mu1_mu2
    c1 = 0.01**2
    c2 = 0.03**2
    ssim_map = ((2 * mu1_mu2 + c1) * (2 * sigma12 + c2)) / (
        (mu1_sq + mu2_sq + c1) * (sigma1_sq + sigma2_sq + c2)
    )
    return ssim_map.mean() if size_average else ssim_map


def ssim_rows(
    img1: jnp.ndarray,
    img2: jnp.ndarray,
    row0,
    nrows: int,
    total_rows: int,
    window_size: int = 11,
) -> jnp.ndarray:
    """Rows [row0, row0+nrows) of the full-image SAME-padded `ssim` map,
    computed from only an (nrows + window − 1)-row slice.

    The device-local piece for sharded losses: each device convolves its own
    row block (plus the window halo), so per-device SSIM FLOPs scale with
    rows/n_devices instead of the full image. Images are zero-padded to
    ``ceil`` row blocks; rows ≥ ``total_rows`` come out as garbage (zero
    inputs → SSIM 1) and must be masked by the caller.
    """
    h = window_size // 2
    c, H, W = img1.shape
    assert H == total_rows

    def slice_pad(img):
        # top/bottom halo zeros (≡ SAME padding) + tail zeros so the
        # dynamic slice never clamps
        p = jnp.pad(img, ((0, 0), (h, h + nrows), (0, 0)))
        return jax.lax.dynamic_slice_in_dim(
            p, row0, nrows + 2 * h, axis=1
        )

    s1, s2 = slice_pad(img1), slice_pad(img2)
    k = window_size

    # vertical VALID (halo pre-padded), horizontal SAME — exactly the
    # full-image SAME conv restricted to this row block, as banded MXU
    # matmuls like `_depthwise_conv` (the separable single-feature convs
    # this replaced cost ~55 ms/step fwd+VJP at 1920×960 — the r3 SSIM
    # fix had only reached the unsharded loss; found via the 1×1-mesh
    # sharding-tax measurement, BENCH.md r4)
    Bv = jnp.asarray(_band_matrix(nrows + 2 * h, k))[h : h + nrows, :]
    Bh = jnp.asarray(_band_matrix(W, k))

    def conv(x):
        t = jnp.einsum(
            "ry,cyx->crx", Bv, x, precision=jax.lax.Precision.HIGHEST
        )
        return jnp.einsum(
            "crx,xw->crw", t, Bh, precision=jax.lax.Precision.HIGHEST
        )

    mu1, mu2 = conv(s1), conv(s2)
    mu1_sq, mu2_sq, mu1_mu2 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    sigma1_sq = conv(s1 * s1) - mu1_sq
    sigma2_sq = conv(s2 * s2) - mu2_sq
    sigma12 = conv(s1 * s2) - mu1_mu2
    c1, c2 = 0.01**2, 0.03**2
    return ((2 * mu1_mu2 + c1) * (2 * sigma12 + c2)) / (
        (mu1_sq + mu2_sq + c1) * (sigma1_sq + sigma2_sq + c2)
    )


def training_loss(
    pred: jnp.ndarray,
    gt: jnp.ndarray,
    lambda_dssim: float = 0.2,
) -> jnp.ndarray:
    """(1-λ)·L1 + λ·(1−SSIM) (`src/gaussian_mapper.cpp:403-413`)."""
    return (1.0 - lambda_dssim) * l1_loss(pred, gt) + lambda_dssim * (
        1.0 - ssim(pred, gt)
    )
