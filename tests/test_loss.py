"""Loss/metric parity vs the reference formulas (torch re-implementation)."""

import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from omnigs_tpu.ops import loss as L


def _torch_ssim(img1, img2, window_size=11):
    """Direct port of `/root/reference/include/loss_utils.h:54-129` (test-only)."""
    x = torch.arange(window_size, dtype=torch.float32) - window_size // 2
    g = torch.exp(-(x * x) / (2 * 1.5 * 1.5))
    g = g / g.sum()
    w2 = g[:, None] @ g[None, :]
    c = img1.shape[0]
    window = w2.expand(c, 1, window_size, window_size).contiguous()
    pad = window_size // 2
    mu1 = F.conv2d(img1[None], window, padding=pad, groups=c)
    mu2 = F.conv2d(img2[None], window, padding=pad, groups=c)
    mu1_sq, mu2_sq, mu1_mu2 = mu1**2, mu2**2, mu1 * mu2
    s1 = F.conv2d((img1 * img1)[None], window, padding=pad, groups=c) - mu1_sq
    s2 = F.conv2d((img2 * img2)[None], window, padding=pad, groups=c) - mu2_sq
    s12 = F.conv2d((img1 * img2)[None], window, padding=pad, groups=c) - mu1_mu2
    c1, c2 = 0.01**2, 0.03**2
    m = ((2 * mu1_mu2 + c1) * (2 * s12 + c2)) / (
        (mu1_sq + mu2_sq + c1) * (s1 + s2 + c2)
    )
    return m.mean().item()


def test_ssim_matches_reference():
    rng = np.random.default_rng(0)
    a = rng.random((32, 48, 3), dtype=np.float32)
    b = np.clip(a + rng.normal(0, 0.1, a.shape).astype(np.float32), 0, 1)
    got = float(
        L.ssim(
            jnp.asarray(a).transpose(2, 0, 1), jnp.asarray(b).transpose(2, 0, 1)
        )
    )
    want = _torch_ssim(
        torch.from_numpy(a).permute(2, 0, 1), torch.from_numpy(b).permute(2, 0, 1)
    )
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
    ac = jnp.asarray(a).transpose(2, 0, 1)
    assert 0.999 < float(L.ssim(ac, ac)) <= 1.0 + 1e-6


def test_psnr_variants():
    rng = np.random.default_rng(1)
    a = rng.random((16, 16, 3)).astype(np.float32)
    b = rng.random((16, 16, 3)).astype(np.float32)
    mse = np.mean((a - b) ** 2)
    np.testing.assert_allclose(
        float(L.psnr(jnp.asarray(a), jnp.asarray(b))),
        10 * np.log10(1 / mse),
        rtol=3e-5,
    )
    per_ch = np.mean((a - b) ** 2, axis=(0, 1))
    want = np.mean(20 * np.log10(1 / np.sqrt(per_ch)))
    np.testing.assert_allclose(
        float(
            L.psnr_gaussian_splatting(
                jnp.asarray(a).transpose(2, 0, 1),
                jnp.asarray(b).transpose(2, 0, 1),
            )
        ),
        want,
        rtol=3e-5,
    )


def test_training_loss_weights():
    a = jnp.zeros((3, 16, 16))
    b = jnp.ones((3, 16, 16)) * 0.5
    l = float(L.training_loss(a, b, lambda_dssim=0.2))
    l1 = float(L.l1_loss(a, b))
    s = float(L.ssim(a, b))
    np.testing.assert_allclose(l, 0.8 * l1 + 0.2 * (1 - s), rtol=1e-6)
