"""Frame output: tonemap + PNG/NPZ writers.

Replaces the reference's swapchain present path (storage image blit,
ref: Graphics/RayTracing/RTApp.cpp:87-152) — frames here are arrays
written to disk or compared against goldens.
"""
from __future__ import annotations

import numpy as np


def tonemap(hdr: np.ndarray, exposure: float = 1.0,
            gamma: float = 2.2) -> np.ndarray:
    """Simple exposure + gamma to 8-bit.  The reference writes linear
    RGBA32F straight to a float swapchain (SwapChain.cpp:384-392), so
    gamma=1.0 gives the parity comparison space."""
    x = np.asarray(hdr, np.float32) * exposure
    x = np.clip(x, 0.0, 1.0)
    if gamma != 1.0:
        x = x ** (1.0 / gamma)
    return (x * 255.0 + 0.5).astype(np.uint8)


def write_png(path: str, rgb8: np.ndarray) -> None:
    from PIL import Image

    arr = np.asarray(rgb8)
    if arr.dtype != np.uint8:
        arr = tonemap(arr)
    Image.fromarray(arr, mode="RGB").save(path)


def write_hdr_npz(path: str, **arrays) -> None:
    np.savez_compressed(path, **{k: np.asarray(v) for k, v in arrays.items()})


def psnr(a: np.ndarray, b: np.ndarray, peak: float = 1.0) -> float:
    mse = float(np.mean((np.asarray(a, np.float64)
                         - np.asarray(b, np.float64)) ** 2))
    if mse == 0:
        return float("inf")
    return 10.0 * np.log10(peak * peak / mse)


def ssim(a: np.ndarray, b: np.ndarray, peak: float = 1.0) -> float:
    """Global SSIM (single window) — coarse but dependency-free metric
    for golden-image gating."""
    a = np.asarray(a, np.float64).ravel()
    b = np.asarray(b, np.float64).ravel()
    c1 = (0.01 * peak) ** 2
    c2 = (0.03 * peak) ** 2
    mu_a, mu_b = a.mean(), b.mean()
    va, vb = a.var(), b.var()
    cov = ((a - mu_a) * (b - mu_b)).mean()
    return float(
        ((2 * mu_a * mu_b + c1) * (2 * cov + c2))
        / ((mu_a**2 + mu_b**2 + c1) * (va + vb + c2))
    )
