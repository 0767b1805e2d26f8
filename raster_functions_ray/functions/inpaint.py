"""Stepwise local radiometric adjustment (cloud inpainting).

Faithful NumPy re-expression of the reference's iterative algorithm
(functions/StepwiseLocalRadiometricAdjustment.py:67-234): the OpenCV 5×5
binary dilation becomes a shifted-maximum filter and the Numba
per-boundary-pixel kernels become plain loops over the (perimeter-sized)
boundary rings — every arithmetic step (nonzero-window mean/std, the
radiometric transfer norm = (σ_t/σ_r)·replace + μ_t − (σ_t/σ_r)·μ_r, the
expand-ring accumulation) matches the reference op for op.  cv2/numba are
absent from this environment; the literal-transcription oracle in
tests/test_kernels_focal.py pins these semantics.
"""

from __future__ import annotations

import numpy as np


def dilate5x5_binary(img: np.ndarray, iterations: int = 1) -> np.ndarray:
    """cv2.dilate(img, np.ones((5,5)), iterations=n) for a 0/1 image:
    each iteration ORs the Chebyshev-radius-2 neighborhood (zero padding
    at the border, like OpenCV's default border for binary dilation of a
    0/1 mask embedded in zeros)."""
    out = np.asarray(img).astype(np.uint8)
    for _ in range(iterations):
        p = np.pad(out, 2)
        acc = np.zeros_like(out)
        h, w = out.shape
        for dy in range(-2, 3):
            for dx in range(-2, 3):
                acc = np.maximum(acc, p[2 + dy:2 + dy + h, 2 + dx:2 + dx + w])
        out = acc
    return out


def _norm_calc(ker_targ: np.ndarray, ker_replace: np.ndarray,
               replace_val: float) -> float:
    """numbaNormCalc (StepwiseLocalRadiometricAdjustment.py:161-173):
    population std/mean of the NONZERO window samples, radiometric
    transfer of the replacement pixel."""
    sigma_t = ker_targ.std()
    sigma_r = ker_replace.std()
    mu_t = ker_targ.mean()
    mu_r = ker_replace.mean()
    return ((sigma_t / sigma_r) * replace_val) + mu_t - ((sigma_t / sigma_r) * mu_r)


def _crop_center(img: np.ndarray, cropx: int, cropy: int) -> np.ndarray:
    y, x = img.shape
    startx = x // 2 - (cropx // 2)
    starty = y // 2 - (cropy // 2)
    return img[starty:starty + cropy, startx:startx + cropx]


def stepwise_radiometric_adjustment(cloud_img: np.ndarray,
                                    replace_img: np.ndarray,
                                    cloud_mask: np.ndarray,
                                    win_size: int = 80,
                                    mask_dilate_iters: int = 10) -> np.ndarray:
    """One band of the reference's updatePixels flow
    (StepwiseLocalRadiometricAdjustment.py:67-149):

    1. dilate the cloud mask ``mask_dilate_iters``× with the 5×5 kernel;
    2. targ = cloudy image outside the dilated mask, replace = clean image
       inside it; count the cycles needed to grow the known region back;
    3. per cycle: dilate the known region once, take the newly-added
       boundary ring, and for each boundary pixel compute the radiometric
       transfer from the nonzero samples of its (2·win+1)² window in targ
       and replace; add the ring into targ and repeat.

    Returns the filled image (f8; the reference casts f4 at block exit).
    """
    cloud_img = np.asarray(cloud_img, dtype=np.float64)
    replace_img = np.asarray(replace_img, dtype=np.float64)
    clouds = dilate5x5_binary(np.asarray(cloud_mask, np.uint8), mask_dilate_iters)

    targ = cloud_img * (1 - clouds)
    repl = replace_img * clouds

    # cycle count: dilations of the known region until everything is known.
    # A fully-clouded block has no known seeds — dilation would never
    # grow it (infinite loop); there is nothing to transfer from, so the
    # fill is the replacement scene verbatim.
    image = (1 - clouds).astype(np.uint8)
    if not np.any(image):
        return replace_img
    num_cycles = 0
    while np.any(image == 0):
        image = dilate5x5_binary(image, 1)
        num_cycles += 1

    r = win_size
    h, w = targ.shape
    test_targ = np.pad(targ, r, constant_values=0.0)
    test_replace = np.pad(repl, r, constant_values=0.0)
    test_clouds = np.pad((1 - clouds).astype(np.uint8), r)

    for _ in range(num_cycles):
        dilated = dilate5x5_binary(test_clouds, 1)
        boundary_no_pad = dilated.astype(np.int16) - test_clouds.astype(np.int16)
        boundary_cropped = _crop_center(boundary_no_pad, w, h)
        boundary = np.pad(boundary_cropped, r, constant_values=0)
        new_targ = np.zeros_like(test_targ)
        for x, y in zip(*np.where(boundary == 1)):
            kt = test_targ[x - r:x + r + 1, y - r:y + r + 1].ravel()
            kr = test_replace[x - r:x + r + 1, y - r:y + r + 1].ravel()
            new_targ[x, y] = _norm_calc(kt[kt != 0], kr[kr != 0],
                                        test_replace[x, y])
        test_clouds = dilated
        test_targ = test_targ + new_targ

    return _crop_center(test_targ, w, h)
