"""Trajectory utilities: Umeyama alignment and absolute trajectory error."""

from __future__ import annotations

from typing import Tuple

import numpy as np


def align_umeyama(estimated: np.ndarray, reference: np.ndarray,
                  with_scale: bool = True):
    """Least-squares similarity transform aligning estimated camera
    centers to reference ones (Umeyama 1991). Both [N, 3].

    Returns (s, R, t) with reference ~= s * R @ estimated + t.
    """
    est = np.asarray(estimated, np.float64)
    ref = np.asarray(reference, np.float64)
    if not (np.isfinite(est).all() and np.isfinite(ref).all()):
        # degenerate input (e.g. untrained weights produce NaN poses):
        # report an identity alignment instead of an SVD crash — the
        # caller's ATE comes out NaN, which is the honest answer
        return 1.0, np.eye(3), np.zeros(3)
    mu_e = est.mean(axis=0)
    mu_r = ref.mean(axis=0)
    xe = est - mu_e
    xr = ref - mu_r
    cov = xr.T @ xe / est.shape[0]
    U, D, Vt = np.linalg.svd(cov)
    S = np.eye(3)
    if np.linalg.det(U) * np.linalg.det(Vt) < 0:
        S[2, 2] = -1
    R = U @ S @ Vt
    if with_scale:
        var_e = (xe ** 2).sum() / est.shape[0]
        s = float(np.trace(np.diag(D) @ S) / var_e)
    else:
        s = 1.0
    t = mu_r - s * R @ mu_e
    return s, R, t


def absolute_trajectory_error(estimated_centers: np.ndarray,
                              reference_centers: np.ndarray,
                              with_scale: bool = True) -> float:
    """RMSE of camera centers after sim(3) (or SE(3)) alignment — the
    standard monocular ATE."""
    s, R, t = align_umeyama(estimated_centers, reference_centers, with_scale)
    aligned = (s * (R @ np.asarray(estimated_centers, np.float64).T)).T + t
    err = aligned - np.asarray(reference_centers, np.float64)
    return float(np.sqrt((err ** 2).sum(axis=1).mean()))


def camera_centers(R: np.ndarray, t: np.ndarray) -> np.ndarray:
    """World-to-cam (R, t) [N,3,3]/[N,3] -> camera centers [N,3]."""
    R = np.asarray(R)
    t = np.asarray(t)
    return -np.einsum("nij,ni->nj", R, t)
