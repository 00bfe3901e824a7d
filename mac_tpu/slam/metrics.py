"""Trajectory quality metrics: Umeyama-aligned ATE and rotation RPE.

The reference delegates these to the `evo` package (reference:
examples/pose_graph_utils.py:470-526). Implemented natively here (numpy):

  * ate_tran: mean translation error after SE(d) Umeyama alignment
    (gauge-invariant, matching evo.metrics.APE(translation_part)).
  * rpe_rot: mean relative rotation error in degrees between consecutive
    pose pairs (matching evo.metrics.RPE(rotation_angle_deg) with unit delta).

Poses are SE-Sync variable matrices: X = [t_1 .. t_n | R_1 .. R_n] of shape
(d, n(d+1)) (reference: pose_graph_utils.py:353-379).
"""

from typing import Tuple

import numpy as np


def translations_from_variable_matrix(xhat: np.ndarray) -> np.ndarray:
    d, cols = xhat.shape
    n = cols // (d + 1)
    return xhat[:, :n]


def rotations_from_variable_matrix(xhat: np.ndarray) -> np.ndarray:
    d, cols = xhat.shape
    n = cols // (d + 1)
    return xhat[:, n:(d + 1) * n]


def normalize_poses(xhat: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Gauge-normalize: rotate by R_1^T and translate t_1 to the origin.
    Returns (t (d, n), R (d, d*n))."""
    t = translations_from_variable_matrix(xhat)
    R = rotations_from_variable_matrix(xhat)
    d = t.shape[0]
    R0 = R[:, :d]
    t = R0.T @ t
    R = R0.T @ R
    t = t - t[:, :1]
    return t, R


def umeyama_alignment(src: np.ndarray, dst: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Rigid (R, t) minimizing ||R src + t - dst||_F^2 (no scale)."""
    mu_s = src.mean(axis=1, keepdims=True)
    mu_d = dst.mean(axis=1, keepdims=True)
    cov = (dst - mu_d) @ (src - mu_s).T / src.shape[1]
    U, S, Vt = np.linalg.svd(cov)
    d = src.shape[0]
    sign = np.sign(np.linalg.det(U @ Vt))
    D = np.eye(d)
    D[-1, -1] = sign
    R = U @ D @ Vt
    t = mu_d - R @ mu_s
    return R, t


def ate_tran(estimate: np.ndarray, reference: np.ndarray) -> float:
    """Mean translation ATE after Umeyama alignment of the estimate onto the
    reference (reference semantics: pose_graph_utils.py:470-493)."""
    t_est, _ = normalize_poses(estimate)
    t_ref, _ = normalize_poses(reference)
    R, t = umeyama_alignment(t_est, t_ref)
    aligned = R @ t_est + t
    errs = np.linalg.norm(aligned - t_ref, axis=0)
    return float(errs.mean())


def rpe_rot(estimate: np.ndarray, reference: np.ndarray) -> float:
    """Mean relative rotation error (degrees) over consecutive pose pairs
    (reference semantics: pose_graph_utils.py:495-506)."""
    _, R_est = normalize_poses(estimate)
    _, R_ref = normalize_poses(reference)
    d = R_est.shape[0]
    n = R_est.shape[1] // d
    errs = []
    for i in range(n - 1):
        Re0 = R_est[:, i * d:(i + 1) * d]
        Re1 = R_est[:, (i + 1) * d:(i + 2) * d]
        Rr0 = R_ref[:, i * d:(i + 1) * d]
        Rr1 = R_ref[:, (i + 1) * d:(i + 2) * d]
        dRe = Re0.T @ Re1
        dRr = Rr0.T @ Rr1
        E = dRr.T @ dRe
        cos = (np.trace(E) - (d - 2)) / 2.0
        errs.append(np.degrees(np.arccos(np.clip(cos, -1.0, 1.0))))
    return float(np.mean(errs))


def poses_ate_tran(estimate: np.ndarray, reference: np.ndarray) -> float:
    return ate_tran(estimate, reference)


def poses_rpe_rot(estimate: np.ndarray, reference: np.ndarray) -> float:
    return rpe_rot(estimate, reference)
