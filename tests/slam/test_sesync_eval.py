"""Tests for mac_tpu.slam.sesync_eval against brute-force dense oracles
(entry-by-entry assembly, the construction the reference uses —
reference: examples/g2o_experiment.py:23-180)."""

import numpy as np
import pytest

from mac_tpu.slam.pose_graph import RelativePoseMeasurement, rot2D_from_theta
from mac_tpu.slam.sesync_eval import (
    construct_LGrho,
    construct_sesync_quadratic_form_matrix,
    evaluate_sesync_objective,
    evaluate_sesync_rotation_objective,
    orbit_distance_dS,
    select_measurements,
)


def _random_measurements(n=7, m=14, d=2, seed=0):
    rng = np.random.RandomState(seed)
    out = []
    for _ in range(m):
        i, j = rng.choice(n, size=2, replace=False)
        if d == 2:
            R = rot2D_from_theta(rng.uniform(-np.pi, np.pi))
        else:
            A = rng.normal(size=(3, 3))
            Q, _ = np.linalg.qr(A)
            if np.linalg.det(Q) < 0:
                Q[:, 0] *= -1
            R = Q
        out.append(RelativePoseMeasurement(
            i=int(i), j=int(j), R=R, t=rng.normal(size=d),
            kappa=float(rng.uniform(0.5, 3.0)), tau=float(rng.uniform(0.5, 3.0)),
        ))
    return out, n


def _dense_lgrho_oracle(measurements):
    d = len(measurements[0].t)
    n = max(max(m.i, m.j) for m in measurements) + 1
    L = np.zeros((d * n, d * n))
    for m in measurements:
        for k in range(d):
            L[d * m.i + k, d * m.i + k] += m.kappa
            L[d * m.j + k, d * m.j + k] += m.kappa
        for r in range(d):
            for c in range(d):
                L[d * m.i + r, d * m.j + c] += -m.kappa * m.R[r, c]
                L[d * m.j + r, d * m.i + c] += -m.kappa * m.R[c, r]
    return L


def _dense_qform_oracle(measurements):
    d = len(measurements[0].t)
    n = max(max(m.i, m.j) for m in measurements) + 1
    M = np.zeros(((d + 1) * n, (d + 1) * n))
    for m in measurements:
        i, j = m.i, m.j
        M[i, i] += m.tau
        M[j, j] += m.tau
        M[i, j] += -m.tau
        M[j, i] += -m.tau
        for k in range(d):
            M[i, n + i * d + k] += m.tau * m.t[k]
            M[j, n + i * d + k] += -m.tau * m.t[k]
            M[n + i * d + k, i] += m.tau * m.t[k]
            M[n + i * d + k, j] += -m.tau * m.t[k]
            M[n + d * i + k, n + d * i + k] += m.kappa
            M[n + d * j + k, n + d * j + k] += m.kappa
        for r in range(d):
            for c in range(d):
                M[n + i * d + r, n + j * d + c] += -m.kappa * m.R[r, c]
                M[n + j * d + r, n + i * d + c] += -m.kappa * m.R[c, r]
                M[n + i * d + r, n + i * d + c] += m.tau * m.t[r] * m.t[c]
    return M


@pytest.mark.parametrize("d", [2, 3])
def test_lgrho_matches_dense_oracle(d):
    meas, n = _random_measurements(d=d, seed=d)
    L = construct_LGrho(meas).toarray()
    np.testing.assert_allclose(L, _dense_lgrho_oracle(meas), atol=1e-12)


@pytest.mark.parametrize("d", [2, 3])
def test_qform_matches_dense_oracle(d):
    meas, n = _random_measurements(d=d, seed=10 + d)
    M = construct_sesync_quadratic_form_matrix(meas).toarray()
    np.testing.assert_allclose(M, _dense_qform_oracle(meas), atol=1e-12)


def test_rotation_objective_positive_and_zero_at_consistency():
    # A loop of consistent rotations has zero rotation cost.
    thetas = [0.3, -0.5, 0.9]
    Rs = [rot2D_from_theta(t) for t in thetas]
    absolute = [np.eye(2)]
    for R in Rs:
        absolute.append(absolute[-1] @ R)
    meas = []
    for k, R in enumerate(Rs):
        meas.append(RelativePoseMeasurement(
            i=k, j=k + 1, R=R, t=np.zeros(2), kappa=1.0, tau=1.0))
    L = construct_LGrho(meas)
    Rblock = np.concatenate(absolute, axis=1)  # (2, 2*4)
    assert abs(evaluate_sesync_rotation_objective(L, Rblock)) < 1e-12
    # A perturbed assignment costs more.
    Rbad = Rblock.copy()
    Rbad[:, -2:] = rot2D_from_theta(1.0)
    assert evaluate_sesync_rotation_objective(L, Rbad) > 1e-3


def test_sesync_objective_nonnegative_psd():
    meas, n = _random_measurements(seed=4)
    M = construct_sesync_quadratic_form_matrix(meas)
    rng = np.random.RandomState(1)
    X = rng.normal(size=(2, M.shape[0]))
    val = evaluate_sesync_objective(M, X)
    oracle = float(np.trace(X @ _dense_qform_oracle(meas) @ X.T))
    assert abs(val - oracle) < 1e-9 * max(1.0, abs(oracle))
    assert val > -1e-9  # M is PSD by construction


def test_orbit_distance_properties():
    rng = np.random.RandomState(3)
    d, n = 2, 5
    Rs = [rot2D_from_theta(a) for a in rng.uniform(-np.pi, np.pi, n)]
    X = np.concatenate(Rs, axis=1)
    # Distance to itself is zero; to a globally rotated copy is zero.
    assert orbit_distance_dS(X, X) < 1e-9
    G = rot2D_from_theta(0.7)
    assert orbit_distance_dS(X, G @ X) < 1e-9
    # Registration recovers the global rotation.
    dS, G_S = orbit_distance_dS(X, G @ X, compute_G_S=True)
    np.testing.assert_allclose(G_S @ (G @ X), X, atol=1e-9)
    # A genuinely different block is far.
    Y = X.copy()
    Y[:, :2] = rot2D_from_theta(2.0)
    assert orbit_distance_dS(X, Y) > 1e-3


def test_select_measurements():
    meas, n = _random_measurements(seed=5)
    w = np.zeros(len(meas))
    w[::2] = 1.0
    sel = select_measurements(meas, w)
    assert len(sel) == int(w.sum())
    assert sel[0] is meas[0] and sel[1] is meas[2]
