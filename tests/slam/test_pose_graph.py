"""g2o parsing and trajectory metric tests (reference has no tests here;
differential checks against hand-built records and analytic alignments)."""

import numpy as np
import pytest

from mac_tpu.slam.metrics import (
    ate_tran,
    rotations_from_variable_matrix,
    rpe_rot,
    translations_from_variable_matrix,
    umeyama_alignment,
)
from mac_tpu.slam.pose_graph import (
    quat2rot,
    read_g2o_file,
    rot2D_from_theta,
    rpm_to_mac,
    split_edges,
)


def test_read_g2o_se2(tmp_path):
    f = tmp_path / "tiny.g2o"
    f.write_text(
        "VERTEX_SE2 0 0 0 0\n"
        "EDGE_SE2 0 1 1.0 0.0 0.1 100 0 0 100 0 400\n"
        "EDGE_SE2 1 2 0.5 0.5 0.0 50 0 0 50 0 200\n"
        "EDGE_SE2 0 2 1.4 0.6 0.1 10 0 0 10 0 40\n"
    )
    meas, n = read_g2o_file(str(f))
    assert n == 3
    assert len(meas) == 3
    m = meas[0]
    assert (m.i, m.j) == (0, 1)
    # kappa = I33; tau = 2 / tr(inv(tran_info)) = 2 / (1/100 + 1/100) = 100.
    assert np.isclose(m.kappa, 400.0)
    assert np.isclose(m.tau, 100.0)
    np.testing.assert_allclose(m.R, rot2D_from_theta(0.1))

    fixed, loops = split_edges(rpm_to_mac(meas))
    assert len(fixed) == 2 and len(loops) == 1
    assert loops[0].weight == 40.0


def test_read_g2o_se3(tmp_path):
    f = tmp_path / "tiny3d.g2o"
    info = np.eye(6) * 4.0
    triu = [str(info[i, j]) for i in range(6) for j in range(i, 6)]
    f.write_text(
        "EDGE_SE3:QUAT 0 1 1 2 3 0 0 0 1 " + " ".join(triu) + "\n"
    )
    meas, n = read_g2o_file(str(f))
    assert n == 2
    m = meas[0]
    np.testing.assert_allclose(m.t, [1, 2, 3])
    np.testing.assert_allclose(m.R, np.eye(3), atol=1e-12)
    # tau = 3/tr(inv(4I)) = 3/(3/4) = 4; kappa = 3/(2*3/4) = 2.
    assert np.isclose(m.tau, 4.0)
    assert np.isclose(m.kappa, 2.0)


def test_quat2rot_is_rotation():
    rng = np.random.RandomState(0)
    q = rng.randn(4)
    q /= np.linalg.norm(q)
    R = quat2rot(q)
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-12)
    assert np.isclose(np.linalg.det(R), 1.0)


def test_real_dataset_counts():
    meas, n = read_g2o_file("data/intel.g2o")
    assert n == 1728
    fixed, loops = split_edges(rpm_to_mac(meas))
    assert len(fixed) == 1727
    assert len(loops) == 785


def _poses_matrix(ts, Rs):
    """Build an SE-Sync variable matrix [t1..tn | R1..Rn]."""
    d = ts.shape[0]
    return np.concatenate([ts, np.concatenate(Rs, axis=1)], axis=1)


def test_ate_invariant_to_rigid_transform():
    rng = np.random.RandomState(1)
    n, d = 12, 2
    ts = rng.randn(d, n)
    Rs = [rot2D_from_theta(a) for a in rng.rand(n)]
    X = _poses_matrix(ts, Rs)
    # A rigidly transformed copy must have zero ATE.
    Rg = rot2D_from_theta(0.7)
    tg = np.array([[3.0], [-1.0]])
    ts2 = Rg @ ts + tg
    Rs2 = [Rg @ R for R in Rs]
    X2 = _poses_matrix(ts2, Rs2)
    assert ate_tran(X2, X) < 1e-10
    # arccos near 1 loses half the digits; 1e-5 degrees is numerical zero.
    assert rpe_rot(X2, X) < 1e-5


def test_ate_detects_error():
    rng = np.random.RandomState(2)
    n, d = 10, 2
    ts = rng.randn(d, n)
    Rs = [rot2D_from_theta(a) for a in rng.rand(n)]
    X = _poses_matrix(ts, Rs)
    ts_noisy = ts + 0.5 * rng.randn(d, n)
    X2 = _poses_matrix(ts_noisy, Rs)
    assert ate_tran(X2, X) > 0.05


def test_umeyama_recovers_transform():
    rng = np.random.RandomState(3)
    src = rng.randn(3, 20)
    Rg = quat2rot(np.array([0.5, 0.5, 0.5, 0.5]))
    tg = np.array([[1.0], [2.0], [3.0]])
    dst = Rg @ src + tg
    R, t = umeyama_alignment(src, dst)
    np.testing.assert_allclose(R, Rg, atol=1e-10)
    np.testing.assert_allclose(t, tg, atol=1e-10)
