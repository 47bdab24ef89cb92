"""Geometry op tests: analytic cases + cross-checks against a direct numpy
port of the reference per-pixel formulas (view_tools_cython.pyx:196-240,
multivih5datareader.cpp:369-424)."""

import numpy as np
import jax.numpy as jnp
import pytest

from demon_tpu import ops

INTR = np.array([[0.89115971, 1.18821287, 0.5, 0.5]], dtype=np.float32)


def _np_rodrigues(aa):
    angle = np.sqrt(aa.dot(aa))
    if angle < 1e-9:
        return np.eye(3)
    u = aa / angle
    c, s = np.cos(angle), np.sin(angle)
    K = np.array([[0, -u[2], u[1]], [u[2], 0, -u[0]], [-u[1], u[0], 0]])
    return c * np.eye(3) + s * K + (1 - c) * np.outer(u, u)


def _np_flow_reference(depth_z, K_px, R, t, W, H):
    """Direct port of the reference per-pixel flow loop (computeFlow,
    multivih5datareader.cpp:369-424) for relative motion R,t: cam1 at
    identity, cam2 at (R, t). Returns pixel-unit flow [H,W,2]."""
    P2 = K_px @ np.concatenate([R, t.reshape(3, 1)], axis=1)
    invK = np.linalg.inv(K_px)
    flow = np.full((H, W, 2), np.nan, np.float32)
    for y in range(H):
        for x in range(W):
            d = depth_z[y, x]
            if not np.isfinite(d) or d <= 0:
                continue
            px, py = x + 0.5, y + 0.5
            pos = invK @ np.array([px, py, 1.0])
            pos = pos * d  # CAMERA_Z depth
            p2 = P2 @ np.append(pos, 1.0)
            flow[y, x, 0] = p2[0] / p2[2] - px
            flow[y, x, 1] = p2[1] / p2[2] - py
    return flow


class TestRotations:
    def test_roundtrip_random(self, rng):
        aa = rng.randn(32, 3).astype(np.float32)
        R = ops.angleaxis_to_rotation_matrix(jnp.asarray(aa))
        aa2 = ops.rotation_matrix_to_angleaxis(R)
        np.testing.assert_allclose(np.asarray(aa2), aa, atol=2e-5)

    def test_matches_numpy_rodrigues(self, rng):
        aa = rng.randn(8, 3).astype(np.float32)
        R = np.asarray(ops.angleaxis_to_rotation_matrix(jnp.asarray(aa)))
        for i in range(8):
            np.testing.assert_allclose(R[i], _np_rodrigues(aa[i]), atol=1e-5)

    def test_zero_rotation(self):
        R = np.asarray(ops.angleaxis_to_rotation_matrix(jnp.zeros((1, 3))))
        np.testing.assert_allclose(R[0], np.eye(3), atol=1e-7)
        aa = ops.rotation_matrix_to_angleaxis(jnp.eye(3)[None])
        np.testing.assert_allclose(np.asarray(aa), 0.0, atol=1e-7)

    def test_orthonormal(self, rng):
        aa = 3.0 * rng.randn(16, 3).astype(np.float32)
        R = np.asarray(ops.angleaxis_to_rotation_matrix(jnp.asarray(aa)))
        eye = np.einsum("bij,bkj->bik", R, R)
        np.testing.assert_allclose(eye, np.broadcast_to(np.eye(3), eye.shape), atol=1e-5)
        np.testing.assert_allclose(np.linalg.det(R), 1.0, atol=1e-5)

    def test_pi_rotation(self):
        aa = np.array([[np.pi, 0, 0]], dtype=np.float32)
        R = ops.angleaxis_to_rotation_matrix(jnp.asarray(aa))
        aa2 = np.asarray(ops.rotation_matrix_to_angleaxis(R))
        # angle-axis at pi is sign-ambiguous; compare rotations
        R2 = np.asarray(ops.angleaxis_to_rotation_matrix(jnp.asarray(aa2)))
        np.testing.assert_allclose(R2, np.asarray(R), atol=1e-5)


class TestDepthToFlow:
    H, W = 24, 32

    def _setup(self, rng, aa=None, t=None):
        H, W = self.H, self.W
        depth_z = (1.0 + 2.0 * rng.rand(H, W)).astype(np.float32)
        aa = np.zeros(3, np.float32) if aa is None else np.asarray(aa, np.float32)
        t = np.array([0.1, -0.05, 0.02], np.float32) if t is None else np.asarray(t, np.float32)
        K_px = np.array(
            [
                [INTR[0, 0] * W, 0, INTR[0, 2] * W],
                [0, INTR[0, 1] * H, INTR[0, 3] * H],
                [0, 0, 1],
            ]
        )
        return depth_z, aa, t, K_px

    def test_matches_reference_formula(self, rng):
        depth_z, aa, t, K_px = self._setup(rng, aa=[0.02, -0.03, 0.01])
        R = _np_rodrigues(aa)
        ref = _np_flow_reference(depth_z, K_px, R, t, self.W, self.H)

        inv_depth = (1.0 / depth_z)[None]
        flow = ops.depth_to_flow(
            jnp.asarray(INTR),
            jnp.asarray(inv_depth),
            jnp.asarray(aa[None]),
            jnp.asarray(t[None]),
            inverse_depth=True,
            normalize_flow=False,
        )
        np.testing.assert_allclose(np.asarray(flow)[0], ref, atol=1e-2, rtol=1e-4)

    def test_normalized_flow_scaling(self, rng):
        depth_z, aa, t, _ = self._setup(rng)
        inv_depth = (1.0 / depth_z)[None]
        f_px = np.asarray(
            ops.depth_to_flow(
                jnp.asarray(INTR), jnp.asarray(inv_depth), jnp.asarray(aa[None]),
                jnp.asarray(t[None]), normalize_flow=False,
            )
        )
        f_n = np.asarray(
            ops.depth_to_flow(
                jnp.asarray(INTR), jnp.asarray(inv_depth), jnp.asarray(aa[None]),
                jnp.asarray(t[None]), normalize_flow=True,
            )
        )
        np.testing.assert_allclose(f_n[..., 0] * self.W, f_px[..., 0], rtol=1e-4)
        np.testing.assert_allclose(f_n[..., 1] * self.H, f_px[..., 1], rtol=1e-4)

    def test_zero_motion_zero_flow(self, rng):
        depth_z, _, _, _ = self._setup(rng)
        flow = ops.depth_to_flow(
            jnp.asarray(INTR),
            jnp.asarray((1.0 / depth_z)[None]),
            jnp.zeros((1, 3)),
            jnp.zeros((1, 3)),
        )
        np.testing.assert_allclose(np.asarray(flow), 0.0, atol=1e-6)

    def test_invalid_depth_gives_nan(self, rng):
        depth_z, aa, t, _ = self._setup(rng)
        inv = (1.0 / depth_z).copy()
        inv[3, 4] = np.nan
        inv[5, 6] = 0.0
        inv[7, 8] = -1.0
        flow = np.asarray(
            ops.depth_to_flow(
                jnp.asarray(INTR), jnp.asarray(inv[None]),
                jnp.asarray(aa[None]), jnp.asarray(t[None]),
            )
        )
        for yx in [(3, 4), (5, 6), (7, 8)]:
            assert np.all(np.isnan(flow[0, yx[0], yx[1]]))
        assert np.isfinite(flow[0, 0, 0]).all()

    def test_channel_dim_accepted(self, rng):
        depth_z, aa, t, _ = self._setup(rng)
        f1 = ops.depth_to_flow(
            jnp.asarray(INTR), jnp.asarray((1 / depth_z)[None, :, :, None]),
            jnp.asarray(aa[None]), jnp.asarray(t[None]),
        )
        f2 = ops.depth_to_flow(
            jnp.asarray(INTR), jnp.asarray((1 / depth_z)[None]),
            jnp.asarray(aa[None]), jnp.asarray(t[None]),
        )
        np.testing.assert_array_equal(np.asarray(f1), np.asarray(f2))


class TestFlowToDepth:
    def test_inverse_of_depth_to_flow(self, rng):
        """flow_to_depth(depth_to_flow(d)) == d on synthetic scenes."""
        H, W = 24, 32
        depth_z = (1.0 + 2.0 * rng.rand(2, H, W)).astype(np.float32)
        aa = 0.05 * rng.randn(2, 3).astype(np.float32)
        t = rng.randn(2, 3).astype(np.float32)
        t /= np.linalg.norm(t, axis=1, keepdims=True)
        intr = np.repeat(INTR, 2, axis=0)

        inv = 1.0 / depth_z
        flow = ops.depth_to_flow(
            jnp.asarray(intr), jnp.asarray(inv), jnp.asarray(aa), jnp.asarray(t)
        )
        inv_rec = ops.flow_to_depth(
            flow, jnp.asarray(intr), jnp.asarray(aa), jnp.asarray(t)
        )
        np.testing.assert_allclose(np.asarray(inv_rec)[..., 0], inv, rtol=1e-3, atol=1e-4)

    def test_nan_flow_gives_nan(self, rng):
        H, W = 8, 8
        flow = np.zeros((1, H, W, 2), np.float32)
        flow[0, 2, 3] = np.nan
        d = np.asarray(
            ops.flow_to_depth(
                jnp.asarray(flow), jnp.asarray(INTR),
                jnp.zeros((1, 3)), jnp.asarray([[1.0, 0, 0]]),
            )
        )
        assert np.isnan(d[0, 2, 3, 0])

    def test_flow_to_depth2_nonnegative(self, rng):
        H, W = 16, 16
        flow = 0.05 * rng.randn(1, H, W, 2).astype(np.float32)
        d = np.asarray(
            ops.flow_to_depth2(
                jnp.asarray(flow), jnp.asarray(INTR),
                jnp.zeros((1, 3)), jnp.asarray([[0.0, 0, 1.0]]),
            )
        )
        assert np.nanmin(d) >= 0.0


class TestDepthToNormals:
    def test_frontoparallel_plane(self):
        H, W = 16, 16
        inv = np.full((1, H, W), 0.5, np.float32)  # z = 2 plane
        n = np.asarray(ops.depth_to_normals(jnp.asarray(inv), jnp.asarray(INTR)))
        inner = n[0, 4:-4, 4:-4]
        np.testing.assert_allclose(inner[..., 2], -1.0, atol=1e-3)
        np.testing.assert_allclose(inner[..., 0], 0.0, atol=1e-3)

    def test_unit_norm(self, rng):
        H, W = 16, 16
        inv = (0.2 + rng.rand(1, H, W)).astype(np.float32)
        n = np.asarray(ops.depth_to_normals(jnp.asarray(inv), jnp.asarray(INTR)))
        norms = np.linalg.norm(n, axis=-1)
        np.testing.assert_allclose(norms[np.isfinite(norms)], 1.0, atol=1e-4)

    def test_nan_region(self, rng):
        H, W = 16, 16
        inv = (0.2 + rng.rand(1, H, W)).astype(np.float32)
        inv[0, 8, 8] = np.nan
        n = np.asarray(ops.depth_to_normals(jnp.asarray(inv), jnp.asarray(INTR)))
        assert np.all(np.isnan(n[0, 8, 8]))
        assert np.all(np.isfinite(n[0, 2, 2]))
