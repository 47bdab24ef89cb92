"""Tests for warp2d, median3x3_downsample, resizes and elementwise ops."""

import numpy as np
import jax
import jax.numpy as jnp

from demon_tpu import ops


class TestWarp2d:
    def test_zero_flow_identity(self, rng):
        img = rng.rand(2, 12, 16, 3).astype(np.float32)
        flow = np.zeros((2, 12, 16, 2), np.float32)
        out = np.asarray(ops.warp2d(jnp.asarray(img), jnp.asarray(flow)))
        np.testing.assert_allclose(out, img, atol=1e-6)

    def test_integer_shift(self, rng):
        img = rng.rand(1, 8, 8, 1).astype(np.float32)
        flow = np.zeros((1, 8, 8, 2), np.float32)
        flow[..., 0] = 2.0  # shift right by 2 px
        out = np.asarray(
            ops.warp2d(jnp.asarray(img), jnp.asarray(flow), normalized=False)
        )
        # output(x) = input(x+2); last two columns out of bounds -> 0
        np.testing.assert_allclose(out[0, :, :6, 0], img[0, :, 2:, 0], atol=1e-6)
        np.testing.assert_allclose(out[0, :, 6:, 0], 0.0)

    def test_normalized_units(self, rng):
        img = rng.rand(1, 8, 16, 1).astype(np.float32)
        fpix = np.zeros((1, 8, 16, 2), np.float32)
        fpix[..., 0] = 3.0
        fnorm = fpix.copy()
        fnorm[..., 0] = 3.0 / 16
        a = np.asarray(ops.warp2d(jnp.asarray(img), jnp.asarray(fpix), normalized=False))
        b = np.asarray(ops.warp2d(jnp.asarray(img), jnp.asarray(fnorm), normalized=True))
        np.testing.assert_allclose(a, b, atol=1e-5)

    def test_bilinear_half_pixel(self):
        img = np.zeros((1, 4, 4, 1), np.float32)
        img[0, :, 2, 0] = 1.0
        flow = np.full((1, 4, 4, 2), 0.0, np.float32)
        flow[..., 0] = 0.5
        out = np.asarray(ops.warp2d(jnp.asarray(img), jnp.asarray(flow), normalized=False))
        # sampling between columns 1|2 and 2|3 gives 0.5 at both
        np.testing.assert_allclose(out[0, :, 1, 0], 0.5, atol=1e-6)
        np.testing.assert_allclose(out[0, :, 2, 0], 0.5, atol=1e-6)

    def test_nan_flow_gives_border_value(self, rng):
        img = rng.rand(1, 6, 6, 2).astype(np.float32)
        flow = np.zeros((1, 6, 6, 2), np.float32)
        flow[0, 3, 3, :] = np.nan
        out = np.asarray(ops.warp2d(jnp.asarray(img), jnp.asarray(flow)))
        assert np.all(np.isfinite(out))

    def test_gradients_flow(self, rng):
        img = jnp.asarray(rng.rand(1, 8, 8, 1).astype(np.float32))
        flow = jnp.asarray(0.01 * rng.randn(1, 8, 8, 2).astype(np.float32))

        def f(fl):
            return jnp.sum(ops.warp2d(img, fl) ** 2)

        g = jax.grad(f)(flow)
        assert np.all(np.isfinite(np.asarray(g)))
        assert np.abs(np.asarray(g)).sum() > 0

    def test_matches_torch_grid_sample(self, rng):
        """Cross-check bilinear semantics against torch (independent oracle)."""
        import torch
        import torch.nn.functional as F

        B, H, W, C = 2, 10, 14, 3
        img = rng.rand(B, H, W, C).astype(np.float32)
        flow = (0.2 * rng.randn(B, H, W, 2)).astype(np.float32)

        ours = np.asarray(
            ops.warp2d(jnp.asarray(img), jnp.asarray(flow), normalized=False)
        )

        # torch grid_sample with align_corners=False uses the same half-pixel
        # center convention; build the sampling grid from pixel positions.
        xs = np.arange(W) + 0.5 + flow[..., 0]
        ys = np.arange(H)[:, None] + 0.5 + flow[..., 1]
        gx = 2 * xs / W - 1
        gy = 2 * ys / H - 1
        grid = torch.from_numpy(np.stack([gx, gy], -1).astype(np.float32))
        timg = torch.from_numpy(img.transpose(0, 3, 1, 2))
        tout = F.grid_sample(
            timg, grid, mode="bilinear", padding_mode="zeros", align_corners=False
        )
        ref = tout.numpy().transpose(0, 2, 3, 1)
        np.testing.assert_allclose(ours, ref, atol=2e-5)


class TestMedianDownsample:
    def test_constant(self):
        x = jnp.full((1, 8, 8, 2), 3.0)
        out = np.asarray(ops.median3x3_downsample(x))
        assert out.shape == (1, 4, 4, 2)
        np.testing.assert_allclose(out, 3.0)

    def test_median_semantics(self, rng):
        x = rng.rand(1, 8, 8, 1).astype(np.float32)
        out = np.asarray(ops.median3x3_downsample(jnp.asarray(x)))
        # interior window centered at (2,2)
        win = x[0, 1:4, 1:4, 0].ravel()
        np.testing.assert_allclose(out[0, 1, 1, 0], np.median(win), atol=1e-6)

    def test_nan_robust(self, rng):
        x = rng.rand(1, 8, 8, 1).astype(np.float32)
        x[0, 2, 2, 0] = np.nan  # 1 NaN in the window -> finite median survives
        out = np.asarray(ops.median3x3_downsample(jnp.asarray(x)))
        assert np.isfinite(out[0, 1, 1, 0])
        x[:] = np.nan
        out = np.asarray(ops.median3x3_downsample(jnp.asarray(x)))
        assert np.all(np.isnan(out))

    def test_recursive_levels(self, rng):
        x = jnp.asarray(rng.rand(1, 64, 64, 1).astype(np.float32))
        levels = ops.recursive_median_downsample(x, 5)
        assert len(levels) == 5
        assert levels[-1].shape == (1, 2, 2, 1)


class TestResize:
    def test_nearest_upsample(self):
        x = jnp.asarray(np.arange(4, dtype=np.float32).reshape(1, 2, 2, 1))
        out = np.asarray(ops.resize_nearest(x, 4, 4))
        np.testing.assert_array_equal(out[0, :, :, 0],
                                      [[0, 0, 1, 1], [0, 0, 1, 1],
                                       [2, 2, 3, 3], [2, 2, 3, 3]])

    def test_area_downsample(self, rng):
        x = rng.rand(1, 8, 8, 3).astype(np.float32)
        out = np.asarray(ops.resize_area(jnp.asarray(x), 4, 4))
        np.testing.assert_allclose(
            out[0, 0, 0], x[0, :2, :2].mean(axis=(0, 1)), atol=1e-6
        )


class TestElementwise:
    def test_leaky_relu(self):
        x = jnp.asarray([-1.0, 0.0, 2.0])
        np.testing.assert_allclose(np.asarray(ops.leaky_relu(x)), [-0.1, 0.0, 2.0])

    def test_replace_nonfinite_forward(self):
        x = jnp.asarray([1.0, np.nan, np.inf, -np.inf, -2.0])
        np.testing.assert_allclose(
            np.asarray(ops.replace_nonfinite(x)), [1.0, 0, 0, 0, -2.0]
        )

    def test_replace_nonfinite_grad(self):
        x = jnp.asarray([1.0, np.nan, 3.0])

        def f(v):
            return jnp.sum(ops.replace_nonfinite(v * 2.0) ** 2)

        g = np.asarray(jax.grad(f)(x))
        assert np.isfinite(g).all()
        assert g[1] == 0.0
        np.testing.assert_allclose(g[0], 8.0)  # d/dx (2x)^2 = 8x

    def test_sig_shapes_and_order(self, rng):
        x = jnp.asarray(rng.rand(1, 16, 16, 2).astype(np.float32))
        out = ops.scale_invariant_gradient(x, deltas=[1, 2], weights=[1, 1])
        assert out.shape == (1, 16, 16, 8)

    def test_sig_values(self):
        eps = 0.001
        x = np.zeros((1, 4, 4, 1), np.float32)
        x[0, 0, 0, 0] = 1.0
        x[0, 0, 1, 0] = 3.0
        out = np.asarray(
            ops.scale_invariant_gradient(jnp.asarray(x), deltas=[1], weights=[2.0], epsilon=eps)
        )
        expected_gx = 2.0 * (3.0 - 1.0) / (3.0 + 1.0 + eps)
        np.testing.assert_allclose(out[0, 0, 0, 0], expected_gx, rtol=1e-5)
        # gy at bottom row must be zero (no neighbor)
        np.testing.assert_allclose(out[0, 3, :, 1], 0.0)
