"""The stride-2 factored conv pair's phase-decomposed backward
(models/layers.py _phased_axis_conv) must match the XLA-derived gradient
of the plain nn.Conv formulation — forward bit-identical, gradients to
float rounding — for both pad modes and all kernel sizes the nets use."""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from demon_tpu.models.layers import _kernel_init, convrelu2
from demon_tpu.ops import leaky_relu


class _Phased(nn.Module):
    kernel: int
    pad_mode: str

    @nn.compact
    def __call__(self, x):
        return convrelu2(x, (6, 8), self.kernel, name="c",
                         pad_mode=self.pad_mode, stride=2, phased_bwd=True)


class _Plain(nn.Module):
    kernel: int
    pad_mode: str

    @nn.compact
    def __call__(self, x):
        k = self.kernel
        if self.pad_mode == "caffe":
            pad_y = ((k // 2, k // 2), (0, 0))
            pad_x = ((0, 0), (k // 2, k // 2))
        else:
            pad_y = pad_x = "SAME"
        y = nn.Conv(6, (k, 1), strides=(2, 1), padding=pad_y,
                    kernel_init=_kernel_init(), name="cy")(x)
        y = leaky_relu(y)
        y = nn.Conv(8, (1, k), strides=(1, 2), padding=pad_x,
                    kernel_init=_kernel_init(), name="cx")(y)
        return leaky_relu(y)


@pytest.mark.parametrize("pad_mode", ["caffe", "same"])
@pytest.mark.parametrize("kernel", [3, 5, 7, 9])
def test_phased_pair_matches_plain(kernel, pad_mode):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 16, 24, 5).astype(np.float32))
    phased = _Phased(kernel, pad_mode)
    plain = _Plain(kernel, pad_mode)
    p_ph = phased.init(jax.random.key(0), x)["params"]
    # same tree, same shapes — reuse the weights for the plain module
    p_pl = {"cy": p_ph["cy"], "cx": p_ph["cx"]}
    y_ph = phased.apply({"params": p_ph}, x)
    y_pl = plain.apply({"params": p_pl}, x)
    np.testing.assert_array_equal(np.asarray(y_ph), np.asarray(y_pl))

    def loss_ph(p, x):
        return jnp.sum(jnp.sin(phased.apply({"params": p}, x)))

    def loss_pl(p, x):
        return jnp.sum(jnp.sin(plain.apply({"params": p}, x)))

    g_ph = jax.grad(loss_ph, argnums=(0, 1))(p_ph, x)
    g_pl = jax.grad(loss_pl, argnums=(0, 1))(p_pl, x)
    for a, b in zip(jax.tree_util.tree_leaves(g_ph),
                    jax.tree_util.tree_leaves(g_pl)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-5, atol=1e-5)


def test_phased_ineligible_falls_back():
    """Odd spatial size keeps the plain nn.Conv path (same param tree)."""
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(1, 15, 24, 4).astype(np.float32))
    m = _Phased(5, "same")
    p = m.init(jax.random.key(0), x)["params"]
    y = m.apply({"params": p}, x)
    assert y.shape[1] == 8  # ceil(15/2), via the nn.Conv fallback
