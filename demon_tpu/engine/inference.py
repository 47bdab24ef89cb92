"""Fused DeMoN inference: bootstrap -> scan(iterative) -> refinement in ONE
jitted XLA program.

The reference runs 5 separate session.run calls per pair with host round
trips between them (examples/example.py:87-99). Here the whole pipeline is
a single program: the iterative recurrence is a lax.scan over shared
weights, so XLA pipelines the convs and the geometry ops without ever
leaving the device, and batching across pairs is free.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models import (
    BootstrapNet,
    IterativeNet,
    RefinementNet,
    DemonPrediction,
    DEMON_INTRINSICS,
)


class DemonOutput(NamedTuple):
    """Final outputs plus the per-iteration trajectory of predictions."""

    prediction: DemonPrediction      # final iteration (level-2 resolution)
    depth_refined: jax.Array         # [B, H, W, 1] full-resolution inverse depth
    normal_refined: Optional[jax.Array]  # v2 only
    history: DemonPrediction         # stacked [iterations+1, ...] incl. bootstrap


class DemonEngine:
    """Builds, initializes and runs the three-network DeMoN stack.

    Usage:
        engine = DemonEngine(variant="v1", iterations=3)
        params = engine.init(jax.random.key(0))
        out = engine.predict(params, image_pair, image2_2)  # jitted
    """

    # fixed operating resolution of the reference nets
    HEIGHT, WIDTH = 192, 256

    def __init__(self, variant: str = "v1", iterations: int = 3,
                 dtype=jnp.float32, use_pallas: bool = False,
                 use_pallas_head=None):
        """use_pallas routes qualifying factored-conv pairs through the
        VMEM-fused pallas kernel (ops/pallas_conv.py) — inference-only
        (no custom VJP) and TPU-only; leave False on CPU and for
        differentiated apply. use_pallas_head controls the packed-tap
        prediction-head kernel separately (None follows use_pallas) so
        its win/loss is measurable standalone (BENCH_PALLAS_HEAD=1)."""
        self.variant = variant
        self.iterations = iterations
        self.dtype = dtype
        self.bootstrap = BootstrapNet(variant=variant, dtype=dtype,
                                      pallas=use_pallas,
                                      pallas_head=use_pallas_head)
        self.iterative = IterativeNet(variant=variant, dtype=dtype,
                                      pallas=use_pallas,
                                      pallas_head=use_pallas_head)
        self.refinement = RefinementNet(variant=variant, dtype=dtype,
                                        pallas=use_pallas,
                                        pallas_head=use_pallas_head)
        self._jit_predict = jax.jit(self._predict)
        self._jit_predict_eval = jax.jit(self._predict_eval)
        self._jit_refine = jax.jit(
            lambda p, i, d: self.refinement.apply(p, i, d))

    # ------------------------------------------------------------------
    def init(self, rng, batch_size: int = 1) -> Dict[str, Any]:
        """Initialize all three parameter trees."""
        H, W = self.HEIGHT, self.WIDTH
        image_pair = jnp.zeros((batch_size, H, W, 6), jnp.float32)
        image2_2 = jnp.zeros((batch_size, H // 4, W // 4, 3), jnp.float32)
        intrinsics = jnp.broadcast_to(jnp.asarray(DEMON_INTRINSICS),
                                      (batch_size, 4))
        k1, k2, k3 = jax.random.split(rng, 3)
        # jit the init path: un-jitted tracing executes op-by-op, which is
        # pathologically slow over a remote TPU transport
        boot = jax.jit(self.bootstrap.init)(k1, image_pair, image2_2)
        prev = jax.jit(self.bootstrap.apply)(boot, image_pair, image2_2)
        iter_ = jax.jit(self.iterative.init)(
            k2, image_pair, image2_2, intrinsics, prev)
        refine = jax.jit(self.refinement.init)(
            k3, image_pair[..., :3], prev.depth2
        )
        return {"bootstrap": boot, "iterative": iter_, "refinement": refine}

    # ------------------------------------------------------------------
    @staticmethod
    def cast_params(params, dtype=jnp.bfloat16):
        """Cast floating-point parameters for serving. With bf16 weights
        the per-pass HBM weight traffic halves (fp32 master weights are
        otherwise read and cast in-graph every scan iteration); the
        pipeline is HBM-bound (BENCHMARKS.md) so this is free accuracy-
        for-bandwidth at inference time."""
        def _cast(x):
            if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating):
                return x.astype(dtype)
            return x

        return jax.tree.map(_cast, params)

    # ------------------------------------------------------------------
    def _predict(self, params, image_pair, image2_2, intrinsics) -> DemonOutput:
        boot_pred = self.bootstrap.apply(params["bootstrap"], image_pair, image2_2)

        def step(prev: DemonPrediction, _):
            pred = self.iterative.apply(
                params["iterative"], image_pair, image2_2, intrinsics, prev
            )
            return pred, pred

        final, iter_preds = jax.lax.scan(
            step, boot_pred, None, length=self.iterations
        )
        history = jax.tree.map(
            lambda b, it: jnp.concatenate([b[None], it], axis=0),
            boot_pred, iter_preds,
        )
        refine_out = self.refinement.apply(
            params["refinement"], image_pair[..., :3], final.depth2
        )
        return DemonOutput(
            prediction=final,
            depth_refined=refine_out["predict_depth0"],
            normal_refined=refine_out.get("predict_normal0"),
            history=history,
        )

    def predict(self, params, image_pair, image2_2,
                intrinsics: Optional[jax.Array] = None) -> DemonOutput:
        """Jitted full forward pass. image_pair: [B,192,256,6] in [-0.5,0.5],
        image2_2: [B,48,64,3]."""
        if intrinsics is None:
            intrinsics = jnp.broadcast_to(
                jnp.asarray(DEMON_INTRINSICS), (image_pair.shape[0], 4)
            )
        return self._jit_predict(params, image_pair, image2_2, intrinsics)

    # ------------------------------------------------------------------
    def _predict_eval(self, params, image_pair, image2_2, intrinsics):
        """Evaluation-protocol forward: per-iteration predictions PLUS a
        refined depth for every iteration (the reference refines each of
        the 4 iterations, examples/evaluation.py:226-257) — still one
        jitted program."""
        out = self._predict(params, image_pair, image2_2, intrinsics)
        image1 = image_pair[..., :3]
        refined = []
        for i in range(self.iterations + 1):
            depth2_i = jax.tree.map(lambda t: t[i], out.history.depth2)
            r = self.refinement.apply(params["refinement"], image1, depth2_i)
            refined.append(r["predict_depth0"])
        return {
            "flow2": out.history.flow2,            # [I+1, B, h, w, 2]
            "conf2": out.history.conf2,
            "depth2": out.history.depth2,          # [I+1, B, h, w, 1]
            "normal2": out.history.normal2,
            "rotation": out.history.rotation,      # [I+1, B, 3]
            "translation": out.history.translation,
            "scale": out.history.scale,
            "depth_refined": jnp.stack(refined),   # [I+1, B, H, W, 1]
        }

    def predict_eval(self, params, image_pair, image2_2,
                     intrinsics: Optional[jax.Array] = None):
        if intrinsics is None:
            intrinsics = jnp.broadcast_to(
                jnp.asarray(DEMON_INTRINSICS), (image_pair.shape[0], 4)
            )
        return self._jit_predict_eval(params, image_pair, image2_2, intrinsics)

    # ------------------------------------------------------------------
    def refine(self, params, image1, depth2, mesh=None):
        """Run the refinement net alone at arbitrary resolution.

        With a mesh carrying a 'space' axis, the image HEIGHT is sharded
        across it (spatial partitioning): activations of one image split
        across chips and GSPMD inserts the conv halo exchanges at the
        seams. This is the production path for resolutions whose
        refinement activations outgrow a single chip (192x256 DeMoN ops
        fit one chip; 4k-class refinement does not). image1: [B, H, W, 3];
        depth2: [B, h, w, 1] (any coarse size — nearest-upsampled inside).
        """
        if mesh is not None:
            from .sharding import replicate_pytree, spatial_sharding

            image1 = jax.device_put(
                image1, spatial_sharding(mesh, jnp.ndim(image1)))
            depth2 = jax.device_put(
                depth2, spatial_sharding(mesh, jnp.ndim(depth2)))
            # replicating the parameter tree moves tens of MB host->mesh;
            # cache it so a per-frame refinement loop pays it once. The
            # cache retains the keyed tree itself: an id()-only key could
            # alias a new dict allocated at a recycled address and serve
            # stale weights
            ref = params["refinement"]
            cached = getattr(self, "_refine_replicated", None)
            if cached is None or cached[0] is not ref or cached[1] != mesh:
                cached = (ref, mesh, replicate_pytree(ref, mesh))
                self._refine_replicated = cached
            params = {"refinement": cached[2]}
        return self._jit_refine(params["refinement"], image1, depth2)


def prepare_input_pair(img1: np.ndarray, img2: np.ndarray) -> Dict[str, np.ndarray]:
    """Pack two uint8 RGB images into network inputs (NHWC).

    Mirrors the reference's prepare_input_data (examples/example.py:15-42):
    resize to 256x192, map [0,255] -> [-0.5, 0.5], build the 6-channel
    pair plus the 4x-downsampled second image.
    """
    from PIL import Image

    def _resize(a, w, h):
        return np.asarray(Image.fromarray(a).resize((w, h), Image.BILINEAR))

    H, W = DemonEngine.HEIGHT, DemonEngine.WIDTH
    if img1.shape[:2] != (H, W):
        img1 = _resize(img1, W, H)
    if img2.shape[:2] != (H, W):
        img2 = _resize(img2, W, H)
    img2_2 = _resize(img2, W // 4, H // 4)

    to_f = lambda a: a.astype(np.float32) / 255.0 - 0.5
    image_pair = np.concatenate([to_f(img1), to_f(img2)], axis=-1)[None]
    return {
        "image_pair": image_pair,
        "image1": to_f(img1)[None],
        "image2_2": to_f(img2_2)[None],
    }
