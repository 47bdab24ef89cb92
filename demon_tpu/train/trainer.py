"""The evolution trainer — TPU-native port of training/v2/training.py.

The reference trains in six "evolutions" (stages), each rebuilding the
graph, warm-starting from the previous stage's checkpoint and training a
different subset of the networks:

    0_flow1      netFlow1                1000k iters, batch 32
    1_dm1        netDM1                  1000k
    2_flow2      netFlow2                 250k
    3_dm2        netDM2                   250k
    4_iterative  netFlow2 + netDM2       1500k, batch 8 (+24 recycled)
    5_refine     netRefine                250k

Design differences from the reference (same training distribution):

* One jitted train_step per evolution; gradients are taken only w.r.t. the
  evolution's trainable nets (the reference masks via var_list,
  training.py:500-514).
* The capacity-2 FIFOQueue that recycles iterative-net predictions
  (training.py:278-320,463-477) becomes an explicit on-device replay
  carry: each step consumes (fresh batch of B) + (3B recycled rows) and
  re-emits the first 3B rows of the combined batch with netDM2's new
  predictions — the same "1 fresh + 3 recycled simulated iterations" mix.
* Data parallelism is a jax.sharding mesh instead of tower splitting;
  XLA inserts the gradient all-reduce.
* Checkpoints are orbax instead of tf.Saver.

Faithfully kept: Adam(eps=1e-6), elementwise gradient clipping to +-100,
the LR curve (constant 1/3 then quadratic to 1e-6), all loss weights, the
sig-weight ease-in / level5 fade-out schedules, L2(4e-4) kernel
regularization on the trainable nets, batch sizes.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Dict, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from .. import ops
from ..models import FlowBlock, DepthMotionBlock, RefinementBlock
from . import losses as L
from .schedules import demon_lr_schedule, ease_in_quad, ease_out_quad

EVOLUTIONS = ("0_flow1", "1_dm1", "2_flow2", "3_dm2", "4_iterative", "5_refine")

# ground-truth keys evolution 4's losses consume on recycled rows; the
# replay carry stores exactly these (see make_train_step)
REPLAY_GT_KEYS = ("flow2", "flow5", "flow2_sig", "depth2", "depth2_sig",
                  "normal2", "rotation", "translation")

_K = 1000


class ParamsEmaState(NamedTuple):
    """State of _params_ema: the EMA shadow of the trainable params."""

    ema: Any


def _params_ema(decay: float) -> optax.GradientTransformation:
    """Terminal chain link that tracks an EMA of the *post-update*
    parameters in its state. The updates pass through unchanged, so it
    never alters training; the shadow tree rides the optimizer state and
    is therefore checkpointed/restored with it for free."""

    def init_fn(params):
        # must COPY: aliasing the live params buffers would make the jitted
        # step donate the same buffer twice (params + opt_state)
        return ParamsEmaState(ema=jax.tree.map(jnp.copy, params))

    def update_fn(updates, state, params=None):
        if params is None:
            raise ValueError("_params_ema needs the current params")
        new_params = optax.apply_updates(params, updates)
        ema = jax.tree.map(
            lambda e, p: e * decay + p.astype(e.dtype) * (1.0 - decay),
            state.ema, new_params)
        return updates, ParamsEmaState(ema=ema)

    return optax.GradientTransformation(init_fn, update_fn)


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Module-level constants of the reference driver (training.py:30-75)."""

    variant: str = "v2"
    height: int = 192
    width: int = 256
    # "bfloat16" runs the conv stacks in bf16 on the MXU while keeping
    # fp32 master weights, fp32 losses/gradients/Adam state, and fp32
    # geometry/GT tensors (predictions are cast back at the apply
    # boundary). The reference has no mixed-precision story (TF1.4/CUDA8);
    # on TPU this is the native fast path.
    compute_dtype: str = "float32"
    max_iter: Dict[str, int] = dataclasses.field(default_factory=lambda: {
        "0_flow1": 1000 * _K, "1_dm1": 1000 * _K, "2_flow2": 250 * _K,
        "3_dm2": 250 * _K, "4_iterative": 1500 * _K, "5_refine": 250 * _K,
    })
    base_lr: Dict[str, float] = dataclasses.field(default_factory=lambda: {
        "0_flow1": 0.00025, "1_dm1": 0.0002, "2_flow2": 0.00015,
        "3_dm2": 0.00015, "4_iterative": 0.00015, "5_refine": 0.0002,
    })
    batch_size: int = 32
    batch_size_iterative: int = 8
    simulated_iterations: int = 4
    flow_loss_weight: float = 0.5 * 1000
    flow_grad_loss_weight: float = 0.25 * 1000
    flow_conf_loss_weight: float = 0.5 * 100 * 0.5
    flow_conf_grad_loss_weight: float = 0.25 * 100
    depth_loss_weight: float = 0.5 * 300
    depth_grad_loss_weight: float = 0.25 * 1500
    normal_loss_weight: float = 0.5 * 50
    rotation_loss_weight: float = 160.0
    translation_loss_weight: float = 15.0 * 3
    l2_regularizer: float = 0.0004
    grad_clip: float = 100.0
    adam_eps: float = 1e-6
    # Production niceties with no reference counterpart (both default off):
    # ema_decay > 0 maintains an exponential moving average of the
    # trainable parameters inside the optimizer state (checkpointed with
    # it); read it back with EvolutionTrainer.ema_params(opt_state).
    ema_decay: float = 0.0
    # accum_steps > 1 accumulates gradients over N micro-batches before
    # each optimizer update (optax.MultiSteps) — the >HBM-batch recipe.
    # The LR schedule and max_iter then count *effective* updates.
    accum_steps: int = 1
    # Run the clip/Adam/LR core over ONE flat parameter vector
    # (optax.flatten) instead of ~100 per-kernel tensors. Same math,
    # element for element (tests/test_train_features.py), and it looked
    # like the fix for the profiled 3.94 ms/step of scattered per-leaf
    # Adam fusions — but MEASURED SLOWER on the chip (evo-4 bf16:
    # 367 -> 198 samples/s; the ravel/unravel relayouts of ~100 tiled
    # tensors cost more than the fusions they replace). Kept as an
    # opt-in knob with the measurement recorded (BENCHMARKS.md round-3
    # evo-4 section); the optimizer-state pytree changes shape, so
    # checkpoints are not interchangeable across this flag.
    flat_opt: bool = False
    # Opt-in phase-decomposed data gradient for the stride-2 conv pairs
    # (models/layers.py convrelu2 phased_bwd) — measured dead end on the
    # round-3 chip, kept off; see BENCHMARKS.md "evolution-4 profile
    # attack". Forward is bit-identical either way.
    phased_bwd: bool = False
    # Ablation knob for evolution 4's training distribution: True keeps the
    # reference mix of 1 fresh batch + 3 recycled prediction batches
    # (training.py:278-320); False feeds 4x fresh rows with netDM1
    # predictions as prev each step (same compute, no recycling).
    replay_recycled: bool = True

    def batch_for(self, evo: str) -> int:
        if evo >= "4_iterative":
            if evo == "4_iterative" and not self.replay_recycled:
                # fresh-mix ablation: same rows/step as the recycled mix
                return self.batch_size_iterative * self.simulated_iterations
            return self.batch_size_iterative
        return self.batch_size


# which nets receive gradients in each evolution (training.py:500-514)
TRAINABLE_NETS = {
    "0_flow1": ("netFlow1",),
    "1_dm1": ("netDM1",),
    "2_flow2": ("netFlow2",),
    "3_dm2": ("netDM2",),
    "4_iterative": ("netFlow2", "netDM2"),
    "5_refine": ("netRefine",),
}

NET_NAMES = ("netFlow1", "netDM1", "netFlow2", "netDM2", "netRefine")


def _split_flowconf(fc):
    return fc[..., :2], fc[..., 2:]


def _l2_reg(params, scale):
    """scale * sum(||kernel||^2)/2 over conv/dense kernels, matching
    tf.contrib.layers.l2_regularizer (training.py:75)."""
    total = 0.0
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    for path, leaf in flat:
        names = [getattr(p, "key", getattr(p, "name", "")) for p in path]
        if names and names[-1] == "kernel":
            total = total + jnp.sum(leaf.astype(jnp.float32) ** 2)
    return 0.5 * scale * total


class EvolutionTrainer:
    """Builds and runs per-evolution jitted train steps.

    Parameters are a flat dict {net_name: param_tree}; the same trees slot
    into the engine's composite networks for inference.
    """

    def __init__(self, config: TrainConfig = TrainConfig(), mesh=None):
        self.config = config
        self.mesh = mesh
        v = config.variant
        dt = (jnp.bfloat16 if config.compute_dtype == "bfloat16"
              else jnp.float32)
        pb = config.phased_bwd
        self.flow_block = FlowBlock(variant=v, dtype=dt, phased_bwd=pb)
        self.dm_block = DepthMotionBlock(variant=v, dtype=dt, phased_bwd=pb)
        self.refine_block = RefinementBlock(variant=v, dtype=dt,
                                            phased_bwd=pb)
        self._step_fns: Dict[str, Any] = {}

    # ------------------------------------------------------------------
    # init
    # ------------------------------------------------------------------
    def init_params(self, rng) -> Dict[str, Any]:
        cfg = self.config
        H, W = cfg.height, cfg.width
        B = 1
        image_pair = jnp.zeros((B, H, W, 6))
        image2_2 = jnp.zeros((B, H // 4, W // 4, 3))
        intr = jnp.full((B, 4), 0.5)
        keys = jax.random.split(rng, 5)

        # jit init/apply: un-jitted tracing dispatches op-by-op (very slow
        # over a remote TPU transport)
        pF1 = jax.jit(self.flow_block.init)(keys[0], image_pair)["params"]
        fc = jax.jit(self.flow_block.apply)({"params": pF1}, image_pair)
        flow2, _ = _split_flowconf(fc["predict_flowconf2"])
        pDM1 = jax.jit(self.dm_block.init)(
            keys[1], image_pair, image2_2, flow2, fc["predict_flowconf2"]
        )["params"]
        dm1 = jax.jit(self.dm_block.apply)(
            {"params": pDM1}, image_pair, image2_2, flow2, fc["predict_flowconf2"]
        )
        prev = {
            "depth2": dm1["predict_depth2"],
            "normal2": dm1["predict_normal2"],
            "rotation": dm1["predict_rotation"],
            "translation": dm1["predict_translation"],
        }
        pF2 = jax.jit(self.flow_block.init)(
            keys[2], image_pair, image2_2, intr, prev
        )["params"]
        pDM2 = jax.jit(self.dm_block.init)(
            keys[3], image_pair, image2_2, flow2, fc["predict_flowconf2"],
            dm1["predict_rotation"], dm1["predict_translation"], intr,
        )["params"]
        pRef = jax.jit(self.refine_block.init)(
            keys[4], image_pair[..., :3], dm1["predict_depth2"]
        )["params"]
        return {"netFlow1": pF1, "netDM1": pDM1, "netFlow2": pF2,
                "netDM2": pDM2, "netRefine": pRef}

    # ------------------------------------------------------------------
    # optimizer
    # ------------------------------------------------------------------
    def make_optimizer(self, evo: str) -> optax.GradientTransformation:
        cfg = self.config
        lr = partial(demon_lr_schedule, base_lr=cfg.base_lr[evo],
                     max_iter=cfg.max_iter[evo])
        core = optax.chain(
            optax.clip(cfg.grad_clip),
            optax.scale_by_adam(eps=cfg.adam_eps),
            optax.scale_by_learning_rate(lr),
        )
        if cfg.flat_opt:
            # clip/Adam/LR are elementwise, so flattening is math-identical;
            # it collapses ~100 per-kernel update fusions into one (see the
            # flat_opt field note). The EMA link stays outside — it needs
            # the shaped params.
            core = optax.flatten(core)
        links = [core]
        if cfg.ema_decay:
            links.append(_params_ema(cfg.ema_decay))
        tx = optax.chain(*links)
        if cfg.accum_steps > 1:
            ms = optax.MultiSteps(tx, every_k_schedule=cfg.accum_steps)
            tx = optax.GradientTransformation(ms.init, ms.update)
        return tx

    def ema_params(self, opt_state):
        """The EMA parameter tree kept by _params_ema inside `opt_state`,
        or None when config.ema_decay == 0."""
        found = []

        def visit(s):
            if isinstance(s, ParamsEmaState):
                found.append(s.ema)
            elif isinstance(s, (tuple, list)):
                for c in s:
                    visit(c)
            elif isinstance(s, dict):
                for c in s.values():
                    visit(c)

        visit(opt_state)
        return found[0] if found else None

    def eval_params(self, params, opt_state):
        """Params for evaluation/serving: the live tree with the EMA
        shadow substituted for the nets it covers (the evolution's
        trainable nets). Identity when config.ema_decay == 0."""
        ema = self.ema_params(opt_state)
        return {**params, **ema} if ema is not None else params

    # ------------------------------------------------------------------
    # forward helpers
    # ------------------------------------------------------------------
    @staticmethod
    def _f32(out):
        """Losses, gradients and the replay carry stay fp32 regardless of
        the blocks' compute dtype — cast once at the apply boundary."""
        return jax.tree.map(lambda a: a.astype(jnp.float32), out)

    def _apply_flow(self, p, image_pair, image2_2=None, intr=None, prev=None):
        return self._f32(self.flow_block.apply(
            {"params": p}, image_pair, image2_2=image2_2, intrinsics=intr,
            prev=prev,
        ))

    def _apply_dm(self, p, image_pair, image2_2, flow2, flowconf2,
                  rotation=None, translation=None, intr=None):
        return self._f32(self.dm_block.apply(
            {"params": p}, image_pair, image2_2, flow2, flowconf2,
            rotation, translation, intr,
        ))

    # ------------------------------------------------------------------
    # the per-evolution loss
    # ------------------------------------------------------------------
    def _evolution_losses(self, evo, params, batch, gt, step, replay):
        """Returns (selected_loss_sum, all_losses_dict, new_replay).

        batch: dict with IMAGE_PAIR [B,H,W,6], INTRINSICS [B,4] and derived
        image1/image2_2; gt: output of prepare_ground_truth_tensors.
        """
        cfg = self.config
        max_iter = cfg.max_iter[evo]
        stepf = step.astype(jnp.float32)
        loss_dict: Dict[str, jax.Array] = {}
        selected: list = []
        new_replay = replay

        image_pair = batch["IMAGE_PAIR"]
        image2_2 = batch["image2_2"]
        intr = batch["INTRINSICS"]

        # --- netFlow1 (always runs; trained only in evo 0) --------------
        f1 = self._apply_flow(params["netFlow1"], image_pair)
        f1_flow5, f1_conf5 = _split_flowconf(f1["predict_flowconf5"])
        f1_flow2, f1_conf2 = _split_flowconf(f1["predict_flowconf2"])

        if evo == "0_flow1":
            flow_sig_w = ease_out_quad(stepf, 0.0, cfg.flow_grad_loss_weight,
                                       max_iter // 3)
            conf_sig_w = ease_out_quad(stepf, 0.0, cfg.flow_conf_grad_loss_weight,
                                       max_iter // 3)
            lvl5 = ease_in_quad(stepf, 1.0, -1.0, max_iter // 3)
            ld = L.flow_loss_block(
                gt["flow2"], gt["flow5"], gt["flow2_sig"],
                f1_flow2, f1_flow5, f1_conf2, f1_conf5,
                cfg.flow_loss_weight, cfg.flow_conf_loss_weight,
                flow_sig_w, conf_sig_w, conf_diff_scale=10.0,
                level5_factor=lvl5, loss_prefix="netFlow1_",
            )
            loss_dict.update(ld)
            selected += ["netFlow1_" + n for n in L.FLOW_SELECTED]
            return self._total(loss_dict, selected, params, evo), loss_dict, new_replay

        # --- netDM1 ------------------------------------------------------
        dm1 = self._apply_dm(params["netDM1"], image_pair, image2_2,
                             f1_flow2, f1["predict_flowconf2"])
        if evo == "1_dm1":
            depth_sig_w = ease_out_quad(stepf, 0.0, cfg.depth_grad_loss_weight,
                                        2_000_000)
            ld = L.depthnormal_loss_block(
                gt["depth2"], gt["depth2_sig"], gt["normal2"],
                gt["rotation"], gt["translation"],
                dm1["predict_depth2"], dm1["predict_normal2"],
                dm1["predict_rotation"], dm1["predict_translation"],
                cfg.depth_loss_weight, depth_sig_w, cfg.normal_loss_weight,
                cfg.rotation_loss_weight, cfg.translation_loss_weight,
                loss_prefix="netDM1_",
            )
            loss_dict.update(ld)
            selected += ["netDM1_" + n for n in L.DEPTHNORMAL_SELECTED]
            return self._total(loss_dict, selected, params, evo), loss_dict, new_replay

        # --- iterative replay mix (evo 4) ---------------------------------
        data = {"IMAGE_PAIR": image_pair, "image2_2": image2_2,
                "INTRINSICS": intr}
        dm1_state = {k: dm1[k] for k in
                     ("predict_depth2", "predict_normal2", "predict_rotation",
                      "predict_translation", "predict_scale")}
        if evo == "4_iterative" and not cfg.replay_recycled:
            # fresh-mix ablation: the reader already delivers 4B fresh rows;
            # prev stays netDM1's predictions for every row, nothing carried
            pass
        elif evo == "4_iterative":
            assert replay is not None
            data = jax.tree.map(
                lambda fresh, old: jnp.concatenate([fresh, old], 0),
                data, replay["data"])
            # the carry holds only the gt keys evo-4's losses read — the
            # full-resolution tensors (flow0, depth0[_sig], normal0) would
            # add ~16 unused fp32 channels at 192x256 per recycled row to
            # every step's concat/slice/constraint traffic
            gt = {k: jnp.concatenate([gt[k], replay["gt"][k]], 0)
                  for k in REPLAY_GT_KEYS}
            dm1_state = jax.tree.map(
                lambda fresh, old: jnp.concatenate([fresh, old], 0),
                dm1_state, replay["dm"])
            image_pair, image2_2, intr = (
                data["IMAGE_PAIR"], data["image2_2"], data["INTRINSICS"])

        prev = {
            "depth2": dm1_state["predict_depth2"],
            "normal2": dm1_state["predict_normal2"],
            "rotation": dm1_state["predict_rotation"],
            "translation": dm1_state["predict_translation"],
        }

        # --- netFlow2 ------------------------------------------------------
        f2 = self._apply_flow(params["netFlow2"], image_pair, image2_2, intr, prev)
        f2_flow5, f2_conf5 = _split_flowconf(f2["predict_flowconf5"])
        f2_flow2, f2_conf2 = _split_flowconf(f2["predict_flowconf2"])

        if evo in ("2_flow2", "4_iterative"):
            if evo == "2_flow2":
                flow_sig_w = ease_out_quad(stepf, 0.0, cfg.flow_grad_loss_weight,
                                           max_iter // 3)
                conf_sig_w = ease_out_quad(stepf, 0.0,
                                           cfg.flow_conf_grad_loss_weight,
                                           max_iter // 3)
                lvl5 = ease_in_quad(stepf, 1.0, -1.0, max_iter // 3)
            else:
                flow_sig_w = cfg.flow_grad_loss_weight
                conf_sig_w = cfg.flow_conf_grad_loss_weight
                lvl5 = 0.0
            ld = L.flow_loss_block(
                gt["flow2"], gt["flow5"], gt["flow2_sig"],
                f2_flow2, f2_flow5, f2_conf2, f2_conf5,
                cfg.flow_loss_weight, cfg.flow_conf_loss_weight,
                flow_sig_w, conf_sig_w, conf_diff_scale=10.0,
                level5_factor=lvl5, loss_prefix="netFlow2_",
            )
            loss_dict.update(ld)
            selected += ["netFlow2_" + n for n in L.FLOW_SELECTED]
        if evo == "2_flow2":
            return self._total(loss_dict, selected, params, evo), loss_dict, new_replay

        # --- netDM2 --------------------------------------------------------
        dm2 = self._apply_dm(
            params["netDM2"], image_pair, image2_2, f2_flow2,
            f2["predict_flowconf2"], dm1_state["predict_rotation"],
            dm1_state["predict_translation"], intr,
        )
        if evo in ("3_dm2", "4_iterative"):
            if evo == "3_dm2":
                depth_sig_w = ease_out_quad(stepf, 0.0,
                                            cfg.depth_grad_loss_weight, max_iter)
            else:
                depth_sig_w = cfg.depth_grad_loss_weight
            ld = L.depthnormal_loss_block(
                gt["depth2"], gt["depth2_sig"], gt["normal2"],
                gt["rotation"], gt["translation"],
                dm2["predict_depth2"], dm2["predict_normal2"],
                dm2["predict_rotation"], dm2["predict_translation"],
                cfg.depth_loss_weight, depth_sig_w, cfg.normal_loss_weight,
                cfg.rotation_loss_weight, cfg.translation_loss_weight,
                loss_prefix="netDM2_",
            )
            loss_dict.update(ld)
            selected += ["netDM2_" + n for n in L.DEPTHNORMAL_SELECTED]
        if evo == "3_dm2":
            return self._total(loss_dict, selected, params, evo), loss_dict, new_replay

        if evo == "4_iterative":
            if cfg.replay_recycled:
                # re-emit the first 3B rows with netDM2's predictions as the
                # next step's recycled portion (reference training.py:463-477)
                n = (cfg.simulated_iterations - 1) * cfg.batch_size_iterative
                take = lambda t: jax.lax.stop_gradient(t[:n])
                dm2_state = {k: dm2[k] for k in dm1_state}
                new_replay = {
                    "data": jax.tree.map(take, data),
                    "gt": jax.tree.map(take, gt),
                    "dm": jax.tree.map(take, dm2_state),
                }
            return self._total(loss_dict, selected, params, evo), loss_dict, new_replay

        # --- netRefine (evo 5) ---------------------------------------------
        if evo == "5_refine":
            ref = self._f32(self.refine_block.apply(
                {"params": params["netRefine"]},
                batch["image1"], dm2["predict_depth2"],
            ))
            depth_sig_w = ease_out_quad(stepf, 0.0,
                                        0.5 * cfg.depth_grad_loss_weight, max_iter)
            ld = L.depth_refine_loss_block(
                gt["depth0"], gt["depth0_sig"], gt["normal0"],
                ref["predict_depth0"], ref.get("predict_normal0"),
                cfg.depth_loss_weight, depth_sig_w, cfg.normal_loss_weight,
                loss_prefix="netRefine_",
            )
            loss_dict.update(ld)
            # v1's refinement block predicts depth only — no normal loss
            selected += ["netRefine_" + n for n in L.REFINE_SELECTED
                         if ("netRefine_" + n) in ld]
            return self._total(loss_dict, selected, params, evo), loss_dict, new_replay

        raise ValueError(f"unhandled evolution {evo}")

    def _total(self, loss_dict, selected, params, evo):
        total = sum(loss_dict[k] for k in selected)
        reg = sum(
            _l2_reg(params[n], self.config.l2_regularizer)
            for n in TRAINABLE_NETS[evo]
        )
        return total + reg

    # ------------------------------------------------------------------
    # parameter sharding (tensor parallelism over the 'model' axis)
    # ------------------------------------------------------------------
    def shard_params(self, params):
        """Place params on the trainer's mesh: big dense kernels
        (dense5/motion_fc*) column-sharded over 'model', everything else
        replicated (engine/sharding.model_parallel_param_shardings).
        Optimizer state initialized from these params inherits the layout
        (optax mirrors the param pytree), and jitted steps keep it — no
        per-step resharding. No-op without a mesh."""
        if self.mesh is None:
            return params
        from ..engine.sharding import model_parallel_param_shardings

        shardings = model_parallel_param_shardings(self.mesh, params)
        return jax.tree.map(jax.device_put, params, shardings)

    # ------------------------------------------------------------------
    # replay-carry sharding
    # ------------------------------------------------------------------
    def _constrain_replay(self, tree):
        """Pin the evo-4 replay pytree to the shardings its consumers use:
        batch dim over 'data', image height over 'space' where divisible.

        Without this, GSPMD propagates conflicting shardings onto the
        carried tensors and falls back to 'involuntary full
        rematerialization' (replicate + repartition) every step — the
        round-1 dryrun logged exactly that for every replay['gt'] leaf
        (VERDICT weak item #2). The constraint applies at carry input,
        carry output, and initialization, so producer and consumer agree.
        """
        if tree is None or self.mesh is None:
            return tree
        from jax.sharding import NamedSharding, PartitionSpec as P

        axes = self.mesh.axis_names
        data_ax = "data" if "data" in axes else None
        space_ax = "space" if "space" in axes else None
        sp = self.mesh.shape[space_ax] if space_ax else 1

        def constrain(leaf):
            if leaf.ndim >= 3 and space_ax and sp > 1 \
                    and leaf.shape[1] % sp == 0:
                spec = P(data_ax, space_ax)
            else:
                spec = P(data_ax)
            return jax.lax.with_sharding_constraint(
                leaf, NamedSharding(self.mesh, spec))

        return jax.tree.map(constrain, tree)

    # ------------------------------------------------------------------
    # the train step
    # ------------------------------------------------------------------
    def make_train_step(self, evo: str):
        """Returns jitted step(params, opt_state, batch, step, replay) ->
        (params, opt_state, metrics, replay)."""
        if evo in self._step_fns:
            return self._step_fns[evo]
        cfg = self.config
        optimizer = self.make_optimizer(evo)
        trainable_names = TRAINABLE_NETS[evo]

        def prepare(batch):
            image1 = batch["IMAGE_PAIR"][..., :3]
            image2 = batch["IMAGE_PAIR"][..., 3:]
            image2_2 = ops.resize_area(image2, cfg.height // 4, cfg.width // 4)
            rotation = batch["MOTION"][:, :3]
            translation = batch["MOTION"][:, 3:]
            gt = L.prepare_ground_truth_tensors(
                batch["DEPTH"], rotation, translation, batch["INTRINSICS"])
            b = dict(batch)
            b["image1"] = image1
            b["image2_2"] = image2_2
            return b, gt

        def step_fn(params, opt_state, batch, step, replay=None):
            replay = self._constrain_replay(replay)
            b, gt = prepare(batch)
            frozen = {k: v for k, v in params.items() if k not in trainable_names}
            # schedules (loss-weight ramps, LR) count optimizer updates;
            # with gradient accumulation `step` counts micro-batches
            # (guarded so accum_steps=1 keeps the cached jaxpr unchanged)
            eff_step = step // cfg.accum_steps if cfg.accum_steps > 1 else step

            def loss_fn(trainable):
                full = {**frozen, **trainable}
                total, loss_dict, new_replay = self._evolution_losses(
                    evo, full, b, gt, eff_step, replay)
                return total, (loss_dict, new_replay)

            trainable = {k: params[k] for k in trainable_names}
            (total, (loss_dict, new_replay)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(trainable)
            updates, opt_state = optimizer.update(grads, opt_state, trainable)
            trainable = optax.apply_updates(trainable, updates)
            new_params = {**params, **trainable}
            new_replay = self._constrain_replay(new_replay)
            metrics = dict(loss_dict)
            metrics["total_loss"] = total
            metrics["learning_rate"] = demon_lr_schedule(
                eff_step.astype(jnp.float32),
                cfg.base_lr[evo], cfg.max_iter[evo])
            return new_params, opt_state, metrics, new_replay

        # donate params + opt state only. Donating the evo-4 replay carry
        # (argnum 4) was tried in round 3 and reverted: never a measured
        # win (neutral within noise when combined with the phased-bwd
        # experiment, 175 vs 174 samples/s; every measured combination of
        # that round's step-level changes regressed — BENCHMARKS.md
        # "evolution-4 profile attack"), and it breaks callers that
        # legitimately reuse a carry (bench warmup, tests).
        jitted = jax.jit(step_fn, donate_argnums=(0, 1))
        self._step_fns[evo] = jitted
        return jitted

    def init_opt_state(self, evo: str, params):
        trainable = {k: params[k] for k in TRAINABLE_NETS[evo]}
        return self.make_optimizer(evo).init(trainable)

    def init_replay(self, evo: str, params, batch):
        """Initialize the recycled-prediction carry by replicating the first
        batch 3x (reference training.py:304-320)."""
        if evo != "4_iterative" or not self.config.replay_recycled:
            return None
        cfg = self.config
        image1 = batch["IMAGE_PAIR"][..., :3]
        image2 = batch["IMAGE_PAIR"][..., 3:]
        image2_2 = ops.resize_area(image2, cfg.height // 4, cfg.width // 4)
        rotation = batch["MOTION"][:, :3]
        translation = batch["MOTION"][:, 3:]
        gt = L.prepare_ground_truth_tensors(
            batch["DEPTH"], rotation, translation, batch["INTRINSICS"])
        gt = {k: gt[k] for k in REPLAY_GT_KEYS}  # only what evo-4 reads
        data = {"IMAGE_PAIR": batch["IMAGE_PAIR"], "image2_2": image2_2,
                "INTRINSICS": batch["INTRINSICS"]}

        @jax.jit
        def _init(params, data, gt):
            f1 = self._apply_flow(params["netFlow1"], data["IMAGE_PAIR"])
            flow2, _ = _split_flowconf(f1["predict_flowconf2"])
            dm1 = self._apply_dm(params["netDM1"], data["IMAGE_PAIR"],
                                 data["image2_2"], flow2,
                                 f1["predict_flowconf2"])
            dm_state = {k: dm1[k] for k in
                        ("predict_depth2", "predict_normal2",
                         "predict_rotation", "predict_translation",
                         "predict_scale")}
            rep = lambda t: jnp.concatenate(
                [t] * (cfg.simulated_iterations - 1), axis=0)
            return self._constrain_replay({
                "data": jax.tree.map(rep, data),
                "gt": jax.tree.map(rep, gt),
                "dm": jax.tree.map(rep, dm_state),
            })

        return _init(params, data, gt)
