"""LFG (flow autoencoder) training: reconstruction + equivariance, TPU-native.

Capability parity with LFG/train.py (Adam lr 2e-4 betas 0.5/0.999 over
generator + region predictor + bg predictor, multi-epoch cosine-free schedule
with milestone decay per config), LFG/modules/model.py ReconstructionModel
(:141-216: multi-scale VGG19 perceptual pyramid loss with per-layer weights,
equivariance-shift and equivariance-affine losses under a random thin-plate-
spline warp) and config/hdtf128.yaml train_params.

TPU redesign: one jitted SPMD step, batch sharded over 'data'. Cross-replica
sync-BN is AUTOMATIC under jit/GSPMD: the batch is one logical array, so the
plain BN mean/var over it are global and XLA inserts the collective — exactly
the reference SyncMaster math with zero code. (SyncBatchNorm's explicit psum
via ``sync_bn_axis`` exists for pmap/shard_map contexts only.) The random TPS
transform and its jacobian are closed-form (no autograd double-backward like
model.py:129).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from dawn_tpu.models.lfg.flow_ae import FlowAE
from dawn_tpu.models.lfg.vgg import Vgg19Features
from dawn_tpu.models.lfg.warp import anti_alias_downsample, make_coordinate_grid
from dawn_tpu.ops.resample import grid_sample


# ------------------------------------------------------------- random warps

def random_tps_params(rng: jax.Array, batch: int, sigma_affine: float = 0.05,
                      sigma_tps: float = 0.005, points_tps: int = 5):
    """Random affine + TPS control weights (model.py Transform.__init__)."""
    r1, r2, r3 = jax.random.split(rng, 3)
    noise = jax.random.normal(r1, (batch, 2, 3)) * sigma_affine
    theta = noise + jnp.eye(2, 3)[None]
    cp = make_coordinate_grid(points_tps, points_tps)
    control_points = cp.reshape(-1, 2)                        # (K, 2)
    control_params = jax.random.normal(
        r2, (batch, 1, points_tps ** 2)) * sigma_tps
    return theta, control_points, control_params


def tps_warp_coordinates(coords: jax.Array, theta: jax.Array,
                         control_points: jax.Array,
                         control_params: jax.Array) -> jax.Array:
    """Transform coordinates (model.py:107-127). coords (B, N, 2)."""
    transformed = (jnp.einsum("bij,bnj->bni", theta[:, :, :2], coords)
                   + theta[:, :, 2][:, None])
    d = coords[:, :, None, :] - control_points[None, None]    # (B, N, K, 2)
    dist = jnp.abs(d).sum(-1)
    kern = dist ** 2 * jnp.log(dist + 1e-6)                   # TPS radial kernel
    # scalar TPS displacement added to both coordinates (model.py:117-126)
    tps = (kern * control_params).sum(axis=-1)[..., None]     # (B, N, 1)
    return transformed + tps


# ---------------------------------------------------------------- trainer

@dataclasses.dataclass
class LFGTrainConfig:
    img_size: int = 128
    lr: float = 2e-4
    scales: Tuple[float, ...] = (1, 0.5, 0.25, 0.125)
    perceptual_weights: Tuple[float, ...] = (10, 10, 10, 10, 10)
    equivariance_shift: float = 10.0
    equivariance_affine: float = 10.0
    sigma_affine: float = 0.05
    sigma_tps: float = 0.005
    points_tps: int = 5
    epoch_milestones: Tuple[int, ...] = (60, 90)
    steps_per_epoch: int = 0  # 0 disables the milestone decay (constant lr)
    milestone_gamma: float = 0.1
    sync_bn_axis: Optional[str] = None  # explicit psum axis — ONLY for
                                        # pmap/shard_map; under plain
                                        # jit/GSPMD leave None (batch stats
                                        # are already global, the axis name
                                        # would be unbound)


class LFGTrainer:
    def __init__(self, config: LFGTrainConfig = LFGTrainConfig(),
                 flow_ae: Optional[FlowAE] = None):
        self.config = config
        bn = dict(train_bn=True, bn_axis=config.sync_bn_axis)
        self.flow_ae = flow_ae or FlowAE(
            generator_kw=bn, region_kw=bn, bg_kw=bn, flow_kw=bn)
        self.vgg = Vgg19Features()
        if config.steps_per_epoch and config.epoch_milestones:
            # torch MultiStepLR(milestones=epoch_milestones, gamma)
            # (LFG/train.py:59), converted to steps
            lr = optax.piecewise_constant_schedule(
                config.lr,
                {m * config.steps_per_epoch: config.milestone_gamma
                 for m in config.epoch_milestones})
        else:
            lr = config.lr
        self.tx = optax.adam(lr, b1=0.5, b2=0.999)

    def init_state(self, rng: jax.Array, vgg_variables=None) -> Dict[str, Any]:
        cfg = self.config
        r1, r2 = jax.random.split(rng)
        variables = self.flow_ae.init_variables(r1, cfg.img_size)
        if vgg_variables is None:
            vgg_variables = self.vgg.init(
                r2, jnp.zeros((1, cfg.img_size, cfg.img_size, 3)))
        params = {k: v["params"] for k, v in variables.items()}
        stats = {k: v.get("batch_stats", {}) for k, v in variables.items()}
        return {"params": params, "batch_stats": stats,
                "opt_state": self.tx.init(params),
                "step": jnp.zeros((), jnp.int32),
                "vgg": vgg_variables}

    # ----------------------------------------------------------------- loss
    def _perceptual(self, vgg_vars, pred: jax.Array, gt: jax.Array) -> jax.Array:
        """Multi-scale VGG pyramid L1 (model.py:178-187)."""
        cfg = self.config
        total = 0.0
        for scale in cfg.scales:
            p = anti_alias_downsample(pred, scale)
            g = anti_alias_downsample(gt, scale)
            fp = self.vgg.apply(vgg_vars, p)
            fg = self.vgg.apply(vgg_vars, g)
            for w, a, b in zip(cfg.perceptual_weights, fp, fg):
                total = total + w * jnp.abs(a - jax.lax.stop_gradient(b)).mean()
        return total

    def loss_fn(self, params, batch_stats, vgg_vars, rng, batch):
        """batch: source (B,H,W,3), driving (B,H,W,3) in [0,1]."""
        cfg = self.config
        src, drv = batch["source"], batch["driving"]
        b = src.shape[0]

        # live copy: each forward reads the PREVIOUS forward's running stats
        # and persists its own — the region predictor runs three times per
        # step (src, drv, TPS-transformed) and all three must update the
        # running mean/var sequentially, exactly like the torch reference's
        # consecutive forwards (overwriting would keep only the last,
        # TPS-warped, distribution)
        mutables = {k: batch_stats[k] for k in params}

        def apply_mod(mod, name, *args, method=None):
            out, mut = mod.apply(
                {"params": params[name], "batch_stats": mutables[name]},
                *args, method=method, mutable=["batch_stats"])
            mutables[name] = mut["batch_stats"]
            return out

        fa = self.flow_ae
        src_params = apply_mod(fa.region_predictor, "region_predictor", src)
        drv_params = apply_mod(fa.region_predictor, "region_predictor", drv)
        bg = apply_mod(fa.bg_predictor, "bg_predictor", src, drv)
        motion = apply_mod(fa.flow_predictor, "pixelwise_flow_predictor",
                           src, drv_params, src_params, bg)
        out = apply_mod(fa.generator, "generator", src, motion)

        losses = {"perceptual": self._perceptual(vgg_vars, out["prediction"], drv)}

        # equivariance under a random TPS warp (model.py:189-215)
        theta, cp, cw = random_tps_params(rng, b, cfg.sigma_affine,
                                         cfg.sigma_tps, cfg.points_tps)
        h, w = drv.shape[1:3]
        grid = make_coordinate_grid(h, w).reshape(1, -1, 2)
        grid = jnp.broadcast_to(grid, (b, h * w, 2))
        warped_grid = tps_warp_coordinates(grid, theta, cp, cw)
        transformed = grid_sample(drv, warped_grid.reshape(b, h, w, 2))
        trans_params = apply_mod(fa.region_predictor, "region_predictor",
                                 transformed)

        # shift equivariance: driving shift == warp(transformed shift)
        recovered = tps_warp_coordinates(trans_params["shift"], theta, cp, cw)
        losses["equivariance_shift"] = (
            cfg.equivariance_shift * jnp.abs(drv_params["shift"] - recovered).mean())

        if "affine" in drv_params and cfg.equivariance_affine > 0:
            # affine equivariance via the warp jacobian at the region centers
            def jac_at(points):  # (B, R, 2) -> (B, R, 2, 2)
                def f(c, th, cpts, cwts):
                    return tps_warp_coordinates(c[None, None], th[None],
                                                cpts, cwts[None])[0, 0]
                return jax.vmap(lambda pts, th, cwts: jax.vmap(
                    lambda p: jax.jacfwd(lambda q: f(q, th, cp, cwts))(p)
                )(pts))(points, theta, cw)

            jac = jac_at(trans_params["shift"])
            affine_t = jnp.matmul(jac, trans_params["affine"])
            normed = jnp.matmul(jnp.linalg.inv(drv_params["affine"]), affine_t)
            eye = jnp.eye(2)
            losses["equivariance_affine"] = (
                cfg.equivariance_affine * jnp.abs(eye - normed).mean())

        total = sum(losses.values())
        losses["total"] = total
        return total, (losses, mutables)

    def train_step(self, state, rng, batch):
        grads, (metrics, new_stats) = jax.grad(
            self.loss_fn, has_aux=True)(state["params"], state["batch_stats"],
                                        state["vgg"], rng, batch)
        updates, opt_state = self.tx.update(grads, state["opt_state"],
                                            state["params"])
        params = optax.apply_updates(state["params"], updates)
        return {**state, "params": params, "opt_state": opt_state,
                "batch_stats": new_stats,
                "step": state["step"] + 1}, metrics

    def make_sharded_step(self, mesh: Mesh):
        rep = NamedSharding(mesh, P())
        data = NamedSharding(mesh, P("data"))
        return jax.jit(self.train_step,
                       in_shardings=(rep, rep, {"source": data, "driving": data}),
                       donate_argnums=(0,))
