"""PBnet CVAE + PatchGAN training, TPU-native.

Capability parity with PBnet/src/train/train_cvae_ganloss_ann_eye.py
(1-D conv PatchGAN over pose sequences :51-88 with BCE real/fake, AdamW +
cosine for G and D, KL annealing from cae.py:66-85, grad clip 2.0) and
trainer_gan_ann.py (joint G+D backward per batch :63).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
import flax.linen as nn
from jax.flatten_util import ravel_pytree
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from dawn_tpu.models.pbnet import CVAE, PBnetParams


class PatchGAN1D(nn.Module):
    """1-D conv discriminator over (B, T, D) motion sequences (:51-74)."""
    base: int = 64

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = nn.Conv(self.base, (4,), strides=(2,), padding=1, name="conv1")(x)
        x = nn.leaky_relu(x, 0.2)
        x = nn.Conv(self.base * 2, (4,), strides=(2,), padding=1, name="conv2")(x)
        x = nn.LayerNorm(name="norm2")(x)
        x = nn.leaky_relu(x, 0.2)
        x = nn.Conv(self.base * 4, (4,), strides=(1,), padding=1, name="conv3")(x)
        x = nn.LayerNorm(name="norm3")(x)
        x = nn.leaky_relu(x, 0.2)
        return nn.Conv(1, (4,), strides=(1,), padding=1, name="conv4")(x)


@dataclasses.dataclass
class PBnetTrainConfig:
    lr: float = 1e-4
    total_steps: int = 100_000
    grad_clip: float = 2.0
    gan_weight: float = 1.0
    kind: str = "pose"       # 'pose' (6-d) | 'blink' (2-d)


class PBnetTrainer:
    def __init__(self, config: PBnetTrainConfig = PBnetTrainConfig(),
                 hp: Optional[PBnetParams] = None):
        self.config = config
        if hp is None:
            dims = dict(pose=(6, 0), blink=(2, 0))[config.kind]
            hp = PBnetParams(pos_dim=dims[0], eye_dim=dims[1])
        self.model = CVAE(hp, deterministic=False)
        self.disc = PatchGAN1D()
        sched = optax.cosine_decay_schedule(config.lr, config.total_steps)
        self.tx_g = optax.chain(optax.clip_by_global_norm(config.grad_clip),
                                optax.adamw(sched))
        self.tx_d = optax.chain(optax.clip_by_global_norm(config.grad_clip),
                                optax.adamw(sched))

    def init_state(self, rng: jax.Array, num_frames: int = 8) -> Dict[str, Any]:
        r1, r2 = jax.random.split(rng)
        gvars = self.model.init_variables(r1, num_frames)
        dvars = self.disc.init(
            r2, jnp.zeros((1, num_frames, self.model.hp.feature_dim)))
        g_flat, g_unravel = ravel_pytree(gvars)
        d_flat, d_unravel = ravel_pytree(dvars)
        self._g_unravel, self._d_unravel = g_unravel, d_unravel
        return {"g": g_flat, "d": d_flat,
                "opt_g": self.tx_g.init(g_flat), "opt_d": self.tx_d.init(d_flat),
                "step": jnp.zeros((), jnp.int32)}

    # ----------------------------------------------------------------- loss
    def g_loss(self, g_flat, d_flat, rng, batch, epoch):
        """CVAE mixed loss + generator GAN loss (trainer_gan_ann.py:27-63).

        batch may carry 'lengths' (B,) from collate_padded: losses are then
        masked to valid frames (reference computes on x[mask],
        tools/losses.py:9-21) and the decoder zeroes padded outputs exactly
        like the torch modules do (output[~mask] = 0).
        """
        gvars = self._g_unravel(g_flat)
        dvars = self._d_unravel(d_flat)
        x, y = batch["x"], batch["hubert"]
        mask = None
        if "lengths" in batch:
            mask = jnp.arange(x.shape[1])[None, :] < batch["lengths"][:, None]
        r1, r2 = jax.random.split(rng)
        out = self.model.forward(
            {k: v for k, v in gvars.items()}, r1, x, y, mask)
        x_delta = x - x[:, :1]
        if mask is not None:
            x_delta = x_delta * mask[..., None]   # collate zero-pads x; keep
                                                  # real/fake identically padded
        mixed, losses = self.model.compute_loss(out, x_delta, mask, epoch)
        fake_logits = self.disc.apply(dvars, out["output"])
        g_gan = optax.sigmoid_binary_cross_entropy(
            fake_logits, jnp.ones_like(fake_logits)).mean()
        total = mixed + self.config.gan_weight * g_gan
        losses["g_gan"] = g_gan
        return total, (losses, out["output"])

    def d_loss(self, d_flat, real, fake):
        dvars = self._d_unravel(d_flat)
        rl = self.disc.apply(dvars, real)
        fl = self.disc.apply(dvars, jax.lax.stop_gradient(fake))
        return (optax.sigmoid_binary_cross_entropy(rl, jnp.ones_like(rl)).mean()
                + optax.sigmoid_binary_cross_entropy(fl, jnp.zeros_like(fl)).mean())

    # ----------------------------------------------------------------- step
    def train_step(self, state, rng, batch, epoch: int = 0):
        (g_total, (metrics, fake)), g_grads = jax.value_and_grad(
            self.g_loss, has_aux=True)(state["g"], state["d"], rng, batch, epoch)
        gu, opt_g = self.tx_g.update(g_grads, state["opt_g"], state["g"])
        g = state["g"] + gu

        x_delta = batch["x"] - batch["x"][:, :1]
        if "lengths" in batch:
            m = (jnp.arange(x_delta.shape[1])[None, :]
                 < batch["lengths"][:, None])
            x_delta = x_delta * m[..., None]
        d_total, d_grads = jax.value_and_grad(self.d_loss)(
            state["d"], x_delta, fake)
        du, opt_d = self.tx_d.update(d_grads, state["opt_d"], state["d"])
        d = state["d"] + du

        metrics = dict(metrics)
        metrics["d_loss"] = d_total
        metrics["g_total"] = g_total
        return {"g": g, "d": d, "opt_g": opt_g, "opt_d": opt_d,
                "step": state["step"] + 1}, metrics

    def make_sharded_step(self, mesh: Mesh, with_lengths: bool = False):
        rep = NamedSharding(mesh, P())
        data = NamedSharding(mesh, P("data"))
        batch_sh = {"x": data, "hubert": data}
        if with_lengths:
            batch_sh["lengths"] = data
        # epoch is TRACED (compute_loss's annealing is jnp-based) — a static
        # epoch would recompile the step for every distinct value
        return jax.jit(self.train_step,
                       in_shardings=(rep, rep, batch_sh, rep),
                       donate_argnums=(0,))
