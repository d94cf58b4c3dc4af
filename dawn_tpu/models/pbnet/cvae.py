"""PBnet CVAE: model type, losses, generation API, and the archi factory.

Capability parity with PBnet/src/models/modeltype/{cae,cvae}.py and
get_model.py: forward = encode -> reparameterize -> decode; ``generate`` draws
per-frame z ~ N(0,1) and decodes pose/blink drives from audio (cae.py:112-166
— the API the unified pipeline calls); loss aggregation with KL annealing
(cae.py:66-85); the modelname/opt.yaml-driven factory (get_model.py:19-35).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Mapping, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from dawn_tpu.models.pbnet.architectures import (
    DecoderFC, DecoderGRU, DecoderTransformerReemb6,
    EncoderFC, EncoderGRU, EncoderTransformerReemb6,
)
from dawn_tpu.models.pbnet.architectures_vanilla import (
    DecoderAutotransAudio, DecoderMLP, DecoderTransformer, EncoderMLP,
)

# the reference registry (get_model.py:16) plus 'mlp' (mlp.py exists in the
# reference architectures dir and loads through its importlib factory even
# though it is missing from the ARCHINAMES constant). The reemb5/6 family is
# what the released checkpoints use: reemb5 = joint pose+eye with a ±200 eval
# window, reemb6 = separate pose / blink with a ±100 window; reemb7/8 /
# transformermel (whose modules are ABSENT from the reference repo — the
# shipped run script names reemb8, run_cvae_h_ann_reemb_rope_eye_3.sh:17)
# resolve to reemb6-compatible builds: there is nothing upstream to port, and
# a reemb8 checkpoint's opt.yaml carries reemb6-family hyperparameters.
ARCHINAMES = ("fc", "gru", "mlp", "transformer", "transformerreemb5",
              "transformerreemb6", "transformerreemb7", "transformerreemb8",
              "transformermel", "transgru", "grutrans", "autotrans")
MODELTYPES = ("cae", "cvae")

# archiname -> (encoder cls, decoder cls, eval window, latent contract).
# latent contract: 'frame' = per-frame z (B, T, latent_dim); 'seq' = one
# sequence-level z whose width is named by the 5th element.
_ARCH_TABLE = {
    "transformerreemb5": (EncoderTransformerReemb6, DecoderTransformerReemb6, 200, "frame", None),
    "transformerreemb6": (EncoderTransformerReemb6, DecoderTransformerReemb6, 100, "frame", None),
    "transformerreemb7": (EncoderTransformerReemb6, DecoderTransformerReemb6, 100, "frame", None),
    "transformerreemb8": (EncoderTransformerReemb6, DecoderTransformerReemb6, 100, "frame", None),
    "gru": (EncoderGRU, DecoderGRU, None, "frame", None),
    "fc": (EncoderFC, DecoderFC, None, "frame", None),
    # faithful ports of the reference ablation modules (architectures_vanilla)
    "transformer": (EncoderTransformerReemb6, DecoderTransformer, None, "frame", None),
    "mlp": (EncoderMLP, DecoderMLP, None, "seq", "ff_size"),
    "autotrans": (EncoderTransformerReemb6, DecoderAutotransAudio, None, "frame", None),
    # upstream transgru.py / grutrans.py pair an audio-interface half with an
    # ACTOR class-interface half and are not runnable on DAWN data as-is
    # (DEVIATIONS.md); the factory pairs the DAWN-compatible halves instead.
    "transgru": (EncoderTransformerReemb6, DecoderGRU, None, "frame", None),
    "grutrans": (EncoderGRU, DecoderTransformer, None, "frame", None),
    # module absent upstream; reemb6-compatible build (see ARCHINAMES note)
    "transformermel": (EncoderTransformerReemb6, DecoderTransformerReemb6, None, "frame", None),
}


def _filter_kwargs(cls, kw):
    names = {f.name for f in dataclasses.fields(cls)}
    return {k: v for k, v in kw.items() if k in names}


def parse_modelname(modelname: str):
    """'{modeltype}_{archiname}_{loss1}_{loss2}...' -> parts
    (parser/model.py:30-44)."""
    modeltype, archiname, *losses = modelname.split("_")
    if modeltype not in MODELTYPES:
        raise NotImplementedError(f"model type {modeltype!r}")
    if archiname not in ARCHINAMES:
        raise NotImplementedError(f"architecture {archiname!r}")
    if not losses:
        raise NotImplementedError("at least one loss is required")
    return modeltype, archiname, losses


@dataclasses.dataclass
class PBnetParams:
    """Hyperparameters, constructable from a PBnet opt.yaml dict."""
    pos_dim: int = 6
    eye_dim: int = 0
    audio_dim: int = 1024
    latent_dim: int = 256          # == audio_latent_dim in the archi
    pose_latent_dim: int = 64
    ff_size: int = 128
    num_layers: int = 2
    num_heads: int = 4
    num_buckets: int = 128
    max_distance: int = 128
    dropout: float = 0.1
    archiname: str = "transformerreemb6"
    num_frames: int = 40           # fixed seq_len (only the mlp arch uses it)
    lambdas: Mapping[str, float] = dataclasses.field(
        default_factory=lambda: {"rc": 1.0, "kl": 1.0, "reg": 0.1})

    @classmethod
    def from_opt(cls, opt: Mapping[str, Any]) -> "PBnetParams":
        """Build from a loaded opt.yaml (parser/training.py save_args layout).

        The reference merges eye/pose dims at load time
        (unified_video_generator.py:79-92): pose model gets pos_dim=6
        eye_dim=0, blink model pos_dim=0 eye_dim=2.
        """
        def g(key, default):
            return opt.get(key, default)
        return cls(
            pos_dim=int(g("pos_dim", 6)),
            eye_dim=int(g("eye_dim", 0)),
            audio_dim=int(g("audio_dim", 1024)),
            # the knob the reference archis actually consume is
            # audio_latent_dim (transformerreemb6.py:148,159 — the parser's
            # latent_dim is unused by the reemb family); fall back to
            # latent_dim for hand-written opts
            latent_dim=int(g("audio_latent_dim", g("latent_dim", 256))),
            ff_size=int(g("ff_size", 128)),
            num_layers=int(g("num_layers", 2)),
            num_heads=int(g("num_heads", 4)),
            num_buckets=int(g("num_buckets", 128)),
            max_distance=int(g("max_distance", 128)),
            dropout=float(g("dropout", 0.1)),
            archiname=g("archiname", "transformerreemb6"),
            num_frames=int(g("num_frames", 40)),
            lambdas=g("lambdas", {"rc": 1.0, "kl": 1.0, "reg": 0.1}),
        )

    @property
    def feature_dim(self) -> int:
        """The pose-or-blink feature width the model generates.

        The reference encodes eye ratios through the same pos slots
        (transformerreemb6 sets self.eye_dim = 0 and pos_dim carries either
        6-d pose or 2-d blink).
        """
        return self.pos_dim + self.eye_dim


class CVAE:
    """Functional CVAE over the reemb architecture family."""

    def __init__(self, params: PBnetParams, deterministic: bool = True):
        if params.archiname not in ARCHINAMES:
            raise NotImplementedError(
                f"archiname {params.archiname!r} is not in the reference "
                f"registry {ARCHINAMES}")
        self.hp = params
        self.deterministic = deterministic
        enc_cls, dec_cls, eval_window, self.latent_kind, lat_attr = \
            _ARCH_TABLE[params.archiname]
        kw = dict(pos_dim=params.feature_dim, audio_dim=params.audio_dim,
                  pose_latent_dim=params.pose_latent_dim,
                  audio_latent_dim=params.latent_dim, ff_size=params.ff_size,
                  num_layers=params.num_layers, num_heads=params.num_heads,
                  dropout=params.dropout, deterministic=deterministic,
                  num_frames=params.num_frames,
                  num_buckets=params.num_buckets,
                  max_distance=params.max_distance, eval_window=eval_window)
        self.encoder = enc_cls(**_filter_kwargs(enc_cls, kw))
        self.decoder = dec_cls(**_filter_kwargs(dec_cls, kw))
        self.latent_width = (params.latent_dim if lat_attr is None
                             else getattr(params, lat_attr))

    def _z_shape(self, b: int, t: int) -> Tuple[int, ...]:
        if self.latent_kind == "seq":
            return (b, self.latent_width)
        return (b, t, self.latent_width)

    def init_variables(self, rng: jax.Array, num_frames: int = 8) -> Dict[str, Any]:
        if self.hp.archiname == "mlp":
            num_frames = self.hp.num_frames   # the mlp arch is fixed-length
        r1, r2 = jax.random.split(rng)
        d = self.hp.feature_dim
        x = jnp.zeros((1, num_frames, d))
        y = jnp.zeros((1, num_frames, self.hp.audio_dim))
        z = jnp.zeros(self._z_shape(1, num_frames))
        enc = self.encoder.init(r1, x, y)
        dec = self.decoder.init(r2, x, z, y)
        return {"encoder": enc, "decoder": dec}

    # ------------------------------------------------------------------ api
    def encode(self, variables, x, y, mask=None, dropout_rng=None):
        rngs = None if dropout_rng is None else {"dropout": dropout_rng}
        return self.encoder.apply(variables["encoder"], x, y, mask, rngs=rngs)

    def decode(self, variables, x, z, y, mask=None, dropout_rng=None):
        rngs = None if dropout_rng is None else {"dropout": dropout_rng}
        return self.decoder.apply(variables["decoder"], x, z, y, mask,
                                  rngs=rngs)

    def forward(self, variables, rng, x, y, mask=None):
        """Training forward: encode -> reparameterize -> decode (cvae.py:20-38)."""
        r_z, r_enc, r_dec = jax.random.split(rng, 3)
        drop = not self.deterministic
        enc = self.encode(variables, x, y, mask,
                          dropout_rng=r_enc if drop else None)
        std = jnp.exp(0.5 * enc["logvar"])
        z = enc["mu"] + std * jax.random.normal(r_z, enc["mu"].shape)
        out = self.decode(variables, x, z, y, mask,
                          dropout_rng=r_dec if drop else None)
        return {"output": out, "z": z, **enc}

    def generate(self, variables, rng, init_state, audio, lengths=None,
                 fact: float = 1.0):
        """Inference: z ~ N(0,1) per frame, decode drives (cae.py:112-166).

        init_state: (B, D) normalized first-frame pose (or blink);
        audio: (B, T, 1024). Returns Δ-drives (B, T, D); the caller adds the
        init state and de-normalizes (unified_video_generator.py:294-296).
        """
        b, t, _ = audio.shape
        mask = None
        if lengths is not None:
            mask = jnp.arange(t)[None, :] < lengths[:, None]
        z = fact * jax.random.normal(rng, self._z_shape(b, t))
        x = jnp.broadcast_to(init_state[:, None], (b, t, init_state.shape[-1]))
        if self.hp.archiname == "autotrans":
            # the ACTOR decoder generates autoregressively (autotrans.py:156)
            from dawn_tpu.models.pbnet.architectures_vanilla import (
                DecoderAutotransAudio, make_autotrans_core)
            m = mask if mask is not None else jnp.ones((b, t), bool)
            zm, yv, lengths = self.decoder.apply(
                variables["decoder"], z, audio, m,
                method=DecoderAutotransAudio.prep)
            core = make_autotrans_core(self.decoder)
            core_vars = {"params": variables["decoder"]["params"]["core"]}
            return core.generate(core_vars, zm, yv, m, lengths).reshape(
                b, t, -1)
        return self.decode(variables, x, z, audio, mask)

    # ---------------------------------------------------------------- losses
    def compute_loss(self, batch_out: Dict[str, jax.Array], x_delta: jax.Array,
                     mask: Optional[jax.Array], epoch: int = 0,
                     rng: Optional[jax.Array] = None,
                     encode_fn=None,
                     ) -> Tuple[jax.Array, Dict[str, jax.Array]]:
        """Mixed loss with KL annealing (cae.py:66-85).

        Every loss name from the reference registry (losses.py `_matching_`:
        rc, rcw, reg, kl, ssim, var, mmd, hp) is supported via
        ``dawn_tpu.models.pbnet.losses``. KL annealing replicates cae.py:72-76
        exactly, oddities included: FULL weight at epoch 0, ZERO for epochs
        1..1e4-1, full again from 1e4 (max(epoch-1e4, 7e4)/7e4 == 1 up to
        epoch 8e4), then growing without bound beyond 8e4.
        ``mmd``/``hp`` need ``rng``; ``hp`` additionally needs ``encode_fn``
        (x -> latent, the reference's model.return_latent).
        """
        from dawn_tpu.models.pbnet import losses as L

        hp = self.hp
        out = batch_out["output"]
        m = jnp.ones(out.shape[:2], out.dtype) if mask is None else mask.astype(out.dtype)

        losses = {}
        for name in hp.lambdas:
            if name == "kl":
                # traced-compatible so the train step can pass the live
                # epoch without a static-arg recompile per value
                ep = jnp.asarray(epoch, jnp.float32)
                anneal = jnp.where(
                    ep == 0, 1.0,
                    jnp.where(ep < 1e4, 0.0,
                              jnp.maximum(ep - 1e4, 7e4) / 7e4))
                if batch_out["mu"].ndim == 2:   # sequence-level latent (mlp)
                    kl = -0.5 * (1.0 + batch_out["logvar"]
                                 - jnp.square(batch_out["mu"])
                                 - jnp.exp(batch_out["logvar"]))
                    losses["kl"] = anneal * kl.mean()
                else:
                    losses["kl"] = anneal * L.kl_loss(
                        batch_out["mu"], batch_out["logvar"], m)
            elif name == "mmd":
                losses["mmd"] = L.mmd_loss(batch_out["z"], rng)
            elif name == "hp":
                losses["hp"] = L.hessian_penalty(rng, encode_fn, x_delta)
            else:
                losses[name] = L.get_loss_function(name)(out, x_delta, m)
        mixed = sum(hp.lambdas[k] * v for k, v in losses.items())
        losses["mixed"] = mixed
        return mixed, losses


def build_pbnet(opt: Mapping[str, Any], deterministic: bool = True) -> CVAE:
    """Factory mirroring get_model.py: opt.yaml dict -> CVAE instance."""
    return CVAE(PBnetParams.from_opt(opt), deterministic=deterministic)


def get_model(parameters: Mapping[str, Any], deterministic: bool = True) -> CVAE:
    """Reference get_model parity (get_model.py:19-35): a parameters dict
    carrying ``modelname`` (e.g. 'cvae_transformerreemb6_rc_kl_reg') plus
    hyperparameters; loss weights come from ``lambda_<loss>`` keys (default 1,
    reg 0.1 — parser/model.py:8-13)."""
    parameters = dict(parameters)
    if "modelname" in parameters:
        modeltype, archiname, losses = parse_modelname(parameters["modelname"])
        if modeltype != "cvae":
            raise NotImplementedError("only the cvae modeltype is deployed")
        parameters["archiname"] = archiname
        parameters.setdefault("lambdas", {
            loss: float(parameters.get(
                f"lambda_{loss}", 0.1 if loss == "reg" else 1.0))
            for loss in losses})
    return build_pbnet(parameters, deterministic=deterministic)
