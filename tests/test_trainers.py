"""Trainer smoke tests on tiny shapes + 8-device sharded step.

Covers: DMTrainer (loss, NaN guard, EMA, snapshot panels), LFGTrainer,
PBnetTrainer — each one jitted step on the virtual 8-CPU mesh from conftest.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp


def _tiny_flow_ae():
    from dawn_tpu.models.lfg.flow_ae import FlowAE
    return FlowAE(
        generator_kw=dict(block_expansion=8, max_features=32,
                          num_bottleneck_blocks=1),
        region_kw=dict(block_expansion=4, max_features=16, num_blocks=2),
        bg_kw=dict(block_expansion=4, max_features=16, num_blocks=2),
        flow_kw=dict(block_expansion=4, max_features=16, num_blocks=2))


@pytest.fixture(scope="module")
def dm_setup():
    from dawn_tpu.train.train_dm import DMTrainer, DMTrainConfig
    from dawn_tpu.models.dm.unet3d import Unet3D

    cfg = DMTrainConfig(img_size=32, fea_channels=32, color_jitter=False,
                        ema_decay=0.99)
    trainer = DMTrainer(cfg, flow_ae=_tiny_flow_ae())
    trainer.unet = Unet3D(dim=16, dim_mults=(1, 2),
                          channels=trainer.in_channels, cond_pose=6,
                          win_width=2)
    b, t, s = 2, 4, cfg.img_size
    r = np.random.RandomState(0)
    batch = {
        "video": jnp.asarray(r.rand(b, t, s, s, 3) * 255, jnp.float32),
        "hubert": jnp.asarray(r.randn(b, t, 1024), jnp.float32),
        "pose": jnp.asarray(r.randn(b, t, 6), jnp.float32),
        "blink": jnp.asarray(r.rand(b, t, 2), jnp.float32),
        "bbox": jnp.asarray(
            np.tile([s * .25, s * .75, s * .25, s * .75, s, s], (b, 1)),
            jnp.float32),
        "mouth_lmk": jnp.asarray(r.rand(b, t, 19, 2) * s, jnp.float32),
    }
    state = trainer.init_state(jax.random.PRNGKey(0), num_frames=t)
    return trainer, state, batch


class TestDMTrainer:
    def test_step_updates_and_ema(self, dm_setup):
        trainer, state, batch = dm_setup
        new_state, metrics = trainer.train_step(state, jax.random.PRNGKey(1),
                                                batch)
        assert np.isfinite(float(metrics["total"]))
        assert float(metrics["grads_finite"]) == 1.0
        assert not np.allclose(np.asarray(new_state["params"]),
                               np.asarray(state["params"]))
        # EMA moved a little toward the new params
        d = trainer.config.ema_decay
        expect = np.asarray(state["params"]) * d + \
            np.asarray(new_state["params"]) * (1 - d)
        assert np.allclose(np.asarray(new_state["ema_params"]), expect,
                           atol=1e-5)

    def test_nan_guard_rolls_back_whole_step(self, dm_setup):
        """A non-finite-grad step must leave params AND the optimizer state
        (Adam moments, schedule count) untouched — the reference skips
        optimizer.step entirely (_s2.py:326-339); decaying the moments with
        zero grads would distort the first finite step afterwards."""
        trainer, state, batch = dm_setup
        # one finite step first so the moments are non-trivial
        state1, _ = trainer.train_step(state, jax.random.PRNGKey(1), batch)
        poisoned = dict(batch)
        poisoned["video"] = batch["video"].at[0, 0, 0, 0, 0].set(jnp.nan)
        state2, metrics = trainer.train_step(state1, jax.random.PRNGKey(2),
                                             poisoned)
        assert float(metrics["grads_finite"]) == 0.0
        assert np.array_equal(np.asarray(state2["params"]),
                              np.asarray(state1["params"]))
        for new, old in zip(jax.tree_util.tree_leaves(state2["opt_state"]),
                            jax.tree_util.tree_leaves(state1["opt_state"])):
            assert np.array_equal(np.asarray(new), np.asarray(old))

    def test_ema_buffer_not_aliased(self, dm_setup):
        """make_sharded_step donates the state pytree; params and ema must be
        distinct buffers or Execute() rejects the donation ("donate the same
        buffer twice"). The full sharded step is exercised by
        __graft_entry__.dryrun_multichip."""
        trainer, state, _ = dm_setup
        assert (state["ema_params"].unsafe_buffer_pointer()
                != state["params"].unsafe_buffer_pointer())

    def test_stage2_frame0_split(self):
        """Stage 2: frame 0 is the init condition, NOT part of the diffused
        clip (rand_6D.py:249-250); condition rows drop frame 0 but keep the
        frame-0 deltas; mouth landmarks keep the reference's :t-1 slice
        (train..._s2.py:290)."""
        from dawn_tpu.train.train_dm import DMTrainer, DMTrainConfig

        cfg = DMTrainConfig(img_size=32, fea_channels=32, color_jitter=False,
                            stage=2, ema_decay=None)
        trainer = DMTrainer(cfg, flow_ae=_tiny_flow_ae())
        b, t, s = 1, 5, cfg.img_size
        r = np.random.RandomState(3)
        batch = {
            "video": jnp.asarray(r.rand(b, t, s, s, 3) * 255, jnp.float32),
            "hubert": jnp.asarray(r.randn(b, t, 1024), jnp.float32),
            "pose": jnp.asarray(r.randn(b, t, 6), jnp.float32),
            "blink": jnp.asarray(r.rand(b, t, 2), jnp.float32),
            "mouth_lmk": jnp.asarray(r.rand(b, t, 19, 2) * s, jnp.float32),
        }
        video, ref_img, cond, mouth = trainer.prepare_inputs(
            jax.random.PRNGKey(0), batch)
        assert video.shape[1] == t - 1
        assert np.allclose(np.asarray(ref_img),
                           np.asarray(batch["video"][:, 0]) / 255.0)
        assert np.allclose(np.asarray(video[:, 0]),
                           np.asarray(batch["video"][:, 1]) / 255.0)
        # condition row i corresponds to frame i+1, deltas still vs frame 0
        exp_dpose = np.asarray(batch["pose"][:, 2] - batch["pose"][:, 0])
        assert np.allclose(np.asarray(cond[:, 1, 1024:1030]), exp_dpose,
                           atol=1e-6)
        assert mouth.shape[1] == t - 1
        assert np.allclose(np.asarray(mouth),
                           np.asarray(batch["mouth_lmk"][:, :-1]))

    def test_stage2_loss_shapes(self):
        """A full stage-2 train step runs and the UNet sees t-1 frames."""
        from dawn_tpu.train.train_dm import DMTrainer, DMTrainConfig
        from dawn_tpu.models.dm.unet3d import Unet3D

        cfg = DMTrainConfig(img_size=32, fea_channels=32, color_jitter=False,
                            stage=2, ema_decay=None)
        trainer = DMTrainer(cfg, flow_ae=_tiny_flow_ae())
        trainer.unet = Unet3D(dim=8, dim_mults=(1, 2),
                              channels=trainer.in_channels, cond_pose=6,
                              win_width=2, attn_heads=2, attn_dim_head=8)
        b, t, s = 1, 4, cfg.img_size
        r = np.random.RandomState(4)
        batch = {
            "video": jnp.asarray(r.rand(b, t, s, s, 3) * 255, jnp.float32),
            "hubert": jnp.asarray(r.randn(b, t, 1024), jnp.float32),
            "pose": jnp.asarray(r.randn(b, t, 6), jnp.float32),
            "blink": jnp.asarray(r.rand(b, t, 2), jnp.float32),
            "bbox": jnp.asarray(
                np.tile([s * .25, s * .75, s * .25, s * .75, s, s], (b, 1)),
                jnp.float32),
            "mouth_lmk": jnp.asarray(r.rand(b, t, 19, 2) * s, jnp.float32),
        }
        state = trainer.init_state(jax.random.PRNGKey(0), num_frames=t - 1)
        new_state, metrics = trainer.train_step(state, jax.random.PRNGKey(1),
                                                batch)
        assert np.isfinite(float(metrics["total"]))
        assert float(metrics["mouth_loss"]) > 0.0

    def test_sharded_step_8dev(self):
        """The DM sharded train step on the ('data', 'seq') = (4, 2) conftest
        mesh — the in-tree regression guard for __graft_entry__.dryrun_multichip
        (round-1 failure: the dryrun was the only 8-device exercise of this
        step and it never ran). Tiny UNet to keep CPU compile time in check."""
        from dawn_tpu.train.train_dm import DMTrainer, DMTrainConfig
        from dawn_tpu.models.dm.unet3d import Unet3D
        from dawn_tpu.parallel.mesh import make_mesh

        cfg = DMTrainConfig(img_size=32, fea_channels=32, color_jitter=False,
                            ema_decay=None)
        trainer = DMTrainer(cfg, flow_ae=_tiny_flow_ae())
        trainer.unet = Unet3D(dim=8, dim_mults=(1, 2),
                              channels=trainer.in_channels, cond_pose=6,
                              win_width=2, attn_heads=2, attn_dim_head=8)
        b, t, s = 4, 4, cfg.img_size
        r = np.random.RandomState(0)
        batch = {
            "video": jnp.asarray(r.rand(b, t, s, s, 3) * 255, jnp.float32),
            "hubert": jnp.asarray(r.randn(b, t, 1024), jnp.float32),
            "pose": jnp.asarray(r.randn(b, t, 6), jnp.float32),
            "blink": jnp.asarray(r.rand(b, t, 2), jnp.float32),
            "bbox": jnp.asarray(
                np.tile([s * .25, s * .75, s * .25, s * .75, s, s], (b, 1)),
                jnp.float32),
            "mouth_lmk": jnp.asarray(r.rand(b, t, 19, 2) * s, jnp.float32),
        }
        mesh = make_mesh(8, seq_parallel=2)
        with mesh:
            state = trainer.init_state(jax.random.PRNGKey(0), num_frames=t)
            step = trainer.make_sharded_step(mesh)
            new_state, metrics = step(state, jax.random.PRNGKey(1), batch)
            metrics = jax.device_get(metrics)
        assert np.isfinite(metrics["total"])
        assert float(metrics["grads_finite"]) == 1.0

        # batches WITHOUT mouth landmarks (no --lmk-dir) must also shard:
        # in_shardings is built per batch-key-set, not hardcoded
        no_lmk = {k: v for k, v in batch.items() if k != "mouth_lmk"}
        with mesh:
            state2 = trainer.init_state(jax.random.PRNGKey(2), num_frames=t)
            _, metrics2 = step(state2, jax.random.PRNGKey(1), no_lmk)
            metrics2 = jax.device_get(metrics2)
        assert np.isfinite(metrics2["total"])
        assert float(metrics2["mouth_loss"]) == 0.0

    def test_teacher_outputs_match_reconstruct_video(self, dm_setup):
        """The deduped teacher path (FlowAE.teacher_outputs — per-video ref
        work computed once) must match reconstruct_video's corresponding
        tensors: every module is frozen eval-mode BN, so dedup of repeated
        rows changes nothing mathematically. Tolerance is f32 roundoff, not
        bitwise — the smaller conv batch changes XLA's reduction
        associativity (measured max|d| ~4e-7 CPU, ~1.5e-4 TPU)."""
        trainer, state, batch = dm_setup
        video = batch["video"].astype(jnp.float32) / 255.0
        ref = video[:, 0]
        full = trainer.flow_ae.reconstruct_video(
            state["frozen"]["lfg"], ref, video)
        dedup = trainer.flow_ae.teacher_outputs(
            state["frozen"]["lfg"], ref, video)
        for k in ("real_vid_grid", "real_vid_conf", "ref_img_fea"):
            np.testing.assert_allclose(np.asarray(dedup[k]),
                                       np.asarray(full[k]),
                                       atol=1e-5, rtol=1e-5, err_msg=k)

    def test_cached_teacher_step_matches(self, dm_setup):
        """Cached-teacher mode (batch carries teacher_precompute outputs
        instead of video) must produce the same loss, metrics, and parameter
        update as the standard step — the teacher tensors are the ONLY path
        the video takes into the loss (PERF_TRAIN.md). Jitter is off in the
        fixture, so the two steps compute the same math."""
        trainer, state, batch = dm_setup
        rng = jax.random.PRNGKey(7)
        ref_state, ref_metrics = trainer.train_step(state, rng, batch)

        teacher = trainer.teacher_precompute(state["frozen"], batch["video"])
        cached_batch = {k: v for k, v in batch.items() if k != "video"}
        cached_batch.update(teacher)
        new_state, metrics = trainer.train_step(state, rng, cached_batch)

        for k in ("total", "loss", "floss", "mouth_loss"):
            np.testing.assert_allclose(float(metrics[k]),
                                       float(ref_metrics[k]),
                                       atol=1e-5, rtol=1e-5, err_msg=k)
        np.testing.assert_allclose(np.asarray(new_state["params"]),
                                   np.asarray(ref_state["params"]),
                                   atol=1e-5, rtol=1e-5)

    def test_remat_policies_preserve_grads(self, dm_setup):
        """jax.checkpoint around the UNet apply (cfg.remat, the HBM-traffic
        A/B in PERF_TRAIN.md) must not change the loss or the gradient —
        only the backward's recompute schedule."""
        import dataclasses
        trainer, state, batch = dm_setup
        rng = jax.random.PRNGKey(11)

        def grad_at(mode):
            old = trainer.config
            trainer.config = dataclasses.replace(old, remat=mode)
            try:
                (loss, _), g = jax.value_and_grad(
                    trainer.loss_fn, has_aux=True)(
                        state["params"], state["frozen"], rng, batch)
                return float(loss), np.asarray(g)
            finally:
                trainer.config = old

        l0, g0 = grad_at("none")
        l1, g1 = grad_at("dots")
        np.testing.assert_allclose(l1, l0, rtol=1e-6)
        np.testing.assert_allclose(g1, g0, atol=1e-5, rtol=1e-4)

    def test_cached_teacher_stage2_matches(self):
        """Stage 2 cached mode: teacher_precompute does the frame-0 split
        itself, so its grid/conf rows align with the diffused frames while
        the raw condition rows still carry frame 0 for the delta baseline."""
        from dawn_tpu.train.train_dm import DMTrainer, DMTrainConfig

        cfg = DMTrainConfig(img_size=32, fea_channels=32, color_jitter=False,
                            ema_decay=None, stage=2)
        trainer = DMTrainer(cfg, flow_ae=_tiny_flow_ae())
        from dawn_tpu.models.dm.unet3d import Unet3D
        trainer.unet = Unet3D(dim=16, dim_mults=(1, 2),
                              channels=trainer.in_channels, cond_pose=6,
                              win_width=2)
        b, t, s = 1, 5, cfg.img_size
        r = np.random.RandomState(3)
        batch = {
            "video": jnp.asarray(r.rand(b, t, s, s, 3) * 255, jnp.float32),
            "hubert": jnp.asarray(r.randn(b, t, 1024), jnp.float32),
            "pose": jnp.asarray(r.randn(b, t, 6), jnp.float32),
            "blink": jnp.asarray(r.rand(b, t, 2), jnp.float32),
            "bbox": jnp.asarray(
                np.tile([s * .25, s * .75, s * .25, s * .75, s, s], (b, 1)),
                jnp.float32),
            "mouth_lmk": jnp.asarray(r.rand(b, t, 19, 2) * s, jnp.float32),
        }
        state = trainer.init_state(jax.random.PRNGKey(0), num_frames=t)
        rng = jax.random.PRNGKey(9)
        _, ref_metrics = trainer.train_step(state, rng, batch)

        teacher = trainer.teacher_precompute(state["frozen"], batch["video"])
        assert teacher["real_vid_grid"].shape[1] == t - 1   # frame-0 split
        cached_batch = {k: v for k, v in batch.items() if k != "video"}
        cached_batch.update(teacher)
        _, metrics = trainer.train_step(state, rng, cached_batch)
        for k in ("total", "loss", "floss", "mouth_loss"):
            np.testing.assert_allclose(float(metrics[k]),
                                       float(ref_metrics[k]),
                                       atol=1e-5, rtol=1e-5, err_msg=k)

    def test_sharded_cached_teacher_step_8dev(self):
        """The cached-teacher batch (grid/conf sharded over 'seq' like the
        video they replace, per-video fea over 'data' only) must run under
        the same per-key-set sharded step as the raw batch."""
        from dawn_tpu.train.train_dm import DMTrainer, DMTrainConfig
        from dawn_tpu.models.dm.unet3d import Unet3D
        from dawn_tpu.parallel.mesh import make_mesh

        cfg = DMTrainConfig(img_size=32, fea_channels=32, color_jitter=False,
                            ema_decay=None)
        trainer = DMTrainer(cfg, flow_ae=_tiny_flow_ae())
        trainer.unet = Unet3D(dim=8, dim_mults=(1, 2),
                              channels=trainer.in_channels, cond_pose=6,
                              win_width=2, attn_heads=2, attn_dim_head=8)
        b, t, s = 4, 4, cfg.img_size
        r = np.random.RandomState(0)
        batch = {
            "video": jnp.asarray(r.rand(b, t, s, s, 3) * 255, jnp.float32),
            "hubert": jnp.asarray(r.randn(b, t, 1024), jnp.float32),
            "pose": jnp.asarray(r.randn(b, t, 6), jnp.float32),
            "blink": jnp.asarray(r.rand(b, t, 2), jnp.float32),
            "bbox": jnp.asarray(
                np.tile([s * .25, s * .75, s * .25, s * .75, s, s], (b, 1)),
                jnp.float32),
        }
        mesh = make_mesh(8, seq_parallel=2)
        with mesh:
            state = trainer.init_state(jax.random.PRNGKey(0), num_frames=t)
            teacher = trainer.teacher_precompute(state["frozen"],
                                                 batch["video"])
            cached = {k: v for k, v in batch.items() if k != "video"}
            cached.update(teacher)
            step = trainer.make_sharded_step(mesh)
            _, metrics = step(state, jax.random.PRNGKey(1), cached)
            metrics = jax.device_get(metrics)
        assert np.isfinite(metrics["total"])
        assert float(metrics["grads_finite"]) == 1.0

    def test_sharded_train_step_no_full_t_allgather(self):
        """The multi-chip TRAINING memory guarantee (VERDICT r4 #2), pinned
        on the compiled program — mirror of
        test_multichip_inference.test_seq_sampler_no_full_t_allgather for the
        TRAIN step: with a >1 'seq' axis the step's temporal attention runs
        as shard_map + ppermute halo exchange (fwd AND bwd), so the compiled
        HLO must not all-gather full-T attention activations.

        Mesh shape matters: the UNet's (b, t) -> (b*t) conv reshapes are
        GSPMD-expressible only when the 'data' axis fully shards the batch
        (per-device batch 1) — otherwise the merged axis interleaves
        unsharded-b with sharded-t blocks and GSPMD all-gathers the conv
        activations at full T, silently voiding the memory bound (measured:
        ('data':1,'seq':8) at b=2 gathers f32[2,16,...] conv tensors). The
        production long-video config is data=batch, seq=the rest."""
        import re

        from dawn_tpu.train.train_dm import DMTrainer, DMTrainConfig
        from dawn_tpu.models.dm.unet3d import Unet3D
        from dawn_tpu.parallel.mesh import make_mesh

        cfg = DMTrainConfig(img_size=32, fea_channels=32, color_jitter=False,
                            ema_decay=None, win_width=2)
        trainer = DMTrainer(cfg, flow_ae=_tiny_flow_ae())
        trainer.unet = Unet3D(dim=8, dim_mults=(1, 2),
                              channels=trainer.in_channels, cond_pose=6,
                              win_width=2, attn_heads=2, attn_dim_head=8)
        b, t, s = 2, 16, cfg.img_size           # 2 frames/shard over seq=8
        r = np.random.RandomState(0)
        batch = {
            "video": jnp.asarray(r.rand(b, t, s, s, 3) * 255, jnp.float32),
            "hubert": jnp.asarray(r.randn(b, t, 1024), jnp.float32),
            "pose": jnp.asarray(r.randn(b, t, 6), jnp.float32),
            "blink": jnp.asarray(r.rand(b, t, 2), jnp.float32),
            "bbox": jnp.asarray(
                np.tile([s * .25, s * .75, s * .25, s * .75, s, s], (b, 1)),
                jnp.float32),
        }
        mesh = make_mesh(8, seq_parallel=4)      # ('data': 2, 'seq': 4)
        from jax.sharding import NamedSharding, PartitionSpec as P
        rep = NamedSharding(mesh, P())
        bs = {k: NamedSharding(mesh, P("data", "seq") if k != "bbox"
                               else P("data")) for k in batch}
        with mesh:
            state = trainer.init_state(jax.random.PRNGKey(0), num_frames=t)
            trainer.make_sharded_step(mesh)      # installs the seq UNet clone
            step = jax.jit(trainer.train_step, in_shardings=(rep, rep, bs))
            lowered = step.lower(state, jax.random.PRNGKey(1), batch)
            compiled = lowered.compile()
            # it must also EXECUTE (halo-exchange bwd included)
            new_state, metrics = compiled(state, jax.random.PRNGKey(1), batch)
            metrics = jax.device_get(metrics)
        assert np.isfinite(metrics["total"])
        assert float(metrics["grads_finite"]) == 1.0

        text = compiled.as_text()
        # full-T attention activation at the top level: (B*HW, T, hidden)
        s_top = (s // 4) ** 2
        qkv_elems = b * s_top * t * 16           # hidden = heads*dh = 16
        offenders = []
        for line in text.splitlines():
            if "all-gather" not in line:
                continue
            m = re.search(r"=\s*\(?([a-z0-9]+)\[([0-9,]*)\]", line)
            if not m:
                continue
            dims = tuple(int(d) for d in m.group(2).split(",") if d)
            n_el = 1
            for d in dims:
                n_el *= d
            if n_el >= qkv_elems and t in dims:
                offenders.append(line.strip()[:160])
        assert not offenders, (
            "sharded TRAIN step all-gathers full-T activation tensors:\n"
            + "\n".join(offenders))

    def test_snapshot_panels(self, dm_setup):
        trainer, state, batch = dm_setup
        snaps = trainer.snapshot(state, jax.random.PRNGKey(2), batch,
                                 max_frames=2)
        for k in ("real_frames", "real_decode", "fake_decode",
                  "real_flow_fig", "fake_flow_fig", "real_conf_fig",
                  "fake_conf_fig"):
            assert k in snaps and np.isfinite(
                np.asarray(snaps[k], np.float32)).all(), k
        assert snaps["fake_decode"].shape == snaps["real_decode"].shape

    def test_snapshot_grid_png(self, dm_setup, tmp_path):
        trainer, state, batch = dm_setup
        from dawn_tpu.utils.misc import save_snapshot_grid
        snaps = trainer.snapshot(state, jax.random.PRNGKey(2), batch,
                                 max_frames=2)
        p = tmp_path / "snap.png"
        save_snapshot_grid(str(p), snaps)
        assert p.exists() and p.stat().st_size > 0


class TestLFGTrainer:
    def test_step(self):
        from dawn_tpu.train.train_lfg import LFGTrainer, LFGTrainConfig
        cfg = LFGTrainConfig(img_size=32, scales=(1, 0.5))
        trainer = LFGTrainer(cfg, flow_ae=_tiny_flow_ae())
        state = trainer.init_state(jax.random.PRNGKey(0))
        r = np.random.RandomState(0)
        batch = {"source": jnp.asarray(r.rand(2, 32, 32, 3), jnp.float32),
                 "driving": jnp.asarray(r.rand(2, 32, 32, 3), jnp.float32)}
        new_state, metrics = trainer.train_step(state, jax.random.PRNGKey(1),
                                                batch)
        assert np.isfinite(float(metrics["total"]))


class TestPBnetTrainer:
    def test_sharded_step(self):
        from dawn_tpu.train.train_pbnet import PBnetTrainer, PBnetTrainConfig
        from dawn_tpu.parallel.mesh import make_mesh
        trainer = PBnetTrainer(PBnetTrainConfig(kind="pose"))
        # >= 12 frames: the 1-D PatchGAN's four k=4 convs (two stride-2)
        # consume 8+ frames of context, exactly like the reference's
        # D_patchgan trained on 40-frame clips (train_cvae...:51-88)
        t = 40
        state = trainer.init_state(jax.random.PRNGKey(0), num_frames=t)
        r = np.random.RandomState(0)
        batch = {"x": jnp.asarray(r.randn(8, t, 6), jnp.float32),
                 "hubert": jnp.asarray(r.randn(8, t, 1024), jnp.float32)}
        mesh = make_mesh(8, seq_parallel=1)
        with mesh:
            step = trainer.make_sharded_step(mesh)
            new_state, metrics = step(state, jax.random.PRNGKey(1), batch, 0)
        assert np.isfinite(float(metrics["g_total"]))
        assert np.isfinite(float(metrics["d_loss"]))

    def test_ragged_batch_masked(self):
        """Variable-length padded batches (reference collate design,
        tensors_eye.py:23-44): losses must be computed on valid frames only
        (reference: x[mask], tools/losses.py:9-21) and the generated fake
        must be zeroed on padded frames like the torch decoder's
        output[~mask] = 0."""
        from dawn_tpu.train.train_pbnet import PBnetTrainer, PBnetTrainConfig
        from dawn_tpu.train.data import collate_padded

        trainer = PBnetTrainer(PBnetTrainConfig(kind="pose"))
        r = np.random.RandomState(0)
        samples = [{"x": r.randn(40, 6).astype(np.float32),
                    "hubert": r.randn(40, 1024).astype(np.float32)},
                   {"x": r.randn(28, 6).astype(np.float32),
                    "hubert": r.randn(28, 1024).astype(np.float32)}]
        raw = collate_padded(samples)
        assert raw["x"].shape[1] == 40 and list(raw["lengths"]) == [40, 28]
        state = trainer.init_state(jax.random.PRNGKey(0), num_frames=40)

        batch = {"x": jnp.asarray(raw["x"]),
                 "hubert": jnp.asarray(raw["hubert"]),
                 "lengths": jnp.asarray(raw["lengths"])}
        (loss, (metrics, fake)) = trainer.g_loss(
            state["g"], state["d"], jax.random.PRNGKey(1), batch, 20000)
        assert np.isfinite(float(loss))
        # fake zeroed on padded frames (decoder output[~mask] = 0)
        assert np.abs(np.asarray(fake)[1, 28:]).max() == 0.0
        assert np.abs(np.asarray(fake)[1, :28]).max() > 0.0

        # dropping lengths (no mask) must change the loss: padded frames
        # would otherwise contribute to every loss term — the round-1 bug
        nomask = {"x": batch["x"], "hubert": batch["hubert"]}
        loss_nm, _ = trainer.g_loss(state["g"], state["d"],
                                    jax.random.PRNGKey(1), nomask, 20000)
        assert not np.allclose(float(loss), float(loss_nm))

        # a full train step with lengths runs end-to-end
        new_state, m = trainer.train_step(state, jax.random.PRNGKey(2),
                                          batch, 20000)
        assert np.isfinite(float(m["g_total"]))


def test_resume_bit_exact(dm_setup, tmp_path):
    """Interrupt/resume fidelity through the REAL trainer state: step 1 ->
    checkpoint -> restore -> step 2 must equal the uninterrupted steps 1-2
    (params, EMA, opt state, step counter) — the reference's resume contract
    (train...6D.py:199-214) without its lr-schedule recomputation caveats."""
    import jax
    from dawn_tpu.utils.checkpoint import (restore_checkpoint, restored_step,
                                           save_checkpoint)

    trainer, state, batch = dm_setup
    k1, k2 = jax.random.PRNGKey(21), jax.random.PRNGKey(22)
    s1, _ = trainer.train_step(state, k1, batch)
    s1_host = jax.device_get(s1)            # before donation invalidates s1
    s2, _ = trainer.train_step(s1, k2, batch)
    s2_host = jax.device_get(s2)

    d = str(tmp_path / "ck")
    save_checkpoint(d, s1_host, 1)
    restored = restore_checkpoint(d, template=s1_host)
    assert restored_step(restored) == 1

    s2b, _ = trainer.train_step(restored, k2, batch)
    for key in ("params", "ema_params"):
        np.testing.assert_array_equal(np.asarray(s2b[key]),
                                      np.asarray(s2_host[key]), err_msg=key)
    assert int(np.asarray(s2b["step"])) == int(np.asarray(s2_host["step"]))
    a_leaves = jax.tree_util.tree_leaves(s2_host["opt_state"])
    b_leaves = jax.tree_util.tree_leaves(jax.device_get(s2b["opt_state"]))
    assert len(a_leaves) == len(b_leaves)
    for a, b in zip(a_leaves, b_leaves):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
