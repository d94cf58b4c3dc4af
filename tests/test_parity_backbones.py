"""Parity of the preprocessing CNN backbones vs the reference torch defs."""

import os
import sys

import numpy as np
import pytest
import torch
import jax.numpy as jnp

HERE = os.path.dirname(os.path.abspath(__file__))
if os.path.join(HERE, "ref_shims") not in sys.path:
    sys.path.insert(0, os.path.join(HERE, "ref_shims"))

torch.manual_seed(0)


def _load_ref(name, path):
    """Both reference trees define a 'models' package; load by file path."""
    import importlib.util
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _bn_randomize(module, rng):
    sd = module.state_dict()
    for k in sd:
        if k.endswith("running_mean"):
            sd[k] = torch.from_numpy(rng.randn(*sd[k].shape).astype(np.float32) * 0.1)
        if k.endswith("running_var"):
            sd[k] = torch.from_numpy(rng.rand(*sd[k].shape).astype(np.float32) + 0.5)
    module.load_state_dict(sd)
    return module


class TestFaceBoxesNet:
    def test_parity(self):
        TorchFB = _load_ref(
            "ref_faceboxes",
            "/root/reference/extract_init_states/FaceBoxes/models/faceboxes.py"
        ).FaceBoxesNet
        from dawn_tpu.models.face3d.faceboxes_net import FaceBoxesNet

        tnet = _bn_randomize(TorchFB("test", None, 2).eval(),
                             np.random.RandomState(0))
        jnet = FaceBoxesNet()

        sd = {k: v for k, v in tnet.state_dict().items()}
        # build the flax variable tree by name mapping
        from dawn_tpu.weights.torch_convert import _np

        def convbn(prefix):
            w = _np(sd[f"{prefix}.conv.weight"])
            return ({"conv": {"kernel": jnp.asarray(np.transpose(w, (2, 3, 1, 0)))},
                     "bn": {"scale": jnp.asarray(_np(sd[f"{prefix}.bn.weight"])),
                            "bias": jnp.asarray(_np(sd[f"{prefix}.bn.bias"]))}},
                    {"bn": {"mean": jnp.asarray(_np(sd[f"{prefix}.bn.running_mean"])),
                            "var": jnp.asarray(_np(sd[f"{prefix}.bn.running_var"]))}})

        params, stats = {}, {}
        for ours, theirs in (("conv1", "conv1"), ("conv2", "conv2")):
            p, s = convbn(theirs)
            params[ours] = {"convbn": p}
            stats[ours] = {"convbn": s}
        for i in (1, 2, 3):
            blk_p, blk_s = {}, {}
            for br in ("branch1x1", "branch1x1_2", "branch3x3_reduce", "branch3x3",
                       "branch3x3_reduce_2", "branch3x3_2", "branch3x3_3"):
                p, s = convbn(f"inception{i}.{br}")
                blk_p[br], blk_s[br] = p, s
            params[f"inception{i}"] = blk_p
            stats[f"inception{i}"] = blk_s
        for name in ("conv3_1", "conv3_2", "conv4_1", "conv4_2"):
            p, s = convbn(name)
            params[name], stats[name] = p, s
        for i in range(3):
            for head, ours in (("loc", f"loc_{i}"), ("conf", f"conf_{i}")):
                w = _np(sd[f"{head}.{i}.weight"])
                params[ours] = {"kernel": jnp.asarray(np.transpose(w, (2, 3, 1, 0))),
                                "bias": jnp.asarray(_np(sd[f"{head}.{i}.bias"]))}
        variables = {"params": params, "batch_stats": stats}

        rng = np.random.RandomState(1)
        x = rng.randn(1, 128, 128, 3).astype(np.float32) * 50
        with torch.no_grad():
            tloc, tconf = tnet(torch.from_numpy(np.transpose(x, (0, 3, 1, 2))))
        jloc, jconf = jnet.apply(variables, jnp.asarray(x))
        tloc = tloc.numpy().reshape(1, -1, 4)
        np.testing.assert_allclose(np.asarray(jloc), tloc, atol=2e-3)
        np.testing.assert_allclose(np.asarray(jconf), tconf.numpy(), atol=1e-4)


class TestMobileNet:
    def test_parity(self):
        mobilenet_1 = _load_ref(
            "ref_mobilenet",
            "/root/reference/extract_init_states/models/mobilenet_v1.py"
        ).mobilenet_1
        from dawn_tpu.models.face3d.mobilenet import MobileNetV1, convert_mobilenet

        tnet = _bn_randomize(mobilenet_1(num_classes=62).eval(),
                             np.random.RandomState(2))
        variables = convert_mobilenet({k: v for k, v in tnet.state_dict().items()})
        jnet = MobileNetV1()
        rng = np.random.RandomState(3)
        x = rng.randn(2, 120, 120, 3).astype(np.float32)
        with torch.no_grad():
            ref = tnet(torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))).numpy()
        got = np.asarray(jnet.apply(variables, jnp.asarray(x)))
        np.testing.assert_allclose(got, ref, atol=2e-3)


class TestBackboneAlternates:
    """The 3DDFA-zoo alternates (extract_init_states/models/{mobilenet_v3,
    resnet}.py + the mb05 widen-factor config point) — previously a
    documented drop, now ported with converter parity."""

    def _x(self, seed, size=120):
        rng = np.random.RandomState(seed)
        return rng.randn(2, size, size, 3).astype(np.float32)

    def _run_torch(self, tnet, x):
        with torch.no_grad():
            return tnet(torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))).numpy()

    @pytest.mark.parametrize("mode", ["small", "large"])
    def test_mobilenet_v3_parity(self, mode):
        ref = _load_ref(
            "ref_mobilenet_v3",
            "/root/reference/extract_init_states/models/mobilenet_v3.py")
        from dawn_tpu.models.face3d.backbones import get_backbone

        tnet = _bn_randomize(
            ref.mobilenet_v3(num_classes=62, size=128, mode=mode).eval(),
            np.random.RandomState(10))
        jnet, convert = get_backbone("mobilenet_v3", num_classes=62, mode=mode)
        variables = convert({k: v for k, v in tnet.state_dict().items()})
        x = self._x(11, size=128)
        np.testing.assert_allclose(
            np.asarray(jnet.apply(variables, jnp.asarray(x))),
            self._run_torch(tnet, x), atol=2e-3)

    def test_resnet22_parity(self):
        ref = _load_ref(
            "ref_resnet22",
            "/root/reference/extract_init_states/models/resnet.py")
        from dawn_tpu.models.face3d.backbones import get_backbone

        tnet = _bn_randomize(ref.resnet22(num_classes=62).eval(),
                             np.random.RandomState(12))
        jnet, convert = get_backbone("resnet22", num_classes=62)
        variables = convert({k: v for k, v in tnet.state_dict().items()})
        x = self._x(13)
        np.testing.assert_allclose(
            np.asarray(jnet.apply(variables, jnp.asarray(x))),
            self._run_torch(tnet, x), atol=2e-3)

    def test_mobilenet_v1_widen05_parity(self):
        # the mb05_120x120.yml config point (widen_factor 0.5)
        ref = _load_ref(
            "ref_mobilenet_wf",
            "/root/reference/extract_init_states/models/mobilenet_v1.py")
        from dawn_tpu.models.face3d.backbones import get_backbone

        tnet = _bn_randomize(ref.mobilenet_05(num_classes=62).eval(),
                             np.random.RandomState(14))
        jnet, convert = get_backbone("mobilenet", num_classes=62,
                                     widen_factor=0.5)
        variables = convert({k: v for k, v in tnet.state_dict().items()})
        x = self._x(15)
        np.testing.assert_allclose(
            np.asarray(jnet.apply(variables, jnp.asarray(x))),
            self._run_torch(tnet, x), atol=2e-3)
