"""STGCN recognizer parity against the reference torch implementation.

Imports PBnet/src/recognition/models/stgcn.py from /root/reference,
random-inits it (the released UESTC .tar is not in this image), converts
the state_dict with convert_stgcn, and compares graphs, features, and
logits — the feature space every stgcn/evaluate.py metric lives in.
"""

import os
import sys

import numpy as np
import pytest
import torch
import jax
import jax.numpy as jnp

HERE = os.path.dirname(os.path.abspath(__file__))
for p in (os.path.join(HERE, "ref_shims"), "/root/reference/PBnet"):
    if p not in sys.path:
        sys.path.insert(0, p)


@pytest.fixture(scope="module")
def ref_graph_mod():
    import importlib
    return importlib.import_module("src.recognition.models.stgcnutils.graph")


@pytest.fixture(scope="module")
def ref_stgcn_mod():
    import importlib
    return importlib.import_module("src.recognition.models.stgcn")


class TestGraphParity:
    @pytest.mark.parametrize("layout", ["openpose", "ntu-rgb+d", "ntu_edge"])
    @pytest.mark.parametrize("strategy", ["uniform", "distance", "spatial"])
    def test_builtin_layouts(self, ref_graph_mod, layout, strategy):
        from dawn_tpu.models.pbnet.stgcn import build_graph
        ref = ref_graph_mod.Graph(layout=layout, strategy=strategy)
        ours = build_graph(layout, strategy)
        np.testing.assert_allclose(ours, ref.A, atol=1e-12)

    def test_explicit_edges_match_layout(self, ref_graph_mod):
        # the edges= path (used for SMPL kintree pairs) must agree with the
        # equivalent built-in layout
        from dawn_tpu.models.pbnet.stgcn import build_graph, _LAYOUTS
        spec = _LAYOUTS["openpose"]
        ref = ref_graph_mod.Graph(layout="openpose", strategy="spatial")
        ours = build_graph(strategy="spatial", edges=spec["neighbors"],
                           num_node=spec["num_node"], center=spec["center"])
        np.testing.assert_allclose(ours, ref.A, atol=1e-12)

    def test_dawn_head_layout_shape(self):
        from dawn_tpu.models.pbnet.stgcn import build_graph
        a = build_graph("dawn_head", "spatial")
        assert a.shape[1:] == (8, 8)
        # every partition column-normalized: total in-weight of each node
        # with neighbors is 1 (normalize_digraph semantics)
        np.testing.assert_allclose(a.sum(axis=(0, 1)), 1.0, atol=1e-12)


@pytest.fixture(scope="module", params=["openpose", "ntu-rgb+d"])
def pair(request, ref_stgcn_mod):
    torch.manual_seed(3)
    layout = request.param
    in_ch, num_class = 6, 12
    tmodel = ref_stgcn_mod.STGCN(
        in_channels=in_ch, num_class=num_class,
        graph_args={"layout": layout, "strategy": "spatial"},
        edge_importance_weighting=True, device="cpu").eval()
    # random-init still has BN running stats at (0, 1); randomize them the
    # way the shared helper does for other backbones so the BN math is real
    sd = tmodel.state_dict()
    g = torch.Generator().manual_seed(7)
    for k in list(sd):
        if k.endswith("running_mean"):
            sd[k] = torch.randn(sd[k].shape, generator=g) * 0.1
        elif k.endswith("running_var"):
            sd[k] = torch.rand(sd[k].shape, generator=g) * 0.5 + 0.75
    tmodel.load_state_dict(sd)

    from dawn_tpu.models.pbnet.stgcn import STGCN
    from dawn_tpu.weights.torch_convert import convert_stgcn
    cv = convert_stgcn(sd)
    model = STGCN(in_channels=in_ch, num_class=num_class, graph=cv["graph"],
                  edge_importance_weighting=True)
    variables = {"params": cv["params"], "batch_stats": cv["batch_stats"]}
    return tmodel, model, variables, layout


class TestSTGCNParity:
    def test_checkpoint_graph_matches_builder(self, pair, ref_graph_mod):
        _, model, _, layout = pair
        from dawn_tpu.models.pbnet.stgcn import build_graph
        np.testing.assert_allclose(np.asarray(model.graph),
                                   build_graph(layout, "spatial"), atol=1e-6)

    def test_features_and_logits(self, pair):
        tmodel, model, variables, layout = pair
        v = {"openpose": 18, "ntu-rgb+d": 25}[layout]
        rng = np.random.RandomState(11)
        n, t, c = 3, 24, 6
        x = rng.randn(n, t, v, c).astype(np.float32)

        # reference forward takes batch["x"] (N, V, C, T) (stgcn.py:80-87)
        with torch.no_grad():
            tb = tmodel({"x": torch.from_numpy(x.transpose(0, 2, 3, 1))})
        tfeat = tb["features"].numpy()
        tyhat = tb["yhat"].numpy()

        out = model.apply(variables, jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(out["features"]), tfeat,
                                   atol=2e-4, rtol=1e-3)
        np.testing.assert_allclose(np.asarray(out["yhat"]), tyhat,
                                   atol=2e-4, rtol=1e-3)

    def test_temporal_stride_shapes(self, pair):
        # two stride-2 stages: features pool over T/4 frames; any T works
        tmodel, model, variables, layout = pair
        v = {"openpose": 18, "ntu-rgb+d": 25}[layout]
        x = np.random.RandomState(0).randn(1, 17, v, 6).astype(np.float32)
        out = model.apply(variables, jnp.asarray(x))
        assert out["features"].shape == (1, 256)
        with torch.no_grad():
            tb = tmodel({"x": torch.from_numpy(x.transpose(0, 2, 3, 1))})
        np.testing.assert_allclose(np.asarray(out["features"]),
                                   tb["features"].numpy()[None]
                                   if tb["features"].ndim == 1
                                   else tb["features"].numpy(),
                                   atol=2e-4, rtol=1e-3)


class TestSTGCNEvaluation:
    def test_evaluation_flow(self, pair):
        # the full Evaluation.evaluate contract on tiny loaders: flattened
        # {metric}_{key}_{set} keys, fid_gt ~ 0 against itself
        _, model, variables, _ = pair
        from dawn_tpu.evaluate.stgcn_eval import STGCNEvaluation
        layoutv = np.asarray(model.graph).shape[1]
        rng = np.random.RandomState(5)
        num_classes = 3

        def loader(scale):
            motions = (rng.randn(12, 16, layoutv, 6) * scale).astype(np.float32)
            labels = np.arange(12) % num_classes
            return motions, labels

        loaders = {"gt": {"train": loader(1.0), "test": loader(1.0)},
                   "gen": {"train": loader(3.0), "test": loader(3.0)}}
        ev = STGCNEvaluation(model, variables, num_classes, seed=0,
                             batch_size=8)
        metrics = ev.evaluate(loaders)
        for sets in ("train", "test"):
            for key in ("gt", "gen"):
                for m in ("accuracy", "diversity", "multimodality", "fid"):
                    assert f"{m}_{key}_{sets}" in metrics
        # gt scored against its own stats: fid == 0 (up to sqrtm noise);
        # a differently-scaled generator distribution must score strictly
        # worse (relative margin — random-init features compress shifts)
        assert abs(metrics["fid_gt_test"]) < 1e-3
        assert metrics["fid_gen_test"] > 100 * abs(metrics["fid_gt_test"])
        assert metrics["fid_gen_test"] > 1e-3

    def test_dawn_head_recognizer(self):
        from dawn_tpu.evaluate.stgcn_eval import make_dawn_head_stgcn, \
            compute_features
        model, variables = make_dawn_head_stgcn(4, jax.random.PRNGKey(0))
        motions = np.random.RandomState(1).randn(5, 20, 8, 1).astype(np.float32)
        feats, logits = compute_features(model, variables, motions,
                                         batch_size=4)
        assert feats.shape == (5, 256) and logits.shape == (5, 4)
        assert np.isfinite(feats).all() and np.isfinite(logits).all()
