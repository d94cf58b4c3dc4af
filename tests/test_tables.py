"""Parity + behavior of the LaTeX tables port (evaluate/tables.py) vs the
reference generators' shared core (PBnet/src/evaluate/tables/maketable.py)."""

import json
import math
import os

import pytest

from dawn_tpu.evaluate import tables


def _ref_format_table():
    """Execute the reference maketable.py (minus its package-relative
    import) and return its format_table."""
    path = "/root/reference/PBnet/src/evaluate/tables/maketable.py"
    with open(path) as f:
        src = f.read()
    src = src.replace("from .tools import load_metrics",
                      "load_metrics = None")
    ns = {"__name__": "ref_maketable"}
    exec(compile(src, path, "exec"), ns)
    return ns["format_table"]


class TestFormatTableParity:
    """format_table is a semantics-exact port: same formatter choice, same
    colorization thresholds, same output strings."""

    CASES = [
        # (value, gtval, reference mname)
        (0.0234, None, "rc"), (1.7, None, "rc"), (0.0, None, "rc"),
        (4.2, 5.0, "diversity"), (4.2, 1.0, "diversity"),
        (0.5, 5.0, "diversity"), (0.004, 0.005, "diversity"),
        (3.1, None, "multimodality"), (0.02, 0.5, "multimodality"),
        (0.9, None, "accuracy"), (0.5, None, "accuracy"),
        (0.1, None, "accuracy"),
        (1e-3, 1.05e-3, "acceleration"), (5e-3, 1e-3, "acceleration"),
        (2e-3, None, "acceleration"),
        (12.34, None, "fid"), (0.0, None, "fid"),
    ]

    def test_exact_parity(self):
        ref = _ref_format_table()
        for value, gt, mname in self.CASES:
            assert tables.format_table(value, gt, mname) == \
                ref(value, gt, mname), (value, gt, mname)

    def test_l1_uses_rc_rules(self):
        ref = _ref_format_table()
        assert tables.format_table(0.031, None, "l1") == ref(0.031, None, "rc")
        assert tables.format_table(2.0, None, "l1") == ref(2.0, None, "rc")

    def test_degenerate_zero_value(self):
        # log10(0) raises ValueError in the reference; both fall back to 0
        out = tables.format_table(0.0, 1.0, "diversity")
        assert "0" in out and out.startswith("\\textbf")


class TestMakeTable:
    RUNS = {
        "reemb6": {"fid": 3.2, "diversity_pred": 4.0, "diversity_gt": 4.5,
                   "acceleration_pred": 1.1e-3, "acceleration_gt": 1.0e-3,
                   "l1": 0.02, "stgcn_accuracy_test": 0.71},
        "gru_abl": {"fid": 9.9, "diversity_pred": 0.9, "diversity_gt": 4.5,
                    "acceleration_pred": 9e-3, "acceleration_gt": 1.0e-3,
                    "l1": 1.4},
    }

    def test_structure(self):
        tex = tables.make_table(self.RUNS, title="unit")
        assert tex.startswith("\\documentclass{standalone}")
        assert "\\begin{tabular}{lccccc}" in tex  # 5 metric cols + name
        assert "ground truth" in tex
        assert "reemb6" in tex and "gru\\_abl" in tex
        assert "$\\downarrow$" in tex and "$\\rightarrow$" in tex
        assert "$\\uparrow$" in tex            # stgcn accuracy column
        assert "\\bottomrule" in tex and "\\end{document}" in tex

    def test_colorization_thresholds(self):
        tex = tables.make_table(self.RUNS)
        # gru ablation: diversity 0.9 < 0.3*4.5 -> Mahogany; acceleration
        # log10(9) > 0.3 -> Mahogany; l1 >= 1 -> Mahogany
        assert tex.count("Mahogany") >= 3
        # reemb6: diversity 4.0 > 0.8*4.5, acceleration diff < 0.05,
        # stgcn accuracy 0.71 > 0.65 -> Green
        assert tex.count("Green") >= 3

    def test_accuracy_percent_escaped(self):
        tex = tables.make_table(self.RUNS)
        assert "\\%" in tex and "71.0" in tex

    def test_seed_mean_collector(self):
        m = {"0": {"fid": 2.0, "l1": 0.1}, "7": {"fid": 4.0, "l1": 0.3}}
        out = tables._mean_over_seeds(m)
        assert out["fid"] == pytest.approx(3.0)
        assert out["l1"] == pytest.approx(0.2)

    def test_cli_end_to_end(self, tmp_path):
        for name in ("runA", "runB"):
            d = tmp_path / name
            d.mkdir()
            with open(d / "metrics.json", "w") as f:
                json.dump({"0": self.RUNS["reemb6"]}, f)
        out = str(tmp_path / "table.tex")
        tables.main([str(tmp_path / "runA" / "metrics.json"),
                     str(tmp_path / "runB" / "metrics.json"), "-o", out])
        assert os.path.exists(out)
        tex = open(out).read()
        assert "runA" in tex and "runB" in tex
        assert math.isfinite(3.2)  # sanity anchor for the fid cell below
        assert "3.20" in tex       # fid formatted {:.2f}
