"""Examples stay importable + end-to-end regression runs.

The reference ships 60+ examples but never tests them; here every example
module must at least import (catching API drift across the 50 scripts),
the cheapest three run to completion with tiny budgets, and all 14
reference twins run end-to-end with their final metric regression-checked
against a threshold set well below the hand-verified value (commit
2cd6154's recorded accuracies) — so a regression in any twin's training
behavior fails the suite instead of surviving as an import-only smoke.
"""
import glob
import importlib
import os.path as osp
import re
import runpy
import sys

import pytest

EXAMPLES_DIR = osp.join(osp.dirname(osp.dirname(osp.abspath(__file__))), "examples")
MODULES = sorted(
    osp.splitext(osp.basename(p))[0]
    for p in glob.glob(osp.join(EXAMPLES_DIR, "*.py"))
    if not osp.basename(p).startswith("_")
)


@pytest.mark.parametrize("name", MODULES)
def test_example_imports(name):
    """Every example imports cleanly (no API drift, no top-level work)."""
    import flax.linen as fnn

    mod = importlib.import_module(f"examples.{name}")
    has_entry = any(hasattr(mod, a) for a in ("main", "Net", "run")) or any(
        isinstance(v, type) and issubclass(v, fnn.Module)
        for v in vars(mod).values()
    )
    assert has_entry, f"examples/{name}.py exposes no entry point"


def _run(name):
    argv = sys.argv
    sys.argv = [f"examples/{name}.py", "--cpu"]
    try:
        runpy.run_path(osp.join(EXAMPLES_DIR, f"{name}.py"), run_name="__main__")
    finally:
        sys.argv = argv


# (name, final-metric regex, 'min'|'max', threshold, env-budget or None).
# Hand-verified full-budget values in parens; thresholds sit well below so
# only a real training regression trips them (runs are seeded/deterministic).
E2E_TWINS = [
    ("pna", r"test MAE (\d+\.\d+)", "max", 0.85, None),            # 0.54
    ("renet", r"Hits@10 (\d+\.\d+)", "min", 0.30, None),           # 0.55
    ("faust", r"correspondence acc (\d+\.\d+)", "min", 0.15, "10"),  # 0.34@10
    ("mnist_graclus", r"test acc (\d+\.\d+)", "min", 0.70, None),  # 1.00
    ("mnist_nn_conv", r"test acc (\d+\.\d+)", "min", 0.70, None),  # 1.00
    ("mnist_voxel_grid", r"test acc (\d+\.\d+)", "min", 0.60, None),  # 0.83
    ("qm9_pretrained_dimenet", r"test MAE: (\d+\.\d+)", "max", 6.0, None),  # 2.9
    ("qm9_pretrained_schnet", r"test MAE: (\d+\.\d+)", "max", 8.0, None),  # 4.2
    ("ogbn_products_sage", r"test accuracy (\d+\.\d+)", "min", 0.95, None),  # 0.999
    ("ogbn_products_gat", r"test accuracy (\d+\.\d+)", "min", 0.90, "2"),  # 0.999
    ("infomax_inductive", r"probe test accuracy (\d+\.\d+)", "min", 0.70, None),  # 0.89
    ("cluster_gcn_ppi", r"micro-F1 (\d+\.\d+)", "min", 0.70, None),  # 0.83
    ("gcn2_ppi", r"micro-F1 (\d+\.\d+)", "min", 0.75, None),       # 0.87
    ("dgcnn_segmentation", r"point acc (\d+\.\d+)", "min", 0.90, None),  # 0.99
    # frame-resident SpMM-plan training (the round-5 deployment recipe)
    ("reddit_fullbatch_plan", r"train acc=(\d+\.\d+)", "min", 0.30, None),  # 0.40
]


@pytest.mark.parametrize(
    "name,pattern,kind,thr,budget", E2E_TWINS, ids=[t[0] for t in E2E_TWINS]
)
def test_twin_end_to_end(name, pattern, kind, thr, budget, capsys, monkeypatch):
    if budget is not None:
        monkeypatch.setenv("STM_EX_EPOCHS", budget)
    _run(name)
    out = capsys.readouterr().out
    vals = re.findall(pattern, out)
    assert vals, f"examples/{name}.py printed no final metric; tail: {out[-400:]!r}"
    v = float(vals[-1])
    if kind == "min":
        assert v >= thr, f"{name}: metric {v} fell below regression floor {thr}"
    else:
        assert v <= thr, f"{name}: metric {v} rose above regression ceiling {thr}"


def test_label_prop_runs(capsys):
    _run("label_prop")
    out = capsys.readouterr().out
    assert "test accuracy" in out


def test_wl_kernel_runs(capsys):
    _run("wl_kernel")
    out = capsys.readouterr().out
    assert "LOO accuracy: 1.0000" in out


def test_karate_runs(capsys):
    _run("karate_gcn")
    assert "acc" in capsys.readouterr().out.lower()
