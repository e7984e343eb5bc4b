"""End-to-end smoke test of the qrtest driver script — the reference's
integration test ritual (``STMMQR/test/test.sh`` batch-runs ``qrtest`` and
checks the printed residual).  Runs the script as a subprocess on CPU."""
import os
import os.path as osp
import re
import subprocess
import sys

import pytest

ROOT = osp.dirname(osp.dirname(osp.abspath(__file__)))
MTX = osp.join(ROOT, "data", "matrices", "dwt_992.mtx")


@pytest.mark.skipif(not osp.exists(MTX), reason="dwt_992.mtx not present")
def test_qrtest_script_end_to_end(tmp_path):
    out = subprocess.run(
        [sys.executable, osp.join(ROOT, "scripts", "qrtest.py"), MTX, "7",
         "0", "--platform", "cpu", "--results-dir", str(tmp_path)],
        capture_output=True, text=True, timeout=900, cwd=ROOT)
    assert out.returncode == 0, out.stderr[-2000:]
    assert "factorize:" in out.stdout and "solve:" in out.stdout
    qt = (tmp_path / "QR_Time.txt").read_text().strip().split()
    assert qt[0] == "7" and len(qt) == 5  # id, ana, fac, total, residual
    assert float(qt[1]) > 0 and float(qt[2]) > 0


@pytest.mark.skipif(not osp.exists(MTX), reason="dwt_992.mtx not present")
def test_qrtest_write_graph_mode(tmp_path):
    """--write-graph = the -Dwrite_graph feature-emission mode
    (``SparseCore_read_write.c:1040-1190``): emits the three tables and
    skips factorization."""
    out = subprocess.run(
        [sys.executable, osp.join(ROOT, "scripts", "qrtest.py"), MTX, "3",
         "--write-graph", "--results-dir", str(tmp_path)],
        capture_output=True, text=True, timeout=300, cwd=ROOT)
    assert out.returncode == 0, out.stderr[-2000:]
    for fname in ("QR_Node.txt", "QR_Edge.txt", "QR_extinfo.txt"):
        assert (tmp_path / fname).exists(), fname
    node = (tmp_path / "QR_Node.txt").read_text().splitlines()
    assert len(node) == 992  # one row per node
    assert node[0].split()[0] == "3"  # graph id column
