"""Docs build + doc-coverage gate (the reference gates CI on a sphinx docs
build, ``.travis.yml:29-33``; ``docs/build_docs.py`` is the stdlib-only
equivalent — it fails when any public name is unimportable or undocumented)."""
import os.path as osp
import subprocess
import sys

REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))


def test_docs_build_gate(tmp_path):
    r = subprocess.run(
        [sys.executable, osp.join(REPO, "docs", "build_docs.py"),
         "--out", str(tmp_path)],
        capture_output=True, text=True, timeout=600,
        env={**__import__("os").environ, "JAX_PLATFORMS": "cpu"},
    )
    assert r.returncode == 0, f"doc gate failed:\n{r.stderr[-2000:]}"
    pages = list(tmp_path.glob("*.md"))
    assert len(pages) >= 15, f"expected >=15 module pages, got {len(pages)}"
    index = (tmp_path / "index.md").read_text()
    assert "stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.nn" in index
