#!/usr/bin/env python
"""Self-contained API docs builder + doc-coverage gate.

The reference gates CI on a sphinx docs build (`.travis.yml:29-33` builds
`GCN_classifier/docs/`). This environment has no sphinx/mkdocs and installs
are not allowed, so the equivalent here is a stdlib-only generator: it walks
the package's public surface (each subpackage's ``__all__``), renders one
markdown page per module from live signatures + docstrings, and **fails the
build** when a public name is missing, unimportable, or undocumented — the
same class of drift sphinx's nitpicky autodoc catches.

Usage::

    python docs/build_docs.py [--out docs/api] [--check-only]
"""
from __future__ import annotations

import argparse
import importlib
import inspect
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PKG = "stm_multifrontal_qr_factorization_empowered_by_gcn_tpu"

# Public modules documented (and gated) — one page each.
MODULES = [
    f"{PKG}",
    f"{PKG}.data",
    f"{PKG}.datasets",
    f"{PKG}.io",
    f"{PKG}.nn",
    f"{PKG}.nn.conv",
    f"{PKG}.nn.pool",
    f"{PKG}.nn.glob",
    f"{PKG}.nn.norm",
    f"{PKG}.nn.dense",
    f"{PKG}.nn.models",
    f"{PKG}.ops",
    f"{PKG}.ops.plan",
    f"{PKG}.parallel",
    f"{PKG}.sparseqr",
    f"{PKG}.train",
    f"{PKG}.transforms",
    f"{PKG}.utils",
    f"{PKG}.visualization",
]


def _public_names(mod):
    names = getattr(mod, "__all__", None)
    if names is None:
        names = [n for n in vars(mod) if not n.startswith("_")]
        names = [
            n for n in names
            if not inspect.ismodule(getattr(mod, n))
        ]
    return sorted(names)


def _signature(obj) -> str:
    try:
        return str(inspect.signature(obj))
    except (TypeError, ValueError):
        return "(...)"


def _first_paragraph(doc: str) -> str:
    lines = []
    for line in doc.strip().splitlines():
        if not line.strip():
            break
        lines.append(line.strip())
    return " ".join(lines)


def render_module(modname: str):
    """Returns (markdown_text, problems) for one module page."""
    problems = []
    try:
        mod = importlib.import_module(modname)
    except Exception as e:  # noqa: BLE001
        return None, [f"{modname}: import failed: {e}"]

    out = [f"# `{modname}`", ""]
    moddoc = inspect.getdoc(mod)
    if not moddoc:
        problems.append(f"{modname}: module has no docstring")
    else:
        out += [moddoc, ""]

    for name in _public_names(mod):
        obj = getattr(mod, name, None)
        if obj is None:
            problems.append(f"{modname}.{name}: in __all__ but missing")
            continue
        if inspect.ismodule(obj):
            continue
        doc = inspect.getdoc(obj)
        if inspect.isclass(obj):
            out.append(f"## class `{name}{_signature(obj)}`")
            out.append("")
            if doc:
                out += [doc, ""]
            else:
                problems.append(f"{modname}.{name}: class has no docstring")
            methods = [
                (mn, mo)
                for mn, mo in inspect.getmembers(obj, inspect.isfunction)
                if not mn.startswith("_") and mo.__qualname__.startswith(obj.__name__)
            ]
            for mn, mo in methods:
                mdoc = inspect.getdoc(mo)
                out.append(f"### `{name}.{mn}{_signature(mo)}`")
                out.append("")
                if mdoc:
                    out += [mdoc, ""]
        elif callable(obj):
            out.append(f"## `{name}{_signature(obj)}`")
            out.append("")
            if doc:
                out += [doc, ""]
            else:
                problems.append(f"{modname}.{name}: function has no docstring")
        else:
            out.append(f"## `{name}` (constant, `{type(obj).__name__}`)")
            out.append("")
    return "\n".join(out) + "\n", problems


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join(os.path.dirname(__file__), "api"))
    ap.add_argument("--check-only", action="store_true",
                    help="gate only; write nothing")
    args = ap.parse_args()

    # doc builds never need a TPU; stay on CPU so CI/offline runs work
    import jax

    jax.config.update("jax_platforms", "cpu")

    all_problems = []
    pages = {}
    for modname in MODULES:
        text, problems = render_module(modname)
        all_problems += problems
        if text is not None:
            pages[modname] = text

    if not args.check_only:
        os.makedirs(args.out, exist_ok=True)
        index = ["# API reference", ""]
        for modname, text in pages.items():
            fname = modname.replace(".", "_") + ".md"
            with open(os.path.join(args.out, fname), "w") as f:
                f.write(text)
            index.append(f"- [`{modname}`]({fname})")
        with open(os.path.join(args.out, "index.md"), "w") as f:
            f.write("\n".join(index) + "\n")
        print(f"wrote {len(pages)} module pages to {args.out}")

    if all_problems:
        print(f"DOC GATE: {len(all_problems)} problem(s):", file=sys.stderr)
        for p in all_problems:
            print(f"  - {p}", file=sys.stderr)
        return 1
    print("doc gate clean: every public name importable + documented")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
