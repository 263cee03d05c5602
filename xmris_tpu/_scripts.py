"""Console entry points: test runner, docs builder, benchmark.

Equivalent of the reference's ``_scripts.py`` pipeline (console scripts
``docs-api`` / ``docs-notebooks`` / ``test-gen`` / ``test``,
``pyproject.toml:41-46``), adapted to this environment: the API reference is
generated from docstrings with no external tooling, notebook generation is
gated on jupytext availability, and tests run through pytest directly.
"""

from __future__ import annotations

import importlib
import inspect
import subprocess
import sys
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parent.parent

# The docs-page code-block convention, shared with tests/test_docs.py (the
# docs-as-tests harness) so the published notebooks and the executed tests
# can never disagree about which blocks are executable: fenced ``python``
# blocks run; a preceding HTML comment containing ``no-test`` opts out.
import re as _re

DOC_PYTHON_BLOCK_RE = _re.compile(
    r"(<!--[^>]*no-test[^>]*-->\s*)?```python\n(.*?)```", _re.DOTALL
)

_API_MODULES = [
    "xmris_tpu",
    "xmris_tpu.core.config",
    "xmris_tpu.core.array",
    "xmris_tpu.core.accessor",
    "xmris_tpu.core.validation",
    "xmris_tpu.ops.fourier",
    "xmris_tpu.ops.fid",
    "xmris_tpu.ops.phasing",
    "xmris_tpu.ops.baseline",
    "xmris_tpu.ops.optim",
    "xmris_tpu.ops.utils",
    "xmris_tpu.ops.kernels.dft",
    "xmris_tpu.ops.kernels.dft_pallas",
    "xmris_tpu.ops.kernels.lm_pallas",
    "xmris_tpu.models.lineshapes",
    "xmris_tpu.fitting.simulation",
    "xmris_tpu.fitting.prior",
    "xmris_tpu.fitting.lm",
    "xmris_tpu.fitting.amares",
    "xmris_tpu.parallel.mesh",
    "xmris_tpu.parallel.pipeline",
    "xmris_tpu.parallel.planar_pipeline",
    "xmris_tpu.recon.kspace",
    "xmris_tpu.recon.sense",
    "xmris_tpu.vendor.bruker",
    "xmris_tpu.visualization.plot",
    "xmris_tpu.visualization.widget",
    "xmris_tpu.interop.xarray",
    "xmris_tpu.interop.io",
    "xmris_tpu.runtime.cli",
    "xmris_tpu.runtime.config",
    "xmris_tpu.runtime.profiling",
]


def _doc_for(obj) -> str:
    doc = inspect.getdoc(obj) or "*(undocumented)*"
    return doc


def build_api_docs(out_dir: str | Path | None = None) -> Path:
    """Generate a markdown API reference from live docstrings."""
    out_dir = Path(out_dir or REPO_ROOT / "docs" / "api")
    out_dir.mkdir(parents=True, exist_ok=True)

    index_lines = ["# API Reference", ""]
    for mod_name in _API_MODULES:
        mod = importlib.import_module(mod_name)
        lines = [f"# `{mod_name}`", "", _doc_for(mod), ""]
        public = [
            (name, obj)
            for name, obj in vars(mod).items()
            if not name.startswith("_")
            and (inspect.isfunction(obj) or inspect.isclass(obj))
            and getattr(obj, "__module__", None) == mod_name
        ]
        for name, obj in public:
            kind = "class" if inspect.isclass(obj) else "function"
            try:
                sig = str(inspect.signature(obj))
            except (TypeError, ValueError):
                sig = "(...)"
            lines += [f"## `{name}{sig}`", "", f"*{kind}*", "", _doc_for(obj), ""]
            if inspect.isclass(obj):
                for mname, meth in vars(obj).items():
                    if mname.startswith("_") or not callable(meth):
                        continue
                    try:
                        msig = str(inspect.signature(meth))
                    except (TypeError, ValueError):
                        msig = "(...)"
                    lines += [
                        f"### `{name}.{mname}{msig}`",
                        "",
                        _doc_for(meth),
                        "",
                    ]
        page = out_dir / (mod_name.replace(".", "_") + ".md")
        page.write_text("\n".join(lines))
        index_lines.append(f"- [`{mod_name}`]({page.name})")

    index = out_dir / "index.md"
    index.write_text("\n".join(index_lines) + "\n")
    print(f"API reference written to {out_dir} ({len(_API_MODULES)} modules)")
    return out_dir


def markdown_to_notebook(md_path: str | Path) -> dict:
    """Convert a MyST-style markdown page to a Jupyter notebook dict.

    Equivalent of the reference's jupytext conversion
    (``_scripts.py:308-363``) with no external tooling: fenced ``python``
    blocks become code cells, everything between them markdown cells.
    Blocks preceded by an HTML comment containing ``no-test`` become
    markdown (they document samples requiring local scanner exports).
    """
    text = Path(md_path).read_text()
    block_re = DOC_PYTHON_BLOCK_RE

    cells = []

    def md_cell(chunk: str):
        chunk = chunk.strip("\n")
        if chunk:
            cells.append(
                {
                    "cell_type": "markdown",
                    "metadata": {},
                    "source": chunk.splitlines(keepends=True),
                }
            )

    pos = 0
    for m in block_re.finditer(text):
        md_cell(text[pos : m.start()])
        code = m.group(2)
        if m.group(1):  # no-test: keep as fenced markdown, don't execute
            md_cell(f"```python\n{code}```")
        else:
            cells.append(
                {
                    "cell_type": "code",
                    "execution_count": None,
                    "metadata": {},
                    "outputs": [],
                    "source": code.splitlines(keepends=True),
                }
            )
        pos = m.end()
    md_cell(text[pos:])

    return {
        "cells": cells,
        "metadata": {
            "kernelspec": {
                "display_name": "Python 3",
                "language": "python",
                "name": "python3",
            },
            "language_info": {"name": "python"},
        },
        "nbformat": 4,
        "nbformat_minor": 5,
    }


def generate_test_notebooks(out_dir: str | Path | None = None) -> Path:
    """Convert every docs page to an executable ``.ipynb``.

    Mirrors the reference's ``generate_test_notebooks``
    (``_scripts.py:308-363``: MyST .md -> .ipynb into
    ``tests/autogen_notebooks/``), implemented without jupytext — an
    ``.ipynb`` is plain JSON.  Directory structure under ``docs/`` is
    preserved so notebook names stay unique.
    """
    import json

    out_dir = Path(out_dir or REPO_ROOT / "tests" / "autogen_notebooks")
    count = 0
    for md in sorted((REPO_ROOT / "docs").glob("**/*.md")):
        rel = md.relative_to(REPO_ROOT / "docs")
        dest = (out_dir / rel).with_suffix(".ipynb")
        dest.parent.mkdir(parents=True, exist_ok=True)
        dest.write_text(json.dumps(markdown_to_notebook(md), indent=1))
        count += 1
    print(f"{count} notebooks written to {out_dir}")
    return out_dir


def build_docs() -> None:
    """Build the full documentation set (reference's ``docs`` script):
    regenerate the API reference and the notebook mirrors of every page."""
    build_api_docs()
    generate_test_notebooks()


def run_tests(extra_args: list[str] | None = None) -> int:
    """Run the test suite (architecture + parity + integration)."""
    cmd = [sys.executable, "-m", "pytest", "tests/", "-q"]
    cmd += extra_args if extra_args is not None else sys.argv[1:]
    return subprocess.call(cmd, cwd=REPO_ROOT)


def run_bench() -> int:
    """Run the headline benchmark (prints one JSON line)."""
    return subprocess.call([sys.executable, str(REPO_ROOT / "bench.py")])


def main() -> None:  # pragma: no cover - thin CLI
    """Dispatch: python -m xmris_tpu._scripts <docs-api|test-gen|test|bench>."""
    cmd = sys.argv[1] if len(sys.argv) > 1 else "test"
    if cmd == "docs-api":
        build_api_docs()
    elif cmd == "docs":
        build_docs()
    elif cmd == "test-gen":
        generate_test_notebooks()
    elif cmd == "test":
        sys.exit(run_tests(sys.argv[2:]))
    elif cmd == "bench":
        sys.exit(run_bench())
    else:
        print(__doc__)
        sys.exit(2)


if __name__ == "__main__":  # pragma: no cover
    main()
