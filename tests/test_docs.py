"""Documentation-as-tests: execute every python block in docs/*.md.

The reference's primary integration suite is its documentation notebooks
(``tests/README.md``: "the primary test suite ... is integrated into our
documentation notebooks", run via jupytext+nbmake).  This harness provides
the same guarantee without notebook tooling: each docs page's fenced
``python`` blocks execute top-to-bottom in a shared namespace; a block
preceded by an HTML comment containing ``no-test`` is skipped (e.g. samples
requiring local scanner exports).
"""


from pathlib import Path

import matplotlib
import pytest

matplotlib.use("Agg")

_DOCS_DIR = Path(__file__).resolve().parent.parent / "docs"
DOCS = sorted(
    list(_DOCS_DIR.glob("*.md"))
    + list(_DOCS_DIR.glob("notebooks/**/*.md"))
    + list(_DOCS_DIR.glob("contributing/*.md"))
)

# One definition shared with the notebook generator, so published .ipynb
# files and the executed tests can never disagree on block conventions.
from xmris_tpu._scripts import DOC_PYTHON_BLOCK_RE as _BLOCK_RE


def _blocks(path: Path):
    text = path.read_text()
    out = []
    for m in _BLOCK_RE.finditer(text):
        skip = m.group(1) is not None
        out.append((skip, m.group(2)))
    return out


@pytest.mark.parametrize("doc", DOCS, ids=[d.stem for d in DOCS])
def test_doc_executes(doc):
    blocks = _blocks(doc)
    if not any(not skip for skip, _ in blocks):
        pytest.skip(f"{doc.name} has no executable blocks")
    ns: dict = {}
    executed = 0
    for skip, code in blocks:
        if skip:
            continue
        exec(compile(code, f"{doc.name}", "exec"), ns)  # noqa: S102
        executed += 1
    assert executed > 0
