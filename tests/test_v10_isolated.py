"""Umbrella runner for the v10 whole-loop kernel tests.

``tests/test_lm_pallas_v10.py`` traces the entire LM loop into one
pallas_call — the largest XLA:CPU program in the suite.  Compiling it
late in a long in-process compile history deterministically SIGSEGVs
the XLA:CPU compiler on 1-CPU hosts (see ``docs/xla_cpu_segfault.md``).
The same program compiles fine in a fresh process, so we run the whole
v10 module in a subprocess: a fresh compile history, the persistent
compile cache disabled, and — crucially — a crash there fails THIS test
instead of killing the suite process.
"""

import os
import subprocess
import sys

def test_v10_kernel_suite_in_subprocess():
    env = dict(os.environ)
    env["XMT_V10_ISOLATED"] = "1"
    env["XMT_NO_COMPILE_CACHE"] = "1"
    here = os.path.dirname(os.path.abspath(__file__))
    root = os.path.dirname(here)
    result = subprocess.run(
        [
            sys.executable,
            "-m",
            "pytest",
            "-q",
            "-p",
            "no:cacheprovider",
            os.path.join(here, "test_lm_pallas_v10.py"),
        ],
        cwd=root,
        env=env,
        capture_output=True,
        text=True,
        timeout=3600,
    )
    if result.returncode != 0:
        raise AssertionError(
            "v10 kernel subprocess suite failed "
            f"(rc={result.returncode}):\n"
            f"--- stdout ---\n{result.stdout[-8000:]}\n"
            f"--- stderr ---\n{result.stderr[-4000:]}"
        )
    # surface the inner pass count in -v runs
    tail = result.stdout.strip().splitlines()
    print("v10 subprocess:", tail[-1] if tail else "(no output)")
