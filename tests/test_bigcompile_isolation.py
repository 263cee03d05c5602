"""The bigcompile subprocess-isolation hook must not corrupt pytest state.

``tests/conftest.py`` short-circuits ``pytest_runtest_protocol`` for
``@pytest.mark.bigcompile`` items on few-core hosts, running them in a
fresh python subprocess (docs/xla_cpu_segfault.md).  Skipping the normal
protocol also skips pytest's lazy teardown: earlier in-process items
leave class/module finalizers on the SetupState stack for the next
item's protocol to pop.  The hook must pop them itself or the next
in-process test errors with "previous item was not torn down properly"
(observed 2026-08-18 at
``test_parallel.py::TestEngineSelection::test_planar_engine_labeled_front_end``,
the first unmarked test after the marked shard_map group).

This test drives the REAL conftest (read from disk, so it cannot drift
from the code under test) in a pytester-managed tmp dir with isolation
forced on, reproducing the exact failing shape: a plain test in one
class, a marked test, then a plain test in a *different* class.
"""

from __future__ import annotations

import os
from pathlib import Path

pytest_plugins = ["pytester"]

_REPO_ROOT = Path(__file__).resolve().parents[1]


def test_isolated_item_tears_down_previous_state(pytester, monkeypatch):
    monkeypatch.setenv("XMT_ISOLATE_BIGCOMPILE", "1")
    monkeypatch.delenv("XMT_ISOLATED_CHILD", raising=False)
    # The copied conftest imports xmris_tpu; the tmp rootdir isn't the
    # repo, so extend the import path for the subprocess (and its nested
    # isolation child, which inherits the environment).
    pythonpath = str(_REPO_ROOT)
    if os.environ.get("PYTHONPATH"):
        pythonpath += os.pathsep + os.environ["PYTHONPATH"]
    monkeypatch.setenv("PYTHONPATH", pythonpath)

    pytester.makeconftest((Path(__file__).parent / "conftest.py").read_text())
    pytester.makepyfile(
        test_seq="""
        import os

        import pytest


        class TestFirst:
            def test_plain(self):
                assert True

            @pytest.mark.bigcompile
            def test_isolated(self):
                # Proof the marked body really ran in the fresh child.
                assert os.environ.get("XMT_ISOLATED_CHILD") == "1"


        class TestSecond:
            def test_after_isolated(self):
                assert True
        """
    )
    result = pytester.runpytest_subprocess("-q", "-p", "no:cacheprovider")
    result.assert_outcomes(passed=3, errors=0, failed=0)


def test_isolated_item_failure_is_reported(pytester, monkeypatch):
    monkeypatch.setenv("XMT_ISOLATE_BIGCOMPILE", "1")
    monkeypatch.delenv("XMT_ISOLATED_CHILD", raising=False)
    pythonpath = str(_REPO_ROOT)
    if os.environ.get("PYTHONPATH"):
        pythonpath += os.pathsep + os.environ["PYTHONPATH"]
    monkeypatch.setenv("PYTHONPATH", pythonpath)

    pytester.makeconftest((Path(__file__).parent / "conftest.py").read_text())
    pytester.makepyfile(
        test_seq="""
        import pytest


        @pytest.mark.bigcompile
        def test_isolated_fails():
            raise AssertionError("boom-in-child")


        def test_after_failure():
            assert True
        """
    )
    result = pytester.runpytest_subprocess("-q", "-p", "no:cacheprovider")
    result.assert_outcomes(passed=1, failed=1, errors=0)
    result.stdout.fnmatch_lines(["*boom-in-child*"])


def test_isolated_xfail_is_not_reported_as_passed(pytester, monkeypatch):
    """An xfailed child run (rc 0, "1 xfailed") must not count as passed.

    The outcome heuristic classifies the child's -q summary; "xfailed"
    contains neither "passed" nor "skipped", so it previously fell
    through to the generic rc==0 branch and a known-broken test showed
    up as a pass."""
    monkeypatch.setenv("XMT_ISOLATE_BIGCOMPILE", "1")
    monkeypatch.delenv("XMT_ISOLATED_CHILD", raising=False)
    pythonpath = str(_REPO_ROOT)
    if os.environ.get("PYTHONPATH"):
        pythonpath += os.pathsep + os.environ["PYTHONPATH"]
    monkeypatch.setenv("PYTHONPATH", pythonpath)

    pytester.makeconftest((Path(__file__).parent / "conftest.py").read_text())
    pytester.makepyfile(
        test_seq="""
        import pytest


        @pytest.mark.bigcompile
        @pytest.mark.xfail(reason="known broken")
        def test_isolated_xfail():
            raise AssertionError("expected failure")
        """
    )
    result = pytester.runpytest_subprocess("-q", "-p", "no:cacheprovider")
    result.assert_outcomes(passed=0, failed=0, errors=0, skipped=1)


def _chunk_env(monkeypatch):
    monkeypatch.setenv("XMT_CHUNK_SUITE", "1")
    monkeypatch.delenv("XMT_CHUNK_CHILD", raising=False)
    monkeypatch.delenv("XMT_ISOLATED_CHILD", raising=False)
    monkeypatch.setenv("XMT_ISOLATE_BIGCOMPILE", "0")
    pythonpath = str(_REPO_ROOT)
    if os.environ.get("PYTHONPATH"):
        pythonpath += os.pathsep + os.environ["PYTHONPATH"]
    monkeypatch.setenv("PYTHONPATH", pythonpath)


def test_chunked_suite_runs_each_module_in_subprocess(pytester, monkeypatch):
    _chunk_env(monkeypatch)
    pytester.makeconftest((Path(__file__).parent / "conftest.py").read_text())
    pytester.makepyfile(
        test_alpha="""
        import os


        def test_in_chunk_child():
            assert os.environ.get("XMT_CHUNK_CHILD") == "1"
        """,
        test_beta="""
        def test_two():
            assert True
        """,
    )
    result = pytester.runpytest_subprocess("-q", "-p", "no:cacheprovider")
    assert result.ret == 0
    result.stdout.fnmatch_lines(
        ["*chunk: test_alpha.py*", "*chunk: test_beta.py*", "*chunks green*"]
    )


def test_chunked_suite_propagates_failure(pytester, monkeypatch):
    _chunk_env(monkeypatch)
    pytester.makeconftest((Path(__file__).parent / "conftest.py").read_text())
    pytester.makepyfile(
        test_alpha="""
        def test_fails():
            raise AssertionError("chunk-failure-marker")
        """,
        test_beta="""
        def test_ok():
            assert True
        """,
    )
    result = pytester.runpytest_subprocess("-q", "-p", "no:cacheprovider")
    assert result.ret == 1
    result.stdout.fnmatch_lines(["*chunk-failure-marker*", "*1 chunk(s) failed*"])
