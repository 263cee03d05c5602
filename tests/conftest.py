"""Test configuration: CPU platform, 8 virtual devices, float64 parity mode.

Must set XLA flags before jax initializes — keep this at the very top.
"""

import os

# Force CPU: the ambient environment routes jax to a remote TPU tunnel
# (JAX_PLATFORMS=axon), which would turn every eager op into a network
# round-trip. Tests run on a virtual 8-device CPU mesh instead.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The ambient sitecustomize force-registers the axon TPU backend and sets
# jax_platforms="axon,cpu" *after* env vars are read — override it back.
jax.config.update("jax_platforms", "cpu")

# Double precision on CPU so parity tests can assert <=1e-6 (and much tighter)
# against NumPy float64 oracles. TPU runs stay in complex64 (bench path).
jax.config.update("jax_enable_x64", True)

# Persistent compilation cache: repeat suite runs skip recompiling the
# heavyweight programs (the sharded pipelines in particular), which both
# cuts wall time on slow hosts and sidesteps a rare XLA-CPU compiler
# segfault observed only after a long in-process compile history (the
# same program compiles fine in isolation; with the cache warm the
# crashing compile never happens again).
# The cache directory is fingerprinted by the host's CPU flags: XLA:CPU
# serializes AOT executables with the *compiling* machine's features, and
# loading an entry written by a different host (this build's driver moves
# between machines mid-round, /tmp travels with the image) can SIGILL or
# segfault outright in the deserializer (observed 2026-08-17:
# get_executable_and_time -> Fatal Python error: Segmentation fault).
def _host_fingerprint() -> str:
    import hashlib

    try:
        with open("/proc/cpuinfo") as fh:
            for line in fh:
                if line.startswith("flags"):
                    return hashlib.sha256(line.encode()).hexdigest()[:12]
    except OSError:
        pass
    import platform

    return hashlib.sha256(platform.processor().encode()).hexdigest()[:12]


# Kill-switch: XMT_NO_COMPILE_CACHE=1 disables the persistent cache
# entirely (used by the v10 subprocess umbrella, and the right first
# move when a suite run dies inside get/put_executable_and_time).
if not os.environ.get("XMT_NO_COMPILE_CACHE"):
    for _k, _v in (
        (
            "jax_compilation_cache_dir",
            f"/tmp/jax_xmt_test_cache_{_host_fingerprint()}",
        ),
        ("jax_persistent_cache_min_entry_size_bytes", -1),
        ("jax_persistent_cache_min_compile_time_secs", 0.5),
    ):
        try:
            jax.config.update(_k, _v)
        except Exception:  # pragma: no cover — older jax without the option
            pass

import numpy as np  # noqa: E402
import pytest  # noqa: E402

from xmris_tpu import ATTRS, COORDS, DIMS, XmrArray  # noqa: E402


# ---------------------------------------------------------------------------
# Generic subprocess isolation for giant-compile tests
# ---------------------------------------------------------------------------
# On hosts with very few cores, XLA:CPU's compiler segfaults when a giant
# program (a shard_map'd whole-pipeline or whole-loop Pallas program) is
# compiled late in a long in-process compile history — the same program
# compiles fine in a fresh process (docs/xla_cpu_segfault.md; observed at
# the v10 kernel tests in round 3 and, once those were isolated, at the
# next-largest compile, test_parallel's 8-device mrsi_pipeline).  Tests
# carrying ``@pytest.mark.bigcompile`` therefore run in a FRESH python
# subprocess on such hosts (fresh compile history; the persistent cache
# keeps repeat runs fast).  Multi-core hosts run them in-process, where
# the crash has never been observed.


def _isolate_bigcompile() -> bool:
    if os.environ.get("XMT_ISOLATED_CHILD"):
        return False  # already inside an isolation subprocess
    forced = os.environ.get("XMT_ISOLATE_BIGCOMPILE")
    if forced is not None:
        return forced not in ("0", "")
    return (os.cpu_count() or 1) <= 2


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "bigcompile: giant XLA:CPU compile; runs in a fresh subprocess on "
        "few-core hosts (see docs/xla_cpu_segfault.md)",
    )


# ---------------------------------------------------------------------------
# Chunked full-suite execution on few-core hosts
# ---------------------------------------------------------------------------
# Per-test isolation above is not enough: on a 1-CPU host the XLA:CPU
# heap corruption accumulates over the WHOLE in-process compile history,
# and once past the threshold (~500 tests into a full run) the next
# sizeable native operation — a compile, a compile-cache read, or a
# cache write — segfaults.  The crash site therefore moves every time a
# single test is isolated (observed at the v10 kernels, then the 8-device
# mrsi_pipeline, then mrsi_pipeline's engine-selection compile, then a
# plain DE autophase cache READ in test_phasing — the last one is not
# even a big compile).  The structural fix: when a full-suite run starts
# on a few-core host, run each test MODULE in its own fresh subprocess.
# Compile history is bounded by one module, the persistent compile cache
# keeps repeat compiles cheap, and the per-test bigcompile isolation
# still applies inside each chunk.  Multi-core hosts (where the crash
# has never been observed) run the normal in-process loop.


def _chunk_suite(session) -> bool:
    if os.environ.get("XMT_ISOLATED_CHILD") or os.environ.get(
        "XMT_CHUNK_CHILD"
    ):
        return False  # never recurse
    forced = os.environ.get("XMT_CHUNK_SUITE")
    if forced is not None:
        return forced not in ("0", "")
    # Only full-suite-sized runs are at risk; single-file runs keep
    # today's behavior.
    return (os.cpu_count() or 1) <= 2 and len(session.items) >= 200


def pytest_runtestloop(session):
    if session.config.getvalue("collectonly"):
        return None
    if not _chunk_suite(session):
        return None
    import subprocess
    import sys

    groups: list[tuple[str, list[str]]] = []
    for item in session.items:
        path = str(item.path)
        if not groups or groups[-1][0] != path:
            groups.append((path, []))
        groups[-1][1].append(item.nodeid)

    maxfail = session.config.getvalue("maxfail") or 0
    capman = session.config.pluginmanager.getplugin("capturemanager")
    if capman is not None:
        capman.suspend_global_capture(in_=True)
    try:
        print(
            f"\n[conftest] few-core host: running {len(session.items)} "
            f"tests as {len(groups)} per-module subprocess chunks "
            f"(fresh XLA compile history each; see "
            f"docs/xla_cpu_segfault.md). XMT_CHUNK_SUITE=0 disables.",
            flush=True,
        )
        failed_chunks: list[str] = []
        for path, nodeids in groups:
            rel = os.path.relpath(path, session.config.rootpath)
            print(f"[conftest] chunk: {rel} ({len(nodeids)} tests)", flush=True)
            cmd = [sys.executable, "-m", "pytest", "-q", "--no-header"]
            if maxfail:
                cmd.append("-x")
            cmd += nodeids
            env = dict(os.environ, XMT_CHUNK_CHILD="1")
            rc = subprocess.run(
                cmd, cwd=str(session.config.rootpath), env=env
            ).returncode
            # rc 5 = "no tests ran" (a chunk fully deselected/skipped
            # by the child's own logic) — not a failure.
            if rc not in (0, 5):
                failed_chunks.append(rel)
                session.testsfailed += 1
                if maxfail and len(failed_chunks) >= maxfail:
                    break
        if failed_chunks:
            print(
                f"[conftest] {len(failed_chunks)} chunk(s) failed: "
                + ", ".join(failed_chunks),
                flush=True,
            )
        else:
            print(
                f"[conftest] all {len(groups)} chunks green "
                "(counts are in the per-chunk summaries above)",
                flush=True,
            )
    finally:
        if capman is not None:
            capman.resume_global_capture()
    return True


def pytest_runtest_protocol(item, nextitem):
    if item.get_closest_marker("bigcompile") is None:
        return None
    if not _isolate_bigcompile():
        return None
    import subprocess
    import sys
    import time

    from _pytest.reports import TestReport

    hook = item.ihook
    hook.pytest_runtest_logstart(nodeid=item.nodeid, location=item.location)
    t0 = time.monotonic()
    env = dict(os.environ, XMT_ISOLATED_CHILD="1")
    proc = subprocess.run(
        [sys.executable, "-m", "pytest", "-q", "--no-header", item.nodeid],
        capture_output=True,
        text=True,
        env=env,
        cwd=str(item.config.rootpath),
    )
    duration = time.monotonic() - t0
    out = proc.stdout or ""
    if proc.returncode == 0 and "passed" not in out and (
        "skipped" in out or "xfailed" in out
    ):
        # "xfailed" would otherwise fall through to the generic rc==0
        # branch and report a known-broken test as passed.  ("xpassed"
        # contains "passed" and correctly lands there.)
        outcome = "skipped"
        longrepr = (str(item.path), 0, "skipped inside isolated subprocess")
    elif proc.returncode == 0:
        outcome, longrepr = "passed", None
    else:
        outcome = "failed"
        tail = (out[-8000:] + "\n" + (proc.stderr or "")[-4000:]).strip()
        longrepr = (
            f"isolated subprocess exited rc={proc.returncode}\n{tail}"
        )
    report = TestReport(
        nodeid=item.nodeid,
        location=item.location,
        keywords={item.name: 1},
        outcome=outcome,
        longrepr=longrepr,
        when="call",
        sections=[],
        duration=duration,
        user_properties=[],
    )
    hook.pytest_runtest_logreport(report=report)
    # Short-circuiting the protocol skips pytest's LAZY teardown step:
    # earlier in-process items leave class/module finalizers on the
    # SetupState stack for the *next* item's protocol to pop, and if we
    # don't pop them here the next in-process test dies in
    # SetupState.setup with "previous item was not torn down properly".
    # This item itself never ran setup in-process, so teardown_exact only
    # retires state owed by previous items, exactly as the normal
    # protocol's pytest_runtest_teardown(nextitem=...) would.
    try:
        item.session._setupstate.teardown_exact(nextitem)
    except BaseException:
        hook.pytest_runtest_logreport(
            report=TestReport(
                nodeid=item.nodeid,
                location=item.location,
                keywords={item.name: 1},
                outcome="failed",
                longrepr="teardown of prior in-process fixtures failed "
                "after isolated-subprocess run",
                when="teardown",
                sections=[],
                duration=0.0,
                user_properties=[],
            )
        )
    hook.pytest_runtest_logfinish(nodeid=item.nodeid, location=item.location)
    return True


@pytest.fixture
def empty_da() -> XmrArray:
    """Worst-case input: no coords, no attrs, anonymous dims."""
    return XmrArray(np.zeros((8,)), dims=("dim_0",))


@pytest.fixture
def valid_fid_da() -> XmrArray:
    """A 2048-point complex FID with physical coords and required attrs."""
    n = 2048
    sw = 5000.0
    t = np.arange(n) / sw
    data = np.exp(-50.0 * t) * np.exp(1j * 2 * np.pi * 120.0 * t)
    return XmrArray(
        data.astype(np.complex128),
        dims=(DIMS.time,),
        coords={COORDS.time: (DIMS.time, t, {"units": "s"})},
        attrs={
            ATTRS.reference_frequency: 127.6261421,
            ATTRS.carrier_ppm: 4.7,
        },
        name="fid",
    )


@pytest.fixture
def valid_spectrum_da(valid_fid_da) -> XmrArray:
    return valid_fid_da.xmr.to_spectrum()


@pytest.fixture
def multi_dim_da() -> XmrArray:
    """A 4x4 voxel grid of 256-pt FIDs (16-voxel MRSI phantom)."""
    rng = np.random.default_rng(7)
    n = 256
    sw = 4000.0
    t = np.arange(n) / sw
    freqs = rng.uniform(-500, 500, size=(4, 4))
    amps = rng.uniform(0.5, 2.0, size=(4, 4))
    data = amps[..., None] * np.exp(
        (1j * 2 * np.pi * freqs[..., None] - 30.0) * t[None, None, :]
    )
    return XmrArray(
        data.astype(np.complex128),
        dims=(DIMS.x, DIMS.y, DIMS.time),
        coords={
            COORDS.time: (DIMS.time, t, {"units": "s"}),
            DIMS.x: np.arange(4),
            DIMS.y: np.arange(4),
        },
        attrs={ATTRS.reference_frequency: 120.0, ATTRS.carrier_ppm: 0.0},
        name="mrsi",
    )
