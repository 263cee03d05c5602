"""Batch-fit CLI: load -> fit_amares -> save, end-to-end on disk."""

import json

import numpy as np

from xmris_tpu.interop.io import load_dataset_npz, save_npz
from xmris_tpu.runtime.cli import fit_main


def test_fit_cli_end_to_end(tmp_path, capsys):
    from tests.test_fitting import PK_CSV, make_phantom

    pk = tmp_path / "pk.csv"
    pk.write_text(PK_CSV)
    da = make_phantom(n_voxels=3, n_points=256)
    inp = tmp_path / "fids.npz"
    save_npz(da, inp)
    out = tmp_path / "fit.npz"

    rc = fit_main(
        [str(inp), str(pk), "-o", str(out), "--engine", "xla",
         "--max-iter", "40"]
    )
    assert rc == 0

    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["voxels"] == 3
    assert summary["converged_frac"] == 1.0
    assert "PCr" in summary["metabolites"]
    assert summary["voxels_per_s"] > 0

    ds = load_dataset_npz(out)
    amp = ds["amplitude"]
    mets = [str(m) for m in amp.coords["Metabolite"].values]
    pcr = amp.values[..., mets.index("PCr")]
    np.testing.assert_allclose(np.sort(pcr.ravel()), [10.0, 20.0, 30.0],
                               rtol=0.1)
    assert ds["fit_converged"].values.all()


def test_fit_cli_mesh_flag(tmp_path, capsys):
    """--mesh N routes the CLI fit over a device mesh (same results)."""
    from tests.test_fitting import PK_CSV, make_phantom

    pk = tmp_path / "pk.csv"
    pk.write_text(PK_CSV)
    da = make_phantom(n_voxels=3, n_points=256)
    inp = tmp_path / "fids.npz"
    save_npz(da, inp)
    out = tmp_path / "fit_mesh.npz"

    rc = fit_main(
        [str(inp), str(pk), "-o", str(out), "--engine", "xla",
         "--max-iter", "40", "--mesh", "2"]
    )
    assert rc == 0
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["voxels"] == 3 and summary["converged_frac"] == 1.0

    ds = load_dataset_npz(out)
    amp = ds["amplitude"]
    mets = [str(m) for m in amp.coords["Metabolite"].values]
    pcr = amp.values[..., mets.index("PCr")]
    np.testing.assert_allclose(np.sort(pcr.ravel()), [10.0, 20.0, 30.0],
                               rtol=0.1)


def test_recon_cli_end_to_end(tmp_path, capsys):
    """k-space npz -> RSS image npz through the console entry point."""
    from tests.test_recon import make_kspace
    from xmris_tpu.interop.io import load_npz
    from xmris_tpu.runtime.cli import recon_main

    da, _, rss_truth = make_kspace(n=32, n_coils=3)
    inp = tmp_path / "ksp.npz"
    save_npz(da, inp)
    out = tmp_path / "img.npz"

    rc = recon_main([str(inp), "-o", str(out)])
    assert rc == 0
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["combine"] == "rss"
    assert summary["shape"] == [32, 32]

    img = load_npz(out)
    np.testing.assert_allclose(np.abs(img.values), rss_truth, atol=1e-5)

    # SENSE combine path produces a (complex) image of the same shape
    rc = recon_main([str(inp), "-o", str(tmp_path / "img2.npz"),
                     "--combine", "sense"])
    assert rc == 0
    img2 = load_npz(tmp_path / "img2.npz")
    assert img2.values.shape == (32, 32)


def test_fit_cli_component_input(tmp_path, capsys):
    """Planar (component-dim) archives recombine to complex automatically."""
    from tests.test_fitting import PK_CSV, make_phantom
    from xmris_tpu.ops.utils import to_real_imag

    pk = tmp_path / "pk.csv"
    pk.write_text(PK_CSV)
    da = to_real_imag(make_phantom(n_voxels=2, n_points=256))
    inp = tmp_path / "fids_planar.npz"
    save_npz(da, inp)
    out = tmp_path / "fit.npz"

    rc = fit_main(
        [str(inp), str(pk), "-o", str(out), "--engine", "xla",
         "--max-iter", "40"]
    )
    assert rc == 0
    ds = load_dataset_npz(out)
    assert ds["fit_converged"].values.all()


def test_serve_cli_drains_directory(tmp_path, capsys):
    """Streaming server: --once drains pending grids, writes result
    archives, prints one JSON line per grid."""
    from tests.test_fitting import PK_CSV, make_phantom
    from xmris_tpu.runtime.cli import serve_main

    pk = tmp_path / "pk.csv"
    pk.write_text(PK_CSV.replace('"(0, 1)","(0, 1)"', "fixed,fixed"))
    watch = tmp_path / "in"
    watch.mkdir()
    out_dir = tmp_path / "out"
    for i in range(2):
        save_npz(make_phantom(n_voxels=2, n_points=256),
                 watch / f"grid{i}.npz")
    # in-flight atomic-rename suffixes and non-matching files are ignored
    (watch / "grid9.npz.tmp").write_bytes(b"junk")
    (watch / "notes.txt").write_text("not a grid")

    rc = serve_main(
        [str(watch), str(pk), "-o", str(out_dir), "--once",
         "--engine", "xla", "--max-iter", "40"]
    )
    assert rc == 0

    lines = [
        json.loads(ln)
        for ln in capsys.readouterr().out.strip().splitlines()
        if ln.startswith("{")
    ]
    assert sorted(ln["file"] for ln in lines) == ["grid0.npz", "grid1.npz"]
    for ln in lines:
        assert ln["status"] == "ok"
        assert ln["converged_frac"] == 1.0
        assert ln["voxels"] == 2
        assert ln["wall_s"] >= 0
    for i in range(2):
        ds = load_dataset_npz(out_dir / f"grid{i}_fit.npz")
        assert ds["fit_converged"].values.all()


def test_serve_cli_mesh_flag(tmp_path, capsys):
    """--mesh N on the streaming server shards each grid's fit (results
    identical to single-device serving)."""
    from tests.test_fitting import PK_CSV, make_phantom
    from xmris_tpu.runtime.cli import serve_main

    pk = tmp_path / "pk.csv"
    pk.write_text(PK_CSV.replace('"(0, 1)","(0, 1)"', "fixed,fixed"))
    watch = tmp_path / "in"
    watch.mkdir()
    da = make_phantom(n_voxels=3, n_points=256)
    save_npz(da, watch / "grid0.npz")

    rc = serve_main(
        [str(watch), str(pk), "-o", str(tmp_path / "out_mesh"), "--once",
         "--engine", "xla", "--max-iter", "40", "--mesh", "2"]
    )
    assert rc == 0
    line = [
        json.loads(ln)
        for ln in capsys.readouterr().out.strip().splitlines()
        if ln.startswith("{")
    ][-1]
    assert line["status"] == "ok" and line["converged_frac"] == 1.0

    ds = load_dataset_npz(tmp_path / "out_mesh" / "grid0_fit.npz")
    ref = da.xmr.fit_amares(pk, engine="xla", max_iter=40,
                            return_curves=False)
    np.testing.assert_allclose(
        np.asarray(ds["amplitude"].values),
        np.asarray(ref["amplitude"].values), rtol=2e-6,
    )


def test_serve_cli_error_keeps_serving(tmp_path, capsys):
    """A corrupt grid reports status=error and the server continues to
    the next file; exit code 2 flags the failure."""
    from tests.test_fitting import PK_CSV, make_phantom
    from xmris_tpu.runtime.cli import serve_main

    pk = tmp_path / "pk.csv"
    pk.write_text(PK_CSV.replace('"(0, 1)","(0, 1)"', "fixed,fixed"))
    watch = tmp_path / "in"
    watch.mkdir()
    out_dir = tmp_path / "out"
    (watch / "bad.npz").write_bytes(b"this is not an npz archive")
    save_npz(make_phantom(n_voxels=2, n_points=256), watch / "good.npz")

    rc = serve_main(
        [str(watch), str(pk), "-o", str(out_dir), "--once",
         "--engine", "xla", "--max-iter", "40"]
    )
    assert rc == 2

    by_file = {
        ln["file"]: ln
        for ln in (
            json.loads(s)
            for s in capsys.readouterr().out.strip().splitlines()
            if s.startswith("{")
        )
    }
    assert by_file["bad.npz"]["status"] == "error"
    assert by_file["good.npz"]["status"] == "ok"
    assert (out_dir / "good_fit.npz").exists()


def test_serve_cli_state_file_resumes(tmp_path, capsys):
    """A restarted server with --state-file skips grids already handled
    by the previous process and picks up only new arrivals."""
    from tests.test_fitting import PK_CSV, make_phantom
    from xmris_tpu.runtime.cli import serve_main

    pk = tmp_path / "pk.csv"
    pk.write_text(PK_CSV.replace('"(0, 1)","(0, 1)"', "fixed,fixed"))
    watch = tmp_path / "in"
    watch.mkdir()
    out_dir = tmp_path / "out"
    state = tmp_path / "serve.state"
    da = make_phantom(n_voxels=2, n_points=256)
    save_npz(da, watch / "first.npz")

    argv = [str(watch), str(pk), "-o", str(out_dir), "--once",
            "--engine", "xla", "--max-iter", "40",
            "--state-file", str(state)]
    assert serve_main(argv) == 0
    assert state.read_text().splitlines() == ["first.npz"]
    capsys.readouterr()

    save_npz(da, watch / "second.npz")
    assert serve_main(argv) == 0  # fresh process, same ledger
    lines = [
        json.loads(ln)
        for ln in capsys.readouterr().out.strip().splitlines()
        if ln.startswith("{")
    ]
    assert [ln["file"] for ln in lines] == ["second.npz"]
    assert sorted(state.read_text().split()) == ["first.npz", "second.npz"]


def test_serve_cli_pipeline_matches_serial(tmp_path, capsys):
    """The threaded loader/writer pipeline (default) produces the same
    records, outputs, ledger, and exit code as the serial default —
    including in-order records and correct --max-files accounting."""
    from tests.test_fitting import PK_CSV, make_phantom
    from xmris_tpu.interop.io import load_dataset_npz, save_npz
    from xmris_tpu.runtime.cli import serve_main

    pk = tmp_path / "pk.csv"
    pk.write_text(PK_CSV.replace('"(0, 1)","(0, 1)"', "fixed,fixed"))
    watch = tmp_path / "in"
    watch.mkdir()
    da = make_phantom(n_voxels=2, n_points=256)
    for i in range(3):
        save_npz(da, watch / f"g{i}.npz")
    (watch / "bad.npz").write_bytes(b"junk")  # load-stage error path

    runs = {}
    for tag, extra in (("pipe", ["--pipeline"]), ("serial", [])):
        out_dir = tmp_path / f"out_{tag}"
        state = tmp_path / f"{tag}.state"
        rc = serve_main(
            [str(watch), str(pk), "-o", str(out_dir), "--once",
             "--engine", "xla", "--max-iter", "40",
             "--state-file", str(state)] + extra
        )
        lines = [
            json.loads(ln)
            for ln in capsys.readouterr().out.strip().splitlines()
            if ln.startswith("{")
        ]
        for ln in lines:
            ln.pop("wall_s", None)  # stage overlap changes wall clocks
        runs[tag] = (rc, lines, sorted(state.read_text().split()),
                     sorted(p.name for p in out_dir.glob("*_fit.npz")))
    assert runs["pipe"] == runs["serial"]
    rc, lines, ledger, outs = runs["pipe"]
    assert rc == 2  # bad.npz
    assert sorted(ln["file"] for ln in lines) == [
        "bad.npz", "g0.npz", "g1.npz", "g2.npz"
    ]
    assert ledger == ["g0.npz", "g1.npz", "g2.npz"]
    assert outs == ["g0_fit.npz", "g1_fit.npz", "g2_fit.npz"]
    ds = load_dataset_npz(tmp_path / "out_pipe" / "g0_fit.npz")
    assert ds["fit_converged"].values.all()


def test_serve_cli_pipeline_survives_write_stage_crash(
    tmp_path, capsys, monkeypatch
):
    """An exception escaping the write stage must not deadlock --pipeline.

    The ledger append sits outside _write_stage's record try/except; if it
    raises (here: injected at the append open), an unguarded writer thread
    dies, the bounded write_q fills, and the main loop blocks forever on
    put() + the timeoutless join().  The guarded writer keeps draining,
    marks the grids unclean (exit code 2), and surfaces the cause on
    stderr."""
    import builtins
    import threading

    from tests.test_fitting import PK_CSV, make_phantom
    from xmris_tpu.interop.io import save_npz
    from xmris_tpu.runtime.cli import serve_main

    pk = tmp_path / "pk.csv"
    pk.write_text(PK_CSV.replace('"(0, 1)","(0, 1)"', "fixed,fixed"))
    watch = tmp_path / "in"
    watch.mkdir()
    da = make_phantom(n_voxels=2, n_points=256)
    for i in range(3):
        save_npz(da, watch / f"g{i}.npz")
    ledger = tmp_path / "serve.state"
    ledger.touch()

    real_open = builtins.open

    def failing_append(file, mode="r", *a, **kw):
        if str(file) == str(ledger) and "a" in mode:
            raise OSError("simulated ledger write failure")
        return real_open(file, mode, *a, **kw)

    monkeypatch.setattr(builtins, "open", failing_append)
    rc_box = {}

    def run():
        rc_box["rc"] = serve_main(
            [str(watch), str(pk), "-o", str(tmp_path / "out"), "--once",
             "--pipeline", "--engine", "xla", "--max-iter", "40",
             "--state-file", str(ledger)]
        )

    t = threading.Thread(target=run, daemon=True)
    t.start()
    t.join(timeout=300.0)
    # A regression deadlocks here instead of failing an assertion below.
    assert not t.is_alive(), "pipeline serve deadlocked on a writer crash"
    assert rc_box["rc"] == 2
    captured = capsys.readouterr()
    assert "write stage failed" in captured.err
    # The fits themselves succeeded; outputs exist even though the ledger
    # append failed (a restarted server retries these grids).
    assert len(list((tmp_path / "out").glob("*_fit.npz"))) == 3


def test_serve_cli_pipeline_max_files(tmp_path, capsys):
    """--max-files stops after exactly N completed grids (pipeline on)."""
    from tests.test_fitting import PK_CSV, make_phantom
    from xmris_tpu.interop.io import save_npz
    from xmris_tpu.runtime.cli import serve_main

    pk = tmp_path / "pk.csv"
    pk.write_text(PK_CSV.replace('"(0, 1)","(0, 1)"', "fixed,fixed"))
    watch = tmp_path / "in"
    watch.mkdir()
    da = make_phantom(n_voxels=2, n_points=256)
    for i in range(4):
        save_npz(da, watch / f"g{i}.npz")
    out_dir = tmp_path / "out"

    rc = serve_main(
        [str(watch), str(pk), "-o", str(out_dir), "--once", "--pipeline",
         "--engine", "xla", "--max-iter", "40", "--max-files", "2"]
    )
    assert rc == 0
    lines = [
        json.loads(ln)
        for ln in capsys.readouterr().out.strip().splitlines()
        if ln.startswith("{")
    ]
    assert len(lines) == 2
    assert len(list(out_dir.glob("*_fit.npz"))) == 2
