"""Attribute the fused grid program's residual copy/reshape device time.

Compiles ``process_grid_planar_raw`` for the ACTIVE backend (axon TPU by
default — the compile is cached from the r11 session; no execution) and
ranks the optimized-HLO ``copy``/``reshape``/``transpose``/``fusion``
ops by output bytes, printing the source-op provenance XLA kept in the
metadata.  Pure static analysis: one `.lower().compile()` round trip,
zero device dispatches.

Usage:  python scripts/hlo_attrib.py            # TPU layouts (the truth)
        XMT_FORCE_CPU=1 python scripts/hlo_attrib.py   # offline approx
"""

from __future__ import annotations

import os
import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

if os.environ.get("XMT_FORCE_CPU"):
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["PALLAS_AXON_POOL_IPS"] = ""

import jax
import jax.numpy as jnp
import numpy as np

if os.environ.get("XMT_FORCE_CPU"):
    jax.config.update("jax_platforms", "cpu")

for k, v in (
    ("jax_compilation_cache_dir", "/root/.cache/jax_xmt"),
    ("jax_persistent_cache_min_entry_size_bytes", -1),
    ("jax_persistent_cache_min_compile_time_secs", 1.0),
):
    try:
        jax.config.update(k, v)
    except Exception:
        pass

DTYPE_BYTES = {"f32": 4, "bf16": 2, "s32": 4, "u32": 4, "pred": 1, "f16": 2}
SHAPE_RE = re.compile(r"(f32|bf16|s32|u32|pred|f16)\[([0-9,]*)\]")


def shape_bytes(text: str) -> int:
    m = SHAPE_RE.search(text)
    if not m:
        return 0
    dims = [int(d) for d in m.group(2).split(",") if d] or [1]
    return int(np.prod(dims)) * DTYPE_BYTES[m.group(1)]


def main() -> None:
    import tempfile

    import bench
    from xmris_tpu.fitting.amares import seed_plan, template_optimum
    from xmris_tpu.fitting.lm import hashable_pmap
    from xmris_tpu.fitting.prior import load_prior_knowledge
    from xmris_tpu.parallel.pipeline import PipelineConfig
    from xmris_tpu.parallel.process import process_grid_planar_raw

    backend = jax.default_backend()
    print(f"# backend={backend}", flush=True)
    interp = backend != "tpu"

    if os.environ.get("XMT_SMOKE_GRID"):
        bench.GRID = tuple(
            int(s) for s in os.environ["XMT_SMOKE_GRID"].split(",")
            if s.strip()
        )
    fids, weight, freqs = bench.make_inputs()
    NT, ZF = bench.N_TIME, bench.ZERO_FILL

    with tempfile.NamedTemporaryFile("w", suffix=".csv", delete=False) as f:
        f.write(bench.PK_CSV)
        pk_path = f.name
    pk = load_prior_knowledge(pk_path)
    t_j = jnp.asarray((np.arange(NT) / bench.SW).astype(np.float32))
    re_j = jnp.asarray(np.ascontiguousarray(fids.real.astype(np.float32)))
    im_j = jnp.asarray(np.ascontiguousarray(fids.imag.astype(np.float32)))
    x_template = jnp.asarray(
        template_optimum(fids, pk, t_j, bench.MHZ).astype(np.float32)
    )
    amp_slots, ls_plan = seed_plan(pk)
    # Default: the bench-default combo (stacked + grid); XMT_ATTRIB_FLAT=1
    # compiles the flat/DE variant (the r11 slabtrace config, cache hit).
    if os.environ.get("XMT_ATTRIB_FLAT"):
        cfg = PipelineConfig(zero_fill_to=ZF, lb=5.0, autophase="single")
    else:
        cfg = PipelineConfig(
            zero_fill_to=ZF, lb=5.0, autophase="single",
            spec_layout="stacked", ap_optimizer="grid",
        )
    lowered = process_grid_planar_raw.lower(
        re_j, im_j, jnp.asarray(weight), jnp.asarray(freqs), t_j,
        x_template, jnp.asarray(pk.lower), jnp.asarray(pk.upper),
        jnp.asarray(pk.kind),
        cfg=cfg, pmap_static=hashable_pmap(pk.pmap), mhz=bench.MHZ,
        amp_slots=amp_slots, ls_plan=ls_plan, max_iter=24,
        uniform_t_ok=True, spd_pallas=True, interpret=interp,
    )
    compiled = lowered.compile()
    txt = compiled.as_text()
    Path("/tmp/fused_hlo.txt").write_text(txt)
    print(f"# optimized HLO: {len(txt.splitlines())} lines -> /tmp/fused_hlo.txt")

    rows = []
    for line in txt.splitlines():
        ls = line.strip()
        m = re.match(r"%?([\w.\-]+) = (.+)", ls)
        if not m:
            continue
        name, rhs = m.groups()
        kind = None
        for k in ("copy(", "transpose(", "reshape(", "bitcast"):
            if re.search(rf"\b{re.escape(k)}", rhs):
                kind = k.rstrip("(")
                break
        if kind is None and name.startswith(("copy", "transpose", "reshape")):
            kind = name.split(".")[0].rstrip("0123456789_")
        if kind is None:
            continue
        nbytes = shape_bytes(rhs)
        meta = ""
        mm = re.search(r'metadata=\{([^}]*)\}', rhs)
        if mm:
            meta = mm.group(1)
        rows.append((nbytes, kind, name, meta[:160]))
    rows.sort(reverse=True)
    total = sum(r[0] for r in rows)
    print(f"# {len(rows)} layout ops, {total/1e6:.1f} MB total output bytes")
    for nbytes, kind, name, meta in rows[:40]:
        print(f"{nbytes/1e6:9.2f} MB  {kind:9s} {name:40s} {meta}")


if __name__ == "__main__":
    main()
