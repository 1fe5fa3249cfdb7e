"""Capture an xprof trace of the jitted train step and print top HLO ops.

The profiling harness behind PERFORMANCE.md's step-time tables. Traces N
train steps on the current backend, converts the xspace to the `hlo_stats`
tool table, and prints the top ops by self time plus category rollups — the
on-chip ground truth for deciding what to optimize next.

    python tools/profile_step.py --model ShapeNet --batch 3 --top 25
"""
from __future__ import annotations

import argparse
import glob
import json
import os
import sys
import tempfile

sys.path.insert(0, ".")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def capture(step, state, batch, key, n_steps: int, log_dir: str) -> None:
    import jax

    @jax.jit
    def one(state, key):
        s2, metrics = step(state, batch, key)
        return s2, metrics["loss"]

    s, loss = one(state, key)          # compile outside the trace
    jax.block_until_ready(loss)
    jax.profiler.start_trace(log_dir)
    for i in range(n_steps):
        s, loss = one(s, jax.random.fold_in(key, i))
    jax.block_until_ready(loss)
    jax.profiler.stop_trace()


def hlo_stats_rows(log_dir: str):
    """Convert the captured xspace into hlo_stats rows (list of dicts)."""
    from xprof.convert import raw_to_tool_data

    paths = glob.glob(os.path.join(log_dir, "**", "*.xplane.pb"), recursive=True)
    if not paths:
        raise FileNotFoundError(f"no xplane.pb under {log_dir}")
    data, _ = raw_to_tool_data.xspace_to_tool_data(paths, "hlo_stats", {})
    if isinstance(data, bytes):
        data = data.decode()
    obj = json.loads(data)
    # GViz DataTable: {cols: [{label,...}], rows: [{c: [{v: ...}, ...]}]}
    cols = [c.get("label") or c.get("id") for c in obj["cols"]]
    rows = []
    for r in obj["rows"]:
        rows.append({k: (cell or {}).get("v") for k, cell in zip(cols, r["c"])})
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", choices=["ShapeNet", "Pix3D"], default="ShapeNet")
    ap.add_argument("--batch", type=int, default=None)
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--log_dir", default=None,
                    help="keep the raw trace here (default: temp dir)")
    args = ap.parse_args()

    from meshrcnn_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    import jax

    import bench

    if args.model == "Pix3D":
        B = args.batch or 4
        make = bench.bench_pix3d
    else:
        B = args.batch or 3
        make = bench.bench_shapenet

    # reuse bench's model/batch construction, but trace instead of timing:
    # monkeypatch measure to capture state/step/batch then bail out.
    captured = {}

    def fake_measure(step, state, batch, key, Bn, n_steps=20, windows=5):
        captured.update(step=step, state=state, batch=batch, key=key)
        return 0.0, [0.0], None

    bench.measure = fake_measure
    make(B)

    log_dir = args.log_dir or tempfile.mkdtemp(prefix="meshrcnn_trace_")
    capture(captured["step"], captured["state"], captured["batch"],
            captured["key"], args.steps, log_dir)

    rows = hlo_stats_rows(log_dir)
    # column names vary slightly across xprof versions; resolve defensively
    def col(row, *names):
        for n in names:
            if n in row and row[n] is not None:
                return row[n]
        return None

    for r in rows:
        r["_t"] = float(col(r, "Total time (us)", "total_time_us",
                            "Avg. time (us)", "occurrences_total_time_us") or 0.0)
        r["_cat"] = str(col(r, "HLO op category", "category", "Category") or "?")
        r["_name"] = str(col(r, "HLO op name", "hlo_op_name", "HLO op") or "?")[:90]
    total = sum(r["_t"] for r in rows)
    per_step = total / max(args.steps, 1)
    print(json.dumps({"model": args.model, "batch": B, "steps": args.steps,
                      "device_us_per_step": round(per_step, 1),
                      "trace_dir": log_dir}))

    cats = {}
    for r in rows:
        cats[r["_cat"]] = cats.get(r["_cat"], 0.0) + r["_t"]
    print("\n-- category rollup (us/step) --")
    for c, t in sorted(cats.items(), key=lambda kv: -kv[1])[:15]:
        print(f"{t/args.steps:10.1f}  {100*t/max(total,1e-9):5.1f}%  {c}")

    print(f"\n-- top {args.top} ops (us/step) --")
    for r in sorted(rows, key=lambda r: -r["_t"])[:args.top]:
        print(f"{r['_t']/args.steps:10.1f}  {100*r['_t']/max(total,1e-9):5.1f}%  "
              f"{r['_cat'][:24]:24s} {r['_name']}")


if __name__ == "__main__":
    main()
