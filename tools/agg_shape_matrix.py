"""Map the TPU aggregation-fault envelope across shipped capacity sets.

The one-program two-direction `aggregate_neighbours` pipeline reproducibly
faults the tunneled TPU worker at B = 12 with the Pix3D eval capacities
(tools/debug_tpu_eval_fault/BUG_REPORT.md); the shipped guard chunks any B > 8
via lax.map (ops/graph_conv.py:_chunking_active). VERDICT r3/r4 asked for the
fault envelope at the OTHER shipped capacity sets so the guard can be keyed on
the real trigger variables instead of one bisected shape family.

Each probe runs in its OWN subprocess (a fault kills the TPU worker, taking the
process with it): rc 0 = OK, nonzero/timeout = FAULT. The parent sweeps the
matrix and prints one JSON line per cell plus a summary table.

    python tools/agg_shape_matrix.py                 # sweep the default matrix
    python tools/agg_shape_matrix.py --probe B V E C # single in-process probe

Default matrix: the two shipped capacity families (ShapeNet train/eval
8192/32768-edge caps at B in {3, 6, 8, 12}; Pix3D eval 4096/16384 at
B = images x detections in {4, 8, 10, 12, 16}) plus a smaller family to see
whether the trigger is B alone or total gather volume B*E.
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

C = 128  # GraphConv feature width on the refinement stack

# (family, V, E, batches): vert/edge capacities of the shipped configs.
# Kept tight: each probe is a fresh process + compile over the tunnel
# (~10 min on a congested day), so the matrix probes the guard-relevant
# BOUNDARY (B around the bisected safe-8 / fault-12 line) at the two shipped
# capacity families rather than a dense grid.
FAMILIES = [
    ("pix3d_eval", 4096, 16384, [8, 10, 12, 16]),  # bisected: 8 ok, 12 fault
    ("shapenet", 8192, 32768, [8, 12]),            # ShapeNet train/eval caps
]


def probe(B: int, V: int, E: int, Cw: int) -> None:
    """Run the unchunked two-direction aggregation once at the given shape."""
    os.environ["MESHRCNN_AGG_CHUNK_DISABLE"] = "1"
    import numpy as np
    import jax
    import jax.numpy as jnp

    from meshrcnn_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    from meshrcnn_tpu.ops.graph_conv import (aggregate_neighbours,
                                             precompute_adjacency)

    rng = np.random.RandomState(0)
    edges = jnp.asarray(rng.randint(0, V, (B, E, 2)).astype(np.int32))
    mask = jnp.asarray(rng.rand(B, E) < 0.9)
    feats = jnp.asarray(rng.randn(B, V, Cw).astype(np.float32))
    topo = precompute_adjacency(edges, mask, V)
    out = jax.jit(lambda f: aggregate_neighbours(f, topo))(feats)
    jax.block_until_ready(out)
    print(json.dumps({"probe_ok": True, "sum": float(jnp.sum(out))}))


def main() -> None:
    if "--probe" in sys.argv:
        i = sys.argv.index("--probe")
        probe(*[int(x) for x in sys.argv[i + 1:i + 5]])
        return

    timeout = float(os.environ.get("AGG_MATRIX_TIMEOUT", "1500"))
    results = []
    for family, V, E, batches in FAMILIES:
        for B in batches:
            t0 = time.time()
            try:
                r = subprocess.run(
                    [sys.executable, os.path.abspath(__file__), "--probe",
                     str(B), str(V), str(E), str(C)],
                    capture_output=True, text=True, timeout=timeout,
                    cwd=REPO)
                status = "ok" if r.returncode == 0 else f"fault(rc={r.returncode})"
                tail = (r.stdout + r.stderr).strip().splitlines()[-1:]
            except subprocess.TimeoutExpired:
                status, tail = "timeout", []
            rec = {"family": family, "B": B, "V": V, "E": E, "C": C,
                   "status": status, "elapsed_s": round(time.time() - t0, 1),
                   "tail": tail}
            results.append(rec)
            print(json.dumps(rec), flush=True)

    print("\n=== shape matrix (rows: family VxE; per-batch status) ===")
    for family, V, E, batches in FAMILIES:
        row = [f"B={r['B']}:{r['status']}" for r in results
               if r["family"] == family]
        print(f"{family:<12}" + "  ".join(row))


if __name__ == "__main__":
    main()
