"""Multi-HOST data-parallel dryrun: 2 processes x 4 CPU devices, one global mesh.

Exercises `jax.distributed.initialize` beyond the `--multihost` flag (VERDICT r4
next-item 8): two coordinated processes build ONE 8-device dp mesh, run the full
DP train step (`make_dp_train_step`, the same shard_map+pmean program the
single-process dryrun compiles) on a deterministic tiny batch, and the parent
asserts the DP equality contract — both processes report identical metrics,
and those metrics match a single-process 8-device run of the same step to f32
tolerance (compilation may differ between the 1- and 2-process partitions, so
bitwise equality is not required across that boundary; it IS required between
the two coordinated processes, which execute one common program).

    python tools/multihost_dryrun.py          # orchestrates everything
"""
from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_PROC = 2
DEV_PER_PROC = 4
COORD = "127.0.0.1:12733"


def _run_step(mesh):
    """Build the deterministic tiny state/batch and run ONE DP train step on the
    given global mesh; returns host metric floats. Shared by the single-process
    reference and the coordinated children (same seeds -> same host values)."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    import __graft_entry__ as ge
    from meshrcnn_tpu.core.config import TrainConfig
    from meshrcnn_tpu.models.shapenet import ShapeNetModel
    from meshrcnn_tpu.parallel.train_step import (create_train_state,
                                                  make_dp_train_step)

    n = N_PROC * DEV_PER_PROC
    # f32 backbone + saturated voxel-head bias, exactly like
    # tests/test_train_step.py::test_dp_eval_matches_single_device: the 1- vs
    # 2-process partitionings COMPILE differently, so bf16 reduction-order
    # noise would flip cubify threshold crossings and discretely change
    # overflow/chamfer — partition-invariance of the dp plumbing is what this
    # dryrun checks, not bf16 determinism.
    model = ShapeNetModel(num_classes=13, residual=False, cubify_threshold=0.2,
                          voxel_out_channels=8, vert_capacity=512,
                          face_capacity=1024, edge_capacity=2048,
                          num_refinement_stages=3, backbone_dtype="float32")
    config = TrainConfig(optimizer="adam", lr=1e-3, batch_size=n,
                         point_cloud_size=64, normal_k=4, distance_tile=32,
                         train_backbone=False)
    batch = ge._tiny_batch(n)
    host_batch = jax.tree_util.tree_map(
        lambda x: np.asarray(x) if x is not None else None, batch)

    # state: identical host values on every process (same PRNGKey), then
    # replicated onto the global mesh — the multihost-safe way to place params
    state = create_train_state(model, config, jax.random.PRNGKey(0),
                               host_batch.images)
    bias = np.where(np.arange(8) % 3 == 0, 4.0, -4.0).astype(np.float32)
    params = jax.tree_util.tree_map(lambda x: x, state.params)
    params["voxelBranch"]["conv2"]["bias"] = jnp.asarray(bias)
    state = state.replace(params=params)
    rep = NamedSharding(mesh, P())
    g_state = jax.tree_util.tree_map(
        lambda x: jax.device_put(np.asarray(x), rep), state)

    # batch: dp-sharded on the leading axis; every process holds the same full
    # host batch, so device_put places each process's addressable rows
    dp = NamedSharding(mesh, P("dp"))
    g_batch = jax.tree_util.tree_map(
        lambda x: jax.device_put(x, dp) if x is not None else None, host_batch)

    step = make_dp_train_step(model, config, mesh)
    new_state, metrics = step(g_state, g_batch, jax.random.PRNGKey(1))
    jax.block_until_ready(metrics)
    assert int(np.asarray(jax.device_get(new_state.step))) == 1
    return {k: float(np.asarray(jax.device_get(v))) for k, v in metrics.items()}


def child(process_id: int) -> None:
    import numpy as np  # noqa: F401  (jax import order)
    import jax

    jax.distributed.initialize(coordinator_address=COORD,
                               num_processes=N_PROC, process_id=process_id)
    assert jax.process_count() == N_PROC
    assert len(jax.local_devices()) == DEV_PER_PROC
    assert len(jax.devices()) == N_PROC * DEV_PER_PROC
    from jax.sharding import Mesh

    mesh = Mesh(np.asarray(jax.devices()), ("dp",))
    metrics = _run_step(mesh)
    print("CHILD_METRICS " + json.dumps({"pid": process_id, **metrics}),
          flush=True)


def single_process_reference() -> None:
    import numpy as np
    import jax
    from jax.sharding import Mesh

    mesh = Mesh(np.asarray(jax.devices()[:N_PROC * DEV_PER_PROC]), ("dp",))
    metrics = _run_step(mesh)
    print("REF_METRICS " + json.dumps(metrics), flush=True)


def _spawn(args, n_dev, extra_env=None):
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)   # never touch the TPU tunnel here
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "")
                        + f" --xla_force_host_platform_device_count={n_dev}").strip()
    env.update(extra_env or {})
    return subprocess.Popen([sys.executable, os.path.abspath(__file__)] + args,
                            env=env, cwd=REPO, stdout=subprocess.PIPE,
                            stderr=subprocess.STDOUT, text=True)


def _collect(proc, tag):
    out, _ = proc.communicate(timeout=1800)
    lines = [l for l in out.splitlines() if l.startswith(tag)]
    assert proc.returncode == 0, f"{tag} process failed (rc={proc.returncode}):\n{out[-4000:]}"
    assert lines, f"no {tag} line in output:\n{out[-4000:]}"
    return json.loads(lines[-1][len(tag) + 1:])


def main() -> None:
    if "--child" in sys.argv:
        child(int(sys.argv[sys.argv.index("--child") + 1]))
        return
    if "--ref" in sys.argv:
        single_process_reference()
        return

    # 1) single-process 8-device reference
    ref = _collect(_spawn(["--ref"], N_PROC * DEV_PER_PROC), "REF_METRICS")
    print("reference (1 process x 8 devices):", json.dumps(ref))

    # 2) two coordinated processes x 4 devices
    procs = [_spawn(["--child", str(i)], DEV_PER_PROC) for i in range(N_PROC)]
    childs = [_collect(p, "CHILD_METRICS") for p in procs]
    for c in childs:
        print(f"child {c['pid']} (2 processes x 4 devices):", json.dumps(c))

    # equality contract: the two coordinated processes executed one common
    # program -> identical metrics. Vs the single-process partitioning the
    # programs COMPILE differently, so last-ulp f32 differences can flip the
    # sampler's discrete inverse-CDF face picks — chamfer/normal/edge (and
    # hence the total) move by ~1/point_cloud_size per flipped point; those
    # get a discreteness-aware tolerance while continuous metrics stay tight.
    keys = [k for k in ref if k != "pid"]
    SAMPLED = {"chamfer_loss", "normal_loss", "edge_loss", "loss"}
    for k in keys:
        assert childs[0][k] == childs[1][k], (k, childs[0][k], childs[1][k])
        a, b = childs[0][k], ref[k]
        tol = 2e-2 if k in SAMPLED else 1e-5
        assert abs(a - b) <= tol * max(1.0, abs(b)), (k, a, b, tol)
    print("MULTIHOST_DRYRUN_OK", json.dumps(
        {"n_processes": N_PROC, "devices_per_process": DEV_PER_PROC,
         "metrics_equal_across_processes": True,
         "metrics_match_single_process": True}))


if __name__ == "__main__":
    main()
