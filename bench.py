"""End-to-end training throughput benchmark (ShapeNet flagship + Pix3D).

Measures full train-step throughput at the reference training recipes:

* ShapeNet (default): backbone + voxel branch + cubify + 3 refinement stages +
  chamfer/normal/edge losses over 10k-point clouds + optimizer update at batch 3,
  137x137 images, 48^3 voxel grid, residual stages (BASELINE.md: 1.628 s/batch =
  1.84 samples/s on multi-GPU NVIDIA).
* Pix3D (--model Pix3D): Mask R-CNN (FPN + RPN + RoI heads, bf16 conv path) +
  best-IoU RoI voxel branch + cubify + 3 refinement stages + all detection and
  mesh losses at batch 4, 224x224 images (reference recipe, BASELINE.md). The
  reference's recorded epoch batch_time meters span 4.59-136 s/batch (heavily
  data-loading-bound); the baseline used here is its BEST epoch average,
  4.592 s/batch = 0.871 samples/s (decoded from
  /root/reference/checkpoints/pix3d.st) — the most reference-favorable choice.

Prints a cumulative JSON record line ({"metric", "value", "unit",
"vs_baseline", ...}) after each bench completes, flushed immediately — the last
line is always the most complete record, and a timeout mid-run still leaves the
headline on stdout (round-3 lesson: the all-at-the-end print lost everything to
rc=124).
"""
from __future__ import annotations

import argparse
import json
import time

import numpy as np

BASELINE_SAMPLES_PER_SEC = 1.84          # BASELINE.md ShapeNet throughput
PIX3D_BASELINE_SAMPLES_PER_SEC = 0.871   # reference pix3d.st best epoch (see above)


N_STEPS = 20  # steps per scanned dispatch — ms/step and MFU all divide by this


def measure(step, state, batch, key, B, n_steps=N_STEPS, windows=5):
    """Scan n_steps train steps in one dispatch; median-of-N-windows samples/s.

    Median over >=5 windows rather than best-of-3 (VERDICT r1 weak item 1): the
    tunneled chip is shared and its effective bandwidth fluctuates, so a single
    best window overstates robust throughput. Returns (samples/s, window times,
    flops_per_step from the compiled executable's cost analysis, or None).
    """
    import jax

    @jax.jit
    def run_steps(state, key):
        # keep EVERY metric alive (the real train loop consumes them all):
        # returning only the loss lets XLA dead-code-eliminate unweighted
        # metric pipelines and under-measures the step (found in the round-3
        # normal-gating A/B, where "with normal metric" timed identically
        # because the metric had been DCE'd out of the benchmark program).
        def body(s, k):
            s2, metrics = step(s, batch, k)
            return s2, metrics
        keys = jax.random.split(key, n_steps)
        return jax.lax.scan(body, state, keys)

    # AOT-compile once and run the executable directly: lower().compile() does
    # NOT populate the jit dispatch cache, so calling run_steps() afterwards
    # would trace + compile the whole 20-step program a second time (only the
    # persistent disk cache made that cheap).
    compiled = run_steps.lower(state, key).compile()
    flops = None
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0] if ca else {}
        f = float(ca.get("flops", 0.0))
        if f > 0:
            flops = f / n_steps
    except Exception:
        pass

    s1, losses = compiled(state, key)       # warmup (device caches, first run)
    jax.block_until_ready(losses)
    times = []
    for w in range(windows):
        t0 = time.perf_counter()
        s1, losses = compiled(s1, jax.random.fold_in(key, w + 1))
        jax.block_until_ready(losses)
        times.append(time.perf_counter() - t0)
    return B * n_steps / float(np.median(times)), times, flops


def mfu_fields(times, flops_per_step, n_steps=N_STEPS, peak_tflops=197.0):
    """Model FLOPs utilization vs the bf16 MXU peak (TPU v5e: ~197 TFLOP/s).

    The compiler's cost analysis counts every HLO flop (f32 and bf16 alike), so
    this is an upper-ish bound on useful work / peak — standard MFU accounting.
    """
    if flops_per_step is None:
        return {}
    step_s = float(np.median(times)) / n_steps
    achieved = flops_per_step / step_s
    return {"flops_per_step": round(flops_per_step / 1e9, 2),  # GFLOP
            "achieved_tflops": round(achieved / 1e12, 3),
            "mfu_pct_vs_bf16_peak": round(100.0 * achieved / (peak_tflops * 1e12), 2)}


def _shapenet_setup(B=3, report_unweighted=False):
    """Model/config/state/batch at the reference airplane recipe shapes."""
    import jax
    import jax.numpy as jnp

    from meshrcnn_tpu.core.batch import Batch
    from meshrcnn_tpu.core.config import LossWeights, TrainConfig
    from meshrcnn_tpu.models.shapenet import ShapeNetModel
    from meshrcnn_tpu.parallel.train_step import create_train_state

    H = 137
    model = ShapeNetModel(num_classes=13, residual=True, cubify_threshold=0.2,
                          voxel_out_channels=48, vert_capacity=8192,
                          face_capacity=16384, edge_capacity=32768,
                          num_refinement_stages=3)
    config = TrainConfig(optimizer="adam", lr=1e-4, weight_decay=0.0, batch_size=B,
                         point_cloud_size=10000, normal_k=10, distance_tile=2048,
                         train_backbone=False,
                         report_unweighted_losses=report_unweighted,
                         loss_weights=LossWeights(voxel=1.0, chamfer=1.0,
                                                  normal=0.0, edge=0.5))
    rng = np.random.RandomState(0)
    # synthetic batch at the exact training shapes (airplane-recipe scale)
    gt_v, gt_f = 2048, 4096
    batch = Batch(
        images=jnp.asarray(rng.rand(B, H, H, 3).astype(np.float32)),
        voxels=jnp.asarray((rng.rand(B, 48, 48, 48) > 0.7).astype(np.float32)),
        gt_verts=jnp.asarray(rng.randn(B, gt_v, 3).astype(np.float32) * 0.4),
        gt_verts_mask=jnp.ones((B, gt_v), dtype=bool),
        gt_faces=jnp.asarray(rng.randint(0, gt_v, (B, gt_f, 3)).astype(np.int32)),
        gt_faces_mask=jnp.ones((B, gt_f), dtype=bool),
        labels=jnp.asarray(rng.randint(0, 13, (B,)).astype(np.int32)))

    state = create_train_state(model, config, jax.random.PRNGKey(0), batch.images)
    return model, config, state, batch


def bench_shapenet(B=3, report_unweighted=False):
    """ShapeNet train-step throughput at the reference airplane recipe.

    The recipe's loss weights are voxel=1 / chamfer=1 / normal=0 / edge=0.5
    (reference README.md:77; BASELINE.md) — and this framework statically elides
    loss terms whose weight is 0 (train_step._weighted_mesh_total +
    losses.mesh_loss compute_normal), so the headline run does NOT pay the
    kNN/PCA normal pipeline, exactly as a recipe user wouldn't. The reference
    computed (and discarded) the normal value anyway; report_unweighted=True
    reproduces that (forward-computed metric, weight 0 in the total) for the
    conservative apples-to-apples variant, reported as a secondary field.
    """
    import jax

    from meshrcnn_tpu.parallel.train_step import make_train_step

    model, config, state, batch = _shapenet_setup(B, report_unweighted)
    step = make_train_step(model, config)
    sps, times, flops = measure(step, state, batch, jax.random.PRNGKey(1), B)
    return {"metric": "shapenet_train_samples_per_sec",
            "value": round(sps, 3), "unit": "samples/s",
            "vs_baseline": round(sps / BASELINE_SAMPLES_PER_SEC, 3),
            **mfu_fields(times, flops)}, times


def _pix3d_setup(B=4):
    """Model/config/state/batch at the reference Pix3D recipe shapes."""
    import jax
    import jax.numpy as jnp

    from meshrcnn_tpu.core.batch import Batch
    from meshrcnn_tpu.core.config import LossWeights, TrainConfig
    from meshrcnn_tpu.models.pix3d import Pix3DModel
    from meshrcnn_tpu.parallel.train_step import create_train_state

    H = 224
    model = Pix3DModel(num_classes=10, cubify_threshold=0.2,
                       vert_capacity=4096, face_capacity=8192, edge_capacity=16384,
                       num_refinement_stages=3)
    # reference Pix3D recipe: SGD wd 1e-4, warmup/step LR schedule, weights
    # voxel=3 chamfer=1 normal=0.1 edge=0.5 (BASELINE.md, train_utils.py:161-168)
    config = TrainConfig(optimizer="sgd", lr=0.02, weight_decay=1e-4, batch_size=B,
                         point_cloud_size=10000, normal_k=10, distance_tile=2048,
                         train_backbone=True, pix3d_schedule=True,
                         loss_weights=LossWeights(voxel=3.0, chamfer=1.0,
                                                  normal=0.1, edge=0.5))
    rng = np.random.RandomState(0)
    gt_v, gt_f = 2048, 4096
    masks = np.zeros((B, H, H), np.float32)
    masks[:, 40:180, 50:190] = 1.0
    batch = Batch(
        images=jnp.asarray(rng.rand(B, H, H, 3).astype(np.float32)),
        voxels=jnp.asarray((rng.rand(B, 24, 24, 24) > 0.7).astype(np.float32)),
        gt_verts=jnp.asarray(rng.randn(B, gt_v, 3).astype(np.float32) * 0.4),
        gt_verts_mask=jnp.ones((B, gt_v), dtype=bool),
        gt_faces=jnp.asarray(rng.randint(0, gt_v, (B, gt_f, 3)).astype(np.int32)),
        gt_faces_mask=jnp.ones((B, gt_f), dtype=bool),
        labels=jnp.asarray(rng.randint(1, 10, (B,)).astype(np.int32)),
        boxes=jnp.asarray(np.tile(np.array([[40.0, 50.0, 190.0, 180.0]], np.float32),
                                  (B, 1, 1))),
        masks=jnp.asarray(masks))

    state = create_train_state(model, config, jax.random.PRNGKey(0), batch.images)
    return model, config, state, batch


def bench_pix3d(B=4):
    import jax

    from meshrcnn_tpu.parallel.train_step import make_train_step

    model, config, state, batch = _pix3d_setup(B)
    step = make_train_step(model, config)
    sps, times, flops = measure(step, state, batch, jax.random.PRNGKey(1), B)
    return {"metric": "pix3d_train_samples_per_sec",
            "value": round(sps, 3), "unit": "samples/s",
            "vs_baseline": round(sps / PIX3D_BASELINE_SAMPLES_PER_SEC, 3),
            **mfu_fields(times, flops)}, times


def _measure_eval(run_batch, B, batches_per_window=5, windows=5):
    """Time the per-batch eval dispatch pair (forward + fused metrics): median
    samples/s over windows of ``batches_per_window`` back-to-back batches."""
    import jax

    jax.block_until_ready(run_batch(0))          # warmup: compile + caches
    times = []
    for w in range(windows):
        t0 = time.perf_counter()
        for k in range(batches_per_window):
            m = run_batch(w * batches_per_window + k + 1)
        jax.block_until_ready(m)
        times.append(time.perf_counter() - t0)
    sps = B * batches_per_window / float(np.median(times))
    return sps, times


def bench_shapenet_eval(B=3):
    """ShapeNet eval-loop throughput: the exact per-batch device work of
    harness.validate — one eval forward + ONE fused metrics program
    (_shapenet_eval_metrics) per batch (PERFORMANCE.md round-3 eval rework;
    this gives the 65x eval-loop claim a driver-visible anchor, VERDICT r4
    next-item 6)."""
    import jax

    from meshrcnn_tpu.harness import _shapenet_eval_metrics
    from meshrcnn_tpu.parallel.train_step import make_eval_step

    model, config, state, batch = _shapenet_setup(B)
    eval_step = make_eval_step(model)

    def run_batch(i):
        out = eval_step(state, batch.images)
        return _shapenet_eval_metrics(
            jax.random.PRNGKey(i), out, batch.voxels, batch.gt_verts,
            batch.gt_faces, batch.gt_faces_mask, config.point_cloud_size,
            config.normal_k, config.distance_tile, (0.1, 0.3), False)

    sps, times = _measure_eval(run_batch, B)
    return {"shapenet_eval_samples_per_sec": round(sps, 3),
            "shapenet_eval_s_per_batch": round(B / sps, 4)}, times


def bench_pix3d_eval(B=4):
    """Pix3D eval-loop throughput (harness.validate_pix3d device work): eval
    forward + fused metrics INCLUDING the ranked-AP per-slot records (the
    production default). The pre-fusion on-chip record at these exact shapes
    was 18.3 s/batch (PERFORMANCE.md round 3) — reported as vs_prefusion."""
    import jax

    from meshrcnn_tpu.harness import _pix3d_eval_metrics
    from meshrcnn_tpu.parallel.train_step import make_eval_step

    model, config, state, batch = _pix3d_setup(B)
    eval_step = make_eval_step(model)

    def run_batch(i):
        out = eval_step(state, batch.images)
        return _pix3d_eval_metrics(
            jax.random.PRNGKey(i), out, batch.boxes, batch.masks, batch.voxels,
            batch.gt_verts, batch.gt_faces, batch.gt_faces_mask,
            config.point_cloud_size, config.normal_k, config.distance_tile,
            (0.1, 0.3), False, True)

    sps, times = _measure_eval(run_batch, B)
    s_per_batch = B / sps
    return {"pix3d_eval_samples_per_sec": round(sps, 3),
            "pix3d_eval_s_per_batch": round(s_per_batch, 4),
            "pix3d_eval_vs_prefusion_record": round(18.3 / s_per_batch, 1)}, times


def main():
    t_start = time.perf_counter()
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", choices=["both", "ShapeNet", "Pix3D"], default="both",
                    help="default 'both' runs the two recipes, printing a "
                         "cumulative JSON line after EACH bench completes "
                         "(ShapeNet as the headline metric, Pix3D under pix3d_* "
                         "keys) so a timeout mid-run still leaves the driver a "
                         "parseable record of everything measured so far")
    ap.add_argument("--batch", type=int, default=None,
                    help="override the recipe batch size (scaling sweeps; "
                         "headline runs use the reference recipe batch)")
    ap.add_argument("--budget", type=float, default=330.0,
                    help="internal wall-clock budget in seconds: secondary "
                         "benches are skipped (and recorded as skipped) once "
                         "elapsed time exceeds this, so the process always "
                         "exits cleanly within the driver's timeout "
                         "(round-3 lesson: rc=124 loses everything)")
    args = ap.parse_args()

    from meshrcnn_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    # The tunneled chip occasionally goes UNAVAILABLE (worker restart / relay
    # outage — observed 2026-08-17). A crashed bench leaves the driver with no
    # record at all, and a CPU run of the production-shape step would take hours
    # on this 1-core host — so emit the JSON line immediately with the error.
    try:
        import jax
        jax.devices()
    except Exception as e:  # backend init raises RuntimeError or XlaRuntimeError
        metric = ("pix3d_train_samples_per_sec" if args.model == "Pix3D"
                  else "shapenet_train_samples_per_sec")
        record = {
            "metric": metric, "value": 0.0,
            "unit": "samples/s", "vs_baseline": 0.0,
            "error": f"TPU backend unavailable ({type(e).__name__}: {e}); "
                     "bench skipped — see PERFORMANCE.md for the last "
                     "on-chip same-session measurements"}
        if args.model == "both":  # carry the Pix3D half of the combined record
            record["pix3d_train_samples_per_sec"] = 0.0
            record["pix3d_vs_baseline"] = 0.0
        print(json.dumps(record), flush=True)
        return

    def elapsed():
        return time.perf_counter() - t_start

    def emit(record):
        # cumulative record, flushed immediately: the driver keeps the tail of
        # stdout and parses the last JSON line, so every emit supersedes the
        # previous one and a kill mid-run still leaves the latest full record
        record["bench_elapsed_s"] = round(elapsed(), 1)
        print(json.dumps(record), flush=True)

    if args.model == "ShapeNet":
        result, times = bench_shapenet(args.batch or 3)
        result["window_s"] = [round(t, 3) for t in times]
        emit(result)
    elif args.model == "Pix3D":
        result, times = bench_pix3d(args.batch or 4)
        result["window_s"] = [round(t, 3) for t in times]
        emit(result)
    else:
        t0 = elapsed()
        result, times = bench_shapenet(args.batch or 3)
        result["window_s"] = [round(t, 3) for t in times]
        emit(result)  # headline lands even if the secondaries never finish
        # Budget gate for secondaries: reserve an expected-duration margin so a
        # secondary started near the budget cannot blow past the driver's
        # external timeout (ADVICE r4: the start-gate alone let the proof run
        # finish at 365 s against a 330 s budget). The estimate is the longest
        # completed bench this process (compile dominates; warm-cache benches
        # are near-uniform), floored at 60 s.
        durations = [elapsed() - t0]

        def fits(name):
            est = max(max(durations), 60.0)
            if elapsed() + est < args.budget:
                return True
            result[f"{name}_skipped"] = (
                f"budget: elapsed {elapsed():.0f}s + est {est:.0f}s "
                f">= {args.budget}s")
            emit(result)
            return False

        # secondary: Pix3D before the normal-term variant — it is the other
        # model family (more informative than a ShapeNet re-run variant)
        if fits("pix3d"):
            t0 = elapsed()
            p3d, p3d_times = bench_pix3d(args.batch or 4)
            durations.append(elapsed() - t0)
            result["pix3d_train_samples_per_sec"] = p3d["value"]
            result["pix3d_vs_baseline"] = p3d["vs_baseline"]
            result["pix3d_window_s"] = [round(t, 3) for t in p3d_times]
            for k in ("flops_per_step", "achieved_tflops", "mfu_pct_vs_bf16_peak"):
                if k in p3d:
                    result[f"pix3d_{k}"] = p3d[k]
            emit(result)
        # eval-loop records (VERDICT r4 next-item 6: the 65x eval rework gets a
        # driver-visible anchor; state is reused from the train benches' setup
        # path so these are cheap after the models above have compiled)
        if fits("shapenet_eval"):
            t0 = elapsed()
            ev, _ = bench_shapenet_eval(args.batch or 3)
            durations.append(elapsed() - t0)
            result.update(ev)
            emit(result)
        if fits("pix3d_eval"):
            t0 = elapsed()
            ev, _ = bench_pix3d_eval(args.batch or 4)
            durations.append(elapsed() - t0)
            result.update(ev)
            emit(result)
        # same-session secondary: recipe with the normal metric force-computed
        # (the reference computed-and-discarded it; weight stays 0 in the total)
        if fits("normal_term"):
            with_n, _ = bench_shapenet(args.batch or 3, report_unweighted=True)
            result["shapenet_with_normal_term_sps"] = with_n["value"]
            emit(result)


if __name__ == "__main__":
    main()
