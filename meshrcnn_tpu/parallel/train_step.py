"""Jit-compiled training/eval steps with shard_map data parallelism.

Replaces the reference's entire ``dataParallel/`` package (375 LoC of custom
scatter / replicate / parallel_apply / NCCL gather, reference:
dataParallel/dataParallel.py:10-46, gather.py, scatter.py, replicate.py) with the
idiomatic TPU pattern (SURVEY.md §2.8): the batch is sharded over a ``dp`` mesh axis,
every device runs the same jitted step on its shard, and gradients / losses /
batch-norm statistics are averaged with ``jax.lax.pmean`` over ICI. Parameter
"replication" is just the sharding spec P() — no replicate.py machinery exists.

One deliberate improvement over the reference: batch-norm statistics are
cross-replica averaged each step (the reference's CustomDP kept per-GPU BN stats and
only device 0's survived checkpointing).
"""
from __future__ import annotations

from functools import partial
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from meshrcnn_tpu.core.batch import Batch
from meshrcnn_tpu.core.config import TrainConfig
from meshrcnn_tpu.ops.losses import batched_mesh_loss, voxel_loss


@struct.dataclass
class TrainState:
    step: Any
    params: Any
    batch_stats: Any
    opt_state: Any


def make_optimizer(config: TrainConfig, params) -> optax.GradientTransformation:
    """Adam|SGD with weight decay, optional frozen backbone and the Pix3D LR schedule.

    reference: train.py:169-175 (optimizer choice + wd), train.py:146-161 (backbone
    freezing), utils/train_utils.py:161-168 (Pix3D warmup/step schedule).
    """
    if config.pix3d_schedule:
        def lr(step):
            warm = 0.002 + (0.02 - 0.002) * jnp.minimum(step / 1000.0, 1.0)
            decay = jnp.where(step >= 10000, 0.01, jnp.where(step >= 8000, 0.1, 1.0))
            return warm * decay
    else:
        lr = config.lr

    parts = []
    if config.grad_clip and config.grad_clip > 0:
        parts.append(optax.clip_by_global_norm(config.grad_clip))
    parts.append(optax.add_decayed_weights(config.weight_decay))
    if config.optimizer.lower() == "adam":
        parts.append(optax.adam(lr))
    elif config.optimizer.lower() == "sgd":
        parts.append(optax.sgd(lr))
    else:
        raise ValueError(f"unknown optimizer {config.optimizer}")
    base = optax.chain(*parts)

    if not config.train_backbone:
        def label(tree):
            return jax.tree_util.tree_map_with_path(
                lambda path, _: "frozen" if path[0].key == "backbone" else "train", tree)
        return optax.multi_transform({"train": base, "frozen": optax.set_to_zero()},
                                     label(params))
    return base


def create_train_state(model, config: TrainConfig, rng: jax.Array,
                       sample_images: jnp.ndarray, init_image_size: int = 64) -> TrainState:
    # Two compile-time tricks: (1) jit the init — tracing eagerly would dispatch
    # cubify's large scatters op-by-op (minutes over a tunneled device); (2) init on
    # a small dummy image — no parameter shape depends on the spatial dims (convs,
    # dense heads and batch-norm are all channel-shaped), and compiling the full
    # 137x137/48^3 graph just to create params wastes minutes of XLA time.
    shape = (1, init_image_size, init_image_size, jnp.shape(sample_images)[-1])
    init = jax.jit(model.init, static_argnames=("train",))
    variables = init(rng, jnp.zeros(shape, jnp.float32), train=False)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    tx = make_optimizer(config, params)
    return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                      batch_stats=batch_stats, opt_state=tx.init(params))


def shapenet_loss_fn(model, config: TrainConfig, params, batch_stats,
                     batch: Batch, key: jax.Array):
    """Forward + weighted loss sum for the ShapeNet model.

    reference: utils/train_utils.py:208-225 — total = sum_k w_k * loss_k over
    {voxel, chamfer, normal, edge, backbone}.
    """
    out, updates = model.apply({"params": params, "batch_stats": batch_stats},
                               batch.images, train=True, mutable=["batch_stats"])
    w = config.loss_weights
    v_loss = voxel_loss(out.voxels, batch.voxels)
    metrics = {"voxel_loss": v_loss}
    total = w.voxel * v_loss

    if config.train_backbone:
        # proper CE on logits (the reference's nll-on-softmax is degenerate;
        # SURVEY.md §6 says flag, don't reproduce)
        b_loss = optax.softmax_cross_entropy_with_integer_labels(
            out.logits, batch.labels).mean()
        metrics["backbone_loss"] = b_loss
        total = total + w.backbone * b_loss

    if not model.voxel_only:
        # compute_normal: with a zero normal weight the kNN + PCA pipeline would
        # run purely to report a metric (~70 ms of a ~350 ms step on TPU);
        # skip it statically and report normal_loss = 0.0 (PERFORMANCE.md r3).
        chamfer, normal, edge = batched_mesh_loss(
            key, list(out.stage_verts[1:]), out.mesh,
            batch.gt_verts, batch.gt_faces, batch.gt_faces_mask,
            point_cloud_size=config.point_cloud_size,
            num_neighbours=config.normal_k, tile=config.distance_tile,
            compute_normal=bool(w.normal) or config.report_unweighted_losses)
        metrics.update(chamfer_loss=chamfer, normal_loss=normal, edge_loss=edge)
        total = _weighted_mesh_total(total, w, chamfer, normal, edge)
        metrics["overflow"] = (out.overflow.verts + out.overflow.faces
                               + out.overflow.edges).sum().astype(jnp.float32)
    metrics["loss"] = total
    return total, (metrics, updates.get("batch_stats", batch_stats))


def _weighted_mesh_total(total, w, chamfer, normal, edge):
    """Add weighted mesh-loss terms, statically skipping zero weights.

    ``total + 0.0 * term`` is NOT a no-op under reverse AD: the zero scales the
    term's cotangent, and 0 x NaN = NaN — so a NaN in (say) the normal loss's
    eigensolver gradient poisons every parameter even when the recipe sets
    normal=0 (the reference's ShapeNet recipe does exactly that, README.md:77).
    Weights are static config floats, so drop the term from the graph instead.
    """
    if w.chamfer:
        total = total + w.chamfer * chamfer
    if w.normal:
        total = total + w.normal * normal
    if w.edge:
        total = total + w.edge * edge
    return total


def pix3d_loss_fn(model, config: TrainConfig, params, batch_stats,
                  batch: Batch, key: jax.Array):
    """Forward + weighted loss sum for the Pix3D model.

    reference: utils/train_utils.py:208-225 with the Mask R-CNN loss dict nested
    under backbone_loss (dataParallel/gather.py:129-142 reduced each key; here the
    keys are summed into the total like the reference's weighted sum does).
    """
    k_model, k_mesh = jax.random.split(key)
    out, updates = model.apply({"params": params, "batch_stats": batch_stats},
                               batch.images, train=True,
                               gt_boxes=batch.boxes, gt_labels=batch.labels,
                               gt_masks=batch.masks,
                               rng=k_model, mutable=["batch_stats"])
    w = config.loss_weights
    v_loss = voxel_loss(out.voxels, batch.voxels)
    metrics = {"voxel_loss": v_loss}
    total = w.voxel * v_loss

    backbone_total = 0.0
    for name, val in out.backbone_losses.items():
        metrics[name] = val
        backbone_total = backbone_total + val
    metrics["backbone_loss"] = backbone_total
    total = total + w.backbone * backbone_total

    if not model.voxel_only:
        chamfer, normal, edge = batched_mesh_loss(
            k_mesh, list(out.stage_verts[1:]), out.mesh,
            batch.gt_verts, batch.gt_faces, batch.gt_faces_mask,
            point_cloud_size=config.point_cloud_size,
            num_neighbours=config.normal_k, tile=config.distance_tile,
            compute_normal=bool(w.normal) or config.report_unweighted_losses)
        metrics.update(chamfer_loss=chamfer, normal_loss=normal, edge_loss=edge)
        total = _weighted_mesh_total(total, w, chamfer, normal, edge)
        metrics["overflow"] = (out.overflow.verts + out.overflow.faces
                               + out.overflow.edges).sum().astype(jnp.float32)
    metrics["loss"] = total
    return total, (metrics, updates.get("batch_stats", batch_stats))


def make_train_step(model, config: TrainConfig,
                    axis_name: Optional[str] = None) -> Callable:
    """Build the (optionally collective) jitted train step.

    With ``axis_name`` set the step is meant to run inside shard_map: gradients,
    metrics and batch-norm stats are pmean'd over that axis — the TPU analog of the
    reference's NCCL reduce_add of losses + Broadcast of gradients
    (dataParallel/gather.py:13-32).
    """
    tx = None  # built lazily against param structure
    loss_fn = (pix3d_loss_fn if type(model).__name__ == "Pix3DModel"
               else shapenet_loss_fn)

    def step(state: TrainState, batch: Batch, key: jax.Array):
        nonlocal tx
        if tx is None:
            tx = make_optimizer(config, state.params)
        if axis_name is not None:
            key = jax.random.fold_in(key, jax.lax.axis_index(axis_name))
        grad_fn = jax.value_and_grad(
            lambda p: loss_fn(model, config, p, state.batch_stats, batch, key),
            has_aux=True)
        (loss, (metrics, new_bs)), grads = grad_fn(state.params)
        if axis_name is not None:
            grads = jax.lax.pmean(grads, axis_name)
            metrics = jax.lax.pmean(metrics, axis_name)
            new_bs = jax.lax.pmean(new_bs, axis_name)
            loss = jax.lax.pmean(loss, axis_name)

        if config.skip_nonfinite:
            # The reference swallows bad batches with try/except
            # (train_utils.py:202-205); the jit-compiled analog: if any gradient
            # (or the loss) is non-finite, zero the gradients and keep the old
            # params / opt-state / BN stats, reporting it via the grads_finite
            # metric instead of silently. One poisoned step otherwise NaNs the
            # refine stages (and BN running stats) for the rest of the run.
            ok = jnp.isfinite(loss)
            for g in jax.tree_util.tree_leaves(grads):
                ok = jnp.logical_and(ok, jnp.all(jnp.isfinite(g)))
            grads = jax.tree_util.tree_map(
                lambda g: jnp.where(ok, g, jnp.zeros_like(g)), grads)
            updates, new_opt = tx.update(grads, state.opt_state, state.params)
            new_params = optax.apply_updates(state.params, updates)
            keep = lambda old, new: jax.tree_util.tree_map(
                lambda a, b: jnp.where(ok, b, a), old, new)
            new_params = keep(state.params, new_params)
            new_opt = keep(state.opt_state, new_opt)
            new_bs = keep(state.batch_stats, new_bs)
            metrics["grads_finite"] = ok.astype(jnp.float32)
        else:
            updates, new_opt = tx.update(grads, state.opt_state, state.params)
            new_params = optax.apply_updates(state.params, updates)
        return TrainState(step=state.step + 1, params=new_params,
                          batch_stats=new_bs, opt_state=new_opt), metrics

    return step


def make_dp_train_step(model, config: TrainConfig, mesh: Mesh,
                       donate: bool = False) -> Callable:
    """shard_map the train step over the mesh's ``dp`` axis and jit it.

    Batch arrays shard on their leading axis; state and rng are replicated. This is
    the whole data-parallel story — compare dataParallel/ in the reference.
    """
    inner = make_train_step(model, config, axis_name="dp")
    sharded = jax.shard_map(
        inner, mesh=mesh,
        in_specs=(P(), P("dp"), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )
    # donate=True invalidates the input state after each call — only for
    # strictly linear loops (state = step(state, ...), e.g. train.py); callers
    # that reuse a state across step functions (tests, A/B tools) must not
    return jax.jit(sharded, donate_argnums=(0,) if donate else ())


def make_multi_step(model, config: TrainConfig, n_steps: int,
                    mesh: Optional[Mesh] = None, donate: bool = False) -> Callable:
    """Run ``n_steps`` training steps in ONE device dispatch via lax.scan.

    The tunneled chip adds ~5 ms of host round-trip latency per dispatch; staging
    a group of batches (stacked on a new leading axis) and scanning over them
    amortises it — the same trick bench.py uses for measurement, applied to real
    training. With ``mesh``, the whole scan runs inside shard_map over the ``dp``
    axis (batches arrive [n_steps, B, ...] and shard on axis 1): every device
    scans its shard-local batches while gradients/metrics/BN stats pmean each
    inner step — DP and dispatch amortisation compose instead of excluding each
    other. Returns (new_state, metrics averaged over the group).
    """
    step = make_train_step(model, config, axis_name="dp" if mesh is not None else None)

    def multi(state: TrainState, batches: Batch, key: jax.Array):
        keys = jax.random.split(key, n_steps)

        def body(s, xs):
            b, k = xs
            s2, metrics = step(s, b, k)
            return s2, metrics

        state, metrics = jax.lax.scan(body, state, (batches, keys))
        return state, jax.tree_util.tree_map(lambda x: x.mean(0), metrics)

    donated = (0,) if donate else ()
    if mesh is None:
        return jax.jit(multi, donate_argnums=donated)
    sharded = jax.shard_map(multi, mesh=mesh,
                            in_specs=(P(), P(None, "dp"), P()),
                            out_specs=(P(), P()),
                            check_vma=False)
    return jax.jit(sharded, donate_argnums=donated)


def stack_batches(batches) -> Batch:
    """Stack a list of same-shape Batch pytrees on a new leading axis (host-side)."""
    import numpy as np

    return jax.tree_util.tree_map(lambda *xs: np.stack(xs), *batches)


def make_eval_step(model) -> Callable:
    """Jitted eval forward (no targets), reference eval-mode semantics."""
    @jax.jit
    def step(state: TrainState, images: jnp.ndarray):
        return model.apply({"params": state.params, "batch_stats": state.batch_stats},
                           images, train=False)
    return step


def make_split_eval_step(model, dp_mesh: Optional[Mesh] = None) -> Callable:
    """Pix3D eval forward as THREE chained XLA programs instead of one.

    Workaround for the TPU runtime fault documented in ROADMAP.md ("Known
    issue"): at production shapes, the single compiled program containing both
    cubify and the VertixRefinePix3D stages reproducibly kills the TPU worker,
    while each half runs correctly on its own (bisection evidence in
    tools/debug_tpu_eval_fault/). The split:

      1. detection + voxel branch  (the model with voxel_only=True — identical
         params/batch_stats tree, the refine subtrees are simply unused),
      2. cubify + validity masking + ``precompute_adjacency``,
      3. the refinement stages (models/pix3d.py Pix3DRefineStages, whose scope
         names alias Pix3DModel's top-level refine{i} params).

    The three jits chain on-device (JAX dispatch is async — no host sync
    between them), and the assembled Pix3DOutput is element-for-element the
    single-dispatch result; a CPU test asserts equality. Same (state, images)
    signature as make_eval_step. With ``dp_mesh`` every phase additionally runs
    under shard_map over the ``dp`` axis (the split analog of make_dp_eval_step).
    """
    from meshrcnn_tpu.models.pix3d import Pix3DOutput, Pix3DRefineStages
    from meshrcnn_tpu.ops.cubify import cubify
    from meshrcnn_tpu.ops.graph_conv import precompute_adjacency

    if model.voxel_only:
        return make_eval_step(model) if dp_mesh is None else _dp_eval(model, dp_mesh)
    voxel_model = model.clone(voxel_only=True)
    refine = Pix3DRefineStages(vertex_feature_dim=model.vertex_feature_dim,
                               num_refinement_stages=model.num_refinement_stages)

    def wrap(fn, in_specs, out_specs):
        if dp_mesh is None:
            return jax.jit(fn)
        return jax.jit(jax.shard_map(fn, mesh=dp_mesh, in_specs=in_specs,
                                     out_specs=out_specs, check_vma=False))

    detect_phase = wrap(
        lambda state, images: voxel_model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            images, train=False),
        in_specs=(P(), P("dp")), out_specs=P("dp"))

    def cubify_fn(voxels: jnp.ndarray, mesh_valid: jnp.ndarray):
        mesh, overflow = cubify(voxels, model.cubify_threshold,
                                vert_capacity=model.vert_capacity,
                                face_capacity=model.face_capacity,
                                edge_capacity=model.edge_capacity)
        mesh = mesh.replace(
            verts_mask=mesh.verts_mask & mesh_valid[:, None],
            faces_mask=mesh.faces_mask & mesh_valid[:, None],
            edges_mask=mesh.edges_mask & mesh_valid[:, None])
        topo = precompute_adjacency(mesh.edges, mesh.edges_mask,
                                    model.vert_capacity)
        return mesh, topo, overflow

    cubify_phase = wrap(cubify_fn, in_specs=(P("dp"), P("dp")),
                        out_specs=(P("dp"), P("dp"), P("dp")))

    # one compiled refine program per image size (shard_map has no static args,
    # so the size is closed over; eval uses a single fixed size in practice)
    refine_cache: dict = {}

    def get_refine_phase(image_size):
        if image_size not in refine_cache:
            refine_cache[image_size] = wrap(
                lambda params, roi, verts0, topo: refine.apply(
                    {"params": params}, roi, verts0, topo, image_size),
                in_specs=(P(), P("dp"), P("dp"), P("dp")), out_specs=P("dp"))
        return refine_cache[image_size]

    def step(state: TrainState, images: jnp.ndarray):
        H, W = int(images.shape[1]), int(images.shape[2])
        out = detect_phase(state, images)
        B, D = out.detections.valid.shape
        roi = out.detections.roi_features.reshape(
            B * D, *out.detections.roi_features.shape[2:])
        mesh, topo, overflow = cubify_phase(out.voxels, out.mesh_valid)
        stage_verts = get_refine_phase((H, W))(state.params, roi, mesh.verts, topo)
        return Pix3DOutput(detections=out.detections, mask_probs=out.mask_probs,
                           backbone_losses=out.backbone_losses, voxels=out.voxels,
                           mesh=mesh, stage_verts=stage_verts,
                           mesh_valid=out.mesh_valid, overflow=overflow)

    return step


def _dp_eval(model, mesh: Mesh) -> Callable:
    def fwd(state: TrainState, images: jnp.ndarray):
        return model.apply({"params": state.params, "batch_stats": state.batch_stats},
                           images, train=False)

    sharded = jax.shard_map(fwd, mesh=mesh,
                            in_specs=(P(), P("dp")),
                            out_specs=P("dp"),
                            check_vma=False)
    return jax.jit(sharded)


def make_dp_eval_step(model, mesh: Mesh, split: bool = False) -> Callable:
    """Data-parallel eval forward over the ``dp`` mesh axis.

    The TPU analog of the reference's eval-mode merge ``gather_GCN_outputs``
    (dataParallel/gather.py:66-92, wired via gather.py:95-158): each device runs
    the eval forward on its batch shard and the output pytree comes back
    batch-sharded over the mesh — host consumption (``np.asarray`` in
    ``harness.validate``) performs the cross-device gather, and jitted metric
    ops consume the sharded arrays directly. The reference's edge-index
    re-offsetting (gather.py:80-83) has no analog here: every output leaf —
    padded MeshBatch buffers included — is per-sample batch-leading, so
    concatenation along the batch axis IS the merge (SURVEY.md §2.8).

    ``split=True`` (Pix3D on TPU) routes through make_split_eval_step so the
    cubify+refine single-program fault workaround composes with DP.
    """
    if split:
        return make_split_eval_step(model, dp_mesh=mesh)
    return _dp_eval(model, mesh)


def shard_batch(batch: Batch, mesh: Mesh) -> Batch:
    """Place a host batch with leading-axis sharding over the dp mesh."""
    sharding = NamedSharding(mesh, P("dp"))
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding) if x is not None else None, batch)


def shard_stacked_batch(batches: Batch, mesh: Mesh) -> Batch:
    """Place a [n_steps, B, ...] stacked batch group with axis-1 dp sharding
    (the layout make_multi_step's shard_map expects)."""
    sharding = NamedSharding(mesh, P(None, "dp"))
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding) if x is not None else None, batches)
