"""Split-dispatch probe: cubify+topo in jit A, the refine stage in jit B.

The known-faulting program (refine_stage.py l0/l0rand) compiles cubify and
VertixRefinePix3D into ONE XLA program. This probe runs the identical math as
two separate jit dispatches chained on-device — the workaround candidate from
ROADMAP.md. Pass "trained" to use the preserved checkpoint's refine0 params,
anything else for random init.
"""
import sys
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from meshrcnn_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()
from meshrcnn_tpu.ops.cubify import cubify
from meshrcnn_tpu.ops.graph_conv import precompute_adjacency
from meshrcnn_tpu.models.layers import VertixRefinePix3D

mode = sys.argv[1] if len(sys.argv) > 1 else "trained"
d = np.load("/tmp/real_interm.npz")
vox = jnp.asarray(d["voxels"]); roi = jnp.asarray(d["roi"])
valid = jnp.asarray(d["valid"])
l0 = VertixRefinePix3D(use_input_features=False, num_features=128)
if mode == "trained":
    import orbax.checkpoint as ocp
    raw = ocp.PyTreeCheckpointer().restore(
        "/root/pix3d_parity/train/Pix3D/GCN/2026-08-17/final")
    p0 = jax.tree_util.tree_map(jnp.asarray, raw["params"]["refine0"])
else:
    import jax.random as jr
    p0 = l0.init(jr.PRNGKey(0), jnp.zeros((12, 12, 12, 256)),
                 jnp.zeros((12, 4096, 3)),
                 precompute_adjacency(jnp.zeros((12, 16384, 2), jnp.int32),
                                      jnp.zeros((12, 16384), bool), 4096),
                 (224, 224))["params"]

@jax.jit
def phase_cubify(vox, valid):
    mesh, ov = cubify(vox, 0.2, vert_capacity=4096, face_capacity=8192,
                      edge_capacity=16384)
    mesh = mesh.replace(
        verts_mask=mesh.verts_mask & valid[:, None],
        faces_mask=mesh.faces_mask & valid[:, None],
        edges_mask=mesh.edges_mask & valid[:, None])
    topo = precompute_adjacency(mesh.edges, mesh.edges_mask, 4096)
    return mesh, topo

@jax.jit
def phase_refine(p0, roi, verts, topo):
    verts2, feats = l0.apply({"params": p0}, roi, verts, topo, (224, 224))
    return verts2.sum()

mesh, topo = phase_cubify(vox, valid)
jax.block_until_ready(mesh.verts)
print("phase_cubify OK", flush=True)
out = phase_refine(p0, roi, mesh.verts, topo)
jax.block_until_ready(out)
print("split", mode, "OK", float(out), flush=True)
