import sys
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from meshrcnn_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()
from meshrcnn_tpu.ops.cubify import cubify
from meshrcnn_tpu.ops.graph_conv import precompute_adjacency
from meshrcnn_tpu.models.layers import VertixRefinePix3D
import orbax.checkpoint as ocp

mode = sys.argv[1]   # "l0" | "l0rand"
d = np.load("/tmp/real_interm.npz")
if "synth" in sys.argv[1]:
    r = np.random.RandomState(0)
    vox = jnp.asarray((r.rand(12, 24, 24, 24) < 0.5).astype(np.float32))
    roi = jnp.asarray(r.rand(12, 12, 12, 256).astype(np.float32))
else:
    vox = jnp.asarray(d["voxels"]); roi = jnp.asarray(d["roi"])
valid = jnp.asarray(d["valid"])
l0 = VertixRefinePix3D(use_input_features=False, num_features=128)
if mode.startswith("l0") and "rand" not in mode:
    raw = ocp.PyTreeCheckpointer().restore("/root/pix3d_parity/train/Pix3D/GCN/2026-08-17/final")
    p0 = jax.tree_util.tree_map(jnp.asarray, raw["params"]["refine0"])
else:
    import jax.random as jr
    p0 = l0.init(jr.PRNGKey(0), jnp.zeros((12, 12, 12, 256)),
                 jnp.zeros((12, 4096, 3)),
                 precompute_adjacency(jnp.zeros((12, 16384, 2), jnp.int32),
                                      jnp.zeros((12, 16384), bool), 4096),
                 (224, 224))["params"]

@jax.jit
def run(vox, roi, valid, p0):
    mesh, ov = cubify(vox, 0.2, vert_capacity=4096, face_capacity=8192,
                      edge_capacity=16384)
    mesh = mesh.replace(
        verts_mask=mesh.verts_mask & valid[:, None],
        faces_mask=mesh.faces_mask & valid[:, None],
        edges_mask=mesh.edges_mask & valid[:, None])
    topo = precompute_adjacency(mesh.edges, mesh.edges_mask, 4096)
    verts, feats = l0.apply({"params": p0}, roi, mesh.verts, topo, (224, 224))
    return verts.sum()

out = run(vox, roi, valid, p0)
jax.block_until_ready(out)
print(mode, "OK", float(out), flush=True)
