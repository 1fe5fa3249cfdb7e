import sys
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from meshrcnn_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()
from meshrcnn_tpu.ops.cubify import cubify
from meshrcnn_tpu.ops.graph_conv import precompute_adjacency, aggregate_neighbours
from meshrcnn_tpu.ops.vert_align import vert_align

which = sys.argv[1]
rng = np.random.RandomState(0)
vox = jnp.asarray((rng.rand(12, 24, 24, 24) < 0.5).astype(np.float32))
mesh_valid = jnp.zeros((12,), bool)   # all-invalid detections, as in the ckpt eval

@jax.jit
def run(vox, feats):
    mesh, ov = cubify(vox, 0.2, vert_capacity=4096, face_capacity=8192,
                      edge_capacity=16384)
    mesh = mesh.replace(
        verts_mask=mesh.verts_mask & mesh_valid[:, None],
        faces_mask=mesh.faces_mask & mesh_valid[:, None],
        edges_mask=mesh.edges_mask & mesh_valid[:, None])
    if which in ("adj", "both"):
        topo = precompute_adjacency(mesh.edges, mesh.edges_mask, 4096)
        x = jnp.ones((12, 4096, 8), jnp.float32)
        agg = aggregate_neighbours(x, topo, mesh.verts_mask)
    else:
        agg = 0.0
    if which in ("align", "both"):
        al = vert_align([feats], mesh.verts, (224, 224))
    else:
        al = 0.0
    return jax.tree_util.tree_map(lambda a: jnp.sum(a) if hasattr(a, 'sum') else a, (agg, al, mesh.verts.sum()))

feats = jnp.asarray(rng.rand(12, 12, 12, 256).astype(np.float32))
out = run(vox, feats)
jax.block_until_ready(out)
print(which, "OK", flush=True)
