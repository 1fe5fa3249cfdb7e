import sys
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from meshrcnn_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()
from meshrcnn_tpu.ops.cubify import cubify
from meshrcnn_tpu.ops.graph_conv import precompute_adjacency, aggregate_neighbours
from meshrcnn_tpu.ops.vert_align import vert_align

d = np.load("/tmp/real_interm.npz")
vox = jnp.asarray(d["voxels"]); roi = jnp.asarray(d["roi"]); valid = jnp.asarray(d["valid"])
print("inputs finite:", bool(np.isfinite(d["voxels"]).all()), bool(np.isfinite(d["roi"]).all()),
      "roi range", d["roi"].min(), d["roi"].max(), flush=True)

@jax.jit
def run(vox, roi, valid):
    mesh, ov = cubify(vox, 0.2, vert_capacity=4096, face_capacity=8192,
                      edge_capacity=16384)
    mesh = mesh.replace(
        verts_mask=mesh.verts_mask & valid[:, None],
        faces_mask=mesh.faces_mask & valid[:, None],
        edges_mask=mesh.edges_mask & valid[:, None])
    topo = precompute_adjacency(mesh.edges, mesh.edges_mask, 4096)
    x = jnp.ones((12, 4096, 8), jnp.float32)
    agg = aggregate_neighbours(x, topo, mesh.verts_mask)
    al = vert_align([roi], mesh.verts, (224, 224))
    return agg.sum() + al.sum() + mesh.verts.sum()

out = run(vox, roi, valid)
jax.block_until_ready(out)
print("real-data pieces OK", float(out), flush=True)
