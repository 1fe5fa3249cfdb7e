import sys
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from meshrcnn_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()
from meshrcnn_tpu.ops.cubify import cubify
from meshrcnn_tpu.ops.graph_conv import precompute_adjacency, aggregate_neighbours
from meshrcnn_tpu.ops.vert_align import vert_align

level = int(sys.argv[1])
d = np.load("/tmp/real_interm.npz")
vox = jnp.asarray(d["voxels"]); roi = jnp.asarray(d["roi"]); valid = jnp.asarray(d["valid"])
r = np.random.RandomState(1)
W0 = jnp.asarray(r.randn(259, 128).astype(np.float32) * 0.05)
W1 = jnp.asarray(r.randn(259, 128).astype(np.float32) * 0.05)

@jax.jit
def run(vox, roi, valid):
    mesh, ov = cubify(vox, 0.2, vert_capacity=4096, face_capacity=8192,
                      edge_capacity=16384)
    mesh = mesh.replace(
        verts_mask=mesh.verts_mask & valid[:, None],
        faces_mask=mesh.faces_mask & valid[:, None],
        edges_mask=mesh.edges_mask & valid[:, None])
    topo = precompute_adjacency(mesh.edges, mesh.edges_mask, 4096)
    aligned = vert_align([roi], mesh.verts, (224, 224))
    feats = jnp.concatenate([mesh.verts, aligned], axis=-1)   # [12, 4096, 259]
    own = jnp.einsum("bvc,co->bvo", feats, W0)
    if level == 1:
        return own.sum()
    prop = jnp.einsum("bvc,co->bvo", feats, W1)
    neigh = aggregate_neighbours(prop, topo)
    out = jax.nn.relu(own + neigh)
    return out.sum()

out = run(vox, roi, valid)
jax.block_until_ready(out)
print("level", level, "OK", float(out), flush=True)
