"""Op-level bisection of the standalone refine-stage TPU fault.

refine_mix.py established the fault is DATA-INDEPENDENT: VertixRefinePix3D as
its own jitted program at production shapes (N=12, V=4096, E=16384, RoI
12x12x256) kills the TPU worker with fully synthetic benign inputs. This probe
builds sub-programs of that stage from synthetic data to find the smallest op
composition that faults. Usage: python refine_ops.py NAME

  align      vert_align only -> sum
  gconv1     one GraphConv (einsum x2 + aggregate + relu) on precomputed feats
  gconv3     three chained GraphConvs (no vert_align; constant aligned feats)
  align1     vert_align + concat + one GraphConv
  full       the whole stage (= refine_mix sss, known to fault)
  aggonly    aggregate_neighbours alone at C=128
  fullchain  3 GraphConvs + final Dense + tanh (no vert_align)
"""
import sys

sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp

from meshrcnn_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()
from meshrcnn_tpu.models.layers import GraphConv, VertixRefinePix3D
from meshrcnn_tpu.ops.graph_conv import EdgeTopology, aggregate_neighbours
from meshrcnn_tpu.ops.vert_align import vert_align

name = sys.argv[1]
N, V, E = 12, 4096, 16384
r = np.random.RandomState(0)
verts = jnp.asarray((r.rand(N, V, 3).astype(np.float32) - 0.5) * 40)
roi = jnp.asarray(r.randn(N, 12, 12, 256).astype(np.float32))
tsrc = np.load("/tmp/benign_topo.npz")
topo = EdgeTopology(**{k: jnp.asarray(tsrc[k]) for k in
                       ("src_lo", "starts_lo", "ends_lo",
                        "src_hi", "starts_hi", "ends_hi")})
feats259 = jnp.asarray(r.randn(N, V, 259).astype(np.float32) * 0.1)
W0 = jnp.asarray(r.randn(259, 128).astype(np.float32) * 0.05)
W1 = jnp.asarray(r.randn(259, 128).astype(np.float32) * 0.05)
Wa = jnp.asarray(r.randn(131, 128).astype(np.float32) * 0.05)
Wb = jnp.asarray(r.randn(131, 128).astype(np.float32) * 0.05)
Wl = jnp.asarray(r.randn(131, 3).astype(np.float32) * 0.05)


def gconv(feats, w0, w1, topo):
    own = jnp.einsum("bvc,co->bvo", feats, w0)
    prop = jnp.einsum("bvc,co->bvo", feats, w1)
    return jax.nn.relu(own + aggregate_neighbours(prop, topo))


if name == "align":
    fn = lambda: vert_align([roi], verts, (224, 224)).sum()
elif name == "aggonly":
    x = jnp.asarray(r.randn(N, V, 128).astype(np.float32))
    fn = lambda: aggregate_neighbours(x, topo).sum()
elif name == "gconv1":
    fn = lambda: gconv(feats259, W0, W1, topo).sum()
elif name == "gconv3":
    def fn():
        f = gconv(feats259, W0, W1, topo)
        f = gconv(jnp.concatenate([verts, f], -1), Wa, Wb, topo)
        f = gconv(jnp.concatenate([verts, f], -1), Wa, Wb, topo)
        return f.sum()
elif name == "fullchain":
    def fn():
        f = gconv(feats259, W0, W1, topo)
        f = gconv(jnp.concatenate([verts, f], -1), Wa, Wb, topo)
        f = gconv(jnp.concatenate([verts, f], -1), Wa, Wb, topo)
        off = jnp.einsum("bvc,co->bvo", jnp.concatenate([verts, f], -1), Wl)
        return (verts + jnp.tanh(off)).sum()
elif name == "gather":
    # aggregate's first op alone: flattened row gather [12,4096,128] by [12,16384]
    x = jnp.asarray(r.randn(N, V, 128).astype(np.float32))
    from meshrcnn_tpu.ops.gather import batched_gather_rows
    fn = lambda: batched_gather_rows(x, topo.src_lo).sum()
elif name == "cumsum":
    # aggregate's middle op alone: blocked cumsum over [12,16384,128]
    from meshrcnn_tpu.ops.graph_conv import _blocked_cumsum
    x = jnp.asarray(r.randn(N, E, 128).astype(np.float32))
    fn = lambda: _blocked_cumsum(x).sum()
elif name == "segsum":
    # cumsum + boundary gathers (no source gather)
    from meshrcnn_tpu.ops.graph_conv import _sorted_segment_sum
    x = jnp.asarray(r.randn(N, E, 128).astype(np.float32))
    fn = lambda: _sorted_segment_sum(x, topo.starts_lo, topo.ends_lo).sum()
elif name == "aggonly4":
    # training shape: N=4 (the train step runs this daily without faulting)
    x = jnp.asarray(r.randn(4, V, 128).astype(np.float32))
    t4 = jax.tree_util.tree_map(lambda a: a[:4], topo)
    fn = lambda: aggregate_neighbours(x, t4).sum()
elif name == "aggonly8":
    x = jnp.asarray(r.randn(8, V, 128).astype(np.float32))
    t8 = jax.tree_util.tree_map(lambda a: a[:8], topo)
    fn = lambda: aggregate_neighbours(x, t8).sum()
elif name == "cumsum4":
    from meshrcnn_tpu.ops.graph_conv import _blocked_cumsum
    x = jnp.asarray(r.randn(4, E, 128).astype(np.float32))
    fn = lambda: _blocked_cumsum(x).sum()
elif name == "aggonly1":
    x = jnp.asarray(r.randn(1, V, 128).astype(np.float32))
    t1 = jax.tree_util.tree_map(lambda a: a[:1], topo)
    fn = lambda: aggregate_neighbours(x, t1).sum()
elif name == "agg_laxmap":
    # per-sample lax.map over the batch — workaround candidate if the fault is
    # batch-size-triggered
    x = jnp.asarray(r.randn(N, V, 128).astype(np.float32))
    def fn():
        def one(args):
            xi, ti = args
            return aggregate_neighbours(xi[None], ti)[0]
        t_map = jax.tree_util.tree_map(lambda a: a[:, None, :], topo)
        out = jax.lax.map(one, (x, t_map))
        return out.sum()
elif name == "cumsum_c8":
    # C=8 at N=12 (the pieces_real shape that passed inside a larger program)
    from meshrcnn_tpu.ops.graph_conv import _blocked_cumsum
    x = jnp.asarray(r.randn(N, E, 8).astype(np.float32))
    fn = lambda: _blocked_cumsum(x).sum()
elif name == "cumsum_jnp":
    # plain jnp.cumsum formulation at the faulting shape — workaround candidate
    x = jnp.asarray(r.randn(N, E, 128).astype(np.float32))
    fn = lambda: jnp.cumsum(x, axis=1).sum()
elif name == "aggdir":
    # ONE direction of aggregate (gather -> cumsum -> boundary gathers), N=12
    from meshrcnn_tpu.ops.gather import batched_gather_rows
    from meshrcnn_tpu.ops.graph_conv import _sorted_segment_sum
    x = jnp.asarray(r.randn(N, V, 128).astype(np.float32))
    fn = lambda: _sorted_segment_sum(batched_gather_rows(x, topo.src_lo),
                                     topo.starts_lo, topo.ends_lo).sum()
elif name == "agg_barrier":
    # full aggregate with an optimization barrier between the source gather and
    # the blocked cumsum: if the fault is the gather+tri-einsum fusion, this is
    # the production fix
    from meshrcnn_tpu.ops.gather import batched_gather_rows
    from meshrcnn_tpu.ops.graph_conv import _sorted_segment_sum
    x = jnp.asarray(r.randn(N, V, 128).astype(np.float32))
    def fn():
        out = None
        for src, st, en in ((topo.src_lo, topo.starts_lo, topo.ends_lo),
                            (topo.src_hi, topo.starts_hi, topo.ends_hi)):
            c = jax.lax.optimization_barrier(batched_gather_rows(x, src))
            s = _sorted_segment_sum(c, st, en)
            out = s if out is None else out + s
        return out.sum()
elif name == "align1":
    def fn():
        al = vert_align([roi], verts, (224, 224))
        f = jnp.concatenate([verts, al], -1)
        return gconv(f, W0, W1, topo).sum()
elif name == "full":
    l0 = VertixRefinePix3D(use_input_features=False, num_features=128)
    pz = np.load("/tmp/refine_params.npz")
    p0 = {}
    for key in pz.files:
        mod, pname = key.split("|")
        p0.setdefault(mod, {})[pname] = jnp.asarray(pz[key])
    fn = lambda: l0.apply({"params": p0}, roi, verts, topo, (224, 224))[0].sum()
else:
    raise SystemExit(f"unknown probe {name}")

out = jax.jit(fn)()
jax.block_until_ready(out)
print("ops", name, "OK", float(out), flush=True)
