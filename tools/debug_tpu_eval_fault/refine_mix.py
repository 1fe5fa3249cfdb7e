"""Input-substitution probe for the standalone refine-stage fault.

refine_split.py established that VertixRefinePix3D as its OWN XLA program
faults the TPU worker when fed the real (trained-checkpoint, all-detections-
invalid) intermediates, while the full eval with random-init params — valid
meshes — runs fine. This probe feeds the same compiled program host-loaded
inputs, mixing real and synthetic per input, to identify which input triggers
the fault. Usage:  python refine_mix.py SPEC  where SPEC is three letters
<verts><roi><topo>, each r (real, /tmp/refine_inputs.npz) or s (synthetic
benign). Example: "rrr" full real, "sss" full synthetic, "ssr" real topo only.
The compiled program is identical across specs (same shapes/dtypes), so the
compilation cache makes pass-runs fast.
"""
import sys

sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp

from meshrcnn_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()
from meshrcnn_tpu.models.layers import VertixRefinePix3D
from meshrcnn_tpu.ops.graph_conv import EdgeTopology

spec = sys.argv[1]
assert len(spec) == 3 and set(spec) <= set("rs"), spec
d = np.load("/tmp/refine_inputs.npz")
r = np.random.RandomState(0)
N, V, E = 12, 4096, 16384

if spec[0] == "r":
    verts = d["verts"]
else:
    verts = (r.rand(N, V, 3).astype(np.float32) - 0.5) * 40  # same ±20 scale

if spec[1] == "r":
    roi = d["roi"]
else:
    roi = r.randn(N, 12, 12, 256).astype(np.float32)

topo_src = d if spec[2] == "r" else np.load("/tmp/benign_topo.npz")
topo = EdgeTopology(**{k: jnp.asarray(topo_src[k]) for k in
                       ("src_lo", "starts_lo", "ends_lo",
                        "src_hi", "starts_hi", "ends_hi")})

l0 = VertixRefinePix3D(use_input_features=False, num_features=128)
# params precomputed on CPU (never trace/init eagerly on the tunneled chip)
pz = np.load("/tmp/refine_params.npz")
p0 = {}
for key in pz.files:
    mod, name = key.split("|")
    p0.setdefault(mod, {})[name] = jnp.asarray(pz[key])


@jax.jit
def phase_refine(p0, roi, verts, topo):
    verts2, feats = l0.apply({"params": p0}, roi, verts, topo, (224, 224))
    return verts2.sum()


out = phase_refine(p0, jnp.asarray(roi), jnp.asarray(verts), topo)
jax.block_until_ready(out)
print("mix", spec, "OK", float(out), flush=True)
