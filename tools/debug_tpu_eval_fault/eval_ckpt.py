import sys
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from meshrcnn_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()
from meshrcnn_tpu.models.pix3d import Pix3DModel
from meshrcnn_tpu.core.config import TrainConfig
from meshrcnn_tpu.parallel.train_step import create_train_state, make_eval_step
from meshrcnn_tpu.utils.checkpoint import load_state_partial

mode = sys.argv[1]
kw = dict(num_classes=10, cubify_threshold=0.2, vert_capacity=4096,
          face_capacity=8192, edge_capacity=16384, num_refinement_stages=3)
if mode == "voxel_only":
    kw["voxel_only"] = True
model = Pix3DModel(**kw)
rng = np.random.RandomState(0)
images = jnp.asarray(rng.rand(4, 224, 224, 3).astype(np.float32))
state = create_train_state(model, TrainConfig(), jax.random.PRNGKey(0), images)
state, _ = load_state_partial("/root/pix3d_parity/train/Pix3D/GCN/2026-08-17/final", state)
out = make_eval_step(model)(state, images)
jax.block_until_ready(jax.tree_util.tree_leaves(out))
print(mode, "ckpt eval OK")
