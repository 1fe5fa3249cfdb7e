import sys
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from meshrcnn_tpu.models.pix3d import Pix3DModel
from meshrcnn_tpu.core.config import TrainConfig
from meshrcnn_tpu.parallel.train_step import create_train_state
from meshrcnn_tpu.utils.checkpoint import load_state_partial

model = Pix3DModel(num_classes=10, cubify_threshold=0.2, vert_capacity=4096,
                   face_capacity=8192, edge_capacity=16384, num_refinement_stages=3,
                   voxel_only=True)   # gets us detections + voxels without refine
rng = np.random.RandomState(0)
images = jnp.asarray(rng.rand(4, 224, 224, 3).astype(np.float32))
state = create_train_state(model, TrainConfig(), jax.random.PRNGKey(0), images)
state, _ = load_state_partial("/root/pix3d_parity/train/Pix3D/GCN/2026-08-17/final", state)
out = model.apply({"params": state.params, "batch_stats": state.batch_stats},
                  images, train=False)
roi = out.detections.roi_features  # [4, 3, 12, 12, 256]
np.savez("/tmp/real_interm.npz",
         voxels=np.asarray(out.voxels),
         roi=np.asarray(roi).reshape(12, 12, 12, 256),
         valid=np.asarray(out.detections.valid).reshape(12))
print("dumped", out.voxels.shape)
