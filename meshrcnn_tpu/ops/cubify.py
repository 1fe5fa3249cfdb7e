"""Cubify: voxel occupancy grid -> padded triangle mesh batch, all static shapes.

TPU-native redesign of the reference Cubify layer (reference: meshRCNN/layers.py:342-484).
The reference binarises the grid, runs a 6-tap conv3d to find exposed faces, then builds
the mesh with data-dependent shapes: ``nonzero()``, a Python loop over directions,
``unique(dim=0)`` vertex dedup and a *Python dict hash table* to reindex faces
(layers.py:455-462). None of that can live inside an XLA program.

Here everything is fixed shape, and every data movement is chosen for XLA-TPU's fast
paths (no scatters — write-serialised; no vmapped searchsorted/gathers — pathological
batched-gather lowering):

 1. ``occ = grid > threshold`` and six zero-padded shifts give the 6 exposure masks
    (replaces the conv3d at layers.py:411).
 2. Vertices live on the (Z+1, Y+1, X+1) corner lattice. A corner is "used" if any
    exposed face touches it. Vertex ids are assigned by an exclusive cumsum over the
    flattened corner-used grid — this *is* the dedup: each geometric corner has exactly
    one lattice slot, so no sort or hash table is needed (replaces unique + dict at
    layers.py:447-462).
 3. Every (direction, voxel) pair owns two statically-addressed candidate triangles
    whose vertex ids are gathers from the id grid; valid ones are compacted to the
    front of a [Fmax, 3] buffer by **batched binary search over the inclusive cumsum**
    (slot s takes the s-th valid candidate) + flat gathers — the per-sample raw pass
    is vmapped, the compaction runs batched outside the vmap.
 4. Unique undirected edges come from a lexicographic sort + adjacent-compare compact
    (replaces unique(dim=1) at layers.py:478), with the same batched compaction.

Geometry conventions copied from the reference so OBJ artifacts are comparable:
corners at voxel_index +/- 0.5; per-direction corner tables from layers.py:370-400;
quad triangulated as (c0,c1,c2),(c0,c2,c3) (layers.py:441-443); final coordinate
transform (z,y,x) -> (z, x, -y), i.e. the 90-degree x-rotation at layers.py:466-467.
(Note: the reference's corner tables are in raster order, not cyclic order, so its
(0,1,2),(0,2,3) triangulation leaves sliver gaps in every quad. We reproduce the
topology exactly for behavioural parity; tests/test_reference_parity.py shows this
cubify reproduces the reference's shipped demo mesh exactly.)

Capacity overflow is *detected and reported* per sample instead of the reference's
silent try/except batch skipping (utils/train_utils.py:134-137): callers receive
``overflow`` counts alongside the mesh.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from flax import struct

from meshrcnn_tpu.core.mesh import MeshBatch
from meshrcnn_tpu.ops.gather import (batched_gather_rows, batched_searchsorted,
                                     compact_from_cumsum, use_counting_search)

# Per-direction corner lattice offsets (oz, oy, ox), transcribed from the reference
# deltas table (meshRCNN/layers.py:370-400) with -0.5 -> 0 and +0.5 -> 1.
# Directions (exposure test): 0 back(z-1) 1 front(z+1) 2 top(y+1) 3 bottom(y-1)
# 4 left(x-1) 5 right(x+1)  (layers.py:353-362).
_CORNERS = (
    ((0, 0, 0), (0, 0, 1), (0, 1, 0), (0, 1, 1)),  # back
    ((1, 0, 0), (1, 0, 1), (1, 1, 0), (1, 1, 1)),  # front
    ((1, 0, 0), (1, 0, 1), (0, 0, 0), (0, 0, 1)),  # top
    ((0, 1, 0), (0, 1, 1), (1, 1, 0), (1, 1, 1)),  # bottom
    ((1, 0, 0), (0, 0, 0), (1, 1, 0), (0, 1, 0)),  # left
    ((0, 0, 1), (1, 0, 1), (0, 1, 1), (1, 1, 1)),  # right
)
# Neighbour shift for the exposure test per direction: (dz, dy, dx).
_NEIGHBOR = ((-1, 0, 0), (1, 0, 0), (0, 1, 0), (0, -1, 0), (0, 0, -1), (0, 0, 1))


@struct.dataclass
class CubifyOverflow:
    """Per-sample counts of mesh elements that exceeded static capacity."""
    verts: jax.Array  # [B] int32
    faces: jax.Array  # [B] int32
    edges: jax.Array  # [B] int32

    def any(self) -> jax.Array:
        return (self.verts + self.faces + self.edges) > 0


def _neighbor_occ(occ: jnp.ndarray, dz: int, dy: int, dx: int) -> jnp.ndarray:
    """occ[z+dz, y+dy, x+dx] with zeros outside the grid (static shift)."""
    Z, Y, X = occ.shape
    pad = ((1, 1), (1, 1), (1, 1))
    p = jnp.pad(occ, pad)
    return p[1 + dz:1 + dz + Z, 1 + dy:1 + dy + Y, 1 + dx:1 + dx + X]


def _cubify_raw(grid: jnp.ndarray, threshold: float):
    """Per-sample raw pass: exposure, corner-id cumsum, candidate-mask cumsum.

    Candidate triangles are NOT materialised (6*2*Z^3 x 3 ids would be ~50 MB per
    batch at 48^3): their corner ids are reconstructed arithmetically from the
    selected slot indices in ``cubify`` below.
    """
    Z, Y, X = grid.shape
    occ = grid > threshold
    exposed = [occ & ~_neighbor_occ(occ, *_NEIGHBOR[d]) for d in range(6)]

    # corner-used mask via padded shifts (a slice-assign .at[].max lowers to
    # scatter-max — profiled 2 ms/step; jnp.pad is pure data movement)
    used = jnp.zeros((Z + 1, Y + 1, X + 1), dtype=bool)
    for d in range(6):
        for (oz, oy, ox) in _CORNERS[d]:
            used = used | jnp.pad(exposed[d],
                                  ((oz, 1 - oz), (oy, 1 - oy), (ox, 1 - ox)))

    flat_used = used.reshape(-1)
    cum_used = jnp.cumsum(flat_used.astype(jnp.int32))      # inclusive counts
    vid_flat = cum_used - 1                                  # id of each used corner

    # candidate layout: direction-major, two triangle halves per direction,
    # raster voxel order inside — [6 * 2 * Z*Y*X] (matches the reference's
    # direction loop at layers.py:420-427 with the stable batch order)
    e_all = jnp.stack([e.reshape(-1) for e in exposed])      # [6, ZYX]
    cand_mask = jnp.repeat(e_all, 2, axis=0).reshape(-1)     # [12 * ZYX]
    cum_faces = jnp.cumsum(cand_mask.astype(jnp.int32))
    return cum_used, vid_flat, cum_faces


def _corner_coords(Z: int, Y: int, X: int) -> jnp.ndarray:
    """[(Z+1)(Y+1)(X+1), 3] corner coordinates after the reference's axis rotation."""
    shape = (Z + 1, Y + 1, X + 1)
    lz = jax.lax.broadcasted_iota(jnp.float32, shape, 0) - 0.5
    ly = jax.lax.broadcasted_iota(jnp.float32, shape, 1) - 0.5
    lx = jax.lax.broadcasted_iota(jnp.float32, shape, 2) - 0.5
    # (z,y,x) -> (z, x, -y): the 90-deg x-rotation at layers.py:466-467
    return jnp.stack([lz.reshape(-1), lx.reshape(-1), -ly.reshape(-1)], axis=-1)


def _compact(cum: jnp.ndarray, capacity: int):
    """Batched slot -> source mapping: slot s takes the s-th flagged entry.

    cum: [B, N] inclusive cumsum of the keep flags. Returns (src [B, cap] int32,
    mask [B, cap] bool, count [B] int32).

    On TPU this is the hierarchical counting compaction (one gather total);
    the bisection path profiled 28.7 ms/step across cubify's three call sites
    (~20 rounds of random-index gathers each, PERFORMANCE.md round 3). CPU
    keeps the bisection; ``tests/test_ops.py`` pins equality of the two.
    """
    if use_counting_search():
        return compact_from_cumsum(cum, capacity)
    B, N = cum.shape
    iota = jax.lax.broadcasted_iota(jnp.int32, (capacity, 1), 0)[:, 0]
    q = jnp.broadcast_to(iota[None, :] + 1, (B, capacity))
    src = batched_searchsorted(cum, q, side="left")
    src = jnp.minimum(src, N - 1)
    count = jnp.minimum(cum[:, -1], capacity)
    mask = iota[None, :] < count[:, None]
    return src, mask, cum[:, -1]


def batched_edges_from_faces(faces: jnp.ndarray, faces_mask: jnp.ndarray,
                             edge_capacity: int):
    """Unique undirected edges of padded triangle lists, batched and scatter-free.

    Canonicalise each triangle edge as (min, max), lexicographically sort (vmapped
    lax.sort — sorts are fine under vmap), mark first-occurrences, compact via
    batched binary search over the keep cumsum. Replaces the reference's
    ``unique(dim=1)`` COO construction (layers.py:469-478).
    """
    B, F, _ = faces.shape
    f = faces.astype(jnp.int32)
    a = jnp.concatenate([f[:, :, 0], f[:, :, 1], f[:, :, 0]], axis=1)
    b = jnp.concatenate([f[:, :, 1], f[:, :, 2], f[:, :, 2]], axis=1)
    lo = jnp.minimum(a, b)
    hi = jnp.maximum(a, b)
    m3 = jnp.concatenate([faces_mask] * 3, axis=1)
    big = jnp.int32(2**31 - 1)
    lo = jnp.where(m3, lo, big)
    hi = jnp.where(m3, hi, big)
    lo_s, hi_s = jax.vmap(lambda x, y: jax.lax.sort((x, y), num_keys=2))(lo, hi)
    valid = lo_s < big
    first = jnp.ones_like(valid)
    first = first.at[:, 1:].set((lo_s[:, 1:] != lo_s[:, :-1])
                                | (hi_s[:, 1:] != hi_s[:, :-1]))
    keep = valid & first
    cum_keep = jnp.cumsum(keep.astype(jnp.int32), axis=1)
    src, mask, n_unique = _compact(cum_keep, edge_capacity)
    lo_c = batched_gather_rows(lo_s[..., None], src)[..., 0]
    hi_c = batched_gather_rows(hi_s[..., None], src)[..., 0]
    edges = jnp.where(mask[..., None], jnp.stack([lo_c, hi_c], axis=-1), 0)
    overflow = jnp.maximum(n_unique - edge_capacity, 0)
    return edges, mask, overflow


@partial(jax.jit, static_argnames=("threshold", "vert_capacity", "face_capacity",
                                   "edge_capacity"))
def cubify(grid: jnp.ndarray, threshold: float = 0.5, *,
           vert_capacity: int = 4096, face_capacity: int = 8192,
           edge_capacity: int = 16384) -> tuple[MeshBatch, CubifyOverflow]:
    """Cubify a batch of voxel grids.

    Args:
      grid: [B, Z, Y, X] occupancy probabilities.
      threshold: binarisation threshold (reference default 0.5; models use 0.2).
      vert_capacity / face_capacity / edge_capacity: static per-sample capacities.

    Returns:
      (MeshBatch, CubifyOverflow). An empty grid yields an all-masked sample instead
      of the reference's ``ValueError("empty grid")`` (layers.py:434-435) so training
      steps never abort mid-jit; callers can inspect ``mesh.num_verts() == 0``.
    """
    B, Z, Y, X = grid.shape
    cum_used, vid_flat, cum_faces = jax.vmap(
        partial(_cubify_raw, threshold=threshold))(grid)

    # ---- vertices: compact used corners (coords shared across the batch) -------
    coords = _corner_coords(Z, Y, X)
    v_src, verts_mask, n_verts = _compact(cum_used, vert_capacity)
    verts = coords[v_src.reshape(-1)].reshape(B, vert_capacity, 3)
    verts = jnp.where(verts_mask[..., None], verts, 0.0)

    # ---- faces: compact valid candidate triangles --------------------------------
    # decode each selected slot back to (direction, triangle-half, voxel) and
    # gather the 3 corner vertex-ids from the id grid — the candidate array itself
    # is never materialised
    f_src, faces_mask, n_faces = _compact(cum_faces, face_capacity)
    ZYX = Z * Y * X
    block = f_src // ZYX                                   # [B, Fcap] in [0, 12)
    v = f_src % ZYX
    z = v // (Y * X)
    y = (v // X) % Y
    x = v % X
    # per-(direction, half) corner tables: half 0 -> (c0,c1,c2), half 1 -> (c0,c2,c3)
    import numpy as _np
    tbl = _np.zeros((12, 3, 3), dtype=_np.int32)           # [block, k, (oz,oy,ox)]
    for d in range(6):
        cs = _CORNERS[d]
        tbl[2 * d, :, :] = _np.asarray([cs[0], cs[1], cs[2]])
        tbl[2 * d + 1, :, :] = _np.asarray([cs[0], cs[2], cs[3]])
    # the offsets are all 0/1, so each (k, axis) column packs into a 12-bit
    # mask indexed by `block` with a shift-and — XLA ran the equivalent
    # 36-entry table lookups as tiny-table gathers at 1.2 GB/s (~3.5 ms/step,
    # PERFORMANCE.md round 3); the bit trick is pure VPU arithmetic
    masks = [[int(sum(int(tbl[b, k, a]) << b for b in range(12)))
              for a in range(3)] for k in range(3)]
    corner_ids = []
    for k in range(3):
        mz, my, mx = masks[k]
        oz = jnp.right_shift(jnp.int32(mz), block) & 1
        oy = jnp.right_shift(jnp.int32(my), block) & 1
        ox = jnp.right_shift(jnp.int32(mx), block) & 1
        lat = ((z + oz) * ((Y + 1) * (X + 1)) + (y + oy) * (X + 1) + (x + ox))
        corner_ids.append(batched_gather_rows(vid_flat[..., None], lat)[..., 0])
    faces = jnp.stack(corner_ids, axis=-1)
    face_valid = faces_mask & jnp.all(faces < vert_capacity, axis=-1)
    faces = jnp.where(face_valid[..., None], faces, 0)

    # ---- unique undirected edges -------------------------------------------------
    edges, edges_mask, e_overflow = batched_edges_from_faces(faces, face_valid,
                                                             edge_capacity)

    mesh = MeshBatch(verts=verts, verts_mask=verts_mask, faces=faces,
                     faces_mask=face_valid, edges=edges, edges_mask=edges_mask)
    overflow = CubifyOverflow(verts=jnp.maximum(n_verts - vert_capacity, 0),
                              faces=jnp.maximum(n_faces - face_capacity, 0),
                              edges=e_overflow)
    return mesh, overflow
