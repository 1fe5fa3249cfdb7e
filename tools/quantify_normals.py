#!/usr/bin/env python
"""Quantify the face-normal estimator deviation from the reference's kNN+PCA.

The default normal estimator (MESHRCNN_FACE_NORMALS=1, ops/losses.py:mesh_loss)
uses the exact unit normal of the triangle each point was sampled from; the
reference re-estimates normals from the sampled cloud with kNN + PCA
(loss_functions.py:129-170). This script measures, on real meshes, what the
substitution does to the quantity that consumes it — the two-sided |cos|
normal-alignment loss — by comparing on IDENTICAL clouds (same keys):

  * normal-loss VALUE: face normals vs exact-kNN PCA vs approx-kNN PCA
  * its GRADIENT w.r.t. the predicted vertices (cosine similarity, rel L2)
  * per-point estimator agreement |n_face . n_pca| on the GT cloud

Meshes: the teapot OBJ fixture (smooth, curved — the PCA-friendly case) and a
cubify lattice mesh (axis-aligned facets + sharp edges — the case PCA-normals
blur and face normals get exactly right). Run on CPU:

    env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu python tools/quantify_normals.py

Results recorded in PERFORMANCE.md ("Face-normal estimator").
"""
from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, ".")


def load_meshes():
    import jax.numpy as jnp

    from meshrcnn_tpu.data.serialization import load_mesh
    from meshrcnn_tpu.ops.cubify import cubify

    out = {}
    teapot = load_mesh("tests/utils_tests/teapot.obj")
    out["teapot"] = (np.asarray(teapot.vertices, np.float32),
                     np.asarray(teapot.faces, np.int32))
    # cubify mesh: a solid blob voxel grid -> lattice mesh (training-like)
    g = np.zeros((1, 16, 16, 16), np.float32)
    g[0, 4:12, 4:12, 4:12] = 1.0
    g[0, 6:10, 2:6, 6:10] = 1.0
    mesh, _ = cubify(jnp.asarray(g), 0.5, vert_capacity=2048, face_capacity=4096,
                     edge_capacity=8192)
    vm = np.asarray(mesh.verts_mask[0])
    fm = np.asarray(mesh.faces_mask[0])
    out["cubify"] = (np.asarray(mesh.verts[0], np.float32)[: vm.sum()],
                     np.asarray(mesh.faces[0], np.int32)[: fm.sum()])
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=4096, help="points per cloud")
    ap.add_argument("--k", type=int, default=10)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from meshrcnn_tpu.ops.chamfer import (batched_compute_normals,
                                          batched_normal_distance)
    from meshrcnn_tpu.ops.chamfer import chamfer_distance
    from meshrcnn_tpu.ops.sampling import batched_sample_points

    meshes = load_meshes()
    key = jax.random.PRNGKey(0)

    for name, (v, f) in meshes.items():
        V, F = len(v), len(f)
        verts = jnp.asarray(v)[None]
        faces = jnp.asarray(f)[None]
        fmask = jnp.ones((1, F), bool)
        kp, kg = jax.random.split(key)
        # pred cloud: same mesh, slightly perturbed verts (a realistic gradient
        # point); gt cloud: the clean mesh
        pverts = verts + 0.01 * jax.random.normal(jax.random.fold_in(key, 1),
                                                  verts.shape)

        def clouds(pv):
            cp, _, np_ = batched_sample_points(kp, pv, faces, fmask, args.n,
                                               return_normals=True)
            cg, _, ng_ = batched_sample_points(kg, verts, faces, fmask, args.n,
                                               return_normals=True)
            return cp, cg, np_, ng_

        cp, cg, nfp, nfg = clouds(pverts)
        _, ip, _, ig = chamfer_distance(cp[0], cg[0], 2048)
        ip, ig = ip[None], ig[None]

        def loss_face(pv):
            cp, cg, nfp, nfg = clouds(pv)
            a, b = batched_normal_distance(cp, cg, ip, ig, k=args.k,
                                           normals_p=nfp, normals_q=nfg)
            return -(a + b).sum() / args.n

        def loss_pca(pv, exact):
            cp, cg, _, _ = clouds(pv)
            a, b = batched_normal_distance(cp, cg, ip, ig, k=args.k, exact=exact)
            return -(a + b).sum() / args.n

        lf, gf = jax.value_and_grad(loss_face)(pverts)
        le, ge = jax.value_and_grad(lambda pv: loss_pca(pv, True))(pverts)
        la, _ = jax.value_and_grad(lambda pv: loss_pca(pv, False))(pverts)
        gf, ge = np.asarray(gf).ravel(), np.asarray(ge).ravel()
        cos = float(gf @ ge / max(np.linalg.norm(gf) * np.linalg.norm(ge), 1e-12))
        rel = float(np.linalg.norm(gf - ge) / max(np.linalg.norm(ge), 1e-12))

        # noise floor: how self-consistent is the PCA gradient across cloud
        # resampling? (if it is not, a low face-vs-pca cosine reflects PCA
        # estimator noise, not a face-normal pathology). Re-draw both clouds
        # with fresh keys and recompute both estimators' gradients.
        def loss_with_keys(pv, kp2, kg2, face):
            cp2, _, nfp2 = batched_sample_points(kp2, pv, faces, fmask, args.n,
                                                 return_normals=True)
            cg2, _, nfg2 = batched_sample_points(kg2, verts, faces, fmask,
                                                 args.n, return_normals=True)
            _, ip2, _, ig2 = chamfer_distance(
                jax.lax.stop_gradient(cp2)[0], cg2[0], 2048)
            kw = (dict(normals_p=nfp2, normals_q=nfg2) if face
                  else dict(exact=True))
            a, b = batched_normal_distance(cp2, cg2, ip2[None], ig2[None],
                                           k=args.k, **kw)
            return -(a + b).sum() / args.n

        kp2, kg2 = jax.random.split(jax.random.fold_in(key, 99))
        ge2 = np.asarray(jax.grad(
            lambda pv: loss_with_keys(pv, kp2, kg2, False))(pverts)).ravel()
        gf2 = np.asarray(jax.grad(
            lambda pv: loss_with_keys(pv, kp2, kg2, True))(pverts)).ravel()
        cos_pca_self = float(ge @ ge2 / max(np.linalg.norm(ge) *
                                            np.linalg.norm(ge2), 1e-12))
        cos_face_self = float(gf @ gf2 / max(np.linalg.norm(gf) *
                                             np.linalg.norm(gf2), 1e-12))

        # per-point estimator agreement on the clean GT cloud
        npca = batched_compute_normals(cg, k=args.k, exact=True)
        agree = np.abs(np.sum(np.asarray(nfg) * np.asarray(npca), axis=-1))

        print(f"[{name}] V={V} F={F} n={args.n} k={args.k}")
        print(f"  normal loss: face={float(lf):+.4f}  pca_exact={float(le):+.4f}"
              f"  pca_approx={float(la):+.4f}")
        print(f"  grad vs pca_exact: cosine={cos:.3f} relL2={rel:.3f}")
        print(f"  resampling self-consistency: pca={cos_pca_self:.3f}"
              f"  face={cos_face_self:.3f}")
        print(f"  |n_face . n_pca| on GT cloud: mean={agree.mean():.4f}"
              f"  p10={np.percentile(agree, 10):.4f}"
              f"  frac>0.9={float((agree > 0.9).mean()):.3f}")


if __name__ == "__main__":
    main()
