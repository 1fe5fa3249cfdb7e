#!/usr/bin/env python
"""Quantify the approximate-kNN deviation on the normal loss (VERDICT r1 item 8).

The subtile-min candidate scheme in ops/chamfer.py:knn trades ~5% neighbour
recall for a large TPU speedup; this script measures what that actually does to
the quantity it feeds — the PCA-normal alignment loss (reference:
loss_functions.py:107-126) — by comparing, on the same clouds:

  * normal-loss VALUE exact-kNN vs subtile-min-kNN
  * its GRADIENT w.r.t. the predicted cloud (cosine similarity + rel L2 error)
  * raw neighbour recall

Clouds are surface samples of the synthetic cuboid meshes (the actual training
distribution here) plus a smooth sphere control. Run on CPU or TPU:

    python tools/quantify_knn.py [--n 2048] [--k 10]

Results recorded in PERFORMANCE.md ("Approximate kNN deviation").
"""
from __future__ import annotations

import argparse
import sys

import numpy as np

sys.path.insert(0, ".")


def sample_cuboid(rng, n):
    """Uniform samples on the surface of a random axis-aligned cuboid + jitter."""
    ext = rng.uniform(0.3, 1.0, size=3)
    face = rng.randint(0, 6, size=n)
    uv = rng.uniform(-1.0, 1.0, size=(n, 2))
    pts = np.empty((n, 3), np.float32)
    for i in range(6):
        m = face == i
        axis = i // 2
        sign = 1.0 if i % 2 == 0 else -1.0
        others = [a for a in range(3) if a != axis]
        pts[m, axis] = sign * ext[axis]
        pts[m, others[0]] = uv[m, 0] * ext[others[0]]
        pts[m, others[1]] = uv[m, 1] * ext[others[1]]
    return pts + rng.normal(0, 0.005, size=(n, 3)).astype(np.float32)


def sample_sphere(rng, n):
    v = rng.normal(size=(n, 3)).astype(np.float32)
    return v / np.linalg.norm(v, axis=1, keepdims=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=2048, help="points per cloud")
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--tile", type=int, default=2048)
    ap.add_argument("--trials", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from meshrcnn_tpu.ops.chamfer import batched_normal_distance, knn, nearest_neighbor

    def loss_fn(p, q, idx_p, idx_q, exact):
        a, b = batched_normal_distance(p[None], q[None], idx_p[None], idx_q[None],
                                       k=args.k, tile=args.tile, exact=exact)
        # reference normal loss convention: -(sum_p + sum_q) / sizes
        return -(a[0] / p.shape[0] + b[0] / q.shape[0])

    grad_exact = jax.jit(jax.value_and_grad(lambda p, q, ip, iq: loss_fn(p, q, ip, iq, True)))
    grad_approx = jax.jit(jax.value_and_grad(lambda p, q, ip, iq: loss_fn(p, q, ip, iq, False)))
    knn_exact = jax.jit(lambda p: knn(p, p, args.k, args.tile, exact=True)[1])
    knn_approx = jax.jit(lambda p: knn(p, p, args.k, args.tile, exact=False)[1])

    for name, sampler in (("cuboid", sample_cuboid), ("sphere", sample_sphere)):
        recalls, val_rel, grad_cos, grad_rel = [], [], [], []
        for t in range(args.trials):
            rng = np.random.RandomState(100 + t)
            p = jnp.asarray(sampler(rng, args.n))
            q = jnp.asarray(sampler(rng, args.n))
            _, idx_p = nearest_neighbor(p, q, args.tile)
            _, idx_q = nearest_neighbor(q, p, args.tile)

            ie, ia = np.asarray(knn_exact(p)), np.asarray(knn_approx(p))
            rec = np.mean([len(set(ie[i]) & set(ia[i])) / args.k
                           for i in range(args.n)])
            recalls.append(rec)

            ve, ge = grad_exact(p, q, idx_p, idx_q)
            va, ga = grad_approx(p, q, idx_p, idx_q)
            ve, va = float(ve), float(va)
            ge, ga = np.asarray(ge).ravel(), np.asarray(ga).ravel()
            val_rel.append(abs(va - ve) / max(abs(ve), 1e-12))
            grad_cos.append(float(np.dot(ge, ga) /
                                  max(np.linalg.norm(ge) * np.linalg.norm(ga), 1e-12)))
            grad_rel.append(float(np.linalg.norm(ga - ge) /
                                  max(np.linalg.norm(ge), 1e-12)))

        print(f"[{name}] n={args.n} k={args.k} trials={args.trials}")
        print(f"  knn recall:        {np.mean(recalls):.4f}")
        print(f"  loss value rel-err {np.mean(val_rel):.2e}  (exact {ve:.6f}, approx {va:.6f})")
        print(f"  grad cosine sim    {np.mean(grad_cos):.6f}")
        print(f"  grad rel L2 err    {np.mean(grad_rel):.4f}")


if __name__ == "__main__":
    main()
