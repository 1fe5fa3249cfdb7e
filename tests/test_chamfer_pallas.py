"""Fused Pallas chamfer kernel tests.

The kernel only lowers on real TPU hardware; on the CPU test backend we verify
the backward's exact segment-sum math against dense autodiff (the kernel itself is
validated on-device by the bench harness and the TPU-gated test below).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from meshrcnn_tpu.ops.chamfer_pallas import _segment_sum_by_key

ON_TPU = jax.default_backend() == "tpu"


def test_segment_sum_by_key_exact():
    rng = np.random.RandomState(0)
    E, V = 1000, 300
    values = jnp.asarray(rng.randn(E, 3).astype(np.float32))
    keys = jnp.asarray(rng.randint(0, V, (E,)).astype(np.int32))
    out = np.asarray(_segment_sum_by_key(values, keys, V))
    expect = np.zeros((V, 3), dtype=np.float64)
    for e in range(E):
        expect[int(keys[e])] += np.asarray(values)[e]
    assert np.allclose(out, expect, atol=1e-4)


@pytest.mark.skipif(not ON_TPU, reason="Pallas TPU kernel requires TPU hardware")
def test_fused_chamfer_matches_xla():
    from meshrcnn_tpu.ops.chamfer import chamfer_distance
    from meshrcnn_tpu.ops.chamfer_pallas import chamfer_sums_fused

    rng = np.random.RandomState(0)
    p = jnp.asarray(rng.randn(1500, 3).astype(np.float32))
    q = jnp.asarray(rng.randn(1200, 3).astype(np.float32))
    s_p, i_p, s_q, i_q = jax.jit(chamfer_distance)(p, q)
    f_p, fi_p, f_q, fi_q = jax.jit(chamfer_sums_fused)(p, q)
    assert np.isclose(float(s_p), float(f_p), rtol=1e-5)
    assert np.isclose(float(s_q), float(f_q), rtol=1e-5)
    assert (np.asarray(i_p) == np.asarray(fi_p)).mean() > 0.999
    assert (np.asarray(i_q) == np.asarray(fi_q)).mean() > 0.999


@pytest.mark.skipif(not ON_TPU, reason="pallas kernel lowers on TPU only")
def test_knn_candidates_pallas_matches_xla_path():
    """The Pallas kNN-candidate kernel must reproduce the XLA subtile-min path
    exactly (same subtile -> same candidates -> same top-k)."""
    import os
    from meshrcnn_tpu.ops.chamfer import knn

    rng = np.random.RandomState(5)
    p = jnp.asarray(rng.randn(3000, 3).astype(np.float32))
    q = jnp.asarray(rng.randn(2500, 3).astype(np.float32))
    os.environ["MESHRCNN_FUSED_KNN"] = "0"
    d_x, i_x = jax.jit(lambda a, b: knn(a, b, 10, tile=512))(p, q)
    os.environ["MESHRCNN_FUSED_KNN"] = "1"
    d_p, i_p = jax.jit(lambda a, b: knn(a, b, 10, tile=512))(p, q)
    os.environ.pop("MESHRCNN_FUSED_KNN")
    np.testing.assert_allclose(np.asarray(d_p), np.asarray(d_x), rtol=1e-5, atol=1e-5)
    # ties can reorder equal-distance candidates; compare index SETS per row
    ix, ip = np.asarray(i_x), np.asarray(i_p)
    same = np.mean([set(ix[r]) == set(ip[r]) for r in range(ix.shape[0])])
    assert same > 0.99, same


@pytest.mark.skipif(not ON_TPU, reason="Pallas TPU kernel requires TPU hardware")
def test_batched_fused_matches_per_sample():
    """The batched-grid kernel must match per-sample chamfer_sums_fused exactly
    (same tile math, same traversal order), values and gradients."""
    from meshrcnn_tpu.ops.chamfer_pallas import (chamfer_sums_fused,
                                                 chamfer_sums_fused_batched)

    rng = np.random.RandomState(1)
    B, N, M = 3, 1500, 1200
    p = jnp.asarray(rng.randn(B, N, 3).astype(np.float32))
    q = jnp.asarray(rng.randn(B, M, 3).astype(np.float32))
    single = jax.jit(chamfer_sums_fused)        # jit once; reused per sample
    s_p, i_p, s_q, i_q = jax.jit(chamfer_sums_fused_batched)(p, q)
    for b in range(B):
        e_p, ei_p, e_q, ei_q = single(p[b], q[b])
        assert np.isclose(float(s_p[b]), float(e_p), rtol=1e-6)
        assert np.isclose(float(s_q[b]), float(e_q), rtol=1e-6)
        assert np.array_equal(np.asarray(i_p[b]), np.asarray(ei_p))
        assert np.array_equal(np.asarray(i_q[b]), np.asarray(ei_q))

    def tot_b(p, q):
        s1, _, s2, _ = chamfer_sums_fused_batched(p, q)
        return jnp.sum(s1 + s2)

    def tot_s(p, q):
        s1, _, s2, _ = chamfer_sums_fused(p, q)
        return s1 + s2

    grad_s = jax.jit(jax.grad(tot_s, argnums=(0, 1)))
    gb_p, gb_q = jax.jit(jax.grad(tot_b, argnums=(0, 1)))(p, q)
    for b in range(B):
        gs_p, gs_q = grad_s(p[b], q[b])
        np.testing.assert_allclose(np.asarray(gb_p[b]), np.asarray(gs_p), rtol=1e-5)
        np.testing.assert_allclose(np.asarray(gb_q[b]), np.asarray(gs_q), rtol=1e-5)


def test_batched_knn_matches_per_sample():
    """batched_knn must equal per-sample knn on every backend (CPU: pins the
    lax.map plumbing; TPU: pins the batched Pallas kernel + rank-2 merge
    against the single-sample kernel)."""
    from meshrcnn_tpu.ops.chamfer import batched_knn, knn

    rng = np.random.RandomState(7)
    B, N, M, k = 3, 1500, 2000, 10
    p = jnp.asarray(rng.randn(B, N, 3).astype(np.float32))
    q = jnp.asarray(rng.randn(B, M, 3).astype(np.float32))
    d_b, i_b = jax.jit(lambda a, b: batched_knn(a, b, k, tile=512))(p, q)
    single = jax.jit(lambda a, b: knn(a, b, k, tile=512))
    for b in range(B):
        d_s, i_s = single(p[b], q[b])
        np.testing.assert_allclose(np.asarray(d_b[b]), np.asarray(d_s),
                                   rtol=1e-5, atol=1e-5)
        ib, is_ = np.asarray(i_b[b]), np.asarray(i_s)
        same = np.mean([set(ib[r]) == set(is_[r]) for r in range(N)])
        assert same > 0.99, same


@pytest.mark.skipif(not ON_TPU, reason="Pallas TPU kernel requires TPU hardware")
def test_dual_gram_matches_single_gram():
    """The dual-gram kernel body (both reductions on the sublane axis,
    MESHRCNN_CHAMFER_DUALGRAM=1 default) must match the single-gram body to
    MXU rounding: the transposed gram's 3-pass f32 accumulation rounds
    differently in the last ulp (measured 2/1500 mins differ), so mins are
    pinned allclose and argmins to >=99.9% agreement (near-tie flips only),
    same bar as test_fused_chamfer_matches_xla."""
    from meshrcnn_tpu.ops.chamfer_pallas import (_chamfer_bidir_pallas,
                                                 _chamfer_bidir_pallas_batched)

    rng = np.random.RandomState(4)
    p = jnp.asarray(rng.randn(1500, 3).astype(np.float32))
    q = jnp.asarray(rng.randn(3, 700, 3).astype(np.float32))

    def check(a, b):
        d_pa, i_pa, d_qa, i_qa = a
        d_pb, i_pb, d_qb, i_qb = b
        np.testing.assert_allclose(np.asarray(d_pa), np.asarray(d_pb),
                                   rtol=1e-4, atol=1e-6)
        np.testing.assert_allclose(np.asarray(d_qa), np.asarray(d_qb),
                                   rtol=1e-4, atol=1e-6)
        assert (np.asarray(i_pa) == np.asarray(i_pb)).mean() > 0.999
        assert (np.asarray(i_qa) == np.asarray(i_qb)).mean() > 0.999

    q1 = jnp.asarray(rng.randn(1200, 3).astype(np.float32))
    check(_chamfer_bidir_pallas(p, q1, dual=False),
          _chamfer_bidir_pallas(p, q1, dual=True))

    pb = jnp.asarray(rng.randn(3, 1024, 3).astype(np.float32))
    ab = jax.jit(lambda u, v: _chamfer_bidir_pallas_batched(u, v, False))(pb, q)
    bb = jax.jit(lambda u, v: _chamfer_bidir_pallas_batched(u, v, True))(pb, q)
    for xa, xb, ia, ib in [(ab[0], bb[0], ab[1], bb[1]),
                           (ab[2], bb[2], ab[3], bb[3])]:
        np.testing.assert_allclose(np.asarray(xa), np.asarray(xb),
                                   rtol=1e-4, atol=1e-6)
        assert (np.asarray(ia) == np.asarray(ib)).mean() > 0.999


@pytest.mark.skipif(not ON_TPU, reason="Pallas TPU kernel requires TPU hardware")
def test_bf16_gram_and_wide_qtile_variants(monkeypatch):
    """bf16-gram and wide-q-tile kernel variants agree with the f32 reference
    body: refined sums are exact given the assignment, so near-tie argmin flips
    move the sum only by the tie gap (rtol 1e-4); argmins agree >= 99%. The
    reference arm pins MESHRCNN_CHAMFER_BF16GRAM=0 / TILEQ=512 explicitly
    (tile_q 1024 is the shipped default; the bf16 gram stays opt-in — PARITY.md
    round 5 rejected it as a default on held-out fine-accuracy evidence)."""
    from meshrcnn_tpu.ops.chamfer_pallas import chamfer_sums_fused_batched

    rng = np.random.RandomState(11)
    p = jnp.asarray(rng.randn(2, 2000, 3).astype(np.float32) * 0.4)
    q = jnp.asarray(rng.randn(2, 1500, 3).astype(np.float32) * 0.4)

    def run():
        return jax.jit(chamfer_sums_fused_batched)(p, q)

    with monkeypatch.context() as m:
        m.setenv("MESHRCNN_CHAMFER_BF16GRAM", "0")
        m.setenv("MESHRCNN_CHAMFER_TILEQ", "512")
        s_p, i_p, s_q, i_q = run()
    for env in ({"MESHRCNN_CHAMFER_BF16GRAM": "1",
                 "MESHRCNN_CHAMFER_TILEQ": "512"},
                {"MESHRCNN_CHAMFER_BF16GRAM": "0",
                 "MESHRCNN_CHAMFER_TILEQ": "1024"},
                {}):  # {} = the shipped default (bf16 gram + tile_q 1024)
        with monkeypatch.context() as m:
            for k, v in env.items():
                m.setenv(k, v)
            v_p, vi_p, v_q, vi_q = run()
        for b in range(p.shape[0]):
            np.testing.assert_allclose(float(v_p[b]), float(s_p[b]), rtol=1e-4)
            np.testing.assert_allclose(float(v_q[b]), float(s_q[b]), rtol=1e-4)
        assert (np.asarray(vi_p) == np.asarray(i_p)).mean() > 0.99, env
        assert (np.asarray(vi_q) == np.asarray(i_q)).mean() > 0.99, env


def test_tileq_env_validation(monkeypatch):
    """MESHRCNN_CHAMFER_TILEQ must fail fast with a clear message instead of
    an opaque Mosaic compile error (ADVICE r4)."""
    from meshrcnn_tpu.ops.chamfer_pallas import _tile_q

    for bad in ("100", "0", "-128", "129", "abc"):
        monkeypatch.setenv("MESHRCNN_CHAMFER_TILEQ", bad)
        with pytest.raises(ValueError, match="MESHRCNN_CHAMFER_TILEQ"):
            _tile_q()
    monkeypatch.setenv("MESHRCNN_CHAMFER_TILEQ", "1024")
    assert _tile_q() == 1024


def test_exact_sums_match_dense_reference():
    """_exact_sums* recompute chamfer sums from indices in difference form;
    must equal the float64 dense reference given the same assignment."""
    from meshrcnn_tpu.ops.chamfer_pallas import _exact_sums, _exact_sums_batched

    rng = np.random.RandomState(3)
    p64 = rng.randn(400, 3) * 0.3
    q64 = rng.randn(300, 3) * 0.3
    d = ((p64[:, None] - q64[None, :]) ** 2).sum(-1)
    i_p, i_q = d.argmin(1), d.argmin(0)
    want_p, want_q = d.min(1).sum(), d.min(0).sum()
    s_p, s_q = _exact_sums(jnp.asarray(p64, jnp.float32),
                           jnp.asarray(q64, jnp.float32),
                           jnp.asarray(i_p, jnp.int32),
                           jnp.asarray(i_q, jnp.int32))
    np.testing.assert_allclose(float(s_p), want_p, rtol=1e-5)
    np.testing.assert_allclose(float(s_q), want_q, rtol=1e-5)
    sb_p, sb_q = _exact_sums_batched(
        jnp.asarray(p64, jnp.float32)[None], jnp.asarray(q64, jnp.float32)[None],
        jnp.asarray(i_p, jnp.int32)[None], jnp.asarray(i_q, jnp.int32)[None])
    np.testing.assert_allclose(float(sb_p[0]), want_p, rtol=1e-5)
    np.testing.assert_allclose(float(sb_q[0]), want_q, rtol=1e-5)
