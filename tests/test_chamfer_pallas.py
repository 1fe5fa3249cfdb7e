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
