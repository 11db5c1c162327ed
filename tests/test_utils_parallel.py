"""Profiling/debug utilities + parallel helpers tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lns_tpu.parallel.mesh import (
    batch_sharding,
    data_mesh,
    make_global_batch,
    pad_to_multiple,
    replicated_sharding,
    shard_batch,
)


def test_time_fn_measures_something():
    from lns_tpu.utils.profiling import Timer, measure_host_rtt, time_fn

    x = jnp.ones((64, 64))
    dt = time_fn(lambda c: c * 1.000001, x, n=5)
    assert dt >= 0
    t = Timer()
    t.start("a")
    y = (x @ x).block_until_ready()
    t.stop("a", sync_value=y)
    assert "a:" in t.report()
    assert measure_host_rtt(reps=2) >= 0


def test_debug_utils():
    from lns_tpu.utils.debug import assert_finite, nan_debugging

    assert_finite({"a": jnp.ones(3)}, "tree")
    with pytest.raises(FloatingPointError):
        assert_finite({"a": jnp.array([1.0, np.nan])}, "tree")
    with nan_debugging(False):
        pass


def test_pad_to_multiple():
    batch = {"x": np.arange(10).reshape(10, 1)}
    padded, n_valid = pad_to_multiple(batch, 4)
    assert n_valid == 10
    assert padded["x"].shape[0] == 12
    np.testing.assert_array_equal(padded["x"][-2:], [[9], [9]])


def test_make_global_batch_single_host():
    mesh = data_mesh(jax.devices()[:4])
    batch = {"x": np.arange(8, dtype=np.float32).reshape(8, 1)}
    out = make_global_batch(mesh, batch)
    np.testing.assert_array_equal(np.asarray(out["x"]), batch["x"])
    assert out["x"].sharding.is_equivalent_to(batch_sharding(mesh), 2)


def test_shard_batch_and_replicated():
    mesh = data_mesh(jax.devices()[:8])
    x = shard_batch(mesh, jnp.ones((16, 3)))
    assert x.sharding.is_equivalent_to(batch_sharding(mesh), 2)
    rep = replicated_sharding(mesh)
    y = jax.device_put(jnp.ones((4,)), rep)
    assert y.sharding.is_equivalent_to(rep, 1)


def test_pad_nd_1d_3d():
    from lns_tpu.ops.padding import pad_nd

    x1 = jnp.arange(6, dtype=jnp.float32).reshape(1, 6, 1)
    y = pad_nd(x1, [(1, 1)], mode="circular")
    np.testing.assert_array_equal(np.asarray(y[0, :, 0]), [5, 0, 1, 2, 3, 4, 5, 0])
    x3 = jnp.ones((1, 2, 3, 4, 1))
    y3 = pad_nd(x3, [(1, 1), (0, 1), (2, 0)], mode="zeros")
    assert y3.shape == (1, 4, 4, 6, 1)
