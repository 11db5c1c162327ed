"""Probe Mosaic (Pallas-TPU) support for the ops the fused FAB kernel needs.

Each probe compiles + runs a tiny kernel on the real device and checks
numerics vs XLA. Results decide the fused axial-kernel design (see
DESIGN.md "Factorized attention").
"""

import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def run(name, fn):
    try:
        fn()
        print(f"PASS {name}")
    except Exception as e:
        msg = str(e).split("\n")[0][:200]
        print(f"FAIL {name}: {type(e).__name__}: {msg}")


def probe_lane_merge_reshape(dtype):
    """[128, 32, 64] -> [128, 2048] in-kernel."""
    x = jax.random.normal(jax.random.PRNGKey(0), (128, 32, 64)).astype(dtype)

    def kernel(x_ref, o_ref):
        o_ref[:] = x_ref[:].reshape(128, 2048)

    y = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((128, 2048), dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x)
    np.testing.assert_allclose(np.asarray(y, np.float32),
                               np.asarray(x, np.float32).reshape(128, 2048))


def probe_lane_split_reshape(dtype):
    """[128, 2048] -> [128, 32, 64] in-kernel."""
    x = jax.random.normal(jax.random.PRNGKey(0), (128, 2048)).astype(dtype)

    def kernel(x_ref, o_ref):
        o_ref[:] = x_ref[:].reshape(128, 32, 64)

    y = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((128, 32, 64), dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x)
    np.testing.assert_allclose(np.asarray(y, np.float32),
                               np.asarray(x, np.float32).reshape(128, 32, 64))


def probe_transpose_4d(dtype):
    """[4, 32, 32, 64] -> swap dims 1,2 in-kernel."""
    x = jax.random.normal(jax.random.PRNGKey(0), (4, 32, 32, 64)).astype(dtype)

    def kernel(x_ref, o_ref):
        o_ref[:] = jnp.transpose(x_ref[:], (0, 2, 1, 3))

    y = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((4, 32, 32, 64), dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x)
    np.testing.assert_allclose(np.asarray(y, np.float32),
                               np.asarray(x, np.float32).transpose(0, 2, 1, 3))


def probe_rank3_dot(dtype):
    """dot_general([128,128], [128, 32, 64]) contracting ((1,),(0,))."""
    k = jax.random.normal(jax.random.PRNGKey(0), (128, 128)).astype(dtype)
    x = jax.random.normal(jax.random.PRNGKey(1), (128, 32, 64)).astype(dtype)

    def kernel(k_ref, x_ref, o_ref):
        o_ref[:] = jax.lax.dot_general(
            k_ref[:], x_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(o_ref.dtype)

    y = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((128, 32, 64), dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(k, x)
    ref = jnp.einsum("ij,jwd->iwd", k.astype(jnp.float32), x.astype(jnp.float32))
    np.testing.assert_allclose(np.asarray(y, np.float32), np.asarray(ref),
                               rtol=2e-2, atol=2e-2)


def probe_fused_axial(dtype):
    """Candidate fused kernel: row dot on [128, 2048], lane-split, 4D
    transpose, lane-merge, col dot — all per grid step."""
    G, H, W, D = 4, 32, 32, 64  # group=4 heads packed, 128 = G*H rows
    kx = jax.random.normal(jax.random.PRNGKey(0), (G * H, G * H)).astype(dtype)
    ky = jax.random.normal(jax.random.PRNGKey(1), (G * W, G * W)).astype(dtype)
    phi = jax.random.normal(jax.random.PRNGKey(2), (G * H, W * D)).astype(dtype)

    def kernel(kx_ref, ky_ref, x_ref, o_ref):
        o1 = jnp.dot(kx_ref[:], x_ref[:], preferred_element_type=jnp.float32)
        o1 = o1.astype(x_ref.dtype)
        o1 = o1.reshape(G, H, W, D)
        o1 = jnp.transpose(o1, (0, 2, 1, 3))
        o1 = o1.reshape(G * W, H * D)
        o2 = jnp.dot(ky_ref[:], o1, preferred_element_type=jnp.float32)
        o_ref[:] = o2.astype(o_ref.dtype)

    y = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((G * W, H * D), dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(kx, ky, phi)
    o1 = jnp.dot(kx.astype(jnp.float32), phi.astype(jnp.float32))
    o1 = o1.reshape(G, H, W, D).transpose(0, 2, 1, 3).reshape(G * W, H * D)
    ref = jnp.dot(ky.astype(jnp.float32), o1)
    np.testing.assert_allclose(np.asarray(y, np.float32), np.asarray(ref),
                               rtol=5e-2, atol=5e-1)


if __name__ == "__main__":
    print("devices:", jax.devices())
    for dt, tag in [(jnp.bfloat16, "bf16"), (jnp.float32, "f32")]:
        run(f"lane_merge_reshape/{tag}", lambda dt=dt: probe_lane_merge_reshape(dt))
        run(f"lane_split_reshape/{tag}", lambda dt=dt: probe_lane_split_reshape(dt))
        run(f"transpose_4d/{tag}", lambda dt=dt: probe_transpose_4d(dt))
        run(f"rank3_dot/{tag}", lambda dt=dt: probe_rank3_dot(dt))
        run(f"fused_axial/{tag}", lambda dt=dt: probe_fused_axial(dt))
