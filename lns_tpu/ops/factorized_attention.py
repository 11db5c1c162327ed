"""Factorized (axial low-rank) attention (reference:
modules/factorized_attention.py).

FABlock2D builds one n x n integral kernel per spatial axis from pooled
axis descriptors (no softmax — a low-rank kernel a la the factorized
transformer), then applies them sequentially as batched matmuls:
O(h^2 + w^2) instead of O((hw)^2). Both kernel applications are einsums
that map straight onto the MXU; the per-axis kernels are tiny (<= 96x96 at
the resolutions used), so the whole block is matmul-bound — exactly what
TPU wants.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from lns_tpu.ops.activations import gelu
from lns_tpu.ops.conv import Conv1x1, Dense
from lns_tpu.ops.embedding import apply_rotary_pos_emb, rotary_freqs
from lns_tpu.ops.norms import GroupNorm, LayerNorm, instance_norm_2d


class LowRankKernel(nn.Module):
    """Per-head n x n kernel on ONE axis (reference:
    factorized_attention.py:11-69). Input: axis descriptors [b, n, dim];
    output: K [b, heads, n, n]. Positions are linspace(0, 1, n) fed through
    rotary embeddings when `use_rotary_emb`."""

    dim: int
    dim_head: int
    heads: int
    use_rotary_emb: bool = False
    scaling: float = 1.0
    qk_norm: bool = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        n = x.shape[1]
        qk = Dense(self.dim_head * self.heads * 2, use_bias=False, name="to_qk")(x)
        q, k = jnp.split(qk, 2, axis=-1)
        # 'b n (h d) -> b h n d'
        q = q.reshape(q.shape[0], n, self.heads, self.dim_head).transpose(0, 2, 1, 3)
        k = k.reshape(k.shape[0], n, self.heads, self.dim_head).transpose(0, 2, 1, 3)
        if self.qk_norm:
            q = LayerNorm(self.dim_head, use_affine=False, name="q_norm")(q)
            k = LayerNorm(self.dim_head, use_affine=False, name="k_norm")(k)
        if self.use_rotary_emb:
            pos = jnp.linspace(0.0, 1.0, n).reshape(1, n)
            freqs = rotary_freqs(pos, self.dim_head)  # [1, n, d]
            freqs = jnp.broadcast_to(
                freqs[:, None], (q.shape[0], q.shape[1], n, self.dim_head)
            )
            q = apply_rotary_pos_emb(q, freqs)
            k = apply_rotary_pos_emb(k, freqs)
        K = jnp.einsum("bhid,bhjd->bhij", q, k) * self.scaling
        return K


class PoolingReducer(nn.Module):
    """Mean-pool all spatial dims except the first, then LN-MLP
    (reference: factorized_attention.py:72-94). Input is channels-last
    [b, n1, n2, ..., c]; pools dims 2..ndim-2 -> [b, n1, out_dim]."""

    in_dim: int
    hidden_dim: int
    out_dim: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        x = Dense(self.hidden_dim, use_bias=False, name="to_in")(x)
        pool_axes = tuple(range(2, x.ndim - 1))
        if pool_axes:
            x = jnp.mean(x, axis=pool_axes)
        x = LayerNorm(self.hidden_dim, name="ffn_ln")(x)
        x = Dense(self.hidden_dim * 2, use_bias=False, name="ffn_fc1")(x)
        x = gelu(x)
        x = Dense(self.out_dim, use_bias=True, name="ffn_fc2")(x)
        return x  # [b, n1, out_dim]


class FABlock2D(nn.Module):
    """Factorized attention block on NHWC fields (reference:
    factorized_attention.py:97-160).

    GN(1) input norm -> 1x1 `in_proj` to heads*dim_head (u_phi) -> pooled
    per-row / per-column descriptors -> two LowRankKernels k_x (h x h),
    k_y (w x w) -> sequential axial applications -> InstanceNorm + 1x1 MLP
    out, residual.
    """

    dim: int
    dim_head: int
    latent_dim: int
    heads: int
    dim_out: int
    use_rope: bool = True
    kernel_multiplier: int = 2
    qk_norm: bool = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, u):
        # u: [b, h, w, c]
        u_skip = u
        u = GroupNorm(1, self.dim, eps=1e-5, name="in_norm")(u)
        u_phi = Conv1x1(self.heads * self.dim_head, use_bias=False, name="in_proj")(u)
        u = Conv1x1(self.dim, use_bias=False, name="to_in")(u)

        u_x = PoolingReducer(self.dim, self.dim, self.latent_dim, name="to_x")(u)
        # transpose spatial axes, then pool -> per-column descriptors
        u_y = PoolingReducer(self.dim, self.dim, self.latent_dim, name="to_y")(
            u.transpose(0, 2, 1, 3)
        )

        kd = self.dim_head * self.kernel_multiplier
        k_x = LowRankKernel(
            self.latent_dim, kd, self.heads, use_rotary_emb=self.use_rope,
            qk_norm=self.qk_norm, name="low_rank_kernel_x",
        )(u_x)  # [b, heads, h, h]
        k_y = LowRankKernel(
            self.latent_dim, kd, self.heads, use_rotary_emb=self.use_rope,
            qk_norm=self.qk_norm, name="low_rank_kernel_y",
        )(u_y)  # [b, heads, w, w]

        b, h, w, _ = u_phi.shape
        # Split the head axis off the (row-major) channel dim — a free
        # reshape, never a materialized transpose. Both axial applications
        # keep the tensor in [b, row, col, head, d] layout so the only data
        # movement is the matmuls themselves (the reference's einsums
        # 'bhij,bhcjm->bhcim' / 'bhlm,bhcim->bhcil' in channels-last form).
        from lns_tpu.pallas_kernels.backend import enabled as pallas_enabled

        if pallas_enabled():
            # fused Pallas path: both axial matmuls per (sample, head) in
            # VMEM — one HBM read + write of phi
            from lns_tpu.pallas_kernels.axial_attention import axial_kernel_apply

            phi = axial_kernel_apply(
                k_x.astype(u_phi.dtype), k_y.astype(u_phi.dtype), u_phi, self.heads
            )
        else:
            phi = u_phi.reshape(b, h, w, self.heads, self.dim_head)
            phi = jnp.einsum("bnij,bjwnd->biwnd", k_x, phi)
            phi = jnp.einsum("bnlm,bimnd->bilnd", k_y, phi)
            phi = phi.reshape(b, h, w, self.heads * self.dim_head)

        out = instance_norm_2d(phi)
        out = Conv1x1(self.dim_out, use_bias=False, name="out_fc1")(out)
        out = gelu(out)
        out = Conv1x1(self.dim_out, use_bias=False, name="out_fc2")(out)
        return out + u_skip
