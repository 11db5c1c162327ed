"""Factorized (axial low-rank) attention (reference:
modules/factorized_attention.py).

FABlock2D builds one n x n integral kernel per spatial axis from pooled
axis descriptors (no softmax — a low-rank kernel a la the factorized
transformer), then applies them sequentially as batched matmuls:
O(h^2 + w^2) instead of O((hw)^2).

TPU mapping (round-3 defaults): every big-tensor op is a dot_general in
its NATIVE output dim order (batch dims, lhs free, rhs free) — zero
transposes, zero layout-assignment copies — and the instance norm is
folded into per-batch out-projection weights so no elementwise op touches
a full-size tensor. Two cores split the shapes on a traffic model
(`_fab_impl_for`): `_batched_gram_core` applies the axial kernels in
channel space (5 passes over a heads*c-wide tensor, first apply never
MXU-starved) and wins when 5c < 9d; `_batched_core` keeps the head-major
d-space chains (9 passes over heads*d) and wins otherwise. Earlier
formulations (head-major blockdiag MXU packing, per-head chains, looped
Gram c-space) stay selectable via LNS_TPU_FAB_IMPL; the probe shootout
lives in benchmarks/probe_fab_block.py.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from lns_tpu.ops.activations import gelu
from lns_tpu.ops.conv import Conv1x1, Dense
from lns_tpu.ops.embedding import apply_rotary_pos_emb, rotary_freqs
from lns_tpu.ops.initializers import torch_linear_kernel_init
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
            ).astype(q.dtype)
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


class _Kernel(nn.Module):
    """Bare kernel-parameter holder: same param path/shape as a bias-free
    Conv1x1 (so torch-checkpoint conversion is unchanged) but exposes the
    [in, out] matrix for custom-layout einsums."""

    in_features: int
    features: int

    @nn.compact
    def __call__(self):
        return self.param(
            "kernel", torch_linear_kernel_init, (self.in_features, self.features)
        )


def _blockdiag(k, group: int):
    """[B, heads, n, n] -> [B, heads/group, group*n, group*n] block-diagonal
    embedding of the per-head axial kernels."""
    b, heads, n, _ = k.shape
    g = heads // group
    k5 = k.reshape(b, g, group, n, n)
    eye = jnp.eye(group, dtype=k.dtype)
    out = jnp.einsum("bgpij,pq->bgpiqj", k5, eye)
    return out.reshape(b, g, group * n, group * n)


def _pack_group(heads: int, n: int) -> int:
    g = max(1, min(heads, 128 // max(1, n)))
    while heads % g:
        g -= 1
    return g


def axial_apply_headmajor(k_x, k_y, phi, precision=None):
    """Axial kernel application on head-major values.

    k_x: [B, heads, H, H]; k_y: [B, heads, W, W]; phi: [B, heads, H, W, d]
    -> [B, heads, H, W, d].

    The per-head contractions are K=M=n (n <= 96) — tiny matmuls that
    starve the 128x128 MXU; packing `group` heads block-diagonally makes
    each application one [group*n, group*n] @ [group*n, other*d] matmul
    with full MXU tiles (<= 4x structural-zero MACs, still net faster).
    """
    b, heads, h, w, d = phi.shape
    group_h = _pack_group(heads, h)
    group_w = _pack_group(heads, w)

    # rows: contract j over H -> [B, g, (p H), W*d]
    # (4D batched form measures faster than folding g into the batch dim)
    kxb = _blockdiag(k_x, group_h)
    ph = phi.reshape(b, heads // group_h, group_h * h, w * d)
    ph = jnp.einsum("bgxy,bgyz->bgxz", kxb, ph, precision=precision)
    phi = ph.reshape(b, heads, h, w, d)

    # cols: contract m over W (one h<->w transpose, folded back below)
    kyb = _blockdiag(k_y, group_w)
    pw = phi.transpose(0, 1, 3, 2, 4).reshape(b, heads // group_w, group_w * w, h * d)
    pw = jnp.einsum("bgxy,bgyz->bgxz", kyb, pw, precision=precision)
    return pw.reshape(b, heads, w, h, d).transpose(0, 1, 3, 2, 4)


def instance_norm_headmajor(phi, eps: float = 1e-5):
    """InstanceNorm2d on head-major [b, n, h, w, d]: per (b, n, d) channel
    over (h, w) — identical math to NHWC instance_norm_2d."""
    if phi.dtype == jnp.float32:
        # two-pass form: numerically exact (golden f32 path)
        mean = jnp.mean(phi, axis=(2, 3), keepdims=True, dtype=jnp.float32)
        var = jnp.mean(jnp.square(phi - mean), axis=(2, 3), keepdims=True)
        return (phi - mean) * jax.lax.rsqrt(var + eps)
    # low-precision activations: E[x^2]-E[x]^2 with f32 accumulation so
    # both statistics come out of ONE read pass (XLA multi-output fusion;
    # the sequential two-pass form costs a second full pass — profiled),
    # normalize arithmetic at activation width (bf16-wide HBM passes)
    mean = jnp.mean(phi, axis=(2, 3), keepdims=True, dtype=jnp.float32)
    sq = jnp.mean(
        jnp.square(phi.astype(jnp.float32)), axis=(2, 3), keepdims=True
    )
    var = jnp.maximum(sq - jnp.square(mean), 0.0)
    inv = jax.lax.rsqrt(var + eps)
    return (phi - mean.astype(phi.dtype)) * inv.astype(phi.dtype)


def _fab_impl_for(hw: int, dim: int = 0, dim_head: int = 64) -> str:
    """Formulation selector (round-3 measurement campaign,
    benchmarks/probe_fab_block.py at the decode bench shapes, bf16, ms for
    one block; heads=8, dim_head=64):

      shape             headmajor perhead  gram  batched  batchedgram
      16x16 c128  8.02   5.41   6.18    **3.63**    7.32
      32x32 c64  28.51  31.44  28.69     24.80   **16.94**
      24x48 c128    —    8.70   8.19    **5.61**    8.51
      48x96 c64     —   37.72  31.65     30.02   **25.03**

    Two formulations split the shapes on a clean traffic model. `batched`
    (native-dot-order batched per-head chains) touches the heads*d-wide
    head-major tensor in 9 big passes; `batchedgram` applies the axial
    kernels in CHANNEL space (the in_proj commutes past them) so its big
    tensor is heads*c wide but only 5 passes touch it (and its first apply
    is never MXU-starved). c-space wins iff 5*c < 9*d — exactly the
    measured split (c=64/d=64 wins both shapes, c=128/d=64 loses both).
    The other formulations are kept selectable via LNS_TPU_FAB_IMPL for
    benchmarking and cross-validation."""
    import os

    forced = os.environ.get("LNS_TPU_FAB_IMPL", "auto")
    if forced != "auto":
        return forced
    if 5 * dim < 9 * dim_head:
        return "batchedgram"
    return "batched"


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

        w_in = _Kernel(self.dim, self.heads * self.dim_head, name="in_proj")()
        w_in = w_in.reshape(self.dim, self.heads, self.dim_head).astype(u.dtype)

        u_in = Conv1x1(self.dim, use_bias=False, name="to_in")(u)
        u_x = PoolingReducer(self.dim, self.dim, self.latent_dim, name="to_x")(u_in)
        # transpose spatial axes, then pool -> per-column descriptors
        u_y = PoolingReducer(self.dim, self.dim, self.latent_dim, name="to_y")(
            u_in.transpose(0, 2, 1, 3)
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

        w_o1 = _Kernel(self.heads * self.dim_head, self.dim_out, name="out_fc1")()
        w_o1 = w_o1.reshape(self.heads, self.dim_head, self.dim_out)
        k_x = k_x.astype(u.dtype)
        k_y = k_y.astype(u.dtype)

        h, w = u.shape[1], u.shape[2]
        impl = _fab_impl_for(h * w, self.dim, self.dim_head)
        import os as _os_sel

        if (impl == "batchedgram"
                and _os_sel.environ.get("LNS_TPU_FAB_IMPL", "auto") == "auto"):
            # two-pass Pallas core (fab_core.py): same math, value tensor
            # never written to HBM — auto-upgrades the c-space shapes when
            # the gate allows (single TPU device; off under meshes). A
            # forced LNS_TPU_FAB_IMPL=batchedgram keeps the XLA core.
            from lns_tpu.pallas_kernels import backend as _backend

            if _backend.fab2p_enabled():
                impl = "pallas2p"
        if impl == "batched":
            out = self._batched_core(u, k_x, k_y, w_in, w_o1)
        elif impl == "pallas2p":
            import os as _os

            from lns_tpu.pallas_kernels.fab_core import fab_fused_core

            out = fab_fused_core(
                u, k_x, k_y, w_in, w_o1,
                block_b=int(_os.environ.get("LNS_TPU_FAB2P_BLOCK", "0")),
                interpret=_os.environ.get("LNS_TPU_FAB2P_INTERPRET") == "1",
            )
        elif impl == "batchedgram":
            out = self._batched_gram_core(u, k_x, k_y, w_in, w_o1)
        elif impl == "gram":
            out = self._gram_core(u, k_x, k_y, w_in, w_o1)
        elif impl == "perhead":
            # Per-head chains (measured fastest at 16x16-class sizes;
            # DESIGN.md "Factorized attention" item 4): the 8x-inflated 5D
            # head-major tensor never exists. Each head's value tensor is a
            # [b, h, w, d] NHWC-class array — the shape family XLA lays out
            # copy-free around dots — and every dot has adjacent free dims.
            # The instance norm is folded into per-batch out-projection
            # weights so no elementwise op touches a full-size tensor (its
            # normalize-write is what drags XLA's layout assignment into
            # batch-minor layout bouncing).
            out = self._per_head_core(u, k_x, k_y, w_in, w_o1)
        else:
            # head-major + block-diagonal MXU packing: at <= 32x32 the
            # per-head dots' K=M<=32 MXU starvation cancels the copy
            # savings (measured tie at 32x32, loss below)
            u_phi = jnp.einsum("bhwc,cnd->bnhwd", u, w_in)
            phi = axial_apply_headmajor(k_x, k_y, u_phi)
            out = instance_norm_headmajor(phi)
            # fold the (head-major -> channel) relayout into out_fc1
            out = jnp.einsum("bnhwd,ndo->bhwo", out, w_o1.astype(out.dtype))
        out = gelu(out)
        out = Conv1x1(self.dim_out, use_bias=False, name="out_fc2")(out)
        return out + u_skip

    @staticmethod
    def _batched_core(u, k_x, k_y, w_in, w_o1, eps: float = 1e-5):
        """Batched per-head chains in fully NATIVE dot_general orders
        (round 3; probe blkG — fastest measured formulation at every
        decode shape). The 8x head-major value tensor is only ever touched
        by dot_generals: every einsum below has output dim order exactly
        (batch dims, lhs free, rhs free) — what dot_general produces
        natively, so XLA emits zero transposes — and every intermediate
        keeps d minor (the layout class the decoder's NHWC convs use).
        Heads run as dot batch dims (4 big kernels instead of ~40 per-head
        ones) and the per-head outputs are summed INSIDE the final (n, d)
        contraction, so per-head accumulate passes never exist. The
        instance norm is folded into per-batch out-projection weights
        (wp = inv * W, bias = mean * inv @ W); its statistics are a
        read-only single-co-pass reduce with f32 accumulation."""
        b, h, w, c = u.shape
        heads = k_x.shape[1]
        # in_proj, native order: free dims (n, d) land last
        phi = jnp.einsum("bhwc,cnd->bhwnd", u, w_in)
        # row apply; batch (b, n), contract h
        x = jnp.einsum("bnih,bhwnd->bniwd", k_x, phi)
        # col apply; batch (b, n), contract w
        x = jnp.einsum("bnlw,bniwd->bnlid", k_y, x)
        # read-only IN stats per (b, n, d) over spatial (l, i)
        mean = jnp.mean(x, axis=(2, 3), dtype=jnp.float32)       # [b, n, d]
        sq = jnp.mean(jnp.square(x.astype(jnp.float32)), axis=(2, 3))
        var = jnp.maximum(sq - jnp.square(mean), 0.0)
        inv = jax.lax.rsqrt(var + eps)                           # [b, n, d]
        w1f = w_o1.astype(jnp.float32)                           # [n, d, o]
        wp = (inv[..., None] * w1f[None]).astype(x.dtype)        # [b, n, d, o]
        bias = jnp.einsum("bnd,ndo->bo", mean * inv, w1f).astype(x.dtype)
        # joint head-sum out projection: contract (n, d) in ONE dot
        out = jnp.einsum("bnlid,bndo->blio", x, wp) - bias[:, None, None, :]
        # [b, w, h, o] -> [b, h, w, o] (small tensor; fuses downstream)
        return out.transpose(0, 2, 1, 3)

    @staticmethod
    def _batched_gram_core(u, k_x, k_y, w_in, w_o1, eps: float = 1e-5):
        """Batched c-space chains (round 3; probe blkK): the axial kernels
        apply to u in CHANNEL space like `_gram_core` (the in_proj is
        linear and commutes past them), but with heads as dot batch/free
        dims in fully native dot order like `_batched_core` — no Python
        loop, no per-head accumulate passes. Big-tensor traffic vs
        `_batched_core`: the in_proj pass never exists ({write A, read A,
        write B, 2x read B} = 5 passes vs 9), and the first apply batches
        over b ONLY so its lhs free dims are (n, l) rows instead of
        per-(b, n) M=h — no MXU starvation. IN statistics of the
        never-materialized phi = B @ W_in are recovered exactly from B's
        Gram matrix (`_gram_core` math). Only pays when c <= heads*d: the
        c-space tensor carries c channels where `_batched_core`'s carries
        heads*d.

        Apply order (probe blkK vs blkK2): the second apply runs per
        (b, n) with M = K = its own axis length, so the LONGER axis goes
        second to lift that dot's MXU tile occupancy (48x96: M=K=96 at
        0.56 utilization instead of 48 at 0.14); the w-second order costs
        one full-size [b, w, h, o] -> [b, h, w, o] transpose at the end
        (its dot's native order leads with l).

        First-apply output order (probe blkL2, round 4): the first apply's
        output is written with the CONTRACTED-NEXT axis major (e.g.
        "bnhlc" instead of the native "bnlhc") so the second dot walks its
        rhs contraction-major directly — the h<->l relayout copy XLA
        otherwise inserts between the applies (~5.9 ms/rollout in the
        chunked NS2d decode, xplane fusion.1945) folds into the first
        dot's output epilogue (116,32,32,64 chunk: 2.46 -> 2.09 ms/block,
        -15%)."""
        b, h, w, c = u.shape
        heads = k_x.shape[1]
        n_px = h * w
        if w > h:
            # row apply first (batch b only, contract h), col apply second;
            # output written w-major so the col dot consumes it natively
            a = jnp.einsum("bnih,bhwc->bnwic", k_x, u)
            bb = jnp.einsum("bnlw,bnwic->bnlic", k_y, a)
            spatial = "li"  # bb spatial index order: (w-index, h-index)
        else:
            # col apply in c-space; batch b ONLY, contract w; output
            # written h-major so the row dot consumes it natively (blkL2)
            a = jnp.einsum("bnlw,bhwc->bnhlc", k_y, u)
            # row apply; batch (b, n), contract h; native out (b,n,i,l,c)
            bb = jnp.einsum("bnih,bnhlc->bnilc", k_x, a)
            spatial = "il"
        # stats of phi = bb @ w_in without materializing phi
        kx_s = jnp.sum(k_x, axis=2, dtype=jnp.float32)  # [b, n, h]
        ky_s = jnp.sum(k_y, axis=2, dtype=jnp.float32)  # [b, n, w]
        mean_c = (
            jnp.einsum("bnh,bnw,bhwc->bnc", kx_s, ky_s, u.astype(jnp.float32))
            / n_px
        )
        # Gram over BOTH spatial dims — insensitive to bb's spatial order.
        # LNS_TPU_FAB_GRAM_BARRIER=1 routes one operand through an
        # optimization barrier so XLA cannot pattern-match the self-product
        # into a VPU multiply+reduce fusion (in the chunked NS2d decode that
        # fusion profiles at ~5.2 ms/rollout; an MXU dot reads the same
        # bytes at the bandwidth floor).
        import os as _os

        bb2 = bb
        if _os.environ.get("LNS_TPU_FAB_GRAM_BARRIER") == "1":
            bb2 = jax.lax.optimization_barrier(bb)
        g = jnp.einsum(
            "bnilc,bnile->bnce", bb, bb2, preferred_element_type=jnp.float32
        )
        wf = w_in.astype(jnp.float32)  # [c, n, d]
        mean = jnp.einsum("bnc,cnd->bnd", mean_c, wf)  # [b, n, d]
        ex2 = jnp.einsum("cnd,bnce,end->bnd", wf, g / n_px, wf)
        var = jnp.maximum(ex2 - jnp.square(mean), 0.0)
        inv = jax.lax.rsqrt(var + eps)  # [b, n, d]
        w1f = w_o1.astype(jnp.float32)  # [n, d, o]
        # fold in_proj + IN + out_fc1 into one per-(b, n) c->o matrix
        m = jnp.einsum("cnd,bnd,ndo->bnco", wf, inv, w1f).astype(bb.dtype)
        bias = jnp.einsum("bnd,ndo->bo", mean * inv, w1f).astype(bb.dtype)
        # joint head-sum out projection: contract (n, c) in ONE dot
        if spatial == "li":
            out = jnp.einsum("bnlic,bnco->blio", bb, m) - bias[:, None, None, :]
            return out.transpose(0, 2, 1, 3)  # [b, w, h, o] -> [b, h, w, o]
        return jnp.einsum("bnilc,bnco->bilo", bb, m) - bias[:, None, None, :]

    @staticmethod
    def _per_head_core(u, k_x, k_y, w_in, w_o1):
        heads = k_x.shape[1]
        acc = None
        for n in range(heads):
            phi = jnp.einsum("bhwc,cd->bhwd", u, w_in[:, n])
            x = jnp.einsum("bih,bhwd->biwd", k_x[:, n], phi)   # row apply
            x = x.transpose(0, 2, 1, 3)                        # [b, w, i, d]
            x = jnp.einsum("blw,bwid->blid", k_y[:, n], x)     # col apply
            # instance-norm statistics per (b, d) over (l, i), f32 accum
            if x.dtype == jnp.float32:
                mean = jnp.mean(x, axis=(1, 2))
                var = jnp.mean(
                    jnp.square(x - mean[:, None, None, :]), axis=(1, 2))
            else:
                xf = x.astype(jnp.float32)
                mean = jnp.mean(xf, axis=(1, 2))
                var = jnp.maximum(
                    jnp.mean(jnp.square(xf), axis=(1, 2)) - jnp.square(mean),
                    0.0)
            inv = jax.lax.rsqrt(var + 1e-5)                    # [b, d]
            w1f = w_o1[n].astype(jnp.float32)                  # [d, o]
            wp = (inv[:, :, None] * w1f[None]).astype(x.dtype)
            bias = ((mean * inv) @ w1f).astype(x.dtype)        # [b, o]
            t = jnp.einsum("blid,bdo->blio", x, wp) - bias[:, None, None, :]
            acc = t if acc is None else acc + t
        # [b, w, h, o] -> [b, h, w, o]
        return acc.transpose(0, 2, 1, 3)

    @staticmethod
    def _gram_core(u, k_x, k_y, w_in, w_o1, eps: float = 1e-5):
        """Gram-statistics c-space chains (round 3): the axial kernels are
        applied to u in CHANNEL space (the in_proj is linear so it commutes
        past the kernels), and the instance-norm statistics of
        phi = B @ W_in are recovered exactly from B's Gram matrix
        (mean_d = mean_c @ W_in; E[phi_d^2] = W_in^T (G/N) W_in), so the
        head-major d-space tensor never materializes and every op touching
        a full-size tensor is a dot_general — XLA's layout assignment has
        no elementwise/reduce consumer to bounce layouts against (the
        copies that formulation cost 16 ms/decode, DESIGN.md). Exact vs
        the two-pass form to ~1e-7 in f32 (stats always accumulate f32
        via preferred_element_type)."""
        b, h, w, c = u.shape
        heads = k_x.shape[1]
        n_px = h * w
        ones3 = jnp.ones((b, w, h), u.dtype)
        acc = None
        for hd in range(heads):
            a = jnp.einsum("bih,bhwc->biwc", k_x[:, hd], u)
            bb = jnp.einsum("blw,biwc->blic", k_y[:, hd], a)
            g = jnp.einsum("blic,blie->bce", bb, bb,
                           preferred_element_type=jnp.float32)
            sums = jnp.einsum("blic,bli->bc", bb, ones3,
                              preferred_element_type=jnp.float32)
            win = w_in[:, hd].astype(jnp.float32)        # [c, d]
            mean = (sums / n_px) @ win                   # [b, d]
            ex2 = jnp.einsum("cd,bce,ed->bd", win, g / n_px, win)
            var = jnp.maximum(ex2 - jnp.square(mean), 0.0)
            inv = jax.lax.rsqrt(var + eps)               # [b, d]
            w1f = w_o1[hd].astype(jnp.float32)           # [d, o]
            m = jnp.einsum("cd,bd,do->bco", win, inv, w1f).astype(bb.dtype)
            bias = ((mean * inv) @ w1f).astype(bb.dtype)
            t = jnp.einsum("blic,bco->blio", bb, m) - bias[:, None, None, :]
            acc = t if acc is None else acc + t
        # [b, w, h, o] -> [b, h, w, o]
        return acc.transpose(0, 2, 1, 3)
