"""Attention U-Net denoiser (Flax, NHWC, TPU-native).

Re-design of the reference's video-style ``Unet3D``
(`/root/reference/src/unet_model.py:406-622`), which runs 2D fields through
Conv3d kernels with a vestigial frame axis of length 1. Here the network is
2D-native (NHWC — the TPU conv layout; all convs map onto the MXU), with the
frame axis kept as an *optional* capability: inputs may be [B, H, W, C] or
[B, F, H, W, C]; frame attention (RoPE + T5 relative position bias, matching
`unet_model.py:439-444`) is applied whenever F > 1 and reduces to an exact
per-token linear map at F == 1 (attention over a single key is the identity
softmax), which we exploit instead of paying a degenerate attention.

Capability map (reference -> here):
  init Conv3d k=(1,7,7)                 -> init Conv 7x7           (:453)
  init/mid temporal attention           -> FrameAttention          (:457,500)
  per level: 2x time-FiLM ResnetBlock,
     SpatialLinearAttention residual,
     Downsample k=(1,4,4) s=(1,2,2)     -> same, 2D               (:484-492)
  mid: block/spatial full attn/block    -> same                    (:494-502)
  symmetric up path w/ skip concat,
     Upsample = ConvTranspose k4 s2     -> same                    (:504-512)
  final block + 1x1 conv                -> same                    (:514-518)
  time: SinusoidalPosEmb->MLP (4*dim)   -> same                    (:464-469)
  circular padding variants             -> padding_mode='circular' (:171-199)
  sigmoid on last channel               -> sigmoid_last_channel    (:619-621)
  gradient-cond channel + CFG           -> cond/null_cond_prob +
                                           apply_with_guidance     (:521-540)
  self-conditioning plumbing            -> self_condition          (:428,564-566)
  SignalEmbedding (CNN/GRU ablation)    -> models.blocks.SignalEmbedding
"""

from __future__ import annotations

import math
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax.sharding import Mesh, NamedSharding, PartitionSpec

from physicsinformeddiffusionmodels_tpu.ops.pallas_attention import (
    linear_attention,
    linear_attention_block,
)
from physicsinformeddiffusionmodels_tpu.ops.pallas_conv import (
    conv_gn_film_silu_cm,
)
from physicsinformeddiffusionmodels_tpu.ops.pallas_kernels import (
    group_norm_film_silu,
)


# --------------------------------------------------------------------------
# small modules
# --------------------------------------------------------------------------


class SinusoidalPosEmb(nn.Module):
    """Standard transformer sinusoidal timestep embedding
    (`unet_model.py:147-159`)."""

    dim: int

    @nn.compact
    def __call__(self, t):
        half = self.dim // 2
        freqs = jnp.exp(jnp.arange(half) * (-math.log(10000.0) / (half - 1)))
        args = t.astype(jnp.float32)[:, None] * freqs[None, :]
        return jnp.concatenate([jnp.sin(args), jnp.cos(args)], axis=-1)


class ChannelLayerNorm(nn.Module):
    """Channel-only LayerNorm with scale, no bias, biased variance
    (`unet_model.py:201-210`)."""

    dim: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        var = jnp.var(x, axis=-1, keepdims=True)
        mean = jnp.mean(x, axis=-1, keepdims=True)
        gamma = self.param("gamma", nn.initializers.ones, (self.dim,))
        return (x - mean) / jnp.sqrt(var + self.eps) * gamma


def _pad2d(x, pad: int, mode: str):
    """Spatial padding on the (H, W) axes of an NHWC (or NFHWC) tensor."""
    if pad == 0:
        return x
    cfg = [(0, 0)] * (x.ndim - 3) + [(pad, pad), (pad, pad), (0, 0)]
    return jnp.pad(x, cfg, mode="wrap" if mode == "circular" else "constant")


class Conv2dPadded(nn.Module):
    """Conv with explicit zero/circular spatial padding (torch-style
    ``padding_mode``, `unet_model.py:195-199,226-229`)."""

    features: int
    kernel: int
    stride: int = 1
    pad: int = 0
    padding_mode: str = "zeros"
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        if self.padding_mode == "circular":
            # explicit wrap-pad + VALID (torch padding_mode='circular')
            x = _pad2d(x, self.pad, self.padding_mode)
            padding = "VALID"
        else:
            # XLA pads inside the conv — an explicit jnp.pad materializes a
            # copy of every activation (measured ~6ms/step of pure copies).
            # For k=3/7 s=1 p=k//2 and k=4 s=2 p=1, 'SAME' is the identical
            # geometry.
            padding = "SAME"
        return nn.Conv(
            self.features,
            (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding=padding,
            dtype=self.dtype,
        )(x)


class Downsample(nn.Module):
    """k=4 s=2 p=1 strided conv (`unet_model.py:195-199`)."""

    dim: int
    padding_mode: str = "zeros"
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        return Conv2dPadded(self.dim, 4, 2, 1, self.padding_mode, self.dtype)(x)


class Upsample(nn.Module):
    """ConvTranspose k=4 s=2 p=1 (doubles resolution, `unet_model.py:161-193`).
    Circular mode pre-pads circularly and crops, reproducing the reference's
    CircularUpsample trick."""

    dim: int
    padding_mode: str = "zeros"
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        if self.padding_mode == "circular":
            x = _pad2d(x, 1, "circular")
            y = nn.ConvTranspose(
                self.dim, (4, 4), strides=(2, 2), padding="VALID", dtype=self.dtype
            )(x)
            # VALID transpose output: (n+2-1)*2 + 4 - 2*... -> crop 3 per side
            crop = (y.shape[-3] - 2 * (x.shape[-3] - 2)) // 2
            return y[..., crop:-crop, crop:-crop, :]
        # 'SAME' with stride 2 doubles resolution — identical geometry to
        # torch ConvTranspose2d(k=4, s=2, p=1) for even sizes.
        return nn.ConvTranspose(
            self.dim, (4, 4), strides=(2, 2), padding="SAME", dtype=self.dtype
        )(x)


def channel_major(x):
    """[B, H, W, C] -> [B, C, H*W] (one XLA relayout copy)."""
    b, h, w, c = x.shape
    return jnp.swapaxes(x.reshape(b, h * w, c), 1, 2)


def from_channel_major(x_cm, h, w):
    """[B, C, H*W] -> [B, H, W, C]."""
    b, c, _ = x_cm.shape
    return jnp.swapaxes(x_cm, 1, 2).reshape(b, h, w, c)


class Block(nn.Module):
    """conv3x3 -> GroupNorm -> (FiLM scale-shift) -> SiLU
    (`unet_model.py:223-241`).

    Owns its conv parameters so the SAME module runs in either layout:
    natural NHWC (conv + XLA-fused GN chain — XLA's preferred form at
    C >= 128), or channel-major via the fused Pallas Block kernel
    (ops/pallas_conv.py) when the caller passes ``cm=P``, which is the
    winning form for narrow channels where XLA's batch-in-lanes conv
    emitter forces relayout copies around every custom kernel."""

    dim_out: int
    groups: int = 8
    padding_mode: str = "zeros"
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, scale_shift=None, *, cm: int = 0):
        ci = x.shape[1] if cm else x.shape[-1]
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (3, 3, ci, self.dim_out)
        )
        bias = self.param("bias", nn.initializers.zeros, (self.dim_out,))
        gamma = self.param("gn_scale", nn.initializers.ones, (self.dim_out,))
        beta = self.param("gn_bias", nn.initializers.zeros, (self.dim_out,))
        scale, shift = scale_shift if scale_shift is not None else (None, None)
        dt = self.dtype or x.dtype

        if cm:
            assert self.padding_mode == "zeros", "cm path is zero-pad only"
            return conv_gn_film_silu_cm(
                x.astype(dt), kernel, bias, gamma, beta, scale, shift,
                p=cm, groups=self.groups,
            )

        lead = None
        if x.ndim == 5:  # [B, F, H, W, C]: frames fold into batch for the conv
            lead = x.shape[:2]
            x = x.reshape(-1, *x.shape[2:])
        if self.padding_mode == "circular":
            x = _pad2d(x, 1, "circular")
            padding = "VALID"
        else:
            padding = "SAME"
        h = jax.lax.conv_general_dilated(
            x.astype(dt), kernel.astype(dt), (1, 1), padding,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + bias.astype(dt)
        if lead is not None:
            h = h.reshape(*lead, *h.shape[1:])
        # GN -> FiLM -> SiLU via the plain-XLA path: XLA fuses the chain
        # into the conv pipeline (measured, scripts/profile_conv2.py).
        return group_norm_film_silu(
            h, gamma, beta, scale, shift, groups=self.groups
        )


class ResnetBlock(nn.Module):
    """Two FiLM-conditioned blocks + 1x1 residual conv
    (`unet_model.py:243-267`). ``cm=P`` runs channel-major on [B, C, N]."""

    dim_out: int
    groups: int = 8
    padding_mode: str = "zeros"
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, time_emb=None, *, cm: int = 0):
        ci = x.shape[1] if cm else x.shape[-1]
        scale_shift = None
        if time_emb is not None:
            emb = nn.Dense(self.dim_out * 2, dtype=self.dtype)(nn.silu(time_emb))
            if not cm:
                emb = emb[:, *((None,) * (x.ndim - 2)), :]
            scale_shift = jnp.split(emb, 2, axis=-1)
        h = Block(self.dim_out, self.groups, self.padding_mode, self.dtype,
                  name="Block_0")(x, scale_shift, cm=cm)
        h = Block(self.dim_out, self.groups, self.padding_mode, self.dtype,
                  name="Block_1")(h, cm=cm)
        if ci == self.dim_out:
            res = x
        else:
            wr = self.param(
                "res_kernel", nn.initializers.lecun_normal(), (ci, self.dim_out)
            )
            br = self.param("res_bias", nn.initializers.zeros, (self.dim_out,))
            dt = self.dtype or x.dtype
            if cm:
                res = jnp.einsum(
                    "bcn,cd->bdn", x.astype(dt), wr.astype(dt)
                ) + br.astype(dt)[:, None]
            else:
                res = x.astype(dt) @ wr.astype(dt) + br.astype(dt)
        return h + res


class SpatialLinearAttention(nn.Module):
    """Efficient linear attention over the pixel grid
    (`unet_model.py:269-299`): q softmaxed over channels, k over tokens,
    context = k v^T — O(N d^2) instead of O(N^2 d)."""

    dim: int
    heads: int = 8
    dim_head: int = 32
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        *lead, h, w, c = x.shape
        n = h * w
        hidden = self.heads * self.dim_head
        w_qkv = self.param(
            "w_qkv", nn.initializers.lecun_normal(), (c, hidden * 3)
        )
        w_out = self.param(
            "w_out", nn.initializers.lecun_normal(), (hidden, self.dim)
        )
        b_out = self.param("b_out", nn.initializers.zeros, (self.dim,))
        dt = self.dtype or x.dtype
        tokens = x.reshape(-1, n, c).astype(dt)
        out = linear_attention(
            tokens, w_qkv.astype(dt), w_out.astype(dt),
            heads=self.heads, dim_head=self.dim_head,
        )
        return out.reshape(*lead, h, w, self.dim) + b_out.astype(dt)


class LinearAttentionBlock(nn.Module):
    """Pre-norm residual spatial linear attention,
    ``x + b_out + LA(LN_gamma(x))``, fused into ONE Pallas kernel on TPU
    (ops/pallas_attention.linear_attention_block): one HBM read of x, one
    write of the output — the LN, both layout transposes, the bias and the
    residual add that surround the plain kernel are all folded in, and the
    output projection is pre-contracted with the per-head context matrix.
    Equivalent to the reference's ``PreNorm(SpatialLinearAttention) + x``
    (`unet_model.py:212-220,269-299,484-492`)."""

    dim: int
    heads: int = 8
    dim_head: int = 32
    dtype: Optional[jnp.dtype] = None
    # sequence-parallel execution: tokens sharded over sp_mesh axis
    # ``sp_axis`` (batch over ``sp_batch_axis``), cross-device softmax/ctx
    # statistics via parallel.seq_attention — scales attention past
    # single-chip memory at >64^2 resolutions (net-new vs the reference)
    sp_mesh: Optional[Mesh] = None
    sp_axis: str = "tp"
    sp_batch_axis: Optional[str] = "dp"

    @nn.compact
    def __call__(self, x, *, cm: bool = False):
        c = x.shape[1] if cm else x.shape[-1]
        assert c == self.dim, "residual block requires out dim == in dim"
        hidden = self.heads * self.dim_head
        gamma = self.param("ln_gamma", nn.initializers.ones, (c,))
        w_qkv = self.param("w_qkv", nn.initializers.lecun_normal(), (c, hidden * 3))
        w_out = self.param("w_out", nn.initializers.lecun_normal(), (hidden, self.dim))
        b_out = self.param("b_out", nn.initializers.zeros, (self.dim,))
        dt = self.dtype or x.dtype
        if cm:
            # x: [B, C, N] — the kernel's native layout, no transposes
            return linear_attention_block(
                x.astype(dt), gamma, w_qkv, w_out, b_out,
                heads=self.heads, dim_head=self.dim_head, channel_major=True,
            )
        *lead, h, w, _ = x.shape
        tokens = x.reshape(-1, h * w, c).astype(dt)
        n = h * w
        if (
            self.sp_mesh is not None
            and n % self.sp_mesh.shape[self.sp_axis] == 0
            and self.sp_mesh.shape[self.sp_axis] > 1
        ):
            from physicsinformeddiffusionmodels_tpu.parallel.seq_attention import (
                sequence_sharded_linear_attention_block,
            )

            ba = self.sp_batch_axis
            if ba is not None and tokens.shape[0] % self.sp_mesh.shape[ba] != 0:
                ba = None
            # pin the tokens batch-only HERE so the shard_map's token-sharded
            # in_spec reshards at this boundary instead of back-propagating a
            # spatial sharding into the upstream conv chain (GSPMD partitions
            # the manually-padded strided Downsample conv WRONG on a spatially
            # sharded output — verified wrong-by-16 on the 8-device CPU mesh)
            tokens = jax.lax.with_sharding_constraint(
                tokens, NamedSharding(self.sp_mesh, PartitionSpec(ba, None, None))
            )
            out = sequence_sharded_linear_attention_block(
                tokens, gamma.astype(jnp.float32), w_qkv.astype(dt),
                w_out.astype(dt), b_out.astype(jnp.float32),
                self.sp_mesh, self.sp_axis,
                heads=self.heads, dim_head=self.dim_head,
                batch_axis=ba,
                # conv/pad stages are not spatially partitioned — gather the
                # tokens inside the shard_map so no tp-sharded activation
                # escapes into GSPMD propagation (see seq_attention docstring)
                gather_output=True,
            )
        else:
            out = linear_attention_block(
                tokens, gamma, w_qkv, w_out, b_out,
                heads=self.heads, dim_head=self.dim_head,
            )
        return out.reshape(*lead, h, w, self.dim)


def _rope_rotate(x, positions, dim_head):
    """Rotary position embedding on the last dim (rotate_half convention,
    equivalent of rotary_embedding_torch used at `unet_model.py:439-442`)."""
    half = dim_head // 2
    freqs = 1.0 / (10000.0 ** (jnp.arange(0, half, dtype=jnp.float32) / half))
    angles = positions[:, None] * freqs[None, :]  # [n, half]
    cos = jnp.cos(angles)
    sin = jnp.sin(angles)
    x1, x2 = x[..., :half], x[..., half : 2 * half]
    rot = jnp.concatenate([x1 * cos - x2 * sin, x2 * cos + x1 * sin], axis=-1)
    if dim_head > 2 * half:
        rot = jnp.concatenate([rot, x[..., 2 * half :]], axis=-1)
    return rot


class RelativePositionBias(nn.Module):
    """T5-bucketed relative position bias (`unet_model.py:78-116`)."""

    heads: int = 8
    num_buckets: int = 32
    max_distance: int = 128

    @nn.compact
    def __call__(self, n):
        q_pos = jnp.arange(n)
        rel = q_pos[None, :] - q_pos[:, None]
        neg = -rel
        nb = self.num_buckets // 2
        ret = (neg < 0).astype(jnp.int32) * nb
        num = jnp.abs(neg)
        max_exact = nb // 2
        is_small = num < max_exact
        val_large = max_exact + (
            jnp.log(num.astype(jnp.float32) / max_exact + 1e-9)
            / math.log(self.max_distance / max_exact)
            * (nb - max_exact)
        ).astype(jnp.int32)
        val_large = jnp.minimum(val_large, nb - 1)
        buckets = ret + jnp.where(is_small, num, val_large)
        table = nn.Embed(self.num_buckets, self.heads)(buckets)  # [n, n, heads]
        return jnp.transpose(table, (2, 0, 1))  # [heads, n, n]


class Attention(nn.Module):
    """Full multi-head attention over the last token axis with optional RoPE
    and additive position bias (`unet_model.py:317-367`)."""

    dim: int
    heads: int = 8
    dim_head: int = 32
    use_rope: bool = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, pos_bias=None):
        *lead, n, c = x.shape
        hidden = self.heads * self.dim_head
        qkv = nn.Dense(hidden * 3, use_bias=False, dtype=self.dtype)(x)
        qkv = qkv.reshape(*lead, n, 3, self.heads, self.dim_head)
        q, k, v = qkv[..., 0, :, :], qkv[..., 1, :, :], qkv[..., 2, :, :]
        q = jnp.swapaxes(q, -2, -3)  # [..., heads, n, d]
        k = jnp.swapaxes(k, -2, -3)
        v = jnp.swapaxes(v, -2, -3)
        if self.use_rope:
            pos = jnp.arange(n, dtype=jnp.float32)
            q = _rope_rotate(q, pos, self.dim_head)
            k = _rope_rotate(k, pos, self.dim_head)
        q = q * self.dim_head**-0.5
        sim = jnp.einsum("...hid,...hjd->...hij", q, k)
        if pos_bias is not None:
            sim = sim + pos_bias
        sim = sim - jax.lax.stop_gradient(sim.max(axis=-1, keepdims=True))
        attn = jax.nn.softmax(sim, axis=-1)
        out = jnp.einsum("...hij,...hjd->...hid", attn, v)
        out = jnp.swapaxes(out, -2, -3).reshape(*lead, n, hidden)
        return nn.Dense(self.dim, use_bias=False, dtype=self.dtype)(out)


class PreNormResidual(nn.Module):
    """x + fn(LayerNorm(x)) (`unet_model.py:139-145,212-220`)."""

    dim: int
    fn: nn.Module

    @nn.compact
    def __call__(self, x, **kwargs):
        return self.fn(ChannelLayerNorm(self.dim)(x), **kwargs) + x


class FrameAttention(nn.Module):
    """Attention along the frame axis of [B, F, H, W, C] (the reference's
    temporal attention, `unet_model.py:442,457,500`), with RoPE + relative
    position bias. At F == 1 attention over a single key is exact identity
    softmax, so it reduces to to_out(v) — computed directly, skipping the
    degenerate quadratic path."""

    dim: int
    heads: int = 8
    dim_head: int = 32
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        # x: [B, F, H, W, C] -> tokens along F per pixel
        B, F, H, W, C = x.shape
        tokens = jnp.transpose(x, (0, 2, 3, 1, 4)).reshape(B, H * W, F, C)
        if F == 1:
            # softmax over one key is 1 -> attention output == to_out(v);
            # RoPE at position 0 and the single-bucket bias are identities.
            # Only the v third of the qkv weight is used — slice it BEFORE
            # the matmul so the q/k projections are never computed (2/3 of
            # the FLOPs and a [B, HW, 3*hidden] intermediate saved).
            hidden = self.heads * self.dim_head
            w_qkv = self.param(
                "to_qkv_kernel", nn.initializers.lecun_normal(), (C, 3 * hidden)
            )
            w_out = self.param(
                "to_out_kernel", nn.initializers.lecun_normal(), (hidden, self.dim)
            )
            # ... and the two matmuls collapse to one: out = x (W_v W_out),
            # a [C, C] weight computed once per step (hidden never
            # materializes; 8x fewer FLOPs, 1/8 the activation traffic).
            dt = self.dtype or tokens.dtype
            w_eff = (w_qkv[:, 2 * hidden:] @ w_out).astype(dt)
            out = tokens.astype(dt) @ w_eff
        else:
            bias = RelativePositionBias(heads=self.heads, max_distance=32)(F)
            out = Attention(
                self.dim, self.heads, self.dim_head, use_rope=True, dtype=self.dtype,
            )(tokens, pos_bias=bias)
        out = out.reshape(B, H, W, F, self.dim).transpose(0, 3, 1, 2, 4)
        return out


# --------------------------------------------------------------------------
# U-Net
# --------------------------------------------------------------------------


class UNet(nn.Module):
    """Physics-informed diffusion denoiser U-Net.

    Configurations used by the studies (reference `main.py:122-128`):
      Darcy:     UNet(dim=32, channels=2)
      Mechanics: UNet(dim=128, channels=10, out_dim=3, sigmoid_last_channel=True)
    """

    dim: int
    channels: int = 2
    out_dim: Optional[int] = None
    dim_mults: Sequence[int] = (1, 2, 4, 8)
    attn_heads: int = 8
    attn_dim_head: int = 32
    init_dim: Optional[int] = None
    init_kernel_size: int = 7
    use_sparse_linear_attn: bool = True
    resnet_groups: int = 8
    padding_mode: str = "zeros"
    sigmoid_last_channel: bool = False
    self_condition: bool = False
    frame_attention: bool = True
    cond_path: bool = True
    cm_conv_stages: bool = False
    dtype: Optional[jnp.dtype] = None
    # run the final block + 1x1 conv in fp32 under bf16 compute (drift fix;
    # see the head-dtype note in __call__ and docs/DARCY_DRIFT.md)
    fp32_head: bool = False
    # tensor parallelism: constrain wide-stage activations to
    # P('dp', None, None, 'tp') so GSPMD keeps channels partitioned through
    # the conv chain (paired with parallel.mesh.shard_params' output-feature
    # kernel sharding) instead of all-gathering weights at every block.
    # Target: the mechanics dim=128 model (VERDICT r1 item 7).
    tp_mesh: Optional[Mesh] = None
    tp_min_width: int = 128
    # sequence-parallel linear attention (see LinearAttentionBlock.sp_mesh)
    sp_mesh: Optional[Mesh] = None

    def _tp_constrain(self, x):
        """Channel-shard a [B, H, W, C] activation over ('dp', 'tp')."""
        m = self.tp_mesh
        if m is None or x.ndim != 4:
            return x
        tp = m.shape["tp"]
        c = x.shape[-1]
        # group-aligned only: GN has resnet_groups groups over C
        if tp <= 1 or c < self.tp_min_width or c % tp or self.resnet_groups % tp:
            return x
        # batch axis joins the constraint only when divisible (init uses
        # B=1); on a multislice mesh the batch is split over ('slice','dp')
        data = ("slice", "dp") if "slice" in m.axis_names else ("dp",)
        n_data = 1
        for a in data:
            n_data *= m.shape[a]
        ba = data if x.shape[0] % n_data == 0 else None
        x = jax.lax.with_sharding_constraint(
            x, NamedSharding(m, PartitionSpec(ba, None, None, "tp"))
        )
        self.sow("intermediates", "tp_act", x)
        return x

    def _maybe_frame(self, fn, x, has_frames):
        """Apply a frame-axis module; no-op path handled inside FrameAttention."""
        if not self.frame_attention:
            return x
        if not has_frames:
            x5 = x[:, None]  # [B, 1, H, W, C]
            return fn(x5)[:, 0]
        return fn(x)

    @nn.compact
    def __call__(
        self,
        x,
        time,
        x_self_cond=None,
        cond=None,
        null_cond_prob: float = 0.0,
        *,
        rng=None,
    ):
        """Args mirror the reference forward (`unet_model.py:542-622`).

        x: [B, H, W, C] (or [B, F, H, W, C]); time: [B] int timesteps;
        cond: optional [B, H, W, C] residual-gradient conditioning image —
        masked to zero per-sample with probability ``null_cond_prob``
        (classifier-free guidance training; needs ``rng`` when 0 < p < 1).
        """
        has_frames = x.ndim == 5
        squeeze_frames = False
        if has_frames and x.shape[1] == 1:
            x = x[:, 0]
            has_frames = False
            squeeze_frames = True
        B = x.shape[0]
        time = jnp.broadcast_to(jnp.atleast_1d(time), (B,))

        if self.self_condition:
            if x_self_cond is None:
                x_self_cond = jnp.zeros_like(x)
            x = jnp.concatenate([x_self_cond, x], axis=-1)

        init_dim = self.init_dim or self.dim
        pad = self.init_kernel_size // 2
        x = Conv2dPadded(
            init_dim, self.init_kernel_size, 1, pad, self.padding_mode, self.dtype,
            name="init_conv",
        )(x)

        if self.frame_attention:
            frame_attn_init = PreNormResidual(
                init_dim,
                FrameAttention(init_dim, self.attn_heads, self.attn_dim_head, self.dtype),
                name="init_frame_attn",
            )
            x = self._maybe_frame(frame_attn_init, x, has_frames)

        # gradient conditioning channel for residual-grad guidance
        # (`unet_model.py:521-526,571-587`). The modules are created
        # unconditionally (like the reference's always-constructed
        # emb_conv/combine_conv) so checkpoints are interchangeable between
        # conditioned and unconditioned use; with cond=None the branch is
        # dead code XLA removes.
        if self.cond_path:
            cond_in = cond if cond is not None else jnp.zeros((*x.shape[:-1], self.channels), x.dtype)
            if cond is not None:
                if null_cond_prob >= 1.0:
                    cond_in = jnp.zeros_like(cond_in)
                elif null_cond_prob > 0.0:
                    if rng is None:
                        rng = self.make_rng("cond_mask")
                    mask = jax.random.uniform(rng, (B,)) < null_cond_prob
                    cond_in = jnp.where(mask[:, None, None, None], 0.0, cond_in)
            emb = nn.Conv(init_dim, (1, 1), dtype=self.dtype, name="emb_conv_0")(cond_in)
            emb = nn.gelu(emb, approximate=False)
            emb = Conv2dPadded(init_dim, 3, 1, 1, "zeros", self.dtype, name="emb_conv_1")(emb)
            combined = nn.Conv(init_dim, (1, 1), dtype=self.dtype, name="combine_conv")(
                jnp.concatenate([x, emb], axis=-1)
            )
            if cond is not None:
                x = combined

        r = x
        time_dim = self.dim * 4
        t = SinusoidalPosEmb(self.dim, name="time_pos_emb")(time)
        t = nn.Dense(time_dim, dtype=self.dtype, name="time_mlp_0")(t)
        t = nn.gelu(t, approximate=False)
        t = nn.Dense(time_dim, dtype=self.dtype, name="time_mlp_1")(t)

        dims = [init_dim] + [self.dim * m for m in self.dim_mults]
        in_out = list(zip(dims[:-1], dims[1:]))
        num_res = len(in_out)

        # Channel-major level stages (experimental, OFF by default): the
        # whole narrow-channel stage (2 ResnetBlocks + linear attention +
        # skip) can run channel-major [B, C, N] through the fused Pallas
        # Block kernel (ops/pallas_conv.py) with one transpose in/out per
        # stage. Measured on v5e (Darcy, batch 64): the Block kernel's
        # im2col is lane-rotation-bound (fwd ~0.4 ms, bwd ~0.9-1.2 ms per
        # Block at level 0) and loses to XLA's conv-pipeline fusion of the
        # same chain — bench 1901 vs 2289 samples/s/chip — so the default
        # path keeps XLA convs + the fused attention kernel. Flip
        # cm_conv_stages=True to re-measure after kernel improvements.
        def _use_cm(width, xx):
            return (
                self.cm_conv_stages
                and width < 128
                and xx.ndim == 4
                and self.padding_mode == "zeros"
                and xx.shape[-3] == xx.shape[-2]
                # kernel halo bound: tap shifts reach +-(p+1) within a
                # 128-lane-aligned window (pallas_conv._PADW)
                and xx.shape[-2] <= 127
            )

        hs = []
        for ind, (_, dim_out) in enumerate(in_out):
            is_last = ind >= num_res - 1
            if _use_cm(dim_out, x):
                hgt, wdt = x.shape[-3:-1]
                xc = channel_major(x)
                xc = ResnetBlock(dim_out, self.resnet_groups, self.padding_mode, self.dtype)(xc, t, cm=hgt)
                xc = ResnetBlock(dim_out, self.resnet_groups, self.padding_mode, self.dtype)(xc, t, cm=hgt)
                if self.use_sparse_linear_attn:
                    xc = LinearAttentionBlock(
                        dim_out, self.attn_heads, self.attn_dim_head, self.dtype
                    )(xc, cm=True)
                hs.append(("cm", xc))
                x = from_channel_major(xc, hgt, wdt)
            else:
                x = self._tp_constrain(
                    ResnetBlock(dim_out, self.resnet_groups, self.padding_mode, self.dtype)(x, t)
                )
                x = self._tp_constrain(
                    ResnetBlock(dim_out, self.resnet_groups, self.padding_mode, self.dtype)(x, t)
                )
                if self.use_sparse_linear_attn:
                    x = self._tp_constrain(LinearAttentionBlock(
                        dim_out, self.attn_heads, self.attn_dim_head, self.dtype,
                        sp_mesh=self.sp_mesh,
                    )(x))
                hs.append(("nat", x))
            if not is_last:
                x = Downsample(dim_out, self.padding_mode, self.dtype)(x)

        mid_dim = dims[-1]
        x = self._tp_constrain(
            ResnetBlock(mid_dim, self.resnet_groups, self.padding_mode, self.dtype, name="mid_block1")(x, t)
        )

        # full spatial attention over the bottleneck tokens (`unet_model.py:497-499`)
        h_mid, w_mid = x.shape[-3:-1]
        tokens = x.reshape(*x.shape[:-3], h_mid * w_mid, mid_dim)
        tokens = PreNormResidual(
            mid_dim,
            Attention(mid_dim, self.attn_heads, self.attn_dim_head, dtype=self.dtype),
            name="mid_spatial_attn",
        )(tokens)
        x = tokens.reshape(*tokens.shape[:-2], h_mid, w_mid, mid_dim)

        if self.frame_attention:
            mid_frame_attn = PreNormResidual(
                mid_dim,
                FrameAttention(mid_dim, self.attn_heads, self.attn_dim_head, self.dtype),
                name="mid_frame_attn",
            )
            x = self._maybe_frame(mid_frame_attn, x, has_frames)

        x = self._tp_constrain(
            ResnetBlock(mid_dim, self.resnet_groups, self.padding_mode, self.dtype, name="mid_block2")(x, t)
        )

        for ind, (dim_in, dim_out) in enumerate(reversed(in_out)):
            is_last = ind >= num_res - 1
            skip_kind, skip = hs.pop()
            if skip_kind == "cm" and _use_cm(dim_in, x):
                hgt, wdt = x.shape[-3:-1]
                xc = jnp.concatenate([channel_major(x), skip], axis=1)
                xc = ResnetBlock(dim_in, self.resnet_groups, self.padding_mode, self.dtype)(xc, t, cm=hgt)
                xc = ResnetBlock(dim_in, self.resnet_groups, self.padding_mode, self.dtype)(xc, t, cm=hgt)
                if self.use_sparse_linear_attn:
                    xc = LinearAttentionBlock(
                        dim_in, self.attn_heads, self.attn_dim_head, self.dtype
                    )(xc, cm=True)
                x = from_channel_major(xc, hgt, wdt)
            else:
                if skip_kind == "cm":
                    skip = from_channel_major(skip, *x.shape[-3:-1])
                x = jnp.concatenate([x, skip], axis=-1)
                x = self._tp_constrain(
                    ResnetBlock(dim_in, self.resnet_groups, self.padding_mode, self.dtype)(x, t)
                )
                x = self._tp_constrain(
                    ResnetBlock(dim_in, self.resnet_groups, self.padding_mode, self.dtype)(x, t)
                )
                if self.use_sparse_linear_attn:
                    x = self._tp_constrain(LinearAttentionBlock(
                        dim_in, self.attn_heads, self.attn_dim_head, self.dtype,
                        sp_mesh=self.sp_mesh,
                    )(x))
            if not is_last:
                x = Upsample(dim_in, self.padding_mode, self.dtype)(x)

        # fp32 head: compute the last block + 1x1 conv in fp32 even under
        # bf16 compute, so the x0 prediction keeps fp32 granularity. The FD
        # residual amplifies output quantization noise by ~1/d0^2 (bf16
        # rounding of a generator field inflates mean|r| 1.1e-3 -> 0.5, and
        # the trained it-100k model measures mean|r| 0.047 bf16 vs 0.022
        # fp32 at identical weights — see docs/DARCY_DRIFT.md), so the
        # cheap tail in fp32 removes most of the bf16 residual noise floor.
        head_dtype = None if self.fp32_head else self.dtype
        if _use_cm(self.dim, x) and not self.fp32_head:
            hgt, wdt = x.shape[-3:-1]
            xc = jnp.concatenate([channel_major(x), channel_major(r)], axis=1)
            xc = ResnetBlock(self.dim, self.resnet_groups, self.padding_mode, self.dtype, name="final_block")(xc, cm=hgt)
            x = from_channel_major(xc, hgt, wdt)
        else:
            x = jnp.concatenate([x, r], axis=-1)
            if self.fp32_head:
                x = x.astype(jnp.float32)
            x = ResnetBlock(self.dim, self.resnet_groups, self.padding_mode, head_dtype, name="final_block")(x)
        out_dim = self.out_dim or self.channels
        x = nn.Conv(out_dim, (1, 1), dtype=head_dtype, name="final_conv")(x)

        if self.sigmoid_last_channel:
            # force the density/E-field channel into [0,1] (`unet_model.py:619-621`)
            x = jnp.concatenate([x[..., :-1], jax.nn.sigmoid(x[..., -1:])], axis=-1)

        if squeeze_frames:
            x = x[:, None]
        return x


def apply_with_guidance(model: UNet, params, x, time, cond, guidance_scale: float = 3.0):
    """Two-pass classifier-free guidance
    (`unet_model.py:530-540`): null + scale * (cond - null)."""
    logits = model.apply(params, x, time, cond=cond, null_cond_prob=0.0)
    if guidance_scale == 1.0:
        return logits
    null_logits = model.apply(params, x, time, cond=cond, null_cond_prob=1.0)
    return null_logits + (logits - null_logits) * guidance_scale
