"""Import reference (PyTorch) ``Unet3D`` weights into the JAX ``UNet``.

Reference users migrating to this framework can load their trained torch
checkpoints directly: ``import_reference_state_dict`` maps every live
parameter of `/root/reference/src/unet_model.py`'s ``Unet3D``
(`unet_model.py:406-540`) onto the Flax ``models.unet.UNet`` tree, with
layout conversions (OIHW -> HWIO convs, transposed linears, spatially
flipped ConvTranspose kernels, squeezed frame axes).

Build the target with ``UNet(..., frame_attention=False)``: the reference
constructs ``init_temporal_attn`` / ``mid_temporal_attn`` but its forward
never calls them (`unet_model.py:542-622` contains no ``temporal_attn``
invocation), so a reference checkpoint corresponds to the UNet *without*
the (optional, net-new) live frame-attention path.

Reference parameters with no counterpart here are *dead code in the
reference itself* for the supported studies and are skipped (returned in
``unused`` for inspection):

* ``init_temporal_attn`` / ``mid_temporal_attn`` / ``time_rel_pos_bias``
  — constructed (`unet_model.py:444,457,500`) but never invoked in
  ``forward``.
* ``sign_emb_CNN`` — 1D signal embedding (`unet_model.py:370-403,472`):
  constructed unconditionally but only used for 1-D conditioning signals
  that neither the Darcy nor the mechanics study feeds.
* per-attention ``to_q/to_k/to_v`` — cross-attention projections for the
  same unused conditioning path (`unet_model.py:275-278,334-336`).
* ``rotary_emb.inv_freq`` — a deterministic buffer, not a parameter.

The import is exercised end-to-end by ``tests/test_reference_parity_unet.py``,
which transplants a torch state dict and asserts forward-pass equality.
"""

from __future__ import annotations

import numpy as np


# ---- layout transforms (torch -> flax) -----------------------------------


def _linear(w):
    """torch Linear [out, in] -> flax Dense kernel [in, out]."""
    return np.ascontiguousarray(np.asarray(w).T)


def _conv3d(w):
    """torch Conv3d [O, I, 1, kh, kw] (single frame) -> HWIO [kh, kw, I, O]."""
    w = np.asarray(w)
    return np.ascontiguousarray(w[:, :, 0].transpose(2, 3, 1, 0))


def _conv2d(w):
    """torch Conv2d [O, I, kh, kw] -> HWIO [kh, kw, I, O]."""
    return np.ascontiguousarray(np.asarray(w).transpose(2, 3, 1, 0))


def _pointwise3d(w):
    """torch Conv3d 1x1x1 [O, I, 1, 1, 1] -> matmul kernel [I, O]."""
    return np.ascontiguousarray(np.asarray(w)[:, :, 0, 0, 0].T)


def _pointwise2d(w):
    """torch Conv2d 1x1 [O, I, 1, 1] -> matmul kernel [I, O]."""
    return np.ascontiguousarray(np.asarray(w)[:, :, 0, 0].T)


def _conv_transpose3d(w):
    """torch ConvTranspose3d [I, O, 1, kh, kw] -> flax ConvTranspose
    kernel [kh, kw, I, O]; torch's transposed conv correlates with the
    spatially flipped kernel relative to flax's (verified numerically)."""
    w = np.asarray(w)
    return np.ascontiguousarray(w[:, :, 0, ::-1, ::-1].transpose(2, 3, 0, 1))


def _gamma(w):
    """Reference LayerNorm gamma [1, C, 1, 1, 1] -> [C]."""
    return np.ascontiguousarray(np.asarray(w).reshape(-1))


def _copy(w):
    return np.ascontiguousarray(np.asarray(w))


# ---- key map --------------------------------------------------------------


def _resnet_entries(flax_name: str, tp: str, *, has_res: bool, has_mlp: bool):
    """ResnetBlock mapping (`unet_model.py:243-266` -> models.unet.ResnetBlock)."""
    out = {}
    for blk, tblk in (("Block_0", "block1"), ("Block_1", "block2")):
        out[(flax_name, blk, "kernel")] = (f"{tp}.{tblk}.proj.weight", _conv3d)
        out[(flax_name, blk, "bias")] = (f"{tp}.{tblk}.proj.bias", _copy)
        out[(flax_name, blk, "gn_scale")] = (f"{tp}.{tblk}.norm.weight", _copy)
        out[(flax_name, blk, "gn_bias")] = (f"{tp}.{tblk}.norm.bias", _copy)
    if has_mlp:
        out[(flax_name, "Dense_0", "kernel")] = (f"{tp}.mlp.1.weight", _linear)
        out[(flax_name, "Dense_0", "bias")] = (f"{tp}.mlp.1.bias", _copy)
    if has_res:
        out[(flax_name, "res_kernel")] = (f"{tp}.res_conv.weight", _pointwise3d)
        out[(flax_name, "res_bias")] = (f"{tp}.res_conv.bias", _copy)
    return out


def _lab_entries(flax_name: str, tp: str):
    """PreNorm(SpatialLinearAttention) residual (`unet_model.py:269-299`)
    -> models.unet.LinearAttentionBlock."""
    return {
        (flax_name, "w_qkv"): (f"{tp}.fn.fn.to_qkv.weight", _pointwise2d),
        (flax_name, "w_out"): (f"{tp}.fn.fn.to_out.weight", _pointwise2d),
        (flax_name, "b_out"): (f"{tp}.fn.fn.to_out.bias", _copy),
        (flax_name, "ln_gamma"): (f"{tp}.fn.norm.gamma", _gamma),
    }


def reference_key_map(
    dim: int,
    dim_mults=(1, 2, 4, 8),
    init_dim: int | None = None,
    *,
    use_sparse_linear_attn: bool = True,
    cond_path: bool = True,
) -> dict:
    """{flax param path tuple: (reference state-dict key, transform)} for a
    ``Unet3D``/``UNet`` pair built with the same hyperparameters
    (`unet_model.py:406-528`)."""
    m: dict = {}
    init_dim = init_dim or dim
    n_levels = len(dim_mults)
    dims = [init_dim] + [dim * mu for mu in dim_mults]
    in_out = list(zip(dims[:-1], dims[1:]))

    m[("init_conv", "Conv_0", "kernel")] = ("init_conv.weight", _conv3d)
    m[("init_conv", "Conv_0", "bias")] = ("init_conv.bias", _copy)

    m[("time_mlp_0", "kernel")] = ("time_mlp.1.weight", _linear)
    m[("time_mlp_0", "bias")] = ("time_mlp.1.bias", _copy)
    m[("time_mlp_1", "kernel")] = ("time_mlp.3.weight", _linear)
    m[("time_mlp_1", "bias")] = ("time_mlp.3.bias", _copy)

    if cond_path:
        m[("emb_conv_0", "kernel")] = ("emb_conv.0.weight", _conv2d)
        m[("emb_conv_0", "bias")] = ("emb_conv.0.bias", _copy)
        m[("emb_conv_1", "Conv_0", "kernel")] = ("emb_conv.2.weight", _conv2d)
        m[("emb_conv_1", "Conv_0", "bias")] = ("emb_conv.2.bias", _copy)
        m[("combine_conv", "kernel")] = ("combine_conv.weight", _conv2d)
        m[("combine_conv", "bias")] = ("combine_conv.bias", _copy)

    rb = 0
    lab = 0
    # encoder levels (`unet_model.py:485-492`)
    for lvl, (dim_in, dim_out) in enumerate(in_out):
        is_last = lvl >= n_levels - 1
        m.update(_resnet_entries(
            f"ResnetBlock_{rb}", f"downs.{lvl}.0",
            has_res=dim_in != dim_out, has_mlp=True))
        rb += 1
        m.update(_resnet_entries(
            f"ResnetBlock_{rb}", f"downs.{lvl}.1", has_res=False, has_mlp=True))
        rb += 1
        if use_sparse_linear_attn:
            m.update(_lab_entries(f"LinearAttentionBlock_{lab}", f"downs.{lvl}.2"))
            lab += 1
        if not is_last:
            m[(f"Downsample_{lvl}", "Conv2dPadded_0", "Conv_0", "kernel")] = (
                f"downs.{lvl}.3.weight", _conv3d)
            m[(f"Downsample_{lvl}", "Conv2dPadded_0", "Conv_0", "bias")] = (
                f"downs.{lvl}.3.bias", _copy)

    # bottleneck (`unet_model.py:494-502`)
    m.update(_resnet_entries("mid_block1", "mid_block1", has_res=False, has_mlp=True))
    m[("mid_spatial_attn", "ChannelLayerNorm_0", "gamma")] = (
        "mid_spatial_attn.fn.norm.gamma", _gamma)
    m[("Attention_0", "Dense_0", "kernel")] = (
        "mid_spatial_attn.fn.fn.fn.to_qkv.weight", _linear)
    m[("Attention_0", "Dense_1", "kernel")] = (
        "mid_spatial_attn.fn.fn.fn.to_out.weight", _linear)
    m.update(_resnet_entries("mid_block2", "mid_block2", has_res=False, has_mlp=True))

    # decoder levels (`unet_model.py:505-512`); skip concat doubles dim_in
    for lvl, (dim_in, dim_out) in enumerate(reversed(in_out)):
        is_last = lvl >= n_levels - 1
        m.update(_resnet_entries(
            f"ResnetBlock_{rb}", f"ups.{lvl}.0", has_res=True, has_mlp=True))
        rb += 1
        m.update(_resnet_entries(
            f"ResnetBlock_{rb}", f"ups.{lvl}.1", has_res=False, has_mlp=True))
        rb += 1
        if use_sparse_linear_attn:
            m.update(_lab_entries(f"LinearAttentionBlock_{lab}", f"ups.{lvl}.2"))
            lab += 1
        if not is_last:
            m[(f"Upsample_{lvl}", "ConvTranspose_0", "kernel")] = (
                f"ups.{lvl}.3.weight", _conv_transpose3d)
            m[(f"Upsample_{lvl}", "ConvTranspose_0", "bias")] = (
                f"ups.{lvl}.3.bias", _copy)

    # final Block + 1x1 projection (`unet_model.py:515-518`)
    m.update(_resnet_entries("final_block", "final_conv.0", has_res=True, has_mlp=False))
    m[("final_conv", "kernel")] = ("final_conv.1.weight", _conv3d)
    m[("final_conv", "bias")] = ("final_conv.1.bias", _copy)
    return m


def import_reference_state_dict(state_dict, template, key_map) -> tuple[dict, list]:
    """Fill a Flax ``UNet`` param ``template`` (from ``model.init``) with a
    reference torch ``state_dict`` (values as numpy arrays or anything
    ``np.asarray`` accepts).

    Returns ``(params, unused)`` where ``unused`` lists reference keys not
    consumed (the reference's dead conditioning modules — see module
    docstring). Raises on missing keys or shape mismatches.
    """
    import jax.tree_util as jtu

    used = set()

    def fill(path, leaf):
        keys = tuple(
            p.key if hasattr(p, "key") else str(p) for p in path
        )
        if keys and keys[0] == "params":
            keys = keys[1:]
        if keys not in key_map:
            hint = ""
            if any("FrameAttention" in k or "frame_attn" in k for k in keys):
                hint = (
                    " — reference checkpoints have no live frame-attention "
                    "weights; build the target with "
                    "UNet(frame_attention=False) (see module docstring)"
                )
            raise KeyError(f"no reference mapping for param {keys}{hint}")
        tkey, transform = key_map[keys]
        if tkey not in state_dict:
            raise KeyError(f"reference state dict missing {tkey} (for {keys})")
        w = transform(state_dict[tkey]).astype(np.asarray(leaf).dtype)
        if w.shape != leaf.shape:
            raise ValueError(
                f"shape mismatch for {keys}: reference {tkey} -> {w.shape}, "
                f"model expects {leaf.shape}"
            )
        used.add(tkey)
        return w

    params = jtu.tree_map_with_path(fill, template)
    unused = sorted(k for k in state_dict if k not in used)
    return params, unused


def state_dict_from_torch_file(path) -> dict:
    """Load a reference ``checkpoint_<step>.pt`` into a numpy state dict.

    The reference wraps the state dict as ``{'model': state_dict}``
    (`denoising_utils.py:273-287`); bare state dicts are accepted too.
    Requires torch (CPU is enough); tensors are converted to numpy so the
    rest of the import has no torch dependency.
    """
    import torch

    with open(path, "rb") as f:
        obj = torch.load(f, map_location="cpu", weights_only=True)
    sd = obj.get("model", obj) if isinstance(obj, dict) else obj
    return {k: v.numpy() for k, v in sd.items()}
