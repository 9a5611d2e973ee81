"""One-time torch -> flax parameter conversion for SAM2 / DINOv2 checkpoints.

Used both for loading real reference checkpoints (sam2/build_sam.py:119-129
loads `ckpt["model"]`) and, in tests, for driving parity checks against the
reference torch modules with shared random weights. Operates on plain
{name: np.ndarray} state dicts (no torch import needed here; callers convert
tensors to numpy).

Layout rules: Linear w -> kernel = w.T; Conv2d OIHW -> HWIO; our deconvs keep
the torch [c_in, c_out, kh, kw] layout (see common.conv_transpose_2x2_s2);
spatial embeddings NCHW -> HWC.
"""
import numpy as np

__all__ = [
    "convert_hiera", "convert_fpn", "convert_image_encoder",
    "convert_prompt_encoder", "convert_mask_decoder",
    "convert_memory_encoder", "convert_memory_attention", "convert_sam2",
]


def _lin(sd, p):
    out = {"kernel": np.ascontiguousarray(sd[f"{p}.weight"].T)}
    if f"{p}.bias" in sd:
        out["bias"] = sd[f"{p}.bias"]
    return out


def _conv(sd, p):
    out = {"kernel": np.ascontiguousarray(sd[f"{p}.weight"].transpose(2, 3, 1, 0))}
    if f"{p}.bias" in sd:
        out["bias"] = sd[f"{p}.bias"]
    return out


def _ln(sd, p):
    return {"weight": sd[f"{p}.weight"], "bias": sd[f"{p}.bias"]}


def _mlp(sd, p, n_layers):
    return {f"layers_{i}": _lin(sd, f"{p}.layers.{i}") for i in range(n_layers)}


def _attn(sd, p):
    return {k: _lin(sd, f"{p}.{k}")
            for k in ("q_proj", "k_proj", "v_proj", "out_proj")}


def _strip(sd, prefix):
    pl = len(prefix)
    return {k[pl:]: v for k, v in sd.items() if k.startswith(prefix)}


def convert_hiera(sd, prefix="", num_blocks=None):
    sd = _strip(sd, prefix)
    if num_blocks is None:
        num_blocks = 1 + max(int(k.split(".")[1]) for k in sd if k.startswith("blocks."))
    out = {
        "patch_embed": _conv(sd, "patch_embed.proj"),
        "pos_embed": sd["pos_embed"][0].transpose(1, 2, 0),
        "pos_embed_window": sd["pos_embed_window"][0].transpose(1, 2, 0),
    }
    for i in range(num_blocks):
        b = f"blocks.{i}"
        blk = {
            "norm1": _ln(sd, f"{b}.norm1"),
            "norm2": _ln(sd, f"{b}.norm2"),
            "attn": {"qkv": _lin(sd, f"{b}.attn.qkv"),
                     "proj": _lin(sd, f"{b}.attn.proj")},
            "mlp": _mlp(sd, f"{b}.mlp", 2),
        }
        if f"{b}.proj.weight" in sd:
            blk["proj"] = _lin(sd, f"{b}.proj")
        out[f"blocks_{i}"] = blk
    return out


def convert_fpn(sd, prefix="", n_levels=4):
    sd = _strip(sd, prefix)
    return {f"convs_{i}": _conv(sd, f"convs.{i}.conv") for i in range(n_levels)}


def convert_image_encoder(sd, prefix="", n_levels=4):
    return {"trunk": convert_hiera(sd, prefix + "trunk."),
            "neck": convert_fpn(sd, prefix + "neck.", n_levels)}


def convert_prompt_encoder(sd, prefix=""):
    sd = _strip(sd, prefix)
    return {
        "pe_gaussian": sd["pe_layer.positional_encoding_gaussian_matrix"],
        "point_embeddings": np.concatenate(
            [sd[f"point_embeddings.{i}.weight"] for i in range(4)], axis=0),
        "not_a_point_embed": sd["not_a_point_embed.weight"],
        "no_mask_embed": sd["no_mask_embed.weight"],
        "mask_downscaling_0": _conv(sd, "mask_downscaling.0"),
        "mask_downscaling_1": _ln(sd, "mask_downscaling.1"),
        "mask_downscaling_3": _conv(sd, "mask_downscaling.3"),
        "mask_downscaling_4": _ln(sd, "mask_downscaling.4"),
        "mask_downscaling_6": _conv(sd, "mask_downscaling.6"),
    }


def _two_way_block(sd, p):
    return {
        "self_attn": _attn(sd, f"{p}.self_attn"),
        "cross_attn_token_to_image": _attn(sd, f"{p}.cross_attn_token_to_image"),
        "cross_attn_image_to_token": _attn(sd, f"{p}.cross_attn_image_to_token"),
        "mlp": _mlp(sd, f"{p}.mlp", 2),
        "norm1": _ln(sd, f"{p}.norm1"),
        "norm2": _ln(sd, f"{p}.norm2"),
        "norm3": _ln(sd, f"{p}.norm3"),
        "norm4": _ln(sd, f"{p}.norm4"),
    }


def convert_two_way_transformer(sd, prefix="", depth=2):
    sd = _strip(sd, prefix)
    out = {f"layers_{i}": _two_way_block(sd, f"layers.{i}") for i in range(depth)}
    out["final_attn_token_to_image"] = _attn(sd, "final_attn_token_to_image")
    out["norm_final_attn"] = _ln(sd, "norm_final_attn")
    return out


def convert_mask_decoder(sd, prefix="", num_mask_tokens=4,
                         pred_obj_scores=True, pred_obj_scores_mlp=True,
                         use_high_res_features=True):
    sd = _strip(sd, prefix)
    out = {
        "transformer": convert_two_way_transformer(sd, "transformer."),
        "iou_token": sd["iou_token.weight"],
        "mask_tokens": sd["mask_tokens.weight"],
        "output_upscaling_0_weight": sd["output_upscaling.0.weight"],
        "output_upscaling_0_bias": sd["output_upscaling.0.bias"],
        "output_upscaling_1": _ln(sd, "output_upscaling.1"),
        "output_upscaling_3_weight": sd["output_upscaling.3.weight"],
        "output_upscaling_3_bias": sd["output_upscaling.3.bias"],
        "iou_prediction_head": _mlp(sd, "iou_prediction_head", 3),
    }
    for i in range(num_mask_tokens):
        out[f"output_hypernetworks_mlps_{i}"] = _mlp(
            sd, f"output_hypernetworks_mlps.{i}", 3)
    if pred_obj_scores:
        out["obj_score_token"] = sd["obj_score_token.weight"]
        out["pred_obj_score_head"] = (
            _mlp(sd, "pred_obj_score_head", 3) if pred_obj_scores_mlp
            else _lin(sd, "pred_obj_score_head"))
    if use_high_res_features:
        out["conv_s0"] = _conv(sd, "conv_s0")
        out["conv_s1"] = _conv(sd, "conv_s1")
    return out


def convert_memory_encoder(sd, prefix="", fuser_layers=2, num_down_layers=4,
                           has_out_proj=True):
    sd = _strip(sd, prefix)
    mds = {}
    for i in range(num_down_layers):
        mds[f"encoder_{3 * i}"] = _conv(sd, f"mask_downsampler.encoder.{3 * i}")
        mds[f"encoder_{3 * i + 1}"] = _ln(sd, f"mask_downsampler.encoder.{3 * i + 1}")
    last = 3 * num_down_layers
    mds[f"encoder_{last}"] = _conv(sd, f"mask_downsampler.encoder.{last}")
    fus = {}
    for i in range(fuser_layers):
        p = f"fuser.layers.{i}"
        fus[f"layers_{i}"] = {
            "dwconv": _conv(sd, f"{p}.dwconv"),
            "norm": _ln(sd, f"{p}.norm"),
            "pwconv1": _lin(sd, f"{p}.pwconv1"),
            "pwconv2": _lin(sd, f"{p}.pwconv2"),
            "gamma": sd[f"{p}.gamma"],
        }
    out = {"mask_downsampler": mds, "fuser": fus,
           "pix_feat_proj": _conv(sd, "pix_feat_proj")}
    if has_out_proj and "out_proj.weight" in sd:
        out["out_proj"] = _conv(sd, "out_proj")
    return out


def convert_memory_attention(sd, prefix="", num_layers=4):
    sd = _strip(sd, prefix)
    out = {}
    for i in range(num_layers):
        p = f"layers.{i}"
        out[f"layers_{i}"] = {
            "self_attn": _attn(sd, f"{p}.self_attn"),
            "cross_attn_image": _attn(sd, f"{p}.cross_attn_image"),
            "linear1": _lin(sd, f"{p}.linear1"),
            "linear2": _lin(sd, f"{p}.linear2"),
            "norm1": _ln(sd, f"{p}.norm1"),
            "norm2": _ln(sd, f"{p}.norm2"),
            "norm3": _ln(sd, f"{p}.norm3"),
        }
    out["norm"] = _ln(sd, "norm")
    return out


def convert_sam2(sd, cfg):
    """Full SAM2Base state dict -> params for models/sam2/model.py:SAM2.

    cfg: a Sam2Config (config/presets.py)."""
    out = {
        "image_encoder": convert_image_encoder(
            sd, "image_encoder.", n_levels=len(cfg.backbone_channel_list)),
        "sam_prompt_encoder": convert_prompt_encoder(sd, "sam_prompt_encoder."),
        "sam_mask_decoder": convert_mask_decoder(
            sd, "sam_mask_decoder.",
            pred_obj_scores=cfg.pred_obj_scores,
            pred_obj_scores_mlp=cfg.pred_obj_scores_mlp,
            use_high_res_features=cfg.use_high_res_features_in_sam),
        "memory_encoder": convert_memory_encoder(sd, "memory_encoder."),
        "memory_attention": convert_memory_attention(sd, "memory_attention."),
        "maskmem_tpos_enc": sd["maskmem_tpos_enc"][:, 0, 0, :],
        "no_mem_embed": sd["no_mem_embed"][0, 0],
        "no_mem_pos_enc": sd["no_mem_pos_enc"][0, 0],
    }
    if "no_obj_ptr" in sd:
        out["no_obj_ptr"] = sd["no_obj_ptr"][0]
    if cfg.use_obj_ptrs_in_encoder:
        if cfg.use_mlp_for_obj_ptr_proj:
            out["obj_ptr_proj"] = _mlp(sd, "obj_ptr_proj", 3)
        else:
            out["obj_ptr_proj"] = _lin(sd, "obj_ptr_proj")
        if "mask_downsample.weight" in sd:
            out["mask_downsample"] = _conv(sd, "mask_downsample")
    return out


def torch_sd_to_numpy(module_or_sd):
    """torch module/state_dict -> {name: float32 numpy}."""
    sd = (module_or_sd.state_dict()
          if hasattr(module_or_sd, "state_dict") else module_or_sd)
    return {k: np.asarray(v.detach().cpu().float().numpy()) if hasattr(v, "detach")
            else np.asarray(v) for k, v in sd.items()}
