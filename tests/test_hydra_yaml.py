"""Hydra-YAML ingestion for SAM2 topologies (config/hydra_yaml.py): the
reference composes arbitrary `_target_` trees (sam2/build_sam.py:34-36);
parsing its stock YAMLs must reproduce the presets exactly, and a user
variant YAML must build without belonging to the preset dict."""
import os

import pytest
import yaml

from no_time_to_train_tpu.config.hydra_yaml import (load_sam2_yaml,
                                                    resolve_sam2_cfg)
from no_time_to_train_tpu.config.presets import SAM2_PRESETS

REF_CFG_DIR = "/root/reference/sam2_configs"

needs_ref = pytest.mark.skipif(not os.path.isdir(REF_CFG_DIR),
                               reason="reference configs not present")


@needs_ref
@pytest.mark.parametrize("name", ["sam2_hiera_t.yaml", "sam2_hiera_s.yaml",
                                  "sam2_hiera_b+.yaml", "sam2_hiera_l.yaml"])
def test_reference_yaml_matches_preset(name):
    got = load_sam2_yaml(os.path.join(REF_CFG_DIR, name))
    assert got == SAM2_PRESETS[name]


@needs_ref
def test_resolve_prefers_preset_then_disk(tmp_path):
    # preset basename wins even with a bogus directory prefix
    assert resolve_sam2_cfg("/nonexistent/sam2_hiera_s.yaml") == \
        SAM2_PRESETS["sam2_hiera_s.yaml"]
    # non-preset name falls through to disk parsing
    p = os.path.join(REF_CFG_DIR, "sam2_hiera_s.yaml")
    import shutil
    q = tmp_path / "my_variant.yaml"
    shutil.copy(p, q)
    assert resolve_sam2_cfg(str(q)) == SAM2_PRESETS["sam2_hiera_s.yaml"]
    with pytest.raises(KeyError):
        resolve_sam2_cfg("no_such_topology.yaml")


def test_custom_variant_builds(tmp_path):
    """A user-supplied topology (different dims/stages/window spec/memory
    geometry) parses into a coherent Sam2Config."""
    tree = {"model": {
        "_target_": "sam2.modeling.sam2_base.SAM2Base",
        "image_encoder": {
            "_target_": "sam2.modeling.backbones.image_encoder.ImageEncoder",
            "scalp": 1,
            "trunk": {
                "_target_": "sam2.modeling.backbones.hieradet.Hiera",
                "embed_dim": 64, "num_heads": 2, "stages": [1, 2, 4, 2],
                "global_att_blocks": [3, 5, 7],
                "window_pos_embed_bkg_spatial_size": [7, 7],
                "window_spec": [4, 2, 8, 4]},
            "neck": {
                "_target_":
                    "sam2.modeling.backbones.image_encoder.FpnNeck",
                "position_encoding": {"num_pos_feats": 256},
                "d_model": 256,
                "backbone_channel_list": [512, 256, 128, 64],
                "fpn_top_down_levels": [2, 3],
                "fpn_interp_model": "nearest"}},
        "memory_attention": {
            "num_layers": 2,
            "layer": {"dim_feedforward": 1024,
                      "self_attention": {"feat_sizes": [16, 16]},
                      "cross_attention": {"kv_in_dim": 32}}},
        "memory_encoder": {"out_dim": 32},
        "num_maskmem": 5, "image_size": 512,
        "use_high_res_features_in_sam": True,
        "compile_image_encoder": False,
    }}
    p = tmp_path / "variant.yaml"
    p.write_text(yaml.safe_dump(tree))
    cfg = load_sam2_yaml(str(p))
    assert cfg.embed_dim == 64 and cfg.stages == (1, 2, 4, 2)
    assert cfg.window_spec == (4, 2, 8, 4)
    assert cfg.backbone_channel_list == (512, 256, 128, 64)
    assert cfg.mem_attn_layers == 2 and cfg.mem_attn_dim_feedforward == 1024
    assert cfg.mem_dim == 32 and cfg.rope_feat_sizes == (16, 16)
    assert cfg.mem_enc_out_dim == 32
    assert cfg.num_maskmem == 5 and cfg.image_size == 512
    # baked-in video-predictor overrides survive (build_sam.py:57-67)
    assert cfg.binarize_mask_from_pts_for_mem_enc and cfg.fill_hole_area == 8


def test_unknown_model_key_raises(tmp_path):
    p = tmp_path / "bad.yaml"
    p.write_text(yaml.safe_dump(
        {"model": {"not_a_sam2_flag": 1}}))
    with pytest.raises(ValueError, match="not_a_sam2_flag"):
        load_sam2_yaml(str(p))


def test_unknown_trunk_key_raises(tmp_path):
    p = tmp_path / "bad2.yaml"
    p.write_text(yaml.safe_dump(
        {"model": {"image_encoder": {"trunk": {"mystery_dim": 7}}}}))
    with pytest.raises(ValueError, match="mystery_dim"):
        load_sam2_yaml(str(p))
