"""Load reference torch modules from /root/reference as parity oracles.

The reference's `sam2/__init__.py` initializes hydra (not installed here), so we
synthesize namespace packages pointing at the reference tree and import leaf
modules directly. The reference is used ONLY as a numerical oracle in tests —
none of its code ships in this package.
"""
import sys
import types
from pathlib import Path

REF = Path("/root/reference")


def reference_available() -> bool:
    return (REF / "sam2" / "modeling" / "sam2_base.py").exists()


def _ensure_pkg(name: str, path: Path):
    if name in sys.modules:
        return sys.modules[name]
    mod = types.ModuleType(name)
    mod.__path__ = [str(path)]
    mod.__package__ = name
    sys.modules[name] = mod
    return mod


def install_reference_shim():
    """Register `sam2.*` / `no_time_to_train.*` namespaces without running
    their __init__ (which requires hydra), then make leaf imports work."""
    if not reference_available():
        raise RuntimeError("reference repo not mounted at /root/reference")
    _ensure_pkg("sam2", REF / "sam2")
    _ensure_pkg("no_time_to_train", REF / "no_time_to_train")
    # sam2.utils.misc imports tqdm & PIL only; safe. modeling/__init__ is empty.
    return True


def _instantiate(node):
    """Minimal hydra-style recursive instantiation of a `_target_` tree."""
    import importlib
    if isinstance(node, dict):
        kwargs = {k: _instantiate(v) for k, v in node.items() if k != "_target_"}
        if "_target_" in node:
            mod, cls = node["_target_"].rsplit(".", 1)
            return getattr(importlib.import_module(mod), cls)(**kwargs)
        return kwargs
    if isinstance(node, list):
        return [_instantiate(v) for v in node]
    if isinstance(node, str):
        # pyyaml parses "1e-6" as str where omegaconf yields float
        try:
            return float(node) if any(c in node for c in "eE.") and \
                node.replace(".", "").replace("-", "").replace("+", "") \
                    .replace("e", "").replace("E", "").isdigit() else node
        except ValueError:
            return node
    return node


def build_ref_sam2(config_name="sam2_hiera_t.yaml", image_size=None,
                   apply_postprocessing=True, seed=0):
    """Build the reference SAM2Base from a sam2_configs YAML without hydra,
    with the video-predictor behavioral overrides (build_sam.py:57-67) and
    deterministic random weights."""
    import yaml
    import torch
    install_reference_shim()
    with open(REF / "sam2_configs" / config_name) as f:
        cfg = yaml.safe_load(f)["model"]
    if image_size is not None:
        cfg["image_size"] = image_size
    if apply_postprocessing:
        cfg.setdefault("sam_mask_decoder_extra_args", {}).update(
            dynamic_multimask_via_stability=True,
            dynamic_multimask_stability_delta=0.05,
            dynamic_multimask_stability_thresh=0.98)
        cfg["binarize_mask_from_pts_for_mem_enc"] = True
    model = _instantiate(cfg)
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in model.parameters():
            p.copy_(torch.randn(p.shape, generator=g) * 0.02)
    return model.eval()
