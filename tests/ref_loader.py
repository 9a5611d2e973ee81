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


def install_torchvision_shim():
    """Provide torchvision.ops.boxes.batched_nms / nms (pure torch) so the
    reference matching utils import without torchvision."""
    if "torchvision" in sys.modules:
        return
    import torch

    def nms(boxes, scores, iou_threshold):
        order = torch.argsort(scores, descending=True, stable=True)
        keep = []
        suppressed = torch.zeros(len(boxes), dtype=torch.bool)
        areas = (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])
        for i in order.tolist():
            if suppressed[i]:
                continue
            keep.append(i)
            lt = torch.maximum(boxes[i, :2], boxes[:, :2])
            rb = torch.minimum(boxes[i, 2:], boxes[:, 2:])
            wh = (rb - lt).clamp(min=0)
            inter = wh[:, 0] * wh[:, 1]
            union = areas[i] + areas - inter
            iou = torch.where(union > 0, inter / union, torch.zeros_like(union))
            suppressed |= iou > iou_threshold
            suppressed[i] = True  # processed (kept separately)
        return torch.tensor(keep, dtype=torch.long)

    def batched_nms(boxes, scores, idxs, iou_threshold):
        if boxes.numel() == 0:
            return torch.empty((0,), dtype=torch.long)
        max_coord = boxes.max()
        offsets = idxs.to(boxes) * (max_coord + torch.tensor(1.0).to(boxes))
        return nms(boxes + offsets[:, None], scores, iou_threshold)

    import importlib.machinery

    def _mod(name):
        m = types.ModuleType(name)
        m.__spec__ = importlib.machinery.ModuleSpec(name, None)
        m.__version__ = "0.0.0-shim"
        return m

    tv = _mod("torchvision")
    ops = _mod("torchvision.ops")
    boxes_mod = _mod("torchvision.ops.boxes")
    def box_area(boxes):
        return (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])

    boxes_mod.batched_nms = batched_nms
    boxes_mod.nms = nms
    boxes_mod.box_area = box_area
    ops.boxes = boxes_mod
    ops.batched_nms = batched_nms
    ops.nms = nms
    tv.ops = ops
    transforms_mod = _mod("torchvision.transforms")

    import torch.nn as _nn

    class Normalize(_nn.Module):
        def __init__(self, mean, std):
            super().__init__()
            self.mean, self.std = mean, std

        def forward(self, x):
            mean = torch.tensor(self.mean).view(1, -1, 1, 1).to(x)
            std = torch.tensor(self.std).view(1, -1, 1, 1).to(x)
            if x.dim() == 3:
                return (x - mean[0]) / std[0]
            return (x - mean) / std

        __call__ = _nn.Module.__call__

    class Resize(_nn.Module):
        def __init__(self, size, *a, **k):
            super().__init__()
            self.size = size if isinstance(size, (tuple, list)) else (size, size)

        def forward(self, x):
            import torch.nn.functional as TF
            squeeze = x.dim() == 3
            y = TF.interpolate(x[None] if squeeze else x,
                               size=tuple(self.size), mode="bilinear",
                               align_corners=False)
            return y.squeeze(0) if squeeze else y

    class ToTensor(_nn.Module):
        def forward(self, x):
            import numpy as _np
            return torch.from_numpy(_np.asarray(x).transpose(2, 0, 1)) / 255.0

    # SAM2Transforms torch.jit.scripts its Sequential of these shims, which
    # aren't scriptable — make script a pass-through for Modules in tests.
    _orig_script = torch.jit.script

    def _script(obj, *a, **k):
        if isinstance(obj, _nn.Module):
            return obj
        return _orig_script(obj, *a, **k)

    torch.jit.script = _script

    transforms_mod.Normalize = Normalize
    transforms_mod.Resize = Resize
    transforms_mod.ToTensor = ToTensor
    tv.transforms = transforms_mod
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.ops"] = ops
    sys.modules["torchvision.ops.boxes"] = boxes_mod
    sys.modules["torchvision.transforms"] = transforms_mod


def install_hydra_shim():
    """Fake hydra/omegaconf so modules importing sam2.build_sam load (its
    functions are monkeypatched by tests, never actually invoked)."""
    if "hydra" in sys.modules:
        return
    import importlib.machinery

    def _mod(name):
        m = types.ModuleType(name)
        m.__spec__ = importlib.machinery.ModuleSpec(name, None)
        return m

    hydra = _mod("hydra")
    hydra.compose = lambda *a, **k: (_ for _ in ()).throw(
        RuntimeError("hydra shim: compose not available"))
    hydra.initialize_config_module = lambda *a, **k: None
    hydra_utils = _mod("hydra.utils")
    hydra_utils.instantiate = lambda *a, **k: (_ for _ in ()).throw(
        RuntimeError("hydra shim: instantiate not available"))
    hydra.utils = hydra_utils
    omegaconf = _mod("omegaconf")

    class _OC:
        @staticmethod
        def resolve(cfg):
            return cfg

        @staticmethod
        def to_container(cfg, **k):
            return cfg

    omegaconf.OmegaConf = _OC
    sys.modules["hydra"] = hydra
    sys.modules["hydra.utils"] = hydra_utils
    sys.modules["omegaconf"] = omegaconf
