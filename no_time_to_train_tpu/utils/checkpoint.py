"""Checkpoint IO.

Three checkpoint kinds, mirroring the reference (SURVEY §5):
  1. SAM2 weights: torch `.pt` with `["model"]` state dict
     (sam2/build_sam.py:119-129) -> converted to flax params.
  2. Encoder (DINOv2) weights: HF snapshot / safetensors -> flax params.
  3. Memory bank: the phase checkpoints written after fill/postprocess.
     Saved as Lightning-compatible torch checkpoints when torch is available
     (state-dict keys `seg_model.memory_bank.<buffer>` — interoperable with
     the reference's --ckpt_path flow, sam2matcher_pl.py:140-142), with a
     pickle fallback.
"""
import os
import pickle

import numpy as np

BANK_FIELDS = ["fill_counts", "feats", "masks", "feats_avg", "feats_ins_avg",
               "feats_covariances", "feats_centers", "ins_sim_avg", "pca_mean",
               "pca_components", "postprocessed"]


def load_sam2_torch_checkpoint(path, cfg):
    """Reference .pt checkpoint -> flax params for models/sam2/model.SAM2."""
    import torch
    from no_time_to_train_tpu.utils.torch_convert import (convert_sam2,
                                                          torch_sd_to_numpy)
    sd = torch.load(path, map_location="cpu", weights_only=True)
    if "model" in sd:
        sd = sd["model"]
    return convert_sam2(torch_sd_to_numpy(sd), cfg)


def load_dino_checkpoint(path_or_name, enc_cfg):
    """HF model dir / hub name (cached) -> flax params for the matching
    encoder family (DINOv2 or DINOv3)."""
    if os.path.isdir(path_or_name):
        sd = _load_safetensors_dir(path_or_name)
    else:
        from transformers import AutoModel
        import torch
        with torch.no_grad():
            model = AutoModel.from_pretrained(path_or_name)
        sd = {k: v.detach().cpu().float().numpy()
              for k, v in model.state_dict().items()}
    if getattr(enc_cfg, "family", "dinov2") == "dinov3":
        from no_time_to_train_tpu.models.dino_v3 import convert_hf_dinov3
        gated = "plus" in enc_cfg.hf_model_name or "huge" in enc_cfg.name
        return convert_hf_dinov3(sd, enc_cfg, use_gated_mlp=gated)
    from no_time_to_train_tpu.models.dino import convert_hf_dinov2
    return convert_hf_dinov2(sd, enc_cfg)


def _load_safetensors_dir(path):
    from safetensors import safe_open
    sd = {}
    files = [f for f in os.listdir(path) if f.endswith(".safetensors")]
    if not files:
        import torch
        bins = [f for f in os.listdir(path) if f.endswith(".bin")]
        for b in bins:
            part = torch.load(os.path.join(path, b), map_location="cpu",
                              weights_only=True)
            sd.update({k: v.float().numpy() for k, v in part.items()})
        return sd
    for f in files:
        with safe_open(os.path.join(path, f), framework="np") as fh:
            for k in fh.keys():
                sd[k] = np.asarray(fh.get_tensor(k), np.float32)
    return sd


def save_memory_bank(path, bank, bank_neg=None):
    state = {}
    for f in BANK_FIELDS:
        state[f"seg_model.memory_bank.{f}"] = np.asarray(getattr(bank, f))
    if bank_neg is not None:
        for f in BANK_FIELDS:
            state[f"seg_model.memory_bank_neg.{f}"] = np.asarray(
                getattr(bank_neg, f))
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    try:
        import torch
        torch.save({"state_dict": {k: torch.from_numpy(v.copy())
                                   for k, v in state.items()}}, path)
    except ImportError:
        with open(path, "wb") as f:
            pickle.dump({"state_dict": state}, f)


def load_memory_bank(path, bank, bank_neg=None):
    """Restore bank pytrees from a phase checkpoint (ours or the reference's
    Lightning .ckpt)."""
    import jax.numpy as jnp
    import zipfile
    # A checkpoint written by the pickle fallback (torch absent at save time)
    # is not a torch zip archive; torch.load's legacy loader raises
    # RuntimeError / BadZipFile on it, so sniff the format first.
    is_torch_zip = zipfile.is_zipfile(path)
    state = None
    if is_torch_zip:
        try:
            import torch
            ckpt = torch.load(path, map_location="cpu", weights_only=False)
            state = {k: (v.numpy() if hasattr(v, "numpy") else np.asarray(v))
                     for k, v in ckpt["state_dict"].items()}
        except ImportError:
            raise RuntimeError(
                f"{path} is a torch-format checkpoint but torch is not "
                "installed; cannot load it")
    if state is None:
        with open(path, "rb") as f:
            state = pickle.load(f)["state_dict"]

    def restore(b, prefix):
        reps = {}
        for f in BANK_FIELDS:
            key = f"{prefix}.{f}"
            if key in state:
                cur = getattr(b, f)
                val = np.asarray(state[key])
                if f == "postprocessed":
                    val = np.asarray(val).reshape(-1)[0]
                reps[f] = jnp.asarray(val, dtype=cur.dtype)
        return b.replace(**reps)

    bank = restore(bank, "seg_model.memory_bank")
    if bank_neg is not None:
        bank_neg = restore(bank_neg, "seg_model.memory_bank_neg")
    return bank, bank_neg


def save_memory_bank_orbax(path, bank, bank_neg=None):
    """TPU-native alternative: the bank pytree via orbax (async-capable,
    shard-aware). The torch-format writer above stays the default for
    interchange with reference checkpoints."""
    import orbax.checkpoint as ocp
    payload = {"bank": {f: np.asarray(getattr(bank, f))
                        for f in BANK_FIELDS}}
    if bank_neg is not None:
        payload["bank_neg"] = {f: np.asarray(getattr(bank_neg, f))
                               for f in BANK_FIELDS}
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(os.path.abspath(path), payload, force=True)


def load_memory_bank_orbax(path, bank, bank_neg=None):
    import jax.numpy as jnp
    import orbax.checkpoint as ocp
    ckptr = ocp.PyTreeCheckpointer()
    payload = ckptr.restore(os.path.abspath(path))

    def restore(b, tree):
        reps = {}
        for f in BANK_FIELDS:
            if f in tree:
                cur = getattr(b, f)
                val = np.asarray(tree[f])
                if f == "postprocessed":
                    val = val.reshape(-1)[0] if val.ndim else val
                reps[f] = jnp.asarray(val, dtype=cur.dtype)
        return b.replace(**reps)

    bank = restore(bank, payload["bank"])
    if bank_neg is not None and "bank_neg" in payload:
        bank_neg = restore(bank_neg, payload["bank_neg"])
    return bank, bank_neg
