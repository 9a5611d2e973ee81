"""The NTTT matching pipeline, TPU-native.

Rebuild of reference no_time_to_train/models/Sam2MatchingBaseline_noAMG.py.
Key re-designs vs the reference (cited inline):

  * The serial point-prompt microbatch loop (:409-422) becomes a single jitted
    decode: `lax.map` over static prompt chunks inside one XLA program — no
    host round trips, image features broadcast (not expanded/copied).
  * The post-decode pipeline — IoU filter (:428-431), top-k class gate
    (:603-611), mask->box + class NMS (:614-629), positive filter, semantic
    IoS decay (:668-672), top-`num_out_instance` — runs fully on device with
    padded static shapes + validity masks.
  * The final antialiased upsample to the original image size (:657-663) is
    split: score-relevant quantities (IoS) are computed at a static analysis
    resolution (aspect-ratio cancels in intersection-over-self), while the
    ≤num_out_instance winning masks are shipped to the host as low-res logits
    and resized exactly there (data layer), which is both faster and avoids
    dynamic shapes on device.

Phases mirror the reference CLI: fill_memory -> postprocess_memory -> test.
"""
from dataclasses import dataclass

import numpy as np
import jax
import jax.numpy as jnp

from no_time_to_train_tpu.config.presets import ENCODER_PRESETS
from no_time_to_train_tpu.models.sam2.model import SAM2
from no_time_to_train_tpu.models.dino import DinoV2
from no_time_to_train_tpu.models.matching import memory_bank as mb
from no_time_to_train_tpu.models.matching import scoring
from no_time_to_train_tpu.ops.resize import resize, resize_hw
from no_time_to_train_tpu.ops.masks import batched_mask_to_box
from no_time_to_train_tpu.ops.nms import batched_nms, take_first_kept

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


@dataclass(frozen=True)
class MatchingConfig:
    """sam2_infer_cfgs of the reference experiment YAMLs
    (new_exps/coco_fewshot_10shot_Sam2L.yaml:10-18)."""
    points_per_side: int = 32
    testing_point_bs: int = 256          # decode chunk (device-internal)
    iou_thr: float = 0.4
    nms_thr: float = 0.5
    num_out_instance: int = 100
    kmeans_k: int = 4
    n_pca_components: int = 3
    cls_num_per_mask: int = 1
    with_negative_refs: bool = False
    neg_sigma: float = 0.8
    expand_ratio: int = 8
    analysis_res: int = 256              # static res for IoS (see module doc)
    # 256 == the decoder's native low-res mask size, so the IoS binarization
    # needs NO upsample at all (the [800, 512, 512] bilinear map + layout
    # copies + 4x-larger intersection GEMM profiled ~8 ms/step at 512).
    # Intersection/self-area ratios are scale-invariant up to boundary
    # quantization; measured decay-factor delta vs the reference's
    # original-size computation: 7e-4 at 256 vs 4e-4 at 512 (blobby-mask
    # differential, tests/test_pipeline_e2e.py::test_semantic_ios_aspect_*).
    compute_dtype: str = "float32"       # encoders may run bfloat16
    decoder_impl: str = "dense"          # "dense" (reference-shaped, XLA-fused)
    # or "factored" (rank-factored image side, models/sam2/factored_decode.py;
    # measured ~same speed at P=256 on v5e — the [P,n,r] factor traffic offsets
    # the saved [P,n,C] projections; kept as a verified alternative)
    attention_impl: str = "pallas"       # "pallas" or "xla": SDPA backend for
    # long-sequence attention (Hiera global blocks, decoder image side) —
    # the reference's first-class flash-attn toggle
    # (sam2/modeling/sam/transformer.py:23-41). See ops/attention.py.
    encoder_quant: str = "none"          # "int8": W8A8 encoder GEMMs
    # (DINO + Hiera towers, ops/quant.py) on the int8 MXU path — opt-in;
    # AP impact unvalidated without real data, so "none" stays default.


def _normalize(img):
    return (img - IMAGENET_MEAN) / IMAGENET_STD


def grid_points(points_per_side, sam_input_size):
    """Reference _get_grid_points (:335-353): pps^2 (x, y) points + 0.5."""
    a = np.linspace(0, sam_input_size - 1, points_per_side, dtype=np.float32)
    yy, xx = np.meshgrid(a, a, indexing="ij")
    pts = np.stack([xx.reshape(-1), yy.reshape(-1)], axis=-1) + 0.5
    return jnp.asarray(pts)


def _param_shapes_cached(init_fn, key, cache_tag=None):
    """eval_shape traces the full model in Python (~1 min for SAM2-L on this
    host); cache the resulting shape tree on disk keyed by the config tag."""
    import hashlib
    import os
    import pickle
    path = None
    if cache_tag is not None:
        d = os.path.expanduser("~/.cache/nttt_param_shapes")
        os.makedirs(d, exist_ok=True)
        digest = hashlib.sha1(repr(cache_tag).encode()).hexdigest()[:16]
        path = os.path.join(d, f"{digest}.pkl")
        if os.path.exists(path):
            try:
                with open(path, "rb") as f:
                    flat, treedef_bytes = pickle.load(f)
                import jax.tree_util as jtu
                treedef = pickle.loads(treedef_bytes)
                return jtu.tree_unflatten(
                    treedef, [jax.ShapeDtypeStruct(s, d) for s, d in flat])
            except Exception:
                pass
    shapes = jax.eval_shape(init_fn, key)["params"]
    if path is not None:
        try:
            import jax.tree_util as jtu
            leaves, treedef = jtu.tree_flatten(shapes)
            with open(path, "wb") as f:
                pickle.dump(([(l.shape, l.dtype) for l in leaves],
                             pickle.dumps(treedef)), f)
        except Exception:
            pass
    return shapes


def _random_params_like(init_fn, key, seed, cache_tag=None):
    """Random params via eval_shape + host numpy (running flax `init` un-jitted
    dispatches thousands of tiny ops to the device — pathological through a
    remote-TPU tunnel; shapes are all we need for random weights). Norm scales
    and layer-scale gammas init to 1, biases to 0, everything else He-ish."""
    shapes = _param_shapes_cached(init_fn, key, cache_tag)
    rng = np.random.default_rng(seed)
    flat = jax.tree_util.tree_flatten_with_path(shapes)
    leaves = []
    for path, s in flat[0]:
        names = [str(getattr(k, "key", k)).lower() for k in path]
        name = names[-1]
        parent = names[-2] if len(names) > 1 else ""
        if (("norm" in parent or "layernorm" in parent) and name == "weight") \
                or "gamma" in name or "layer_scale" in name:
            arr = np.ones(s.shape)
        elif "bias" in name:
            arr = np.zeros(s.shape)
        else:
            fan_in = int(np.prod(s.shape[:-1])) or 1
            arr = rng.standard_normal(s.shape) / np.sqrt(max(fan_in, 1))
        leaves.append(arr.astype(s.dtype))
    return jax.tree_util.tree_unflatten(flat[1], leaves)


class NoAMGMatcher:
    """Host-side orchestrator owning params + bank + jitted phase functions."""

    def __init__(self, sam2_cfg="sam2_hiera_l.yaml",
                 encoder_cfg="dinov2_large",
                 matching: MatchingConfig = MatchingConfig(),
                 n_classes=20, memory_length=10,
                 sam2_params=None, dino_params=None, seed=0,
                 bank_dtype=jnp.float32):
        if isinstance(sam2_cfg, str):
            from no_time_to_train_tpu.config.hydra_yaml import resolve_sam2_cfg
            sam2_cfg = resolve_sam2_cfg(sam2_cfg)
        self.sam2_cfg = sam2_cfg
        self.enc_cfg = (ENCODER_PRESETS[encoder_cfg]
                        if isinstance(encoder_cfg, str) else encoder_cfg)
        self.matching = matching
        from no_time_to_train_tpu.utils.cache import enable_compilation_cache
        enable_compilation_cache()
        from no_time_to_train_tpu.ops.attention import set_default_impl
        set_default_impl(matching.attention_impl)
        dtype = jnp.dtype(matching.compute_dtype)
        self.sam2 = SAM2(self.sam2_cfg, dtype=dtype,
                         encoder_quant=matching.encoder_quant)
        if self.enc_cfg.family == "dinov3":
            from no_time_to_train_tpu.models.dino_v3 import DinoV3
            gated = "plus" in self.enc_cfg.hf_model_name \
                or "huge" in self.enc_cfg.name
            self.dino = DinoV3(self.enc_cfg, use_gated_mlp=gated, dtype=dtype,
                               quant=matching.encoder_quant)
        else:
            self.dino = DinoV2(self.enc_cfg, dtype=dtype,
                               quant=matching.encoder_quant)

        import time
        key = jax.random.PRNGKey(seed)
        self.init_timings = {}
        t0 = time.time()
        if sam2_params is None:
            s = self.sam2_cfg.image_size
            sam2_params = _random_params_like(
                lambda k: self.sam2.init(k, jnp.zeros((1, s, s, 3)),
                                         method=self.sam2.init_everything),
                key, seed, cache_tag=("sam2", repr(self.sam2_cfg)))
        if dino_params is None:
            e = self.enc_cfg.img_size
            dino_params = _random_params_like(
                lambda k: self.dino.init(k, jnp.zeros((1, e, e, 3))),
                key, seed + 1,
                cache_tag=("dino", repr(self.enc_cfg), type(self.dino).__name__))
        # Params live on device permanently (numpy leaves would be re-uploaded
        # on EVERY execute — catastrophic over a remote-TPU link). Float
        # leaves are pre-cast to the compute dtype: flax's promote_dtype
        # would convert f32->bf16 at every use anyway (same rounding), but
        # storing them f32 makes XLA feed f32 weight operands into the
        # encoder GEMM custom-calls, which then run fp32 MXU passes at ~1/3
        # the bf16 rate (profiled: 82 vs 205 TF/s) and double weight HBM.
        def _to_device(tree):
            def leaf(a):
                if isinstance(a, np.ndarray):
                    # cast on host (ml_dtypes round-to-nearest-even, same
                    # rounding as the XLA convert): halves the upload bytes
                    # through the remote-TPU tunnel and avoids one device
                    # dispatch per leaf
                    if dtype != jnp.float32 and jnp.issubdtype(a.dtype,
                                                               jnp.floating):
                        a = a.astype(np.dtype(dtype))
                    return a
                a = jnp.asarray(a)
                if dtype != jnp.float32 and jnp.issubdtype(a.dtype,
                                                           jnp.floating):
                    a = a.astype(dtype)
                return a
            # packed upload: ONE transfer per dtype instead of one per leaf
            # (the leaf-wise upload measured 339 s for the flagship pair
            # through the tunnel, ~10x the link's bandwidth bound;
            # utils/transfer.py)
            from no_time_to_train_tpu.utils.transfer import packed_device_put
            return packed_device_put(jax.tree.map(leaf, tree))

        self.init_timings["param_init_s"] = time.time() - t0
        t0 = time.time()
        self.sam2_params = _to_device(sam2_params)
        self.dino_params = _to_device(dino_params)
        # host cast + transfer DISPATCH only: device_put is async, the wire
        # transfer itself overlaps whatever runs next (bench.py fences it
        # separately to attribute the tunnel-upload leg)
        self.init_timings["cast_device_put_s"] = time.time() - t0

        gs = self.enc_cfg.grid_size
        self.bank = mb.create(n_classes, memory_length, gs * gs,
                              self.enc_cfg.feat_dim, matching.kmeans_k,
                              matching.n_pca_components, dtype=bank_dtype)
        self.bank_neg = (mb.create(n_classes, memory_length, gs * gs,
                                   self.enc_cfg.feat_dim, matching.kmeans_k,
                                   matching.n_pca_components, dtype=bank_dtype)
                         if matching.with_negative_refs else None)

        self._fill_jit = jax.jit(self._fill_features)
        self._test_jit = jax.jit(self._test_impl,
                                 static_argnames=("with_negative",))
        def _batched(sam2_params, dino_params, bank, bank_neg, imgs,
                     with_negative=False):
            def one(img):
                return self._test_impl(sam2_params, dino_params, bank,
                                       bank_neg, img,
                                       with_negative=with_negative)
            return jax.vmap(one)(imgs)

        self._test_batch_jit = jax.jit(_batched,
                                       static_argnames=("with_negative",))
        self._aot_exec = None
        self._aot_img_shape = None

    # ------------------------------------------------------------------- aot
    def _aot_step_fn(self):
        """The positive-bank test step in the 4-arg signature the serialized
        executable is exported with (utils/aot.py)."""
        def fn(sam2_params, dino_params, bank, img):
            return self._test_impl(sam2_params, dino_params, bank, bank, img,
                                   with_negative=False)
        return fn

    def _aot_extra(self):
        """Config tag folded into the AOT fingerprint: everything that
        changes the traced program but not the package source."""
        return repr((self.matching, repr(self.sam2_cfg), self.enc_cfg,
                     jax.tree.map(lambda a: (a.shape, str(a.dtype)),
                                  self.bank)))

    def enable_aot(self, path=None, export_on_miss=False):
        """Swap the single-image test step to a pre-serialized compiled TPU
        executable (utils/aot.py), skipping jit compilation entirely on a
        cold start. Falls back silently to jit when the artifact is absent
        or was built for a different source/config/topology. Returns
        "loaded" | "exported" | "jit".

        With export_on_miss, a missing/stale artifact is (re)built in place:
        one lower+compile (cheap against the persistent XLA cache this
        process would have paid anyway) + serialize, so the NEXT cold start
        loads in seconds. The negative-refs config keeps the 5-arg jit path
        (the exported signature carries the positive bank only)."""
        if self.matching.with_negative_refs:
            return "jit"
        from no_time_to_train_tpu.utils import aot
        path = path or aot.DEFAULT_PATH
        extra = self._aot_extra()
        ex = aot.load_step(path, extra=extra)
        s = self.sam2_cfg.image_size
        self._aot_img_shape = (s, s, 3)
        if ex is not None:
            self._aot_exec = ex
            return "loaded"
        if export_on_miss:
            img = np.zeros(self._aot_img_shape, np.float32)
            self._aot_exec = aot.export_step(
                self._aot_step_fn(),
                (self.sam2_params, self.dino_params, self.bank, img),
                path, extra=extra)
            return "exported"
        return "jit"

    # ------------------------------------------------------------------ fill
    def _fill_features(self, dino_params, ref_imgs, ref_masks):
        """ref_imgs [S, H, W, 3] in [0,1]; ref_masks [S, Hm, Wm] float.
        -> feats [S, N, D], masks [S, N] (reference forward_fill_memory
        :446-469)."""
        e = self.enc_cfg.img_size
        gs = self.enc_cfg.grid_size
        imgs = resize(ref_imgs, (e, e), mode="bicubic")
        imgs = _normalize(imgs)
        feats = self.dino.apply({"params": dino_params},
                                imgs.astype(self.dino.dtype))
        feats = feats.astype(jnp.float32)
        masks = resize_hw(ref_masks.astype(jnp.float32), (gs, gs),
                          mode="nearest")
        return feats, masks.reshape(masks.shape[0], -1)

    def fill_memory(self, ref_imgs, ref_masks, cat_inds, positive=True):
        feats, masks = self._fill_jit(self.dino_params, jnp.asarray(ref_imgs),
                                      jnp.asarray(ref_masks))
        target = self.bank if positive else self.bank_neg
        updated = mb.fill(target, jnp.asarray(cat_inds, jnp.int32), feats,
                          masks)
        # the reference raises IndexError when more refs than memory_length
        # arrive for a class; JAX scatter would silently drop the write, so
        # fail loudly host-side instead (matching_baseline_utils.py:578 slot
        # indexing semantics).
        max_count = int(np.asarray(updated.fill_counts).max())
        if max_count > updated.feats.shape[1]:
            raise IndexError(
                f"memory bank overflow: a class received {max_count} "
                f"references but memory_length={updated.feats.shape[1]}")
        if positive:
            self.bank = updated
        else:
            self.bank_neg = updated

    def postprocess_memory(self, positive=True):
        if positive:
            self.bank = mb.postprocess(self.bank)
        else:
            self.bank_neg = mb.postprocess(self.bank_neg)

    # ------------------------------------------------------------------ test
    def _decode_grid(self, sam2_params, img_1024):
        """Hiera + FPN once, then chunked batched decode over the full point
        grid. Returns (lr_masks [P, 256, 256] in the compute dtype — every
        consumer binarizes or casts to fp16, both exact from bf16 —
        pred_ious [P], points [P, 2])."""
        m = self.matching
        cfg = self.sam2_cfg
        s = cfg.image_size

        backbone = self.sam2.apply({"params": sam2_params},
                                   _normalize(img_1024)[None].astype(self.sam2.dtype),
                                   method=self.sam2.forward_image)
        fpn = backbone["backbone_fpn"]
        feats = fpn[-1]                      # [1, 64, 64, 256]
        hr = [fpn[0], fpn[1]]                # [1, 256, 256, 32], [1, 128, 128, 64]

        pts = grid_points(m.points_per_side, s)
        n_pts = pts.shape[0]
        chunk = min(m.testing_point_bs, n_pts)
        assert n_pts % chunk == 0
        pts_chunks = pts.reshape(n_pts // chunk, chunk, 1, 2)

        if m.decoder_impl == "factored":
            from no_time_to_train_tpu.models.sam2.factored_decode import (
                factored_best_of_multimask)

            def decode_chunk(pc):
                labels = jnp.ones((chunk, 1), jnp.int32)
                sparse, dense1, dense_pe = self.sam2.apply(
                    {"params": sam2_params}, pc, labels,
                    method=self.sam2.prompt_embeddings)
                mask, iou = factored_best_of_multimask(
                    sam2_params["sam_mask_decoder"], feats, dense_pe,
                    sparse, dense1, hr,
                    pred_obj_scores=cfg.pred_obj_scores,
                    iou_use_sigmoid=cfg.iou_prediction_use_sigmoid)
                return mask.astype(jnp.float32), iou
        else:
            def decode_chunk(pc):
                labels = jnp.ones((chunk, 1), jnp.int32)
                return self.sam2.apply(
                    {"params": sam2_params}, feats, pc, labels, hr,
                    method=self.sam2.forward_sam_heads_best)

        n_chunks = n_pts // chunk
        if n_chunks <= 8:
            # unrolled: XLA schedules/fuses across chunks (a lax.map while
            # loop serializes them and was the profiled top cost)
            outs = [decode_chunk(pts_chunks[i]) for i in range(n_chunks)]
            lr = jnp.concatenate([o[0] for o in outs], axis=0)
            ious = jnp.concatenate([o[1] for o in outs], axis=0)
        else:
            lr, ious = jax.lax.map(decode_chunk, pts_chunks)
            lr = lr.reshape(n_pts, *lr.shape[-2:])
            ious = ious.reshape(-1)
        return lr, ious, pts

    def _test_impl(self, sam2_params, dino_params, bank, bank_neg, tar_img,
                   with_negative=False):
        """tar_img: [S, S, 3] in [0,1] (square, dataset-resized). Returns
        padded result dict (reference forward_test :562-698)."""
        m = self.matching
        e = self.enc_cfg.img_size
        gs = self.enc_cfg.grid_size

        # DINO features (reference _extract_target_features :511-532)
        enc_in = resize(tar_img[None], (e, e), mode="bicubic")
        tar_feat = self.dino.apply({"params": dino_params},
                                   _normalize(enc_in).astype(self.dino.dtype))
        tar_feat = tar_feat.astype(jnp.float32)[0]     # [gs*gs, D]

        # SAM grid decode
        lr, pred_ious, pts = self._decode_grid(sam2_params, tar_img)
        n_masks = lr.shape[0]
        lr_res = lr.shape[-1]
        valid = pred_ious > m.iou_thr                  # (:428-431)

        # DINO grid -> mask resolution (reference _process_sam_masks :534-560)
        feat_sp = resize(tar_feat.reshape(gs, gs, -1)[None], (lr_res, lr_res),
                         mode="bilinear", antialias=True)[0]
        feat_sp = feat_sp.reshape(lr_res * lr_res, -1).astype(self.sam2.dtype)
        masks_bool = (lr > 0).reshape(n_masks, -1)

        n_classes = bank.feats_ins_avg.shape[0]
        if with_negative:
            sim, obj_feats = scoring.sim_global_avg_with_neg(
                feat_sp, masks_bool, bank.feats_avg, bank_neg.feats_ins_avg,
                sigma=m.neg_sigma)
        else:
            sim, obj_feats = scoring.sim_global_avg(feat_sp, masks_bool,
                                                    bank.feats_ins_avg)

        k = n_classes if m.cls_num_per_mask == -1 else m.cls_num_per_mask
        top_scores, labels = jax.lax.top_k(sim, k)     # (:605)
        if k == n_classes:
            gate = top_scores > top_scores[:, 0:1] * 0.6
            top_scores = top_scores * gate             # (:607-609)
        labels = labels.reshape(-1)
        scores_all = top_scores.reshape(-1)

        lr_boxes = batched_mask_to_box(lr > 0).astype(jnp.float32)
        boxes_exp = jnp.repeat(lr_boxes, k, axis=0)
        ious_exp = jnp.repeat(pred_ious, k, axis=0)
        valid_exp = jnp.repeat(valid, k, axis=0)

        order, keep = batched_nms(boxes_exp, ious_exp, labels, valid_exp,
                                  m.nms_thr)           # (:621-629)
        out_num = min(m.num_out_instance * m.expand_ratio, n_masks * k)
        sel, sel_valid = take_first_kept(order, keep, out_num)

        scores_out = scores_all[sel]
        labels_out = labels[sel]
        mask_idx = sel // k
        sel_valid = sel_valid & (scores_out > 0.0)     # positive filter (:637)

        # IoS decay at static analysis resolution (see module docstring)
        ar = m.analysis_res
        lr_sel = lr[mask_idx]
        n_sel = lr_sel.shape[0]
        if ar == lr_res:
            # native mask resolution: binarize directly, no resize
            bin_up = (lr_sel > 0).reshape(n_sel, ar * ar)
        else:
            sub = 8
            pad = (-n_sel) % sub
            lr_pad = jnp.pad(lr_sel, ((0, pad), (0, 0), (0, 0)))
            bin_up = jax.lax.map(
                lambda x: resize_hw(x, (ar, ar), mode="bilinear") > 0,
                lr_pad.reshape(-1, sub, lr_res, lr_res))
            bin_up = bin_up.reshape(n_sel + pad, ar * ar)[:n_sel]

        obj_out = obj_feats[mask_idx]
        obj_sim = jnp.clip(obj_out @ obj_out.T, 0.0)
        ios = scoring.semantic_ios(bin_up, labels_out, obj_sim, valid=sel_valid)
        scores_out = scores_out * jnp.sqrt(jnp.clip(1.0 - ios, 0.0))  # (:668-672)

        final_n = min(m.num_out_instance, n_sel)
        ranked = jnp.argsort(jnp.where(sel_valid, -scores_out, jnp.inf),
                             stable=True)[:final_n]
        f_valid = sel_valid[ranked]
        return dict(
            lr_logits=lr_sel[ranked].astype(jnp.float16),
            scores=jnp.where(f_valid, scores_out[ranked], 0.0),
            labels=labels_out[ranked],
            pred_ious=pred_ious[mask_idx][ranked],
            valid=f_valid,
        )

    def test(self, tar_img):
        """tar_img: [S, S, 3] float in [0,1]. Returns numpy dict with
        `lr_logits` [K, 256, 256] (host resizes to original size), `scores`,
        `labels`, `valid`.

        Device->host traffic is the second cost after compute on a remote-TPU
        link, so only the valid prefix of the mask logits is fetched (winners
        are score-sorted, so valid entries form a prefix)."""
        return self.fetch_test(self.test_async(tar_img))

    def test_async(self, tar_img):
        """Submit one test step; returns device-resident outputs (does not
        block). Pair with fetch_test to pipeline host transfer with the next
        image's compute. Dispatches to the AOT-loaded executable when
        enable_aot() armed one (identical program, zero compile)."""
        with_neg = self.matching.with_negative_refs
        img = jnp.asarray(tar_img)
        if (self._aot_exec is not None and not with_neg
                and tuple(img.shape) == self._aot_img_shape
                and img.dtype == jnp.float32):
            try:
                return self._aot_exec(self.sam2_params, self.dino_params,
                                      self.bank, img)
            except Exception as e:  # aval/topology skew: revert permanently
                import sys
                print(f"[aot] executable call failed "
                      f"({type(e).__name__}: {e}); reverting to jit",
                      file=sys.stderr)
                self._aot_exec = None
        return self._test_jit(self.sam2_params, self.dino_params, self.bank,
                              self.bank_neg if with_neg else self.bank,
                              img, with_negative=with_neg)

    def test_batch_async(self, tar_imgs):
        """Batched variant: [B, S, S, 3] images in one jit step (vmapped) —
        amortizes per-step overhead on a single chip and is the per-device
        unit under data parallelism (parallel/mesh.py)."""
        with_neg = self.matching.with_negative_refs
        return self._test_batch_jit(
            self.sam2_params, self.dino_params, self.bank,
            self.bank_neg if with_neg else self.bank,
            jnp.asarray(tar_imgs), with_negative=with_neg)

    def fetch_test(self, out):
        valid = np.asarray(out["valid"])
        n = int(valid.sum())
        k = valid.shape[0]
        lr = np.zeros((k,) + out["lr_logits"].shape[1:], np.float16)
        if n > 0:
            lr[:n] = np.asarray(out["lr_logits"][:n])
        return dict(lr_logits=lr, scores=np.asarray(out["scores"]),
                    labels=np.asarray(out["labels"]),
                    pred_ious=np.asarray(out["pred_ious"]), valid=valid)


def finalize_records(out, ori_h, ori_w):
    """Fused host-side finalization of one image's padded device output:
    per winning mask, ONE native pass upsamples the low-res logits to the
    original size, binarizes, RLE-encodes (COCO counts string) and computes
    the XYXY box — without ever materializing the full-resolution mask
    (native/nttt_native.cpp finalize_mask; byte-identical to
    finalize_results + rle encode, ~7x faster). Returns
    dict(segs, bboxes, scores, labels) or None when the native lib is
    unavailable (callers fall back to finalize_results)."""
    from no_time_to_train_tpu.utils import native
    if not native.has_finalize():
        return None
    lr = out["lr_logits"].shape[-1]
    if ori_h < lr or ori_w < lr:
        # downscale needs the antialiased matrix path (finalize_results)
        return None
    valid = np.asarray(out["valid"])
    n = int(valid.sum())
    logits = np.asarray(out["lr_logits"][:n], np.float32)
    scores = np.asarray(out["scores"][:n], np.float32)
    labels = np.asarray(out["labels"][:n])
    segs, bboxes = [], np.zeros((n, 4), np.float32)
    for i in range(n):
        counts, box, _ = native.finalize_mask(logits[i], ori_h, ori_w)
        segs.append({"size": [ori_h, ori_w], "counts": counts})
        bboxes[i] = box
    return dict(segs=segs, bboxes=bboxes, scores=scores, labels=labels)


def finalize_results(out, ori_h, ori_w, exact_resize=False):
    """Host-side finalization of one image's padded device output: upsample
    the winning low-res mask logits to the original size (reference
    antialiased-bilinear + >0, :657-663), compute XYXY boxes, and drop padding.

    exact_resize=True uses the torch-parity separable-matmul weights
    (ops/resize.resize_matrix) — bit-matching the reference but slower on
    host; the default uses cv2 INTER_LINEAR, identical for upsampling (the
    antialias flag only affects downscales) and within boundary-pixel noise
    otherwise.
    """
    from no_time_to_train_tpu.ops.resize import _resize_matrix_np

    valid = np.asarray(out["valid"])
    n = int(valid.sum())
    logits = np.asarray(out["lr_logits"][:n], np.float32)
    scores = np.asarray(out["scores"][:n], np.float32)
    labels = np.asarray(out["labels"][:n])
    if n == 0:
        return dict(binary_masks=np.zeros((0, ori_h, ori_w), bool),
                    bboxes=np.zeros((0, 4), np.float32),
                    scores=scores, labels=labels)

    lr = logits.shape[-1]
    if exact_resize or ori_h < lr or ori_w < lr:
        wh = _resize_matrix_np(lr, ori_h, "bilinear",
                               ori_h < lr).astype(np.float32)
        ww = _resize_matrix_np(lr, ori_w, "bilinear",
                               ori_w < lr).astype(np.float32)
        up = np.einsum("oh,nhw->now", wh, logits)
        up = np.einsum("ow,nhw->nho", ww, up)
        masks = up > 0
    else:
        from no_time_to_train_tpu.utils import native
        masks = native.upsample_binarize(logits, ori_h, ori_w) \
            if native.available() else None
        if masks is None:
            import cv2
            masks = np.stack([
                cv2.resize(m, (ori_w, ori_h),
                           interpolation=cv2.INTER_LINEAR) > 0
                for m in logits])

    # boxes on the ori-res binary masks (amg.py batched_mask_to_box
    # semantics), via any-reductions — 15x faster than a per-mask
    # np.nonzero loop (174 -> 12 ms for 100 masks at 480x640)
    masks = np.ascontiguousarray(masks)
    rows = masks.any(axis=2)
    cols = masks.any(axis=1)
    has = rows.any(axis=1)
    y0 = rows.argmax(axis=1)
    y1 = ori_h - 1 - rows[:, ::-1].argmax(axis=1)
    x0 = cols.argmax(axis=1)
    x1 = ori_w - 1 - cols[:, ::-1].argmax(axis=1)
    bboxes = np.where(has[:, None],
                      np.stack([x0, y0, x1, y1], 1).astype(np.float32), 0.0)
    return dict(binary_masks=masks, bboxes=bboxes, scores=scores,
                labels=labels)
