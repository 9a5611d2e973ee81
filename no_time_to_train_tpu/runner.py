"""Phase runner — the orchestration layer replacing the reference's
Lightning wrapper (no_time_to_train/pl_wrapper/sam2matcher_pl.py) and the
driver logic of run_lightning.py's after_test.

Modes (reference test_step dispatch, sam2matcher_pl.py:163-200):
  fill_memory / fill_memory_neg -> feature extraction + bank writes, then a
      memory checkpoint at --out_path;
  postprocess_memory / postprocess_memory_neg -> one on-device postprocess;
  test / test_support -> per-image test steps with synchronized timing, COCO
      RLE encoding, FPS report (identical format, run_lightning.py:152-161),
      optional json export, COCOeval.
"""
import copy
import json
import os
import pickle
import time

import numpy as np

from no_time_to_train_tpu.config.presets import ENCODER_PRESETS
from no_time_to_train_tpu.data.metainfo import METAINFO
from no_time_to_train_tpu.data.datasets import (COCOMemoryFillCropDataset,
                                                COCORefOracleTestDataset)
from no_time_to_train_tpu.models.matching.pipeline import (NoAMGMatcher,
                                                           MatchingConfig,
                                                           finalize_records,
                                                           finalize_results)
from no_time_to_train_tpu.utils import checkpoint as ckpt_io


def _apply_dotted_hacks(model_cfg, dataset_cfgs):
    """The reference allows dotted keys to arrive inside dicts and re-maps
    them (sam2matcher_pl.py:90-127). Generalized: any 'a.b' key in model_cfg /
    dataset_cfgs is folded into its nested dict."""
    for cfgs in (model_cfg, dataset_cfgs):
        for key in [k for k in list(cfgs) if "." in k]:
            head, tail = key.split(".", 1)
            val = cfgs.pop(key)
            if head in ("memory_bank_cfg", "sam2_infer_cfgs", "fill_memory",
                        "test", "support") and isinstance(
                            cfgs.get(head), dict):
                if tail == "cat_names" and isinstance(val, str):
                    val = val.split(",")
                if tail == "class_split":
                    cfgs[head]["cat_names"] = list(METAINFO[val])
                cfgs[head][tail] = val
            elif head == "test" and cfgs is model_cfg:
                mapping = {"imgs_path": "dataset_imgs_path",
                           "online_vis": "online_vis", "vis_thr": "vis_thr"}
                model_cfg[mapping.get(tail, tail)] = val
            else:
                cfgs[key] = val  # leave unknown keys visible
    return model_cfg, dataset_cfgs


def get_dataset(dataset_cfg, stage):
    """Stage -> dataset class map (sam2matcher_pl.py:42-69)."""
    cfg = dict(dataset_cfg)
    name = cfg.pop("name", None)
    assert name in ("coco",), f"unknown dataset {name}"
    if stage in ("fill_memory", "vis_memory", "fill_memory_neg"):
        # test-grid key; the fill dataset class does not accept it
        cfg.pop("n_points_per_edge", None)
        if stage != "fill_memory":
            cfg["custom_data_mode"] = stage
        return COCOMemoryFillCropDataset(**cfg)
    if stage in ("test", "test_support"):
        if stage == "test_support":
            cfg["custom_data_mode"] = stage
        return COCORefOracleTestDataset(**cfg)
    raise NotImplementedError(stage)


class MatcherRunner:
    def __init__(self, model_cfg, dataset_cfgs, data_load_cfgs=None,
                 test_mode="none", seed=42, devices=1, save_dir="."):
        model_cfg = copy.deepcopy(model_cfg)
        dataset_cfgs = copy.deepcopy(dataset_cfgs)
        model_cfg, dataset_cfgs = _apply_dotted_hacks(model_cfg, dataset_cfgs)
        self.test_mode = test_mode
        self.model_cfg = model_cfg
        self.dataset_cfgs = dataset_cfgs
        self.data_load_cfgs = data_load_cfgs or {}
        self.save_dir = save_dir

        name = model_cfg.get("name", "matching_baseline_noAMG").lower()
        assert name == "matching_baseline_noamg", name

        infer = dict(model_cfg.get("sam2_infer_cfgs", {}))
        mb_cfg = dict(model_cfg.get("memory_bank_cfg", {}))
        assert mb_cfg.pop("enable", True)

        enc_cfg = model_cfg.get("encoder_cfg", "dinov2_large")
        if isinstance(enc_cfg, dict):
            enc_name = enc_cfg.get("name", "dinov2_large")
            enc = ENCODER_PRESETS[enc_name]
        else:
            enc = ENCODER_PRESETS[enc_cfg]

        matching = MatchingConfig(
            points_per_side=int(infer.get("points_per_side", 32)),
            testing_point_bs=int(infer.get("testing_point_bs", 256)),
            iou_thr=float(infer.get("iou_thr", 0.4)),
            nms_thr=float(infer.get("nms_thr", 0.5)),
            num_out_instance=int(infer.get("num_out_instance", 100)),
            kmeans_k=int(infer.get("kmeans_k", 4)),
            n_pca_components=int(infer.get("n_pca_components", 3)),
            cls_num_per_mask=int(infer.get("cls_num_per_mask", 1)),
            with_negative_refs=bool(infer.get("with_negative_refs", False)),
            compute_dtype=str(infer.get("compute_dtype", "float32")),
            decoder_impl=str(infer.get("decoder_impl", "dense")),
            attention_impl=str(infer.get("attention_impl", "pallas")),
            encoder_quant=str(infer.get("encoder_quant", "none")),
        )

        sam2_cfg_file = model_cfg.get("sam2_cfg_file", "sam2_hiera_l.yaml")
        # preset basenames resolve directly; any other value is parsed as a
        # reference hydra `_target_` YAML (build_sam.py:34-36 semantics)
        from no_time_to_train_tpu.config.hydra_yaml import resolve_sam2_cfg
        sam2_cfg = resolve_sam2_cfg(sam2_cfg_file)
        sam2_ckpt = model_cfg.get("sam2_ckpt_path")
        sam2_params = None
        if sam2_ckpt and os.path.exists(sam2_ckpt):
            sam2_params = ckpt_io.load_sam2_torch_checkpoint(sam2_ckpt, sam2_cfg)
        dino_params = None
        enc_ckpt = model_cfg.get("encoder_ckpt_path")
        src = enc_ckpt if enc_ckpt and os.path.exists(str(enc_ckpt)) else None
        if src is not None:
            dino_params = ckpt_io.load_dino_checkpoint(src, enc)

        self.matcher = NoAMGMatcher(
            sam2_cfg, enc, matching,
            n_classes=int(mb_cfg.get("category_num", 20)),
            memory_length=int(mb_cfg.get("length", 10)),
            sam2_params=sam2_params, dino_params=dino_params, seed=seed)

        self.devices = int(devices)
        self.output_queue = []
        self.scalars_queue = []
        self.triplets_queue = []
        self.time_queue = []
        self.eval_dataset = None
        self.online_vis = bool(model_cfg.get("online_vis", False))
        self.vis_thr = float(model_cfg.get("vis_thr", 0.5))

    # ----------------------------------------------------------------- phases
    def load_ckpt(self, ckpt_path):
        if ckpt_path:
            self.matcher.bank, self.matcher.bank_neg = ckpt_io.load_memory_bank(
                ckpt_path, self.matcher.bank, self.matcher.bank_neg)

    def save_ckpt(self, out_path):
        ckpt_io.save_memory_bank(out_path, self.matcher.bank,
                                 self.matcher.bank_neg)

    def _save_ckpt_rank0(self, out_path, mode, msg):
        """Checkpoint-save gate for multi-process worlds: every rank holds
        the identical bank (all_gather fill / replicated postprocess), so
        only rank 0 writes — concurrent same-path torch.save calls tear the
        file. The barrier keeps other ranks from racing past the write
        (no-op without a jax.distributed client, where phases are separate
        CLI invocations anyway)."""
        from no_time_to_train_tpu.parallel import multihost
        n_proc, proc_id = multihost.env_world()
        if proc_id == 0:
            self.save_ckpt(out_path)
            print(f"{msg} {out_path}")
        if n_proc > 1:
            multihost.barrier(f"nttt_ckpt_saved_{mode}")

    def run(self, ckpt_path=None, out_path=None, export_result=None,
            output_name="", progress=True):
        mode = self.test_mode
        self.load_ckpt(ckpt_path)
        if mode in ("fill_memory", "fill_memory_neg"):
            from concurrent.futures import ThreadPoolExecutor
            import jax
            ds = get_dataset(self.dataset_cfgs["fill_memory"],
                             mode if mode != "fill_memory" else "fill_memory")
            positive = (mode == "fill_memory")
            # data-parallel fill: per-device feature extraction + all_gather,
            # every host applies the same sequential bank update (reference
            # concat_all_gather, model_utils.py:74-91); positive AND negative
            # banks both route through the mesh
            dp_fill = None
            bs = 8
            wrap = None
            from no_time_to_train_tpu.parallel import multihost
            n_proc, _ = multihost.env_world()
            # cross-process fill: when a jax.distributed world exists (the
            # CLI initialized it), mesh ALL global devices so the encoder
            # forward shards 1/n_proc per process — the reference's DDP
            # fill semantics (each rank encodes its share, concat_all_gather
            # replicates the features, model_utils.py:74-91). Every process
            # still loads the same batch from disk and donates only the
            # rows its devices own (make_global_array).
            global_fill = (n_proc > 1 and self.devices > 1
                           and os.environ.get("NTTT_COORDINATOR"))
            if global_fill:
                from no_time_to_train_tpu.parallel.mesh import (
                    make_mesh, make_data_parallel_fill, make_global_array)
                # `devices` chips from EVERY process, in process order —
                # jax.devices() lists process 0's chips first, so a plain
                # [:devices * n_proc] slice would leave later processes
                # with no addressable mesh devices at all
                devs = [d for pi in range(n_proc)
                        for d in [g for g in jax.devices()
                                  if g.process_index == pi][:self.devices]]
                mesh = make_mesh(devs)
                dp_fill = make_data_parallel_fill(self.matcher, mesh,
                                                  positive=positive)
                bs = mesh.devices.size
                wrap = lambda x: make_global_array(mesh, x)  # noqa: E731
            elif (self.devices > 1
                    and len(jax.local_devices()) >= self.devices):
                from no_time_to_train_tpu.parallel.mesh import (
                    make_mesh, make_data_parallel_fill)
                # local_devices: under jax.distributed each process meshes
                # its OWN chips (jax.devices() is the global list there)
                mesh = make_mesh(jax.local_devices()[:self.devices])
                dp_fill = make_data_parallel_fill(self.matcher, mesh,
                                                  positive=positive)
                bs = self.devices
            pool = ThreadPoolExecutor(max_workers=2)
            batches = [list(range(i, min(i + bs, len(ds))))
                       for i in range(0, len(ds), bs)]
            futs = [pool.submit(lambda ix: [ds[j] for j in ix], b)
                    for b in batches[:2]]
            for bi, b in enumerate(batches):
                items = futs.pop(0).result()
                if bi + 2 < len(batches):
                    futs.append(pool.submit(
                        lambda ix: [ds[j] for j in ix], batches[bi + 2]))
                if dp_fill is not None:
                    n_valid = len(items)
                    while len(items) < bs:      # pad the tail batch; the
                        items.append(items[-1])  # gather drops it via n_valid
                    cats = np.asarray([it["cat_ind"] for it in items],
                                      np.int32)
                    imgs = np.stack([it["img"] for it in items])
                    msks = np.stack([it["mask"] for it in items])
                    if wrap is not None:
                        cats, imgs, msks = wrap(cats), wrap(imgs), wrap(msks)
                        if bi == 0:
                            # compile-skew fence: finish compiling the
                            # collective program in every process before the
                            # first cross-process execution (the transport's
                            # rendezvous deadline is shorter than a compile)
                            dp_fill.jfn.lower(self.matcher.dino_params,
                                              cats, imgs, msks).compile()
                            # name keyed by mode (deterministic + identical
                            # across processes; pos/neg fills barrier apart)
                            multihost.barrier(f"nttt_fill_compiled_{mode}")
                    dp_fill(cats, imgs, msks, n_valid=n_valid)
                else:
                    self.matcher.fill_memory(
                        np.stack([it["img"] for it in items]),
                        np.stack([it["mask"] for it in items]),
                        [it["cat_ind"] for it in items],
                        positive=positive)
                if progress:
                    print(f"fill {min((bi + 1) * bs, len(ds))}/{len(ds)}")
            pool.shutdown()
            if out_path:
                self._save_ckpt_rank0(out_path, mode,
                                      "Checkpoint with memory is saved to")
        elif mode in ("postprocess_memory", "postprocess_memory_neg"):
            self.matcher.postprocess_memory(
                positive=(mode == "postprocess_memory"))
            if out_path:
                self._save_ckpt_rank0(
                    out_path, mode,
                    "Checkpoint with post-processed memory is saved to")
        elif mode in ("test", "test_support"):
            from concurrent.futures import ThreadPoolExecutor
            stage_cfg = self.dataset_cfgs[
                "test" if mode == "test" else "support"]
            ds = get_dataset(stage_cfg, mode)
            self.eval_dataset = ds

            # host-side prefetch (replaces the reference's DataLoader
            # workers) + a two-deep device pipeline: while image i's outputs
            # stream back and finalize on host, image i+1 computes on device.
            import jax
            # multi-host (multi-process) data parallelism: padded round-robin
            # shard + shared-filesystem gather, reference Lightning-DDP
            # semantics (run_lightning.py:23-78, DistributedSampler deal).
            # Set up BEFORE the intra-process DP dispatch so the two compose
            # (each process runs its shard over its local device mesh).
            from no_time_to_train_tpu.parallel import multihost
            n_proc, proc_id = multihost.env_world()
            if n_proc > 1 and os.environ.get("NTTT_COORDINATOR"):
                # a global device mesh (cross-host collectives) needs
                # jax.distributed; the result gather itself is filesystem-
                # based and runs without it, like the reference's tmpdir
                # pickle gather (run_lightning.py:23-78)
                try:
                    multihost.initialize()
                except RuntimeError as e:
                    # constructing MatcherRunner already touched the backend
                    # (weight init), after which jax.distributed refuses to
                    # start — the CLI initializes early (run_lightning.main)
                    raise RuntimeError(
                        "jax.distributed must be initialized BEFORE the "
                        "runner first touches the backend; go through "
                        "run_lightning.main, or call parallel.multihost."
                        "initialize() before constructing MatcherRunner"
                    ) from e
            indices = multihost.process_shard_indices(len(ds), n_proc,
                                                      proc_id)
            gather_dir = multihost.run_gather_dir(
                os.path.join(self.save_dir, "multihost_gather"))
            if n_proc > 1:  # drop any stale part BEFORE compute starts
                multihost.clear_rank_part(gather_dir, proc_id)
            if self.devices > 1 and len(jax.local_devices()) >= self.devices:
                return self._run_test_data_parallel(
                    ds, stage_cfg, indices, (n_proc, proc_id, gather_dir),
                    export_result, output_name)
            # AOT fast start: load the fingerprinted pre-compiled test step
            # if one matches this source/config/topology (utils/aot.py);
            # silently stays on jit + persistent cache otherwise
            if self.model_cfg.get("aot", True):
                status = self.matcher.enable_aot()
                if status == "loaded":
                    print("[aot] loaded precompiled test step "
                          "(no jit compile)")
            workers = max(1, int(self.data_load_cfgs.get("workers", 0)) or 1)
            pool = ThreadPoolExecutor(max_workers=workers)
            futures = [pool.submit(ds.__getitem__, j) for j in indices[:2]]

            vis_dir = self._vis_dir(stage_cfg)

            # process-level pad duplicates (tail of the shard) keep the
            # merge aligned but must not double-count analysis rows / vis
            n_real = multihost.rank_real_count(len(ds), n_proc, proc_id)

            def finalize(item, device_out, dt, analysis):
                self.time_queue.append(dt)
                raw = self.matcher.fetch_test(device_out)
                self.output_queue.append(self._finalize_one(
                    ds, stage_cfg, vis_dir, item, raw, analysis=analysis))

            pending = None  # (item, device_out, dt, analysis)
            for pos in range(len(indices)):
                item = futures.pop(0).result()
                if pos + 2 < len(indices):
                    futures.append(pool.submit(ds.__getitem__,
                                               indices[pos + 2]))
                t0 = time.time()
                out = self.matcher.test_async(item["target_img"])
                if pending is not None:
                    finalize(*pending)  # D2H + host work overlap this compute
                np.asarray(out["scores"])  # completion fence (timed like the
                dt = time.time() - t0      # reference's synchronized forward)
                pending = (item, out, dt, pos < n_real)
                if progress and (pos + 1) % 20 == 0:
                    print(f"test {pos + 1}/{len(indices)}")
            if pending is not None:
                finalize(*pending)
            pool.shutdown()

            return self._report_and_evaluate(
                ds, self.output_queue, (n_proc, proc_id, gather_dir),
                export_result, output_name, np.array(self.time_queue),
                n_images=len(self.time_queue))
        elif mode == "vis_memory":
            from no_time_to_train_tpu.data.visualization import vis_memory
            ds = get_dataset(self.dataset_cfgs["fill_memory"], "vis_memory")
            gs = self.matcher.enc_cfg.grid_size
            out_dir = "./results_analysis/memory_vis"
            for i in range(len(ds)):
                item = ds[i]
                feats, _ = self.matcher._fill_jit(
                    self.matcher.dino_params, item["img"][None],
                    item["mask"][None])
                grid = np.asarray(feats[0]).reshape(gs, gs, -1)
                vis_memory(item["img"], grid, item["cat_ind"],
                           self.matcher.bank, out_dir,
                           img_id=item["img_info"]["id"])
            print(f"memory visualizations -> {out_dir}")
        else:
            raise NotImplementedError(f"Unrecognized test mode {mode}")
        return None


    def _vis_dir(self, stage_cfg):
        """Online-visualization output dir (or None when vis is off)."""
        if not self.online_vis:
            return None
        vis_dir = os.path.join("./results_analysis",
                               stage_cfg.get("name", "coco"))
        os.makedirs(vis_dir, exist_ok=True)
        return vis_dir

    def _finalize_one(self, ds, stage_cfg, vis_dir, item, raw,
                      analysis=True, fin=None):
        """Shared per-image tail of the test loops (single-device and DP):
        finalize raw device output at the original resolution and
        COCO-encode it; for non-pad rows (analysis=True) also queue the
        analysis scalars and the online visualization. Returns the encoded
        per-image results. `fin` lets the DP loop pass in a finalize
        computed by a worker process (utils/finalize_pool.py)."""
        info = item["target_img_info"]
        if fin is None and vis_dir is None:
            # fused native finalize: upsample + binarize + RLE + box in one
            # pass per mask, full-res masks never materialized (~7x the
            # split path; byte-identical records). The vis path needs the
            # binary masks, so it keeps finalize_results.
            fin = finalize_records(raw, info["ori_height"],
                                   info["ori_width"])
        if fin is None:
            fin = finalize_results(raw, info["ori_height"],
                                   info["ori_width"])
        if "segs" in fin:
            per_img = dict(img_id=info["id"], scores=fin["scores"],
                           labels=fin["labels"], boxes=fin["bboxes"],
                           segs=fin["segs"])
        else:
            per_img = dict(img_id=info["id"], scores=fin["scores"],
                           labels=fin["labels"], boxes=fin["bboxes"],
                           masks=fin["binary_masks"])
        encoded = ds.encode_results([per_img])
        if analysis:
            self._queue_scalars(item, raw, fin)
            if vis_dir is not None:
                from no_time_to_train_tpu.data.visualization import (
                    vis_results_online)
                vout = dict(scores=fin["scores"], labels=fin["labels"],
                            bboxes=fin["bboxes"],
                            binary_masks=fin["binary_masks"])
                vis_results_online(
                    vout, item.get("tar_anns_by_cat"),
                    (info["ori_height"], info["ori_width"]),
                    os.path.join(ds.root, info["file_name"]), vis_dir,
                    score_thr=self.vis_thr,
                    dataset_name=stage_cfg.get("name"),
                    class_names=ds.cat_names)
        return encoded

    def _report_and_evaluate(self, ds, results, world, export_result,
                             output_name, times_np, n_images, time_scale=1):
        """Shared tail of the test loops: FPS report (reference
        sam2matcher_pl.py summary format), analysis pkl dumps, multi-process
        publish + rank-0 interleaved merge (reference collect_results_cpu,
        run_lightning.py:23-78), result export, COCO evaluation, metrics
        CSV. Non-zero ranks return None after publishing their part."""
        from no_time_to_train_tpu.parallel import multihost
        n_proc, proc_id, gather_dir = world
        print("\n[Validation] Inference Time Benchmark:")
        print(f"  Total images: {n_images}")
        print(f"  Total time: {np.sum(times_np) * time_scale:.4f} s")
        print(f"  Average time per image: {np.mean(times_np):.4f} s")
        print(f"  FPS: {1.0 / np.mean(times_np):.2f}")

        results_unpacked = []
        scalars, triplets = list(self.scalars_queue), list(self.triplets_queue)
        if n_proc > 1:
            # the process-level pad duplicates truncate out at len(ds);
            # analysis rows ride the same part files so rank 0 writes the
            # MERGED pkls (per-rank writes to the shared save_dir would race)
            multihost.save_rank_results(gather_dir, proc_id, results,
                                        scalars, triplets)
            if proc_id != 0:
                return None
            merged, scalars, triplets = multihost.collect_results(
                gather_dir, n_proc, len(ds))
            for r in merged:
                results_unpacked.extend(r)
        else:
            for r in results:
                results_unpacked.extend(r)

        for fname, rows in (("scalars_all.pkl", scalars),
                            ("triplets_all.pkl", triplets)):
            if rows:
                os.makedirs(self.save_dir, exist_ok=True)
                with open(os.path.join(self.save_dir, fname), "wb") as f:
                    pickle.dump(rows, f)
        if export_result:
            with open(export_result, "w") as f:
                json.dump(results_unpacked, f)
        stats = ds.evaluate(results_unpacked, output_name=output_name)
        self._write_metrics_csv(stats, times_np, n_images=n_images)
        return stats

    def _queue_scalars(self, item, raw, fin):
        """Score dumps for the offline analysis layer (reference
        run_lightning.py:163-168 + tools/analysis_scripts/*):

        scalars_all.pkl rows [sim, category, oracle_iou, mem_ins_sim] and
        triplets_all.pkl rows [sim, pred_iou, oracle_iou], one array per
        image. Oracle IoU (best IoU vs a same-class GT instance) is computed
        at the low-res mask resolution from the Oracle dataset's GT; without
        GT (plain test dataset) oracle columns are NaN."""
        n = len(fin["scores"])
        if n == 0:
            return
        cats = np.asarray(fin["labels"], np.int64)
        sims = np.asarray(fin["scores"], np.float64)
        pred_ious = np.asarray(raw["pred_ious"][:n], np.float64)
        anns = item.get("tar_anns_by_cat")
        oracle = np.full(n, np.nan)
        if anns is not None:
            lr = np.asarray(raw["lr_logits"][:n], np.float32)
            lr_res = lr.shape[-1]
            pred = (lr > 0).reshape(n, -1)
            gt_small = {}
            for cat_ind, e in anns.items():
                ms = np.asarray(e["masks"])
                step = max(1, ms.shape[-1] // lr_res)
                gt_small[cat_ind] = (
                    ms[:, ::step, ::step][:, :lr_res, :lr_res] > 0.5
                ).reshape(ms.shape[0], -1)
            for i in range(n):
                g = gt_small.get(int(cats[i]))
                if g is None:
                    oracle[i] = 0.0
                    continue
                inter = (pred[i][None] & g).sum(1)
                union = (pred[i][None] | g).sum(1)
                oracle[i] = float(
                    (inter / np.maximum(union, 1)).max())
        ins_sim = np.asarray(self.matcher.bank.ins_sim_avg, np.float64)
        self.scalars_queue.append(
            np.stack([sims, cats.astype(np.float64), oracle,
                      ins_sim[cats]], axis=1))
        self.triplets_queue.append(np.stack([sims, pred_ious, oracle],
                                            axis=1))

    def _write_metrics_csv(self, stats, times_np, path=None, n_images=None):
        """CSV metrics record (replaces the reference's Lightning CSVLogger,
        new_exps/*.yaml:59-63). times_np entries are per image on the
        single-device loop and per DEVICE-BATCH (already divided by the
        device count) on the DP loop — n_images overrides the image count
        there."""
        import csv
        row = {"images": n_images if n_images is not None else len(times_np),
               "mean_time_s": float(np.mean(times_np)),
               "fps": float(1.0 / np.mean(times_np))}
        if stats:
            for iou_type, st in stats.items():
                row[f"{iou_type}_AP"] = float(st[0])
                row[f"{iou_type}_AP50"] = float(st[1])
                row[f"{iou_type}_AP75"] = float(st[2])
        if path is None:
            os.makedirs(self.save_dir, exist_ok=True)
            path = os.path.join(self.save_dir, "metrics_log.csv")
        write_header = not os.path.exists(path)
        with open(path, "a", newline="") as f:
            w = csv.DictWriter(f, fieldnames=list(row))
            if write_header:
                w.writeheader()
            w.writerow(row)

    def _fetch_dp(self, out):
        """Valid-prefix fetch of a data-parallel batch (mirrors
        matcher.fetch_test): winners are score-sorted so valid entries form a
        prefix per device — ship only `valid.sum()` fp16 mask planes per row
        instead of the full padded [n, K, h, w] block (the D2H link is the
        second cost after compute on a remote-TPU tunnel)."""
        valid = np.asarray(out["valid"])                 # [n, K]
        n, k = valid.shape
        lr = np.zeros((n, k) + out["lr_logits"].shape[2:], np.float16)
        for j in range(n):
            nv = int(valid[j].sum())
            if nv > 0:
                lr[j, :nv] = np.asarray(out["lr_logits"][j, :nv])
        return dict(lr_logits=lr, scores=np.asarray(out["scores"]),
                    labels=np.asarray(out["labels"]),
                    pred_ious=np.asarray(out["pred_ious"]), valid=valid)

    def _run_test_data_parallel(self, ds, stage_cfg, indices, world,
                                export_result, output_name):
        """Shard the image stream over a `data` mesh (reference Lightning-DDP
        equivalent, SURVEY §2.5): per-device single-image steps via shard_map,
        interleaved merge reproducing the reference rank order. Host loading
        is thread-prefetched and the device pipeline is two deep — batch i's
        valid-prefix D2H + RLE encode overlap batch i+1's compute — matching
        the single-device loop's structure, with the full feature set of that
        loop: scalars/triplets queues, online_vis, metrics CSV, and the
        multi-process filesystem gather (each process runs ITS padded
        round-robin shard `indices` over its local device mesh; rank 0
        interleave-merges exactly like run_lightning.py:23-78)."""
        import jax
        from concurrent.futures import ThreadPoolExecutor
        from no_time_to_train_tpu.parallel.mesh import (
            make_mesh, make_data_parallel_test, interleave_results)
        from no_time_to_train_tpu.parallel import multihost
        n_proc, proc_id, gather_dir = world
        n = self.devices
        # local_devices: each process's shard runs on its own addressable
        # chips (jax.devices() returns the GLOBAL list once jax.distributed
        # is initialized, and shard_map over non-addressable devices fails)
        mesh = make_mesh(jax.local_devices()[:n])
        run = make_data_parallel_test(self.matcher, mesh)
        per_rank = [[] for _ in range(n)]
        batches = [indices[i:i + n] for i in range(0, len(indices), n)]

        def load(batch):
            items = [ds[j] for j in batch]
            while len(items) < n:        # pad the tail batch; the device-
                items.append(items[-1])  # level interleave truncates it
            return items

        workers = max(1, int(self.data_load_cfgs.get("workers", 0)) or 1)
        pool = ThreadPoolExecutor(max_workers=workers)
        futures = [pool.submit(load, b) for b in batches[:2]]

        vis_dir = self._vis_dir(stage_cfg)

        # finalize sharding: with data_load_cfgs["finalize_workers"] = W > 0
        # the per-row native finalize (upsample+RLE+box) runs in W jax-free
        # worker processes — one host core cannot finalize at an 8-chip
        # device rate (tools/bench_finalize.py: 80 ms/img at 100 masks vs
        # the ~12 ms/img budget), so rows of each device batch fan out and
        # only the cheap record assembly stays in-process. Vis needs the
        # full-res masks in-process, so it disables the pool.
        fin_pool = None
        fw = int(self.data_load_cfgs.get("finalize_workers", 0) or 0)
        if fw > 0 and vis_dir is None:
            from no_time_to_train_tpu.utils import native
            if native.has_finalize():
                from no_time_to_train_tpu.utils.finalize_pool import (
                    FinalizePool)
                fin_pool = FinalizePool(fw)

        # process-level pads sit at the shard tail (rank_real_count), on top
        # of the batch-level tail pads (n_valid)
        n_real = multihost.rank_real_count(len(ds), n_proc, proc_id)

        def finalize(items, n_valid, out, dt, base):
            self.time_queue.append(dt / n)
            raw_all = self._fetch_dp(out)
            fins = [None] * len(items)
            if fin_pool is not None:
                futs = []
                for j, item in enumerate(items):
                    info = item["target_img_info"]
                    nv = int(raw_all["valid"][j].sum())
                    lr = raw_all["lr_logits"].shape[-1]
                    if info["ori_height"] < lr or info["ori_width"] < lr:
                        futs.append(None)  # antialiased downscale path
                        continue
                    futs.append(fin_pool.submit_row(
                        raw_all["lr_logits"][j, :nv],
                        info["ori_height"], info["ori_width"]))
                for j, fut in enumerate(futs):
                    if fut is None:
                        continue
                    segs, boxes = fut.result()
                    nv = len(segs)
                    fins[j] = dict(
                        segs=segs, bboxes=boxes,
                        scores=np.asarray(raw_all["scores"][j, :nv],
                                          np.float32),
                        labels=raw_all["labels"][j, :nv])
            for j, item in enumerate(items):
                raw = {k: v[j] for k, v in raw_all.items()}
                # pad duplicates (batch tail j >= n_valid, or process-level
                # shard tail) keep merge alignment but must not double-count
                # analysis rows / vis
                per_rank[j].append(self._finalize_one(
                    ds, stage_cfg, vis_dir, item, raw,
                    analysis=j < n_valid and base + j < n_real,
                    fin=fins[j]))

        pending = None
        for bi, batch in enumerate(batches):
            items = futures.pop(0).result()
            if bi + 2 < len(batches):
                futures.append(pool.submit(load, batches[bi + 2]))
            t0 = time.time()
            out = run(np.stack([it["target_img"] for it in items]))
            if pending is not None:
                finalize(*pending)  # D2H + host work overlap this compute
            np.asarray(out["scores"])  # completion fence (tiny [n, K] fetch)
            dt = time.time() - t0
            pending = (items, len(batch), out, dt, bi * n)
        if pending is not None:
            finalize(*pending)
        pool.shutdown()
        if fin_pool is not None:
            fin_pool.shutdown()
        # within-process interleave: device j saw indices[j::n], so zipping
        # the device lists restores this process's shard order
        merged = interleave_results(per_rank, len(indices))

        return self._report_and_evaluate(
            ds, merged, world, export_result, output_name,
            np.array(self.time_queue), n_images=len(indices),
            time_scale=self.devices)
