#!/usr/bin/env python
"""CLI entry point — public-surface-compatible with the reference
run_lightning.py (same subcommand, YAML schema, dotted overrides and extra
flags), backed by the TPU-native runner instead of Lightning.

Usage (identical to the reference shell pipelines):
  python run_lightning.py test --config cfg.yaml \
      --model.test_mode fill_memory --out_path memory.ckpt \
      --model.init_args.model_cfg.memory_bank_cfg.length 10 \
      --model.init_args.dataset_cfgs.fill_memory.memory_pkl refs.pkl
  python run_lightning.py test --config cfg.yaml \
      --model.test_mode postprocess_memory --ckpt_path memory.ckpt \
      --out_path memory_post.ckpt
  python run_lightning.py test --config cfg.yaml --model.test_mode test \
      --ckpt_path memory_post.ckpt [--export_result out.json]
"""
import ast
import os
import sys

import yaml


def _set_dotted(tree, dotted, value):
    parts = dotted.split(".")
    node = tree
    for i, p in enumerate(parts[:-1]):
        nxt = node.get(p)
        if not isinstance(nxt, dict):
            # reference HACK: dotted keys may land inside leaf dicts
            node[".".join(parts[i:])] = value
            return
        node = nxt
    node[parts[-1]] = value


def _parse_value(v):
    try:
        return ast.literal_eval(v)
    except (ValueError, SyntaxError):
        if v.lower() in ("true", "false"):
            return v.lower() == "true"
        if v.lower() in ("null", "none"):
            return None
        return v


TOP_LEVEL = {"out_path", "ckpt_path", "export_result", "seed", "n_shot",
             "coco_semantic_split", "out_support_res", "out_neg_pkl",
             "out_neg_json", "config"}


def parse_args(argv):
    assert argv and argv[0] in ("test", "fit", "predict"), \
        f"usage: run_lightning.py test --config <yaml> [overrides]"
    subcommand = argv[0]
    args = {"subcommand": subcommand}
    overrides = []
    i = 1
    while i < len(argv):
        a = argv[i]
        assert a.startswith("--"), f"unexpected argument {a}"
        if "=" in a:
            key, val = a[2:].split("=", 1)
            i += 1
        else:
            key = a[2:]
            val = argv[i + 1]
            i += 2
        if key in TOP_LEVEL:
            args[key] = val
        else:
            overrides.append((key, _parse_value(val)))
    return args, overrides


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    args, overrides = parse_args(argv)
    assert args["subcommand"] == "test", "only `test` is supported (the " \
        "reference's training path is the legacy SAM2Ref variant)"

    with open(args["config"]) as f:
        cfg = yaml.safe_load(f)

    for key, val in overrides:
        _set_dotted(cfg, key, val)

    model_node = cfg.get("model", {})
    init = model_node.get("init_args", model_node)
    model_cfg = init.get("model_cfg", {})
    dataset_cfgs = init.get("dataset_cfgs", {})
    data_load_cfgs = init.get("data_load_cfgs", {})
    test_mode = model_node.get("test_mode", init.get("test_mode", "none"))

    # replicate run_lightning.py:92-103 (before_test): memory_length wiring
    mb_cfg = model_cfg.get("memory_bank_cfg", {})
    if test_mode == "fill_memory" and "fill_memory" in dataset_cfgs:
        dataset_cfgs["fill_memory"]["memory_length"] = mb_cfg.get("length")
    elif test_mode == "fill_memory_neg" and "fill_memory" in dataset_cfgs:
        dataset_cfgs["fill_memory"]["memory_length"] = mb_cfg.get(
            "length_negative")
        if "support" in dataset_cfgs:
            dataset_cfgs["fill_memory"]["root"] = dataset_cfgs["support"]["root"]
        if args.get("out_neg_json"):
            dataset_cfgs["fill_memory"]["json_file"] = args["out_neg_json"]
        if args.get("out_neg_pkl"):
            dataset_cfgs["fill_memory"]["memory_pkl"] = args["out_neg_pkl"]

    seed = int(args.get("seed") or cfg.get("seed_everything", 42))

    trainer_cfg = cfg.get("trainer", {})
    devices = int(trainer_cfg.get("devices", 1) or 1)
    logger_cfg = trainer_cfg.get("logger") or {}
    if "init_args" in logger_cfg:       # Lightning class_path/init_args form
        logger_cfg = logger_cfg["init_args"] or {}
    save_dir = (logger_cfg.get("save_dir")
                or trainer_cfg.get("logger.save_dir") or ".")
    # jax.distributed must initialize BEFORE the first backend touch (jax
    # forbids it afterwards), and building the runner initializes weights on
    # the backend — so the multi-process setup happens here, not in run().
    # No-op without the NTTT_* env contract / for world size 1.
    from no_time_to_train_tpu.parallel import multihost
    if os.environ.get("NTTT_COORDINATOR"):
        multihost.initialize()
    from no_time_to_train_tpu.runner import MatcherRunner
    runner = MatcherRunner(model_cfg, dataset_cfgs, data_load_cfgs,
                           test_mode=test_mode, seed=seed, devices=devices,
                           save_dir=save_dir)

    output_name = ""
    if args.get("coco_semantic_split"):
        output_name += f"semantic_split_{args['coco_semantic_split']}_"
    if args.get("n_shot") and args.get("seed"):
        output_name += f"{args['n_shot']}shot_{args['seed']}seed"

    runner.run(ckpt_path=args.get("ckpt_path"), out_path=args.get("out_path"),
               export_result=args.get("export_result"),
               output_name=output_name)

    if test_mode == "test_support" and args.get("out_support_res"):
        import pickle
        results = [r for q in runner.output_queue for r in q]
        with open(args["out_support_res"], "wb") as f:
            pickle.dump(results, f)


if __name__ == "__main__":
    main()
