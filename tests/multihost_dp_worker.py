"""Worker for the multihost+DP composition test
(tests/test_multihost.py::test_cli_two_process_dp_composition).

Each of two OS processes owns 4 local CPU devices inside an 8-device
jax.distributed world (gloo), then runs the FULL CLI pipeline with
trainer.devices=2:

  - fill_memory: a GLOBAL 4-device mesh (2 devices x 2 processes) — the
    encoder forward shards across processes with a cross-process
    all_gather, the reference's DDP fill semantics;
  - postprocess_memory: identical local compute per process;
  - test: per-process DP over jax.local_devices() (jax.devices() is the
    GLOBAL list here, and a shard_map mesh over another process's devices
    cannot execute) + shared-filesystem gather; rank 0 merges + exports.

Usage: python multihost_dp_worker.py <rank> <port> <workdir> <cfg>
       <merged_json>
"""
import os
import sys


def main():
    rank, port, workdir, cfg_path, merged = sys.argv[1:6]
    import jax
    # 4 local CPU devices per process (the parent strips the
    # xla_force_host_platform_device_count flag from XLA_FLAGS)
    jax.config.update("jax_num_cpu_devices", 4)
    jax.config.update("jax_cpu_collectives_implementation", "gloo")

    os.environ["NTTT_NUM_PROCESSES"] = "2"
    os.environ["NTTT_PROCESS_ID"] = rank
    os.environ["NTTT_COORDINATOR"] = f"127.0.0.1:{port}"

    # jax.distributed.initialize must run BEFORE the first backend touch —
    # and before any repo import (imports may probe devices); the runner's
    # own initialize() call then no-ops as already-initialized
    jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                               num_processes=2, process_id=int(rank))
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    # CPU-only from here (same rule as multiprocess_worker.py)
    jax.config.update("jax_default_device", jax.local_devices(
        backend="cpu")[0])
    assert len(jax.devices("cpu")) == 8, jax.devices("cpu")
    assert len(jax.local_devices(backend="cpu")) == 4

    os.chdir(workdir)
    # the tiny test presets live only in the parent pytest process; register
    # the same ones here (mirrors tests/test_multihost.py::tiny_cli_setup)
    from no_time_to_train_tpu.config import presets
    from no_time_to_train_tpu.config.presets import Sam2Config
    presets.SAM2_PRESETS.setdefault("sam2_tiny_test.yaml", Sam2Config(
        embed_dim=32, num_heads=1, stages=(1, 1, 1, 1),
        global_att_blocks=(2,), window_pos_embed_bkg_spatial_size=(2, 2),
        window_spec=(4, 2, 4, 2), backbone_channel_list=(256, 128, 64, 32),
        image_size=128))
    presets.ENCODER_PRESETS.setdefault(
        "dino_tiny_test", presets.EncoderConfig("dino_tiny_test", 28, 14, 32,
                                                1, 2, "local"))
    import run_lightning
    # SHARED checkpoint paths: only rank 0 writes (reference Lightning-DDP
    # rank_zero_only saving; concurrent same-path torch.save calls tear the
    # file); the save is fenced by a barrier, so rank 1 loads rank 0's file
    # in the next phase
    mem = os.path.join(workdir, "m_shared.ckpt")
    post = os.path.join(workdir, "p_shared.ckpt")
    run_lightning.main(["test", "--config", cfg_path,
                        "--model.test_mode", "fill_memory",
                        "--out_path", mem])
    run_lightning.main(["test", "--config", cfg_path,
                        "--model.test_mode", "postprocess_memory",
                        "--ckpt_path", mem, "--out_path", post])
    run_lightning.main(["test", "--config", cfg_path,
                        "--model.test_mode", "test", "--ckpt_path", post,
                        "--export_result", merged])
    # exit in lockstep: rank 1 publishes and returns while rank 0 merges +
    # evaluates; on this 1-core host the skew can exceed jax.distributed's
    # shutdown-barrier deadline, killing the still-working rank
    from no_time_to_train_tpu.parallel import multihost
    multihost.barrier("nttt_worker_done")


if __name__ == "__main__":
    main()
