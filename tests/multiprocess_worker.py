"""Worker for the 2-process jax.distributed mesh test
(tests/test_multiprocess_mesh.py). Each process contributes 4 CPU devices to
an 8-device global `data` mesh with gloo cross-process collectives, then runs
the REAL pipeline code paths: `make_data_parallel_fill` (cross-process
all_gather of reference features) and `make_data_parallel_test` (global-mesh
sharded test step). Outputs are pickled per rank for the parent to compare
against a single-process 8-virtual-device run.

Usage: python multiprocess_worker.py <rank> <port> <outdir>
"""
import os
import pickle
import sys


def main():
    rank, port, outdir = int(sys.argv[1]), sys.argv[2], sys.argv[3]
    # 4 local CPU devices per process via config (the parent strips the
    # xla_force_host_platform_device_count flag from XLA_FLAGS)
    import jax
    jax.config.update("jax_num_cpu_devices", 4)
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                               num_processes=2, process_id=rank)
    # CPU-only from here: the axon/TPU client must never be instantiated
    # (two processes sharing one tunnel), same rule as dryrun_multichip
    devices = jax.devices("cpu")
    jax.config.update("jax_default_device", jax.local_devices(
        backend="cpu")[0])
    assert len(devices) == 8, devices
    assert len(jax.local_devices(backend="cpu")) == 4

    import numpy as np
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from __graft_entry__ import _tiny_matcher
    from no_time_to_train_tpu.parallel.mesh import (
        make_mesh, make_data_parallel_fill, make_data_parallel_test,
        make_global_array)

    mesh = make_mesh(devices)            # 2 processes x 4 devices
    matcher = _tiny_matcher(memory_length=3)  # seed-deterministic params
    rng = np.random.default_rng(5)       # SAME data in every process

    cats = (np.arange(8) % 3).astype(np.int32)
    imgs = rng.random((8, 64, 64, 3)).astype(np.float32)
    masks = (rng.random((8, 64, 64)) > 0.5).astype(np.float32)

    # gloo's rendezvous has a ~30s deadline; on one shared CPU core the two
    # processes can finish COMPILING the shard_map programs more than 30s
    # apart, so AOT-compile first and barrier (via the jax.distributed kv
    # store) right before the first collective executes
    from jax._src import distributed
    barrier = distributed.global_state.client.wait_at_barrier

    cats_g = make_global_array(mesh, cats)
    imgs_g = make_global_array(mesh, imgs)
    masks_g = make_global_array(mesh, masks)
    fill = make_data_parallel_fill(matcher, mesh)
    fill.jfn.lower(matcher.dino_params, cats_g, imgs_g, masks_g).compile()
    barrier("fill_compiled", 600_000)
    fill(cats_g, imgs_g, masks_g)
    bank = jax.tree.map(np.asarray, matcher.bank)

    matcher.postprocess_memory()

    test = make_data_parallel_test(matcher, mesh)
    batch = rng.random((8, 128, 128, 3)).astype(np.float32)
    batch_g = make_global_array(mesh, batch)
    test.jfn.lower(matcher.sam2_params, matcher.dino_params, matcher.bank,
                   matcher.bank, batch_g).compile()
    barrier("test_compiled", 600_000)
    out = test(batch_g)

    # each rank can only fetch its addressable rows; record (global row,
    # value) via the shard index
    rows = {}
    for key in ("scores", "labels", "valid", "lr_logits"):
        arr = out[key]
        for shard in arr.addressable_shards:
            row0 = shard.index[0].start or 0
            data = np.asarray(shard.data)
            for j in range(data.shape[0]):
                rows.setdefault(row0 + j, {})[key] = data[j]

    with open(os.path.join(outdir, f"rank{rank}.pkl"), "wb") as f:
        pickle.dump({"bank_fill_counts": np.asarray(bank.fill_counts),
                     "bank_feats": np.asarray(bank.feats),
                     "rows": rows,
                     "n_local_devices": len(jax.local_devices(
                         backend="cpu")),
                     "n_global_devices": len(devices)}, f)
    print(f"rank {rank}: OK ({sorted(rows)} rows)", flush=True)
    # re-sync before exiting: jax's atexit shutdown barrier has a short
    # deadline, and the two ranks can drift minutes apart on one shared core
    barrier("worker_done", 600_000)


if __name__ == "__main__":
    main()
