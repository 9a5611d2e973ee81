"""Multi-host (multi-process) data parallelism skeleton.

The reference runs Lightning DDP across processes: a padded
DistributedSampler deals the eval dataset round-robin to ranks, each rank
pickles its results into a shared tmpdir, `dist.barrier()` synchronizes, and
rank 0 interleave-merges + truncates (reference run_lightning.py:23-78,
`collect_results_cpu`; sharding semantics of
torch.utils.data.DistributedSampler with shuffle=False).

TPU-native mapping (SURVEY §2.5): `jax.distributed.initialize` + a global
device mesh for the collectives, while RESULT collection stays host-side —
exactly like the reference — via a shared-filesystem gather (every TPU pod
deployment has one). The barrier is a file-existence wait: rank files are
written atomically (tmp + rename), so a complete set of part files IS the
barrier. Single-process runs short-circuit everywhere (num_processes=1),
mirroring the reference's `dist.is_initialized()` guards.

Environment contract (mirrors `torchrun`'s):
  NTTT_NUM_PROCESSES / NTTT_PROCESS_ID / NTTT_COORDINATOR — or pass
  explicitly. `initialize()` is idempotent and a no-op for world size 1.
"""
import os
import pickle
import time

from no_time_to_train_tpu.parallel.mesh import interleave_results


def env_world():
    """(num_processes, process_id) from the environment; (1, 0) default."""
    return (int(os.environ.get("NTTT_NUM_PROCESSES", "1")),
            int(os.environ.get("NTTT_PROCESS_ID", "0")))


def initialize(coordinator_address=None, num_processes=None, process_id=None):
    """jax.distributed.initialize for multi-host meshes (replaces the
    reference's NCCL/torch.distributed init, run_lightning.py:12 +
    Lightning DDP). No-op when world size is 1 or when already initialized.

    Returns (num_processes, process_id)."""
    env_n, env_r = env_world()
    n = num_processes if num_processes is not None else env_n
    r = process_id if process_id is not None else env_r
    if n <= 1:
        return 1, 0
    import jax
    from jax._src import distributed as _dist
    if _dist.global_state.client is not None:
        # already initialized (by the launcher or an earlier call) —
        # idempotent re-entry. Checked via the client handle, NOT by
        # catching jax's RuntimeError: the re-init error text ("must be
        # called before any JAX calls") doesn't say "already".
        return n, r
    coord = coordinator_address or os.environ.get("NTTT_COORDINATOR")
    jax.distributed.initialize(coordinator_address=coord,
                               num_processes=n, process_id=r)
    return n, r


def process_shard_indices(n_items, num_processes, process_id):
    """Padded round-robin shard: the exact index assignment of the
    reference's DistributedSampler(shuffle=False) — indices padded by
    wrapping to a multiple of world size, then dealt rank::world_size.
    The pad guarantees every rank runs the same step count (the collective
    lockstep the reference relies on); `collect_results` truncates the
    duplicates back out (run_lightning.py:74-75)."""
    idx = list(range(n_items))
    if num_processes <= 1 or n_items == 0:
        return idx
    total = -(-n_items // num_processes) * num_processes
    pad = total - n_items
    if pad <= n_items:
        idx = idx + idx[:pad]
    else:
        # torch DistributedSampler: when the pad exceeds the index list
        # (n_items < num_processes), repeat the whole list — a short pad
        # would leave ranks with EMPTY shards, whose empty part files make
        # the rank-0 interleave truncate every rank's results to zero
        reps = -(-pad // n_items)
        idx = idx + (idx * reps)[:pad]
    return idx[process_id::num_processes]


def rank_real_count(n_items, num_processes, process_id):
    """Number of REAL (non-pad) entries in this rank's shard: pads occupy
    global positions >= n_items, and the round-robin deal keeps positions
    ascending, so a rank's pads are exactly its tail entries."""
    if num_processes <= 1:
        return n_items
    return len(range(process_id, n_items, num_processes))


def barrier(name, timeout_ms=600_000):
    """Cross-process barrier via the jax.distributed kv-store (no-op when
    jax.distributed is not initialized). Used to fence collective programs
    behind compilation: processes can finish COMPILING a shard_map program
    arbitrarily far apart (minutes on a shared host), while the collective
    transport's rendezvous deadline is much shorter — compile first, then
    barrier, then execute."""
    from jax._src import distributed as _dist
    client = _dist.global_state.client
    if client is not None:
        client.wait_at_barrier(name, timeout_ms)


def _part_path(gather_dir, process_id):
    return os.path.join(gather_dir, f"part_{process_id}.pkl")


def run_gather_dir(base_dir, run_id=None):
    """Per-run gather directory. The file-existence barrier of
    `collect_results` is only sound if part files from a PREVIOUS run can
    never satisfy it — a re-run over a crashed or completed run would
    otherwise silently merge stale results. The launcher propagates a shared
    run id (NTTT_RUN_ID, same contract as the other NTTT_* env vars); runs
    without one share the base dir and rely on `clear_rank_part` at start."""
    rid = run_id or os.environ.get("NTTT_RUN_ID")
    return os.path.join(base_dir, rid) if rid else base_dir


def clear_rank_part(gather_dir, process_id):
    """Delete this rank's stale part file BEFORE any compute starts. Each
    rank clears its own file (race-free: nobody else writes part_<r>), so a
    re-run in the same gather dir can only complete once every current-rank
    process has republished. Residual window: a rank that starts later than
    another rank *finishes* could leave its stale file standing — set
    NTTT_RUN_ID to close it completely."""
    try:
        os.remove(_part_path(gather_dir, process_id))
    except FileNotFoundError:
        pass


def save_rank_results(gather_dir, process_id, results, scalars=None,
                      triplets=None):
    """Atomically publish this rank's result list (reference
    run_lightning.py:56-57, per-rank pickle dump) plus its analysis-layer
    scalars/triplets rows, so rank 0 can write the MERGED scalars_all.pkl /
    triplets_all.pkl (every rank writing them to the shared save_dir would
    race and keep one arbitrary rank's rows). The rename is the completion
    signal other ranks wait on."""
    payload = {"results": results,
               "scalars": list(scalars or ()),
               "triplets": list(triplets or ())}
    os.makedirs(gather_dir, exist_ok=True)
    tmp = _part_path(gather_dir, process_id) + ".tmp"
    with open(tmp, "wb") as f:
        pickle.dump(payload, f)
    os.replace(tmp, _part_path(gather_dir, process_id))


def collect_results(gather_dir, num_processes, total, timeout_s=600.0,
                    poll_s=0.2):
    """Rank-0 gather: wait for all part files (the reference's
    dist.barrier, run_lightning.py:59), load them in rank order, and
    reproduce the interleaved merge + pad truncation (:61-75). Returns
    (results, scalars_rows, triplets_rows) — the analysis rows are
    rank-concatenated (the analysis layer treats them as an unordered
    collection)."""
    paths = [_part_path(gather_dir, r) for r in range(num_processes)]
    deadline = time.time() + timeout_s
    while not all(os.path.exists(p) for p in paths):
        if time.time() > deadline:
            missing = [p for p in paths if not os.path.exists(p)]
            raise TimeoutError(f"multihost gather: missing {missing}")
        time.sleep(poll_s)
    parts = []
    for p in paths:
        with open(p, "rb") as f:
            parts.append(pickle.load(f))
    # ranks may have unequal *real* content but equal padded length; the
    # interleave assumes the padded round-robin deal of
    # process_shard_indices
    results = interleave_results([p["results"] for p in parts], total)
    scalars = [row for p in parts for row in p["scalars"]]
    triplets = [row for p in parts for row in p["triplets"]]
    return results, scalars, triplets
