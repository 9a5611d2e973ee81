"""True multi-process collective test (VERDICT r2 #3c): two OS processes,
4 CPU devices each, one 8-device global `data` mesh with gloo cross-process
collectives. Exercises the REAL runtime paths — `make_data_parallel_fill`
(cross-process `jax.lax.all_gather` of reference features, reference
model_utils.py:74-91) and `make_data_parallel_test` (global-mesh sharded
test step) — and asserts the distributed results are identical to a
single-process 8-virtual-device run of the same code."""
import os
import pickle
import re
import subprocess
import sys

import numpy as np
import pytest

sys.path.insert(0, "/root/repo")

from conftest import cpu_devices

WORKER = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      "multiprocess_worker.py")


@pytest.fixture(scope="module")
def single_process_reference():
    """The same workload on this process's 8 virtual CPU devices."""
    devs = cpu_devices()
    if len(devs) < 8:
        pytest.skip("needs 8 virtual devices")
    import jax
    from __graft_entry__ import _tiny_matcher
    from no_time_to_train_tpu.parallel.mesh import (
        make_mesh, make_data_parallel_fill, make_data_parallel_test)

    mesh = make_mesh(devs[:8])
    matcher = _tiny_matcher(memory_length=3)
    rng = np.random.default_rng(5)      # same stream as the worker
    cats = (np.arange(8) % 3).astype(np.int32)
    imgs = rng.random((8, 64, 64, 3)).astype(np.float32)
    masks = (rng.random((8, 64, 64)) > 0.5).astype(np.float32)
    fill = make_data_parallel_fill(matcher, mesh)
    fill(cats, imgs, masks)
    bank = jax.tree.map(np.asarray, matcher.bank)
    matcher.postprocess_memory()
    test = make_data_parallel_test(matcher, mesh)
    batch = rng.random((8, 128, 128, 3)).astype(np.float32)
    out = jax.tree.map(np.asarray, test(batch))
    return bank, out


def test_two_process_global_mesh(single_process_reference, tmp_path):
    ref_bank, ref_out = single_process_reference

    env = dict(os.environ)
    # the workers size their own CPU platform (4 devices each)
    env["XLA_FLAGS"] = re.sub(
        r"--xla_force_host_platform_device_count=\d+", "",
        env.get("XLA_FLAGS", "")).strip()
    env.pop("JAX_PLATFORMS", None)
    port = "23471"
    procs = [subprocess.Popen(
        [sys.executable, WORKER, str(r), port, str(tmp_path)],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE)
        for r in range(2)]
    outs = []
    for p in procs:
        try:
            stdout, stderr = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append((p.returncode, stdout.decode(), stderr.decode()))
    for rc, stdout, stderr in outs:
        assert rc == 0, f"worker failed:\n{stdout}\n{stderr[-3000:]}"

    ranks = []
    for r in range(2):
        with open(tmp_path / f"rank{r}.pkl", "rb") as f:
            ranks.append(pickle.load(f))

    # topology: 4 local + 8 global devices per process
    for rk in ranks:
        assert rk["n_local_devices"] == 4
        assert rk["n_global_devices"] == 8

    # cross-process all_gather fill: every process holds the SAME bank,
    # identical to the single-process sequential fill
    for rk in ranks:
        np.testing.assert_array_equal(rk["bank_fill_counts"],
                                      ref_bank.fill_counts)
        np.testing.assert_allclose(rk["bank_feats"], ref_bank.feats,
                                   atol=1e-5, rtol=1e-5)

    # sharded test step: the two processes' addressable rows partition the
    # batch and match the single-process run row for row
    rows = {}
    for rk in ranks:
        for i, vals in rk["rows"].items():
            assert i not in rows, f"row {i} owned by both processes"
            rows[i] = vals
    assert sorted(rows) == list(range(8))
    for i in range(8):
        np.testing.assert_allclose(rows[i]["scores"], ref_out["scores"][i],
                                   atol=1e-4, rtol=1e-3)
        np.testing.assert_array_equal(rows[i]["labels"],
                                      ref_out["labels"][i])
        np.testing.assert_array_equal(rows[i]["valid"], ref_out["valid"][i])
        nv = int(rows[i]["valid"].sum())
        if nv:
            got = rows[i]["lr_logits"][:nv].astype(np.float32)
            exp = ref_out["lr_logits"][i, :nv].astype(np.float32)
            np.testing.assert_allclose(got, exp, atol=0.02, rtol=0.02)
