"""AOT executable serialization (utils/aot.py): export/load round trip on
the CPU backend, fingerprint gating, and graceful fallbacks.

CPU deserialization is gated off by default (cpu_aot_loader machine-feature
mismatch makes loaded CPU executables flaky on this host — utils/aot.py
load_step); the round-trip tests set NTTT_AOT_CPU_LOAD=1 to exercise the
deserialize path on small programs where it behaves."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from no_time_to_train_tpu.utils import aot


@pytest.fixture
def cpu_aot_load(monkeypatch):
    monkeypatch.setenv("NTTT_AOT_CPU_LOAD", "1")


def _fn(a, b):
    return {"y": a @ b, "z": (a * 2).sum()}


def test_export_load_round_trip(tmp_path, cpu_aot_load):
    path = str(tmp_path / "step.bin")
    a = jnp.asarray(np.random.default_rng(0).random((8, 16)), jnp.float32)
    b = jnp.asarray(np.random.default_rng(1).random((16, 4)), jnp.float32)
    compiled = aot.export_step(_fn, (a, b), path)
    ref = jax.tree.map(np.asarray, compiled(a, b))

    loaded = aot.load_step(path)
    assert loaded is not None
    got = jax.tree.map(np.asarray, loaded(a, b))
    np.testing.assert_allclose(got["y"], ref["y"], rtol=1e-6)
    np.testing.assert_allclose(got["z"], ref["z"], rtol=1e-6)


def test_export_with_pytree_args(tmp_path, cpu_aot_load):
    """The flagship step's first args are param DICTS — export must flatten
    input_shardings pytrees before reading device sets (regression: the
    flagship export crashed on 'dict' object has no attribute 'device_set'
    while the array-arg round trip stayed green)."""
    path = str(tmp_path / "step.bin")

    def fn(params, x):
        return {"y": x @ params["w"] + params["b"]}

    params = {"w": jnp.asarray(np.random.default_rng(0).random((16, 4)),
                               jnp.float32),
              "b": jnp.zeros((4,), jnp.float32)}
    x = jnp.asarray(np.random.default_rng(1).random((8, 16)), jnp.float32)
    compiled = aot.export_step(fn, (params, x), path)
    ref = np.asarray(compiled(params, x)["y"])
    loaded = aot.load_step(path)
    assert loaded is not None
    np.testing.assert_allclose(np.asarray(loaded(params, x)["y"]), ref,
                               rtol=1e-6)


def test_load_missing_and_mismatch(tmp_path, cpu_aot_load):
    assert aot.load_step(str(tmp_path / "nope.bin")) is None
    # corrupt file -> graceful None
    p = tmp_path / "bad.bin"
    p.write_bytes(b"not a pickle")
    assert aot.load_step(str(p)) is None
    # fingerprint mismatch -> None
    import pickle
    path = str(tmp_path / "step.bin")
    a = jnp.ones((4, 4), jnp.float32)
    aot.export_step(_fn, (a, a), path)
    with open(path, "rb") as f:
        blob = pickle.load(f)
    blob["fingerprint"]["jax"] = "0.0.0"
    with open(path, "wb") as f:
        pickle.dump(blob, f)
    assert aot.load_step(path) is None


def test_extra_fingerprint_gates(tmp_path, cpu_aot_load):
    """The config tag (matcher config repr) must gate loads: an artifact
    exported under one config silently refuses to load under another."""
    path = str(tmp_path / "step.bin")
    a = jnp.ones((4, 4), jnp.float32)
    aot.export_step(_fn, (a, a), path, extra="cfg-A")
    assert aot.load_step(path, extra="cfg-A") is not None
    assert aot.load_step(path, extra="cfg-B") is None
    assert aot.load_step(path) is None  # no tag != tagged artifact


def test_matcher_enable_aot_round_trip(tmp_path):
    """enable_aot exports on miss and the AOT-dispatched test_async matches
    the jit path bit-for-bit (same compiled program). On the CPU backend a
    fresh process must DECLINE to load the artifact (deserialized CPU
    executables are flaky on this host — load_step gate) and stay on jit;
    the loaded path runs on the TPU via bench.py/runner."""
    import __graft_entry__

    path = str(tmp_path / "flagship.bin")
    m = __graft_entry__._tiny_matcher()
    img = np.random.default_rng(0).random((128, 128, 3), np.float32)
    ref = m.test(img)  # jit path
    assert m.enable_aot(path, export_on_miss=True) == "exported"
    got = m.fetch_test(m.test_async(img))
    for k in ref:
        np.testing.assert_array_equal(np.asarray(got[k]),
                                      np.asarray(ref[k]), err_msg=k)

    # CPU-load gate: a second matcher declines the artifact, works on jit
    m2 = __graft_entry__._tiny_matcher()
    assert m2.enable_aot(path) == "jit"
    got2 = m2.fetch_test(m2.test_async(img))
    for k in ref:
        np.testing.assert_array_equal(np.asarray(got2[k]),
                                      np.asarray(ref[k]), err_msg=k)

    # a different config must refuse the artifact (extra-fingerprint gate)
    import dataclasses
    m3 = __graft_entry__._tiny_matcher()
    m3.matching = dataclasses.replace(m3.matching, nms_thr=0.9)
    assert m3.enable_aot(path) == "jit"
