"""AOT executable serialization (utils/aot.py): export/load round trip on
the CPU backend, fingerprint gating, and graceful fallbacks."""
import numpy as np
import jax
import jax.numpy as jnp

from no_time_to_train_tpu.utils import aot


def _fn(a, b):
    return {"y": a @ b, "z": (a * 2).sum()}


def test_export_load_round_trip(tmp_path):
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


def test_export_with_pytree_args(tmp_path):
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


def test_load_missing_and_mismatch(tmp_path):
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
