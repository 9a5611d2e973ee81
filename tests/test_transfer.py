"""Packed host->device upload (utils/transfer.py): value/structure/dtype
identity with plain device_put, and the fallback gates."""
import ml_dtypes
import numpy as np
import jax
import jax.numpy as jnp

from no_time_to_train_tpu.utils.transfer import packed_device_put


def test_packed_put_round_trip(rng):
    tree = {"a": {"w": rng.standard_normal((64, 128))
                  .astype(ml_dtypes.bfloat16),
                  "b": np.zeros((128,), ml_dtypes.bfloat16)},
            "c": [rng.standard_normal((32,)).astype(np.float32),
                  np.arange(7, dtype=np.int32)],
            "d": rng.standard_normal((100, 100)).astype(np.float32)}
    out = packed_device_put(tree, min_leaves=2, min_bytes=0)
    flat1, td1 = jax.tree_util.tree_flatten(tree)
    flat2, td2 = jax.tree_util.tree_flatten(out)
    assert td1 == td2
    for a, b in zip(flat1, flat2):
        assert a.shape == b.shape and str(a.dtype) == str(b.dtype)
        np.testing.assert_array_equal(np.asarray(b), a)


def test_packed_put_fallbacks(rng):
    # small tree -> plain device_put
    out = packed_device_put({"x": np.ones(3, np.float32)})
    np.testing.assert_array_equal(np.asarray(out["x"]), np.ones(3))
    # non-numpy leaf (already on device) -> plain device_put
    out = packed_device_put({"x": jnp.ones((200,)),
                             "y": np.ones((300,), np.float32)},
                            min_leaves=1, min_bytes=0)
    assert float(np.asarray(out["x"]).sum()) == 200.0
    assert float(np.asarray(out["y"]).sum()) == 300.0
