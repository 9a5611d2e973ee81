"""Memory bank + scoring parity vs reference matching_baseline_utils."""
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import jax.numpy as jnp  # noqa: E402

from ref_loader import (install_reference_shim, install_torchvision_shim,  # noqa: E402
                        reference_available)

if not reference_available():
    pytest.skip("reference repo not available", allow_module_level=True)
install_reference_shim()
install_torchvision_shim()

from no_time_to_train.models.matching_baseline_utils import (  # noqa: E402
    MemoryBank as TMemoryBank, compute_sim_global_avg,
    compute_sim_global_avg_with_neg, compute_semantic_ios)

from no_time_to_train_tpu.models.matching import memory_bank as mb  # noqa: E402
from no_time_to_train_tpu.models.matching import scoring  # noqa: E402

C, L, N, D, K, P = 3, 4, 25, 16, 4, 3


def _filled_banks(rng):
    tb = TMemoryBank({"category_num": C, "length": L, "feat_shape": (N, D)}, K, P)
    jb = mb.create(C, L, N, D, K, P)
    cats, fs, ms = [], [], []
    for c in range(C):
        for l in range(L):
            f = rng.standard_normal((N, D)).astype(np.float32)
            m = (rng.random(N) > 0.5).astype(np.float32)
            tb.feats[c, l] += torch.from_numpy(f)
            tb.masks[c, l] += torch.from_numpy(m)
            tb.fill_counts[c] += 1
            cats.append(c); fs.append(f); ms.append(m)
    jb = mb.fill(jb, jnp.asarray(cats, jnp.int32), jnp.asarray(np.stack(fs)),
                 jnp.asarray(np.stack(ms)))
    return tb, jb


def test_fill_and_postprocess(rng):
    tb, jb = _filled_banks(rng)
    np.testing.assert_array_equal(np.asarray(jb.fill_counts),
                                  tb.fill_counts.numpy())
    np.testing.assert_allclose(np.asarray(jb.feats),
                               tb.feats.numpy(), atol=1e-6)

    with torch.no_grad():
        tb.postprocess()
    jb = mb.postprocess(jb)

    np.testing.assert_allclose(np.asarray(jb.feats_avg), tb.feats_avg.numpy(),
                               atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(jb.feats_ins_avg),
                               tb.feats_ins_avg.numpy(), atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(jb.feats_covariances),
                               tb.feats_covariances.numpy(), atol=1e-3,
                               rtol=1e-2)
    np.testing.assert_allclose(np.asarray(jb.ins_sim_avg),
                               tb.ins_sim_avg.numpy(), atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(jb.pca_mean), tb.pca_mean.numpy(),
                               atol=1e-4, rtol=1e-4)
    # PCA components match up to tolerance (same covariance eigenvectors,
    # svd_flip sign convention)
    ref_c = tb.pca_components.numpy()
    got_c = np.asarray(jb.pca_components)
    for c in range(C):
        for p in range(P):
            r, g = ref_c[c, p], got_c[c, p]
            if np.dot(r, g) < 0:
                g = -g  # numerically near-tied max-|x| can flip sign
            np.testing.assert_allclose(g, r, atol=5e-3, rtol=5e-2)
    assert bool(jb.postprocessed)


def test_scoring_parity(rng):
    tb, jb = _filled_banks(rng)
    with torch.no_grad():
        tb.postprocess()
    jb = mb.postprocess(jb)

    n_masks, hw = 12, 64
    tar = rng.standard_normal((hw, D)).astype(np.float32)
    masks = rng.random((n_masks, hw)) > 0.6

    with torch.no_grad():
        ref_sim, ref_obj = compute_sim_global_avg(
            torch.from_numpy(tar), torch.from_numpy(masks),
            tb.feats_ins_avg, softmax=False, temp=1.0, ret_feats=True)
    got_sim, got_obj = scoring.sim_global_avg(
        jnp.asarray(tar), jnp.asarray(masks), jb.feats_ins_avg)
    np.testing.assert_allclose(np.asarray(got_sim), ref_sim.numpy(), atol=1e-4,
                               rtol=1e-3)
    np.testing.assert_allclose(np.asarray(got_obj), ref_obj.numpy(), atol=1e-4,
                               rtol=1e-3)

    # with negatives
    with torch.no_grad():
        ref_neg = compute_sim_global_avg_with_neg(
            torch.from_numpy(tar), torch.from_numpy(masks), tb.feats_avg,
            tb.feats_ins_avg, C, sigma=0.8)
    got_neg, _ = scoring.sim_global_avg_with_neg(
        jnp.asarray(tar), jnp.asarray(masks), jb.feats_avg, jb.feats_ins_avg,
        sigma=0.8)
    np.testing.assert_allclose(np.asarray(got_neg), ref_neg.numpy(), atol=1e-4,
                               rtol=1e-3)

    # semantic IoS
    labels = rng.integers(0, C, n_masks)
    obj_sim = np.clip(np.asarray(got_obj) @ np.asarray(got_obj).T, 0, None)
    masks2d = masks.reshape(n_masks, 8, 8)
    with torch.no_grad():
        ref_ios = compute_semantic_ios(
            torch.from_numpy(masks2d), torch.from_numpy(labels),
            torch.from_numpy(obj_sim.astype(np.float32)), C,
            use_semantic=True, rank_score=True)
    got_ios = scoring.semantic_ios(jnp.asarray(masks.reshape(n_masks, -1)),
                                   jnp.asarray(labels),
                                   jnp.asarray(obj_sim.astype(np.float32)))
    np.testing.assert_allclose(np.asarray(got_ios), ref_ios.numpy(), atol=1e-5,
                               rtol=1e-4)


def test_orbax_roundtrip(tmp_path, rng):
    from no_time_to_train_tpu.utils import checkpoint as ckpt_io
    import jax.numpy as jnp
    bank = mb.create(2, 2, 4, 8, 2, 2)
    bank = mb.fill(bank, jnp.asarray([0, 1], jnp.int32),
                   jnp.asarray(rng.standard_normal((2, 4, 8)), jnp.float32),
                   jnp.ones((2, 4)))
    bank = mb.postprocess(bank)
    path = str(tmp_path / "bank_orbax")
    ckpt_io.save_memory_bank_orbax(path, bank)
    bank2 = mb.create(2, 2, 4, 8, 2, 2)
    bank2, _ = ckpt_io.load_memory_bank_orbax(path, bank2)
    np.testing.assert_allclose(np.asarray(bank2.feats_avg),
                               np.asarray(bank.feats_avg), atol=1e-6)
    assert bool(bank2.postprocessed)


def test_batched_fill_order_matches_sequential(rng):
    """Batched fill must land references in identical slots as item-by-item
    fill (the reference's sequential order)."""
    b1 = mb.create(C, L, N, D, K, P)
    b2 = mb.create(C, L, N, D, K, P)
    cats = np.asarray([0, 0, 1, 2, 1, 0, 2, 2, 1, 0], np.int32)[:C * L][:8]
    feats = rng.standard_normal((len(cats), N, D)).astype(np.float32)
    masks = (rng.random((len(cats), N)) > 0.5).astype(np.float32)
    b1 = mb.fill(b1, jnp.asarray(cats), jnp.asarray(feats), jnp.asarray(masks))
    for i in range(len(cats)):
        b2 = mb.fill(b2, jnp.asarray(cats[i:i + 1]),
                     jnp.asarray(feats[i:i + 1]), jnp.asarray(masks[i:i + 1]))
    np.testing.assert_array_equal(np.asarray(b1.fill_counts),
                                  np.asarray(b2.fill_counts))
    np.testing.assert_allclose(np.asarray(b1.feats), np.asarray(b2.feats),
                               atol=0)
