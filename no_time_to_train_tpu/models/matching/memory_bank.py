"""Per-class memory bank of masked-pooled DINO features.

TPU-native rewrite of reference no_time_to_train/models/matching_baseline_utils.py
:538-656. The bank is an immutable pytree (flax.struct) so fill/postprocess jit
cleanly; postprocess runs fully on device (the reference round-trips to CPU for
sklearn PCA, matching_baseline_utils.py:641-654 — here PCA is an eigh of the
covariance that is computed anyway, and k-means is a fixed-iteration masked
Lloyd loop matching :58-85).
"""
from functools import partial

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class MemoryBank:
    fill_counts: jnp.ndarray        # [C] int32
    feats: jnp.ndarray              # [C, L, N, D]
    masks: jnp.ndarray              # [C, L, N]
    feats_avg: jnp.ndarray          # [C, D]
    feats_ins_avg: jnp.ndarray      # [C, L, D]
    feats_covariances: jnp.ndarray  # [C, D, D]
    feats_centers: jnp.ndarray      # [C, K, D]
    ins_sim_avg: jnp.ndarray        # [C]
    pca_mean: jnp.ndarray           # [C, D]
    pca_components: jnp.ndarray     # [C, P, D]
    postprocessed: jnp.ndarray      # [] bool

    @property
    def n_classes(self):
        return self.feats.shape[0]

    @property
    def length(self):
        return self.feats.shape[1]


def create(n_classes, length, feat_n, feat_dim, kmeans_k=4, n_pca=3,
           dtype=jnp.float32):
    return MemoryBank(
        fill_counts=jnp.zeros((n_classes,), jnp.int32),
        feats=jnp.zeros((n_classes, length, feat_n, feat_dim), dtype),
        masks=jnp.zeros((n_classes, length, feat_n), dtype),
        feats_avg=jnp.zeros((n_classes, feat_dim), dtype),
        feats_ins_avg=jnp.zeros((n_classes, length, feat_dim), dtype),
        feats_covariances=jnp.zeros((n_classes, feat_dim, feat_dim), dtype),
        feats_centers=jnp.zeros((n_classes, kmeans_k, feat_dim), dtype),
        ins_sim_avg=jnp.zeros((n_classes,), dtype),
        pca_mean=jnp.zeros((n_classes, feat_dim), dtype),
        pca_components=jnp.zeros((n_classes, n_pca, feat_dim), dtype),
        postprocessed=jnp.asarray(False),
    )


@jax.jit
def fill(bank: MemoryBank, cat_inds, feats, masks):
    """Write a batch of reference features into the bank, sequentially (so
    duplicate classes within one batch land in successive slots — matching the
    gather-then-loop of the reference, Sam2MatchingBaseline_noAMG.py:478-485).

    cat_inds: [B] int32; feats: [B, N, D]; masks: [B, N].
    """
    def body(carry, item):
        feats_b, masks_b, counts = carry
        cat, f, m = item
        slot = counts[cat]
        feats_b = feats_b.at[cat, slot].add(f)
        masks_b = masks_b.at[cat, slot].add(m)
        counts = counts.at[cat].add(1)
        return (feats_b, masks_b, counts), None

    (feats_b, masks_b, counts), _ = jax.lax.scan(
        body, (bank.feats, bank.masks, bank.fill_counts),
        (cat_inds, feats.astype(bank.feats.dtype), masks.astype(bank.masks.dtype)))
    return bank.replace(feats=feats_b, masks=masks_b, fill_counts=counts)


def _kmeans_masked(feats, weights, k, n_iter, key):
    """Lloyd iterations with cosine assignment over weighted rows.

    feats [M, D], weights [M] in {0,1}. Init picks k random foreground rows
    (reference uses torch.randperm — RNG differs, outputs are vis-only)."""
    m, d = feats.shape
    noise = jax.random.uniform(key, (m,))
    # top-k foreground rows by random score = random fg sample without repl.
    score = jnp.where(weights > 0, noise, -1.0)
    init_idx = jnp.argsort(-score)[:k]
    centers = feats[init_idx]

    fnorm = feats / jnp.maximum(
        jnp.linalg.norm(feats, axis=-1, keepdims=True), 1e-12)

    def body(centers, _):
        cnorm = centers / jnp.maximum(
            jnp.linalg.norm(centers, axis=-1, keepdims=True), 1e-12)
        sim = fnorm @ cnorm.T  # [M, k]
        assign = jnp.argmax(sim, axis=1)
        onehot = jax.nn.one_hot(assign, k, dtype=feats.dtype) * weights[:, None]
        sums = onehot.T @ feats            # [k, D]
        cnts = onehot.sum(axis=0)[:, None]  # [k, 1]
        new_centers = jnp.where(cnts > 0, sums / jnp.maximum(cnts, 1), centers)
        return new_centers, None

    centers, _ = jax.lax.scan(body, centers, None, length=n_iter)
    centers = centers / jnp.maximum(
        jnp.linalg.norm(centers, axis=-1, keepdims=True), 1e-12)
    return centers


def kmeans_decouple(feats, feats_fore, k, n_iter=100, key=None):
    """Decoupled k-means (reference matching_baseline_utils.py:88-126):
    cluster assignment driven by foreground features, centers re-estimated
    from the full features."""
    import jax
    if key is None:
        key = jax.random.PRNGKey(0)
    m = feats.shape[0]
    idx = jax.random.permutation(key, m)[:k]
    centers = feats_fore[idx]

    def norm(x):
        return x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True),
                               1e-12)

    def body(centers, _):
        assign = jnp.argmax(norm(feats) @ norm(centers).T, axis=1)
        onehot = jax.nn.one_hot(assign, k, dtype=feats.dtype)
        sums = onehot.T @ feats_fore
        cnts = onehot.sum(0)[:, None]
        new = jnp.where(cnts > 0, sums / jnp.maximum(cnts, 1), centers)
        return new, None

    centers, _ = jax.lax.scan(body, centers, None, length=n_iter)
    assign = jnp.argmax(norm(feats_fore) @ norm(centers).T, axis=-1)
    onehot = jax.nn.one_hot(assign, k, dtype=feats.dtype)
    sums = onehot.T @ feats
    cnts = onehot.sum(0)[:, None]
    centers = jnp.where(cnts > 0, sums / jnp.maximum(cnts, 1), centers)
    return norm(centers)


def kmeans_pp_init(feats, k, key):
    """k-means++ seeding (reference matcher_utils.py:30): iteratively pick
    points far (L2) from the chosen set."""
    import jax
    m = feats.shape[0]
    k0, key = jax.random.split(key)
    first = jax.random.randint(k0, (), 0, m)
    centers = jnp.zeros((k, feats.shape[1]), feats.dtype).at[0].set(
        feats[first])

    def body(i, carry):
        centers, key = carry
        d2_all = jnp.sum((feats[:, None, :] - centers[None]) ** 2, -1)
        d2 = jnp.min(
            d2_all + jnp.where(jnp.arange(k)[None, :] >= i, jnp.inf, 0.0),
            axis=1)
        key, sub = jax.random.split(key)
        probs = d2 / jnp.maximum(d2.sum(), 1e-12)
        nxt = jax.random.choice(sub, m, p=probs)
        return centers.at[i].set(feats[nxt]), key

    centers, _ = jax.lax.fori_loop(1, k, body, (centers, key))
    return centers


def _pca_from_cov(cov, mean, n_comp):
    """Top principal components via eigh, sklearn svd_flip sign convention."""
    evals, evecs = jnp.linalg.eigh(cov)  # ascending
    comps = evecs[:, ::-1][:, :n_comp].T  # [P, D]
    # sign flip: largest-|x| entry of each component made positive
    idx = jnp.argmax(jnp.abs(comps), axis=1)
    signs = jnp.sign(comps[jnp.arange(n_comp), idx])
    signs = jnp.where(signs == 0, 1.0, signs)
    return comps * signs[:, None]


@partial(jax.jit, static_argnames=("n_iter",))
def postprocess(bank: MemoryBank, key=None, n_iter: int = 100):
    """Class/instance prototypes, covariance, mean pairwise instance sim,
    k-means centers, PCA — all on device (reference :574-656)."""
    if key is None:
        key = jax.random.PRNGKey(0)
    c, l, n, d = bank.feats.shape
    k = bank.feats_centers.shape[1]
    n_pca = bank.pca_components.shape[1]
    f32 = jnp.float32

    masks = bank.masks.astype(f32)
    feats = bank.feats.astype(f32)

    # class prototypes (masked average over all fg pixels of all shots)
    msum_g = masks.sum(axis=(1, 2))[:, None]
    msum_g = jnp.where(msum_g == 0, 1.0, msum_g)
    feats_avg = (feats * masks[..., None]).sum(axis=(1, 2)) / msum_g

    # instance prototypes
    msum_i = masks.sum(axis=2)[..., None]
    msum_i = jnp.where(msum_i == 0, 1.0, msum_i)
    feats_ins_avg = (feats * masks[..., None]).sum(axis=2) / msum_i

    # per-class covariance of fg pixels around the class prototype
    def cov_one(args):
        f, m, avg = args  # [L,N,D], [L,N], [D]
        x = (f - avg).reshape(l * n, d)
        w = m.reshape(l * n)
        n_fg = w.sum()
        sigma = (x * w[:, None]).T @ x / jnp.maximum(n_fg, 1.0)
        return jnp.where(n_fg > 0, sigma, jnp.eye(d, dtype=f32))

    covs = jax.lax.map(cov_one, (feats, masks, feats_avg))

    # mean pairwise cosine sim of instance prototypes (off-diagonal)
    ins_norm = feats_ins_avg / jnp.maximum(
        jnp.linalg.norm(feats_ins_avg, axis=-1, keepdims=True), 1e-12)
    sim = jnp.einsum("cld,cmd->clm", ins_norm, ins_norm)
    slot_valid = (jnp.arange(l)[None, :]
                  < bank.fill_counts[:, None]).astype(f32)  # [C, L]
    pair = slot_valid[:, :, None] * slot_valid[:, None, :]
    pair = pair * (1.0 - jnp.eye(l)[None])
    denom = pair.sum(axis=(1, 2))
    ins_sim = jnp.where(denom > 0, (sim * pair).sum(axis=(1, 2))
                        / jnp.maximum(denom, 1.0), 0.0)

    # k-means over fg pixels (only when n_fg >= k, reference :631-638)
    keys = jax.random.split(key, c)
    def km_one(args):
        f, m, kk, old = args
        centers = _kmeans_masked(f.reshape(l * n, d), m.reshape(l * n), k,
                                 n_iter, kk)
        return jnp.where(m.sum() >= k, centers, old)
    centers = jax.lax.map(km_one, (feats, masks, keys, bank.feats_centers))

    # PCA from covariance (mean is the class prototype; reference fits sklearn
    # PCA on fg rows whose mean IS feats_avg, so eigh(cov) is equivalent)
    def pca_one(args):
        cov, mean, m, old = args
        comps = _pca_from_cov(cov, mean, n_pca)
        ok = m.sum() >= n_pca
        return jnp.where(ok, comps, old), jnp.where(ok, mean, 0.0)
    pca_comps, pca_means = jax.lax.map(
        pca_one, (covs, feats_avg, masks, bank.pca_components))

    dt = bank.feats.dtype
    return bank.replace(
        feats_avg=feats_avg.astype(dt),
        feats_ins_avg=feats_ins_avg.astype(dt),
        feats_covariances=covs.astype(dt),
        ins_sim_avg=ins_sim.astype(dt),
        feats_centers=centers.astype(dt),
        pca_mean=pca_means.astype(dt),
        pca_components=pca_comps.astype(dt),
        postprocessed=jnp.asarray(True),
    )
