"""Rank-factored grid decoder — the TPU-native fast path for the NTTT batched
point-grid decode (reference Sam2MatchingBaseline_noAMG.py:258-331 semantics,
same math as MaskDecoder.predict_best_of_multimask, reorganized).

Why: with P prompts per chunk, the dense two-way transformer materializes and
re-projects per-prompt image keys [P, 4096, 256] five times (k/v/q
projections in layer 1 + the final attention + norm4), ~78 ms/step profiled
on one v5e. But the image side only ever changes through image<-token
cross-attention, whose output is `A @ V` with T token rows — a rank-(heads*T)
update. After the norm4 LayerNorms (row-affine), the per-prompt keys stay in
the form

    keys_i = alpha_i * base_i + (A_tilde @ G)_i

with `base` SHARED across prompts [4096, 256], per-prompt row scales
`alpha` [P, 4096] and factors `A_tilde` [P, 4096, r], `G` [P, r, 256]
(r <= ~133). Every downstream contraction (k/v/q projections, attention
logits, LN statistics, the first upscaling deconv) is evaluated against this
representation, so the per-prompt dense [P, 4096, 256] tensor is never
materialized anywhere in the decode.

Numerics: identical operations re-associated; statistics and softmax in fp32
exactly like the dense path (ops/attention.py, common._layer_norm). Verified
against MaskDecoder.predict_best_of_multimask in tests/test_factored_decode.py.

Measured on one v5e at P=256, T=8, C=256: ~on par with the dense decoder —
the saved [P, n, C] projections come back as [P, n, r~131] factor/stat
traffic (see MatchingConfig.decoder_impl). The asymptotics favor this path
for larger C or smaller T; it is kept as a verified, selectable alternative.
"""
import jax
import jax.numpy as jnp

from no_time_to_train_tpu.models.sam2.common import ACT


def _dense(p, x):
    return x @ p["kernel"].astype(x.dtype) + p["bias"].astype(x.dtype)


def _ln(p, x, eps=1e-5):
    """Matches common._layer_norm: fp32 stats, elementwise in x.dtype."""
    xf = x.astype(jnp.float32)
    u = xf.mean(axis=-1, keepdims=True)
    s = jnp.square(xf - u).mean(axis=-1, keepdims=True)
    inv = jax.lax.rsqrt(s + eps)
    if x.dtype == jnp.float32:
        y = (xf - u) * inv
        return y * p["weight"] + p["bias"]
    y = (x - u.astype(x.dtype)) * inv.astype(x.dtype)
    return y * p["weight"].astype(x.dtype) + p["bias"].astype(x.dtype)


def _mlp2(p, x, act="relu"):
    return _dense(p["layers_1"], ACT[act](_dense(p["layers_0"], x)))


def _mlp_n(p, x, n, act="relu", sigmoid_output=False):
    for i in range(n):
        x = _dense(p[f"layers_{i}"], x)
        if i < n - 1:
            x = ACT[act](x)
    return jax.nn.sigmoid(x) if sigmoid_output else x


def _split(x, heads):
    """[..., N, H*D] -> [..., H, N, D] (head-major channels, as Attention)."""
    *lead, n, c = x.shape
    return x.reshape(*lead, n, heads, c // heads).swapaxes(-2, -3)


def _merge(x):
    """[..., H, N, D] -> [..., N, H*D]."""
    *lead, h, n, d = x.shape
    return x.swapaxes(-2, -3).reshape(*lead, n, h * d)


def _softmax(logits):
    return jax.nn.softmax(logits.astype(jnp.float32), axis=-1)


def _token_attn(p, q_in, k_in, v_in, heads):
    """Dense attention for the tiny token side (T ~ 8), same numerics as
    Attention+sdpa."""
    qh = _split(_dense(p["q_proj"], q_in), heads)
    kh = _split(_dense(p["k_proj"], k_in), heads)
    vh = _split(_dense(p["v_proj"], v_in), heads)
    scale = 1.0 / jnp.sqrt(jnp.asarray(qh.shape[-1], qh.dtype))
    logits = jnp.einsum("...qd,...kd->...qk", qh, kh) * scale
    probs = _softmax(logits).astype(qh.dtype)
    out = jnp.einsum("...qk,...kd->...qd", probs, vh)
    return _dense(p["out_proj"], _merge(out))


def _ln_update(ln_p, alpha, base, At, G, eps=1e-5):
    """Apply keys = LN(alpha*base + At@G) to the factored representation,
    never materializing x = alpha*base + At@G.

    Row statistics expand algebraically: mu = alpha*mean(base) + At@mean(G),
    E[x^2] = alpha^2*||base||^2 + 2*alpha*<base, At@G> + rowquad(At, G@G^T).
    Returns (alpha', base', At', G') with base' = base * ln_weight (shared)
    and rank grown by 2 (the -mu rank-1 term and the LN bias)."""
    p_, n, r = At.shape
    c = base.shape[-1]
    dt = base.dtype
    a32 = (jnp.ones((p_, n), jnp.float32) if alpha is None
           else alpha.astype(jnp.float32))
    b32 = base.astype(jnp.float32)
    f32 = dict(preferred_element_type=jnp.float32)

    # large contractions run on bf16 operands with fp32 accumulation (MXU);
    # only the small [P, r, *] factors are cast — fp32 operand GEMMs measured
    # 3-4x slower and doubled the [P, n, r] intermediates' HBM footprint
    mu = a32 * b32.mean(-1)[None] + jnp.einsum(
        "pnr,pr->pn", At, G.astype(jnp.float32).mean(-1).astype(dt), **f32)
    kg = jnp.einsum("nc,prc->pnr", base, G, **f32).astype(dt)
    cross = jnp.einsum("pnr,pnr->pn", At, kg, **f32)
    gg = jnp.einsum("prc,psc->prs", G, G, **f32).astype(dt)
    agg = jnp.einsum("pnr,prs->pns", At, gg, **f32).astype(dt)
    quad = jnp.einsum("pns,pns->pn", agg, At, **f32)
    e2 = a32 * a32 * jnp.square(b32).sum(-1)[None] + 2.0 * a32 * cross + quad
    var = e2 / c - mu * mu
    inv = jax.lax.rsqrt(var + eps)                              # [P, n] fp32

    w = ln_p["weight"].astype(dt)
    b = ln_p["bias"].astype(dt)
    alpha_new = inv * a32
    base_new = base * w
    at_new = jnp.concatenate(
        [At * inv[..., None].astype(dt), (-inv * mu)[..., None].astype(dt),
         jnp.ones((p_, n, 1), dt)], axis=-1)
    g_new = jnp.concatenate(
        [G * w, jnp.broadcast_to(w[None, None], (p_, 1, c)),
         jnp.broadcast_to(b[None, None], (p_, 1, c))], axis=1)
    return alpha_new, base_new, at_new, g_new


def _t2i_factored(p, queries, qpe, alpha, base, At, G, pe, heads):
    """Token -> image cross-attention where image keys/values are factored.
    Returns attn_out [P, T, C]."""
    dt = base.dtype
    qh = _split(_dense(p["q_proj"], queries + qpe), heads)      # [P,H,T,d]
    wk, bk = p["k_proj"]["kernel"].astype(dt), p["k_proj"]["bias"].astype(dt)
    wv, bv = p["v_proj"]["kernel"].astype(dt), p["v_proj"]["bias"].astype(dt)
    # k input is keys + key_pe = alpha*base + At@G + pe; the pe and bias
    # terms are NOT scaled by alpha, so they get their own shared projections
    base_k = _split((base @ wk)[None], heads)[0]                # [H,n,d] shared
    pe_k = _split((pe @ wk + bk)[None], heads)[0]               # [H,n,d] shared
    base_v = _split((base @ wv)[None], heads)[0]
    fk = _split(G @ wk, heads)                                  # [P,H,r,d]
    fv = _split(G @ wv, heads)
    d = qh.shape[-1]
    bv_h = bv.reshape(heads, d)

    logits = (jnp.einsum("phtd,hnd->phtn", qh, base_k)
              * alpha.astype(dt)[:, None, None, :]
              + jnp.einsum("phtr,pnr->phtn",
                           jnp.einsum("phtd,phrd->phtr", qh, fk), At)
              + jnp.einsum("phtd,hnd->phtn", qh, pe_k))
    scale = 1.0 / jnp.sqrt(jnp.asarray(d, dt))
    probs = _softmax(logits * scale).astype(dt)                 # [P,H,T,n]

    out = (jnp.einsum("phtn,hnd->phtd",
                      probs * alpha.astype(dt)[:, None, None, :], base_v)
           + jnp.einsum("phtr,phrd->phtd",
                        jnp.einsum("phtn,pnr->phtr", probs, At), fv)
           + bv_h[None, :, None, :])
    return _dense(p["out_proj"], _merge(out))


def _i2t_factored(p, queries, qpe, alpha, base, At, G, pe, heads):
    """Image -> token cross-attention. Never materializes per-prompt image
    queries: logits fold the q-projection into the token keys. Returns the
    rank factors (A2 [P, n, H*T], G2 [P, H*T, C]) of its output plus the
    out_proj bias to be handled by the caller."""
    dt = base.dtype
    wq, bq = p["q_proj"]["kernel"].astype(dt), p["q_proj"]["bias"].astype(dt)
    kh = _split(_dense(p["k_proj"], queries + qpe), heads)      # [P,H,T,d]
    vh = _split(_dense(p["v_proj"], queries), heads)
    # q input is keys + key_pe; pe/bias terms are not scaled by alpha
    base_q = _split((base @ wq)[None], heads)[0]                # [H,n,d] shared
    pe_q = _split((pe @ wq + bq)[None], heads)[0]               # [H,n,d] shared
    cq = _split(G @ wq, heads)                                  # [P,H,r,d]
    d = kh.shape[-1]

    # keep n (4096) as the minor axis: softmax over the T tokens reduces the
    # SUBLANE axis; a T-minor layout padded T=8 lanes to 128 (16x memory)
    logits = (jnp.einsum("hnd,phtd->phtn", base_q, kh)
              * alpha.astype(dt)[:, None, None, :]
              + jnp.einsum("phrt,pnr->phtn",
                           jnp.einsum("phrd,phtd->phrt", cq, kh), At)
              + jnp.einsum("hnd,phtd->phtn", pe_q, kh))
    scale = 1.0 / jnp.sqrt(jnp.asarray(d, dt))
    probs = jax.nn.softmax((logits * scale).astype(jnp.float32),
                           axis=-2).astype(dt)                  # [P,H,T,n]

    wo = p["out_proj"]["kernel"].astype(dt)                     # [H*d, C]
    c = wo.shape[-1]
    g2 = jnp.einsum("phtd,hdc->phtc", vh,
                    wo.reshape(heads, d, c))                    # [P,H,T,C]
    p_, h_, t, n = probs.shape
    a2 = probs.transpose(0, 3, 1, 2).reshape(p_, n, h_ * t)
    g2 = g2.reshape(p_, h_ * t, c)
    return a2, g2, p["out_proj"]["bias"].astype(dt)


def factored_best_of_multimask(dp, image_embeddings, image_pe, sparse,
                               dense_embeddings, high_res_features,
                               num_heads=8, pred_obj_scores=True,
                               num_mask_tokens=4, mlp_act="relu",
                               iou_use_sigmoid=False):
    """Drop-in equivalent of MaskDecoder.predict_best_of_multimask operating
    on the raw param tree `dp` (= params["sam_mask_decoder"]).

    image_embeddings/dense_embeddings: [1, h, w, C]; image_pe [h, w, C];
    sparse [P, Ts, C]. Returns (mask [P, 4h, 4w], iou_best [P])."""
    dt = image_embeddings.dtype
    s = 1 if pred_obj_scores else 0
    toks = [dp["iou_token"], dp["mask_tokens"]]
    if pred_obj_scores:
        toks = [dp["obj_score_token"]] + toks
    output_tokens = jnp.concatenate([t.astype(dt) for t in toks], axis=0)
    p_ = sparse.shape[0]
    tokens = jnp.concatenate(
        [jnp.broadcast_to(output_tokens[None], (p_,) + output_tokens.shape),
         sparse.astype(dt)], axis=1)                            # [P, T, C]

    _, h, w, c = image_embeddings.shape
    n = h * w
    src0 = (image_embeddings + dense_embeddings)[0].reshape(n, c)
    pe = image_pe.reshape(n, c).astype(dt)
    tp = dp["transformer"]

    # ---- layer 0: image side is shared across prompts
    l0 = tp["layers_0"]
    queries = _token_attn(l0["self_attn"], tokens, tokens, tokens, num_heads)
    queries = _ln(l0["norm1"], queries)

    # t2i on shared keys0 (alpha=1, no rank): dense shared projections
    ca = l0["cross_attn_token_to_image"]
    qh = _split(_dense(ca["q_proj"], queries + tokens), num_heads)
    k0 = _split(_dense(ca["k_proj"], (src0 + pe)[None]), num_heads)[0]
    v0 = _split(_dense(ca["v_proj"], src0[None]), num_heads)[0]
    d_ca = qh.shape[-1]
    scale = 1.0 / jnp.sqrt(jnp.asarray(d_ca, dt))
    probs = _softmax(jnp.einsum("phtd,hnd->phtn", qh, k0) * scale).astype(dt)
    attn_out = _dense(ca["out_proj"],
                      _merge(jnp.einsum("phtn,hnd->phtd", probs, v0)))
    queries = _ln(l0["norm2"], queries + attn_out)
    queries = _ln(l0["norm3"], queries + _mlp2(l0["mlp"], queries, mlp_act))

    # i2t: produces the first rank factors
    a0, g0, bo0 = _i2t_factored(l0["cross_attn_image_to_token"], queries,
                                tokens, jnp.ones((p_, n), dt), src0,
                                jnp.zeros((p_, n, 1), dt),
                                jnp.zeros((p_, 1, c), dt), pe, num_heads)
    base = src0 + bo0[None]                      # fold out_proj bias (shared)
    alpha, base, at, g = _ln_update(l0["norm4"], None, base, a0, g0)

    # ---- layer 1
    l1 = tp["layers_1"]
    q_sa = queries + tokens
    queries = queries + _token_attn(l1["self_attn"], q_sa, q_sa, queries,
                                    num_heads)
    queries = _ln(l1["norm1"], queries)
    attn_out = _t2i_factored(l1["cross_attn_token_to_image"], queries, tokens,
                             alpha, base, at, g, pe, num_heads)
    queries = _ln(l1["norm2"], queries + attn_out)
    queries = _ln(l1["norm3"], queries + _mlp2(l1["mlp"], queries, mlp_act))
    a2, g2, bo2 = _i2t_factored(l1["cross_attn_image_to_token"], queries,
                                tokens, alpha, base, at, g, pe, num_heads)
    atc = jnp.concatenate([at, a2, jnp.ones((p_, n, 1), dt)], axis=-1)
    gc = jnp.concatenate([g, g2, jnp.broadcast_to(bo2[None, None],
                                                  (p_, 1, c))], axis=1)
    alpha, base, at, g = _ln_update(l1["norm4"], alpha, base, atc, gc)

    # ---- final attention token -> image + final norm
    attn_out = _t2i_factored(tp["final_attn_token_to_image"], queries, tokens,
                             alpha, base, at, g, pe, num_heads)
    queries = _ln(tp["norm_final_attn"], queries + attn_out)

    # ---- heads
    iou_pred = _mlp_n(dp["iou_prediction_head"], queries[:, s, :], 3, mlp_act,
                      sigmoid_output=iou_use_sigmoid)
    mask_tokens_out = queries[:, s + 1: s + 1 + num_mask_tokens, :]
    best = jnp.argmax(iou_pred[:, 1:], axis=-1) + 1
    bi = jnp.arange(p_)
    hyper_all = jnp.stack(
        [_mlp_n(dp[f"output_hypernetworks_mlps_{i}"], mask_tokens_out[:, i, :],
                3, mlp_act) for i in range(num_mask_tokens)], axis=1)
    hyper_best = hyper_all[bi, best]

    # ---- upscaling: fold the first deconv GEMM into the factored form
    c1 = c // 4
    c2 = c // 8
    k1 = dp["output_upscaling_0_weight"].transpose(0, 2, 3, 1).reshape(c, 4 * c1)
    k1 = k1.astype(dt)
    t1 = (jnp.einsum("nm,pn->pnm", base @ k1, alpha.astype(dt))
          + jnp.einsum("pnr,prm->pnm", at, g @ k1))
    t1 = (t1.reshape(p_, h, w, 2, 2, c1)
          + dp["output_upscaling_0_bias"].astype(dt))

    if high_res_features is not None:
        feat_s0, feat_s1 = high_res_features
        s1u = feat_s1.reshape(-1, h, 2, w, 2, c1).transpose(0, 1, 3, 2, 4, 5)
        t1 = _ln(dp["output_upscaling_1"], t1 + s1u, eps=1e-6)
    else:
        t1 = _ln(dp["output_upscaling_1"], t1, eps=1e-6)
    u = ACT["gelu"](t1)

    k2 = dp["output_upscaling_3_weight"].transpose(0, 2, 3, 1).reshape(c1, 4 * c2)
    t2 = jnp.dot(u.reshape(p_ * h * w * 4, c1), k2.astype(u.dtype),
                 preferred_element_type=u.dtype)
    t2 = (t2.reshape(p_, h, w, 2, 2, 2, 2, c2)
          + dp["output_upscaling_3_bias"].astype(dt))
    if high_res_features is not None:
        s0u = feat_s0.reshape(-1, h, 2, 2, w, 2, 2, c2)
        t2 = t2 + s0u.transpose(0, 1, 4, 2, 5, 3, 6, 7)
    gmask = ACT["gelu"](t2)
    mask_u = jnp.einsum("bc,byxpqrsc->byxpqrs", hyper_best, gmask)
    mask = mask_u.transpose(0, 1, 3, 5, 2, 4, 6).reshape(p_, 4 * h, 4 * w)
    return mask, iou_pred[bi, best]
