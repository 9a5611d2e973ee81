"""Single-pass Pallas LayerNorm for the bf16 encoder paths.

XLA lowers each LayerNorm in the Hiera/DINO blocks as a convert+reduce
fusion pair with f32 intermediates and (2,1)-packed relayouts — profiled at
~0.74 ms for a [1024, 64, 144] stage-1 norm whose HBM floor (read + write
bf16 once) is ~0.05 ms; the whole class costs ~11 ms of the flagship step.
This kernel reads each row block once, computes f32 statistics in VMEM and
writes the normalized bf16 rows back — no f32 materialization, no relayout.

Numerics mirror `models/sam2/common._layer_norm`'s compute-dtype branch
exactly (f32 stats, elementwise normalize in bf16, same cast points), so it
is a drop-in for the bf16 path; the f32 path keeps the XLA formulation the
torch-parity tests anchor on. No JVP/VJP rules — gated off under
`ops.upscale_product.no_fusion()` (SAM2Ref training) like the decode
kernels. Reference: sam2/modeling/sam2_utils.py LayerNorm2d and the
nn.LayerNorm uses in hieradet.py/DINOv2 (torch fuses these on GPU via
aten::native_layer_norm; this is the TPU equivalent).
"""
import functools

import numpy as np
import jax
import jax.numpy as jnp

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu  # noqa: F401
    _HAS_PALLAS = True
except Exception:  # pragma: no cover
    _HAS_PALLAS = False

# tests flip this to run through the Pallas interpreter on CPU
_INTERPRET = False


def _ln_kernel(x_ref, w_ref, b_ref, o_ref, *, eps):
    x = x_ref[...]
    dt = x.dtype
    xf = x.astype(jnp.float32)
    u = jnp.mean(xf, axis=-1, keepdims=True)
    s = jnp.mean(jnp.square(xf - u), axis=-1, keepdims=True)
    inv = jax.lax.rsqrt(s + eps)
    y = (x - u.astype(dt)) * inv.astype(dt)
    y = y * w_ref[0].astype(dt) + b_ref[0].astype(dt)
    o_ref[...] = y


def ln_fusible(x, min_rows=1024):
    """True when the Pallas LN applies: bf16 compute on a TPU-resident
    trace, rows a multiple of 8 and large enough that kernel launch
    overhead is amortized (tiny token-side norms stay in XLA)."""
    from no_time_to_train_tpu.ops.upscale_product import (
        default_device_is_cpu, fusion_disabled)
    if not _HAS_PALLAS or x.ndim < 2 or x.dtype != jnp.bfloat16:
        return False
    r = int(np.prod(x.shape[:-1]))
    return (r % 8 == 0 and r >= min_rows and x.shape[-1] >= 16
            and not default_device_is_cpu() and not fusion_disabled())


def layer_norm_pallas(x, weight, bias, eps, row_block=4096,
                      interpret=False):
    """LayerNorm over the last axis of `x` (any leading shape), bf16 in/out,
    f32 statistics — numerics identical to `_layer_norm`'s bf16 branch."""
    interpret = interpret or _INTERPRET
    shape = x.shape
    c = shape[-1]
    r = int(np.prod(shape[:-1]))
    # ln_fusible guarantees this for the gated call sites; direct callers
    # must satisfy it too — the rb halving loop below can otherwise reach a
    # block size violating the TPU sublane-8 constraint and fail to lower
    assert r % 8 == 0, (
        f"layer_norm_pallas needs rows % 8 == 0, got {r} (shape {shape}); "
        "use the XLA _layer_norm formulation for ragged row counts")
    x2 = x.reshape(r, c)
    # the kernel's f32 temporaries cost ~16 bytes/element of scoped vmem
    # (stack limit 16M): cap the block at ~512k elements, rounded down to a
    # power of two so the halving loop can still reach a divisor of r
    cap = max(8, 1 << ((512 * 1024 // c).bit_length() - 1))
    rb = min(row_block, r, cap)
    while r % rb:
        rb //= 2
    out = pl.pallas_call(
        functools.partial(_ln_kernel, eps=eps),
        grid=(r // rb,),
        in_specs=[
            pl.BlockSpec((rb, c), lambda i: (i, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((rb, c), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((r, c), x.dtype),
        interpret=interpret,
        **({} if interpret else dict(compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)))),
    )(x2, weight[None], bias[None])
    return out.reshape(shape)
