"""Packed host->device upload for large parameter trees over a slow link.

`jax.device_put` of a param tree issues one transfer per leaf (~700 for the
flagship pair). Through the remote-TPU tunnel each transfer pays ~30 ms of
fixed overhead and small transfers never reach the link's streaming rate
(measured: 31 MB/s for one 300 MB buffer vs 17 MB/s for 300 x 1 MB — and
the flagship's leaf-wise upload measured 339 s for ~1 GB, 10x the bandwidth
bound). `packed_device_put` concatenates the leaves into ONE contiguous
buffer per dtype on the host, ships each buffer in a single transfer, and
slices the leaves back out in one jitted device-side unpack (cached by the
persistent compilation cache across runs).

The reference has no equivalent problem (torch .cuda() streams over PCIe);
this is remote-TPU plumbing, keyed to utils/cache.py's tunnel conventions.
"""
import numpy as np


def _dtype_key(a):
    return str(a.dtype)


def packed_device_put(tree, min_leaves=17, min_bytes=64 << 20):
    """Upload a numpy pytree as one buffer per dtype + a jitted unpack.
    Falls back to plain jax.device_put for small trees (tiny test matchers,
    already-on-device leaves) where packing only adds a compile."""
    import jax

    leaves, treedef = jax.tree_util.tree_flatten(tree)
    total = sum(getattr(l, "nbytes", 0) for l in leaves)
    if (len(leaves) < min_leaves or total < min_bytes
            or not all(isinstance(l, np.ndarray) for l in leaves)):
        return jax.device_put(tree)

    by_dtype = {}
    for i, l in enumerate(leaves):
        by_dtype.setdefault(_dtype_key(l), []).append(i)

    bufs = {}
    layout = {}  # dtype -> [(leaf_idx, offset, size, shape)]
    for dt, idxs in by_dtype.items():
        flat = [np.ascontiguousarray(leaves[i]).reshape(-1) for i in idxs]
        offs = np.cumsum([0] + [f.size for f in flat])
        layout[dt] = [(i, int(offs[j]), int(flat[j].size), leaves[i].shape)
                      for j, i in enumerate(idxs)]
        bufs[dt] = np.concatenate(flat) if len(flat) > 1 else flat[0]

    dbufs = {dt: jax.device_put(b) for dt, b in bufs.items()}

    def unpack(bufs_):
        out = [None] * len(leaves)
        for dt, entries in layout.items():
            b = bufs_[dt]
            for i, off, size, shape in entries:
                out[i] = jax.lax.dynamic_slice(b, (off,),
                                               (size,)).reshape(shape)
        return out

    out_leaves = jax.jit(unpack)(dbufs)
    return jax.tree_util.tree_unflatten(treedef, out_leaves)
