"""Batched device->host transfers.

Through the tunneled TPU backend every ``np.asarray`` on a device array is
a ~100ms round trip, and eager fancy-indexing additionally pays a remote
compile whenever the index-array shape changes (query counts vary per
proof).  These helpers pack what the host actually needs into ONE jitted
dispatch + ONE transfer, with index shapes padded to power-of-two buckets
so kernels cache across proofs.
"""

from __future__ import annotations

import numpy as np

_PACK_KERNELS = {}
_QGATHER_KERNELS = {}


def pull_planes(planes):
    """Pull a list of device arrays to host in one packed transfer; returns
    numpy arrays of the original shapes (numpy inputs pass through)."""
    if isinstance(planes[0], np.ndarray):
        return [np.asarray(p) for p in planes]
    import jax
    import jax.numpy as jnp

    key = tuple(tuple(p.shape) for p in planes)
    fn = _PACK_KERNELS.get(key)
    if fn is None:
        fn = jax.jit(lambda arrs: jnp.concatenate([a.ravel() for a in arrs]))
        _PACK_KERNELS[key] = fn
    flat = np.asarray(fn(tuple(planes)))
    out = []
    o = 0
    for p in planes:
        size = int(np.prod(p.shape))
        out.append(flat[o : o + size].reshape(p.shape))
        o += size
    return out


def pull_comps(comps):
    """comps: tuple of (lo, hi) device pairs -> host numpy, one transfer."""
    flat = pull_planes([l for c in comps for l in c])
    return tuple((flat[2 * i], flat[2 * i + 1]) for i in range(len(comps)))


def pull_rows(comps, positions, axis):
    """comps: tuple of components (each a tuple of limb arrays, any arity)
    -> same structure on host with ``positions`` gathered along ``axis``;
    one bucketed jitted dispatch."""
    sizes = [len(c) for c in comps]
    flat = [l for c in comps for l in c]
    if isinstance(flat[0], np.ndarray):
        pidx = np.asarray(positions)
        g = [np.take(a, pidx, axis=axis) for a in flat]
    else:
        import jax
        import jax.numpy as jnp

        q = len(positions)
        bucket = max(8, 1 << (q - 1).bit_length())
        key = (len(flat), tuple(flat[0].shape), axis, bucket)
        fn = _QGATHER_KERNELS.get(key)
        if fn is None:

            def gather(arrs, ix):
                return jnp.stack([jnp.take(a, ix, axis=axis) for a in arrs])

            fn = jax.jit(gather)
            _QGATHER_KERNELS[key] = fn
        ix = jnp.asarray(
            np.pad(np.asarray(positions, dtype=np.int32), (0, bucket - q))
        )
        stacked = np.asarray(fn(tuple(flat), ix))
        sl = [slice(None)] * (stacked.ndim - 1)
        sl[axis] = slice(0, q)
        g = [stacked[i][tuple(sl)] for i in range(len(flat))]
    it = iter(g)
    return tuple(tuple(next(it) for _ in range(s)) for s in sizes)


_MULTI_KERNELS = {}


def pull_rows_many(specs):
    """specs: list of (comps, positions, axis) — every positional gather of
    the proof-assembly tail in ONE jitted dispatch + ONE transfer (each
    spec alone costs a tunnel round trip; the tail issues ~7).  Returns a
    list of pull_rows-shaped results."""
    flat_specs = []
    for comps, positions, axis in specs:
        sizes = [len(c) for c in comps]
        arrs = [l for c in comps for l in c]
        flat_specs.append((arrs, sizes, positions, axis))
    if isinstance(flat_specs[0][0][0], np.ndarray):
        return [pull_rows(c, p, a) for (c, p, a) in specs]
    import jax
    import jax.numpy as jnp

    buckets = []
    key_parts = []
    for arrs, sizes, positions, axis in flat_specs:
        q = len(positions)
        bucket = max(8, 1 << (q - 1).bit_length())
        buckets.append(bucket)
        key_parts.append(
            (len(arrs), tuple(arrs[0].shape), axis, bucket)
        )
    key = tuple(key_parts)
    fn = _MULTI_KERNELS.get(key)
    if fn is None:
        axes = [a for (_, _, _, a) in flat_specs]

        def gather(spec_arrs, spec_ix):
            outs = []
            for arrs, ix, axis in zip(spec_arrs, spec_ix, axes):
                outs.append(
                    jnp.stack([jnp.take(a, ix, axis=axis) for a in arrs]).ravel()
                )
            return jnp.concatenate(outs)

        fn = jax.jit(gather)
        _MULTI_KERNELS[key] = fn
    spec_arrs = tuple(tuple(arrs) for (arrs, _, _, _) in flat_specs)
    spec_ix = tuple(
        jnp.asarray(
            np.pad(
                np.asarray(positions, dtype=np.int32),
                (0, bucket - len(positions)),
            )
        )
        for (_, _, positions, _), bucket in zip(flat_specs, buckets)
    )
    flat = np.asarray(fn(spec_arrs, spec_ix))
    out = []
    o = 0
    for (arrs, sizes, positions, axis), bucket in zip(flat_specs, buckets):
        q = len(positions)
        shape = list(arrs[0].shape)
        shape[axis] = bucket
        block = len(arrs) * int(np.prod(shape))
        stacked = flat[o : o + block].reshape((len(arrs),) + tuple(shape))
        o += block
        sl = [slice(None)] * (stacked.ndim - 1)
        sl[axis] = slice(0, q)
        g = [stacked[i][tuple(sl)] for i in range(len(arrs))]
        it = iter(g)
        comps, _, _ = specs[len(out)]
        out.append(
            tuple(tuple(next(it) for _ in range(len(c))) for c in comps)
        )
    return out
