"""Multi-chip sharding — the distributed prover the reference planned but
never built (README.md:43, FriProof.num_partitions hook at fri/src/proof.rs:93).

Parallel axes (SURVEY.md §2.9):
  - 'dp' (instances): StarkPack's batch axis — each device proves a shard of
    the aggregated traces (P1).
  - rows: Merkle leaf hashing and subtree build shard by LDE rows per device,
    roots reduce via all_gather (P7/P8).

Everything rides jax.sharding.Mesh + shard_map with XLA collectives; the
Fiat-Shamir channel stays on the host (it is inherently sequential and tiny).
"""

from __future__ import annotations

import functools

import numpy as np


def make_mesh(n_devices: int = None, axis: str = "dp"):
    import jax
    from jax.sharding import Mesh

    devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    return Mesh(np.array(devices[:n_devices]), (axis,))


def sharded_trace_commitment(mesh, hasher, blowup: int, domain_offset: int = 7):
    """Returns a jitted function computing the combined-row trace commitment
    root for a batch of traces sharded across the 'dp' mesh axis.

    Input: (lo, hi) uint32 arrays of shape (n_traces, width, length), sharded
    on axis 0.  Per device: local iNTT + coset LDE; all_gather of LDE shards;
    each device hashes its row range into Merkle subtree roots; subtree roots
    all_gather; replicated top-of-tree (mirrors merkle/concurrent.rs:22-70,
    with the rayon fan-out replaced by ICI collectives).
    """
    import jax
    import jax.numpy as jnp
    from jax.experimental.shard_map import shard_map
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ..ops import ntt
    from ..utils.convert import rows_to_words

    n_dev = mesh.devices.size

    def local_step(lo, hi):
        # (n/d, w, len) -> LDE (n/d, w, L)
        polys = ntt.interpolate_poly(((lo, hi),))
        lde = ntt.evaluate_poly_with_offset(polys, domain_offset, blowup)
        lde_lo, lde_hi = lde[0]
        # gather all traces' LDEs (instance axis) for the combined rows
        all_lo = jax.lax.all_gather(lde_lo, "dp", axis=0, tiled=True)  # (n, w, L)
        all_hi = jax.lax.all_gather(lde_hi, "dp", axis=0, tiled=True)
        n, w, L = all_lo.shape
        rows_per_dev = L // n_dev
        d = jax.lax.axis_index("dp")
        start = d * rows_per_dev
        # this device's row range across all traces: (n, w, rows) -> rows-major
        my_lo = jax.lax.dynamic_slice_in_dim(all_lo, start, rows_per_dev, axis=2)
        my_hi = jax.lax.dynamic_slice_in_dim(all_hi, start, rows_per_dev, axis=2)
        # (n, w, r) -> (r, n, w) -> (r, n*w)
        rlo = jnp.transpose(my_lo, (2, 0, 1)).reshape(rows_per_dev, n * w)
        rhi = jnp.transpose(my_hi, (2, 0, 1)).reshape(rows_per_dev, n * w)
        words = rows_to_words(((rlo, rhi),), 1)
        leaves = hasher.hash_words(words, n * w * 8)  # (r, 8)
        # local subtree -> root
        cur = leaves
        while cur.shape[0] > 1:
            cur = hasher.merge_words(cur[0::2], cur[1::2])
        roots = jax.lax.all_gather(cur[0], "dp", axis=0)  # (n_dev, 8)
        # replicated top of tree
        top = roots
        while top.shape[0] > 1:
            top = hasher.merge_words(top[0::2], top[1::2])
        return top[0]

    fn = shard_map(
        local_step,
        mesh=mesh,
        in_specs=(P("dp"), P("dp")),
        out_specs=P(),
        check_rep=False,
    )
    return jax.jit(fn)
