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


def sharded_ntt(mesh, n: int, n1: int = None):
    """Multi-chip NTT: the six-step decomposition with the transpose as an
    ICI all-to-all (SURVEY.md §2.9 P3 — the reference's split_radix_fft
    concurrency, prover/src/matrix/segments.rs:232-271, lifted to chips).

    A size-n transform viewed as (n1, n2) is sharded on the column axis:
      1. local column NTTs (size n1) over each device's n2/d columns
      2. local twiddle multiply w^(i2*k1)
      3. all_to_all transpose -> (n2, n1) sharded on its column axis
      4. local column NTTs (size n2)
    Input/output: (lo, hi) pairs of shape (n1, n2) / (n2, n1), sharded on
    axis 1; the flattened row-major output is the natural-order NTT.
    """
    import jax
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P

    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("ignore", DeprecationWarning)
        from jax.experimental.shard_map import shard_map

    from ..math import scalar as fs
    from ..ops import gl64 as gl, ntt
    from ..ops.ntt import _ntt_axis0

    if n1 is None:
        n1 = 1 << ((n.bit_length() - 1) // 2)
    n2 = n // n1
    d = mesh.devices.size
    root = fs.get_root_of_unity(n.bit_length() - 1)

    # per-device twiddle block: tw[k1, i2_local] with global i2 offset
    base = tuple(np.asarray(x) for x in ntt.power_series(root, n2))
    cur = gl.from_u64(np.ones(n2, dtype=np.uint64))
    rows = []
    for _ in range(n1):
        rows.append(cur)
        cur = gl.mul(cur, base)
    twl_full = np.stack([r[0] for r in rows])  # (n1, n2)
    twh_full = np.stack([r[1] for r in rows])

    def local_step(lo, hi, twl, twh):
        # lo/hi: (n1, n2/d) local columns
        a = _ntt_axis0(((lo, hi),))[0]
        b = gl.mul(a, (twl, twh))
        # all_to_all transpose: split rows across devices, concat columns
        # (n1, n2/d) -> gather row-blocks (n1/d, n2) on each device, i.e.
        # global transpose to (n2, n1) sharded by its second axis
        blo = jax.lax.all_to_all(b[0], "dp", split_axis=0, concat_axis=1, tiled=True)
        bhi = jax.lax.all_to_all(b[1], "dp", split_axis=0, concat_axis=1, tiled=True)
        # now (n1/d, n2) — transpose locally to (n2, n1/d)
        tlo, thi = blo.T, bhi.T
        c = _ntt_axis0(((tlo, thi),))[0]
        return c[0], c[1]

    fn = shard_map(
        local_step,
        mesh=mesh,
        in_specs=(P(None, "dp"), P(None, "dp"), P(None, "dp"), P(None, "dp")),
        out_specs=(P(None, "dp"), P(None, "dp")),
        check_rep=False,
    )
    jitted = jax.jit(fn)

    def run(pair):
        """pair: (lo, hi) of shape (n1, n2) (natural row-major view)."""
        return jitted(pair[0], pair[1], twl_full, twh_full)

    return run


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
    from jax.sharding import NamedSharding, PartitionSpec as P

    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("ignore", DeprecationWarning)
        from jax.experimental.shard_map import shard_map

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
