"""Rescue-Prime hash-chain / VDF AIR over f64.

Re-creation of the upstream Winterfell `rescue` example family (removed from
the fork — SURVEY.md §2.8) rebuilt around this framework's Rp64_256: the
trace iterates the Rescue-XLIX permutation, one round per row, in cycles of
8 rows (7 rounds + 1 copy row).  Periodic columns carry the round constants
and the round/copy mask; transition constraints use the classic half-forward
/ half-backward formulation so the degree stays at 7:

  round rows:  MDS(cur^7) + ARK1[r]  ==  (INV_MDS(next - ARK2[r]))^7
  copy rows:   next == cur
"""

from __future__ import annotations

import numpy as np

from ..air import Air, AirContext, Assertion, TransitionConstraintDegree
from ..crypto.rescue import (
    ARK1,
    ARK2,
    INV_MDS,
    MDS,
    NUM_ROUNDS,
    STATE_WIDTH,
    apply_permutation_ints,
)
from ..crypto import rescue as _rescue
from ..math import scalar as fs
from ..ops.felt import mds_apply
from ..prover.pipeline import Prover
from ..prover.trace import TraceTable

CYCLE_LENGTH = 8  # 7 rounds + 1 copy row


class ChainInputs:
    def __init__(self, seed, result):
        """seed: 8 rate elements; result: 4 digest elements."""
        self.seed = list(seed)
        self.result = list(result)

    def to_elements(self):
        return self.seed + self.result


class RescueChainAir(Air):
    def __init__(self, trace_info, pub_inputs, options):
        degrees = [
            TransitionConstraintDegree.with_cycles(7, [CYCLE_LENGTH])
            for _ in range(STATE_WIDTH)
        ]
        self.context = AirContext(trace_info, degrees, 16, options)
        self.seed = pub_inputs.seed
        self.result = pub_inputs.result

    def evaluate_transition(self, frame, periodic_values, result):
        cur = frame.current()
        nxt = frame.next()
        flag = periodic_values[0]
        ark1 = periodic_values[1 : 1 + STATE_WIDTH]
        ark2 = periodic_values[1 + STATE_WIDTH : 1 + 2 * STATE_WIDTH]

        # forward half: MDS(cur^7) + ark1
        cur7 = [c**7 for c in cur]
        fwd = mds_apply(cur7, MDS)
        fwd = [f + ark1[i] for i, f in enumerate(fwd)]

        # backward half: (INV_MDS(next - ark2))^7
        diff = [nxt[i] - ark2[i] for i in range(STATE_WIDTH)]
        bwd = [b**7 for b in mds_apply(diff, INV_MDS)]

        one = 1
        for i in range(STATE_WIDTH):
            round_c = fwd[i] - bwd[i]
            copy_c = nxt[i] - cur[i]
            result[i] = flag * round_c + (one - flag) * copy_c

    def get_assertions(self):
        last = self.trace_length() - 1
        assertions = []
        for i in range(4):
            assertions.append(Assertion.single(i, 0, 0))  # capacity zeros
        for i, v in enumerate(self.seed):
            assertions.append(Assertion.single(4 + i, 0, v))
        for i, v in enumerate(self.result):
            assertions.append(Assertion.single(4 + i, last, v))
        return assertions

    def get_periodic_column_values(self):
        flag = [1] * NUM_ROUNDS + [0] * (CYCLE_LENGTH - NUM_ROUNDS)
        cols = [flag]
        for i in range(STATE_WIDTH):
            cols.append([ARK1[r][i] for r in range(NUM_ROUNDS)] + [0])
        for i in range(STATE_WIDTH):
            cols.append([ARK2[r][i] for r in range(NUM_ROUNDS)] + [0])
        return cols


def build_chain_trace(seed, num_permutations: int, device=None) -> TraceTable:
    """Trace rows: row 8c+k = state after k rounds of permutation c; row
    8c+7 holds the permutation output, copied into row 8(c+1).

    The chain is one long scalar dependency (x^(1/7) is ~98 serial
    multiplies per round), so no accelerator width can hide the latency —
    the reference builds it with a sequential row scan on the CPU
    (trace_table.rs:230-243).  Long chains therefore use the native C
    builder (native/builders.cpp, bit-identical, ~300x the Python loop);
    a ``lax.scan`` accelerator build (`device=True`) is kept as the
    no-compiler fallback.

    Long traces also get a DEVICE EXPANDER (TraceTable.set_device_builder):
    device provers upload only every 8th row (the permutation inputs) and
    recreate the 7 in-between round rows on device — the tunneled TPU moves
    ~10-20 MB/s, so shipping 1/8th of the trace and re-deriving the rest
    with data-parallel rounds cuts the dominant proving phase."""
    trace = _build_chain_trace_host(seed, num_permutations, device)
    if trace.length >= (1 << 14):
        _attach_device_expander(trace)
    return trace


def _build_chain_trace_host(seed, num_permutations: int, device=None) -> TraceTable:
    native = _build_chain_trace_native(seed, num_permutations)
    if native is not None:
        return native
    if device is None:
        device = num_permutations >= (1 << 12)
    if device:
        try:
            return _build_chain_trace_scan(seed, num_permutations)
        except ImportError:
            pass  # jax unavailable -> host loop; real bugs propagate
    length = CYCLE_LENGTH * num_permutations
    cols = np.zeros((STATE_WIDTH, length), dtype=np.uint64)
    state = [0, 0, 0, 0] + [s % fs.P for s in seed]
    for c in range(num_permutations):
        base = c * CYCLE_LENGTH
        cols[:, base] = state
        for r in range(NUM_ROUNDS):
            state = _round_ints(state, r)
            cols[:, base + r + 1] = state
        # rows base+7 is the output; the copy constraint carries it to the
        # next cycle's row 0 (or it is the final row)
    return TraceTable.from_u64_columns(cols)


def _build_chain_trace_native(seed, num_permutations: int):
    """Native sequential builder (native/builders.cpp rescue_chain_trace);
    None if no C compiler is available."""
    import ctypes

    from ..native import get_builders

    lib = get_builders()
    if lib is None:
        return None
    length = CYCLE_LENGTH * num_permutations
    seed8 = np.asarray([s % fs.P for s in seed], dtype=np.uint64)
    mds = np.asarray(MDS, dtype=np.uint64)
    ark1 = np.asarray(ARK1, dtype=np.uint64)
    ark2 = np.asarray(ARK2, dtype=np.uint64)
    out = np.empty((STATE_WIDTH, length), dtype=np.uint64)
    vp = ctypes.c_void_p
    lib.rescue_chain_trace(
        seed8.ctypes.data_as(vp), num_permutations,
        mds.ctypes.data_as(vp), ark1.ctypes.data_as(vp),
        ark2.ctypes.data_as(vp), _rescue.INV_ALPHA,
        out.ctypes.data_as(vp),
    )
    return TraceTable.from_u64_columns(out)


_SCAN_CACHE = {}


def _build_chain_trace_scan(seed, num_permutations: int) -> TraceTable:
    import jax
    import jax.numpy as jnp

    from ..ops import gl64 as gl, vec

    key = num_permutations
    if key not in _SCAN_CACHE:
        mds = gl.from_u64(np.array(MDS, dtype=np.uint64))  # (12, 12)
        ark1 = gl.from_u64(np.array(ARK1, dtype=np.uint64))  # (7, 12)
        ark2 = gl.from_u64(np.array(ARK2, dtype=np.uint64))

        def mds_mul(s):  # s: pair (12,)
            prod = gl.mul((jnp.asarray(mds[0]), jnp.asarray(mds[1])),
                          (s[0][None, :], s[1][None, :]))
            return vec.vsum((prod,), axis=-1)[0]

        def round_fn(s, r):
            s = gl.exp7(s)
            s = mds_mul(s)
            s = gl.add(s, (jnp.asarray(ark1[0][r]), jnp.asarray(ark1[1][r])))
            s = gl.exp_int(s, _rescue.INV_ALPHA)
            s = mds_mul(s)
            s = gl.add(s, (jnp.asarray(ark2[0][r]), jnp.asarray(ark2[1][r])))
            return s

        def body(carry, _):
            rows = [carry]
            s = carry
            for r in range(NUM_ROUNDS):
                s = round_fn(s, r)
                rows.append(s)
            ys = (jnp.stack([p[0] for p in rows[:CYCLE_LENGTH]]),
                  jnp.stack([p[1] for p in rows[:CYCLE_LENGTH]]))
            return s, ys

        def run(state0):
            _, ys = jax.lax.scan(body, state0, None, length=num_permutations)
            # (num_perms, 8, 12) -> (length, 12)
            return tuple(y.reshape(num_permutations * CYCLE_LENGTH,
                                   STATE_WIDTH) for y in ys)

        _SCAN_CACHE[key] = jax.jit(run)

    state0_u64 = np.array([0, 0, 0, 0] + [s % fs.P for s in seed],
                          dtype=np.uint64)
    s0 = tuple(np.asarray(x) for x in gl.from_u64(state0_u64))
    out = _SCAN_CACHE[key](s0)
    cols = gl.to_u64((np.asarray(out[0]), np.asarray(out[1]))).T.copy()
    return TraceTable.from_u64_columns(cols)


_EXPAND_CACHE = {}


def _attach_device_expander(trace: TraceTable):
    """See build_chain_trace: upload the (width, length/8) permutation-input
    rows, expand rounds 1..7 per cycle on device (bit-identical gl64 math —
    differential-tested in tests/test_models.py)."""

    def build():
        import jax
        import jax.numpy as jnp

        from ..ops import gl64 as gl

        cols = trace.main_columns_u64()  # (12, L) u64 host
        length = cols.shape[1]
        n_cycles = length // CYCLE_LENGTH
        bounds = np.ascontiguousarray(cols[:, ::CYCLE_LENGTH])  # (12, C)
        pair = gl.from_u64(bounds)

        key = (STATE_WIDTH, n_cycles)
        if key not in _EXPAND_CACHE:
            # rounds MUST be rolled (lax.scan): 7 unrolled rounds of chained
            # gl.muls hit the known XLA:CPU deep-limb-chain compile runaway
            # (CLAUDE.md) — the rolled body compiles once
            ark1 = gl.from_u64(np.asarray(ARK1, dtype=np.uint64))  # (7, 12)
            ark2 = gl.from_u64(np.asarray(ARK2, dtype=np.uint64))

            def round_body(carry, arks):
                lo, hi = carry  # (12, C)
                a1lo, a1hi, a2lo, a2hi = arks  # (12,)
                state = [(lo[i], hi[i]) for i in range(STATE_WIDTH)]
                state = [gl.exp7(x) for x in state]
                state = gl.mds_circulant(state, _rescue.MDS_ROW0)
                state = [
                    gl.add(x, (a1lo[i], a1hi[i]))
                    for i, x in enumerate(state)
                ]
                state = [gl.exp_int(x, _rescue.INV_ALPHA) for x in state]
                state = gl.mds_circulant(state, _rescue.MDS_ROW0)
                state = [
                    gl.add(x, (a2lo[i], a2hi[i]))
                    for i, x in enumerate(state)
                ]
                nlo = jnp.stack([x[0] for x in state])
                nhi = jnp.stack([x[1] for x in state])
                return (nlo, nhi), (nlo, nhi)

            def expand(lo, hi):
                arks = (jnp.asarray(ark1[0]), jnp.asarray(ark1[1]),
                        jnp.asarray(ark2[0]), jnp.asarray(ark2[1]))
                _, ys = jax.lax.scan(round_body, (lo, hi), arks)
                out = []
                for plane, first in ((0, lo), (1, hi)):
                    rows = jnp.concatenate(
                        [first[None], ys[plane]], axis=0
                    )  # (8, 12, C)
                    out.append(
                        jnp.transpose(rows, (1, 2, 0)).reshape(
                            STATE_WIDTH, n_cycles * CYCLE_LENGTH
                        )
                    )
                return out[0], out[1]

            _EXPAND_CACHE[key] = jax.jit(expand)
        return _EXPAND_CACHE[key](*pair)

    trace.set_device_builder(build)


def _round_ints(state, r):
    state = [pow(x, 7, fs.P) for x in state]
    state = [
        sum(MDS[i][j] * state[j] for j in range(STATE_WIDTH)) % fs.P
        for i in range(STATE_WIDTH)
    ]
    state = [(x + c) % fs.P for x, c in zip(state, ARK1[r])]
    state = [pow(x, _rescue.INV_ALPHA, fs.P) for x in state]
    state = [
        sum(MDS[i][j] * state[j] for j in range(STATE_WIDTH)) % fs.P
        for i in range(STATE_WIDTH)
    ]
    state = [(x + c) % fs.P for x, c in zip(state, ARK2[r])]
    return state


class RescueChainProver(Prover):
    air_class = RescueChainAir

    def __init__(self, options, hasher):
        self._options = options
        self.hasher = hasher

    def get_pub_inputs(self, trace: TraceTable) -> ChainInputs:
        last = trace.length - 1
        seed = [trace.get(4 + i, 0) for i in range(8)]
        result = [trace.get(4 + i, last) for i in range(4)]
        return ChainInputs(seed, result)

    def options(self):
        return self._options
