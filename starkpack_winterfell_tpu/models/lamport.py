"""Lamport+ one-time-signature verification AIR.

Re-creation of the upstream Winterfell `lamport` example family (removed
from the fork — SURVEY.md §2.8), rebuilt on this framework's field-native
Rescue-Prime.  The statement: "I know preimages s_i with H(s_i) = pk_{i,b_i}
for every bit b_i of the public message m, where the pk pairs hash to the
public key PK".

Trace (26 columns, cycles of 8 rows, k message bits, k+1 cycles):
  A (cols 0..11):  per-cycle Rescue hash of the revealed secret s_i
                   (state reset each cycle: [4,0,0,0, s_i, 0,0,0,0])
  B (cols 12..23): running sponge accumulating the pk pairs; at the end of
                   cycle i it absorbs (h_i0, h_i1) where the revealed-side
                   hash comes from A's digest (routed by bit b_i) and the
                   other side is a signature witness
  b (col 24):      message bit for the cycle (boolean at absorb rows)
  m (col 25):      message accumulator m' = 2m + b at absorb rows

Assertions pin A/B initial capacities, m(0)=0, final B digest == PK, and
final m == message.  The public key equals
Rp64_256.hash_elements(h_00,h_01,...,h_{k-1}0,h_{k-1}1) — verifiable against
the host hasher (crypto/rescue.py).

The reference config pairs this AIR family with SHA3 transcript hashing; the
base field here is the framework's native f64 (the upstream example's f128
variant awaits multi-field protocol integration, see CLAUDE.md).
"""

from __future__ import annotations

import numpy as np

from ..air import Air, AirContext, Assertion, TransitionConstraintDegree
from ..crypto.rescue import ARK1, ARK2, INV_MDS, MDS, NUM_ROUNDS, STATE_WIDTH, Rp64_256
from ..math import scalar as fs
from ..ops.felt import mds_apply
from ..prover.pipeline import Prover
from ..prover.trace import TraceTable
from .rescue_chain import CYCLE_LENGTH, _round_ints

A0 = 0  # A state columns 0..11
B0 = STATE_WIDTH  # B state columns 12..23
BIT = 2 * STATE_WIDTH  # 24
MSG = BIT + 1  # 25
TRACE_WIDTH = MSG + 1


class LamportInputs:
    def __init__(self, message: int, pub_key):
        self.message = message
        self.pub_key = list(pub_key)  # 4 elements

    def to_elements(self):
        return [self.message] + self.pub_key


class LamportAir(Air):
    def __init__(self, trace_info, pub_inputs, options):
        L = trace_info.length
        degrees = (
            [TransitionConstraintDegree.with_cycles(7, [CYCLE_LENGTH]) for _ in range(STATE_WIDTH)]
            + [TransitionConstraintDegree.with_cycles(7, [CYCLE_LENGTH, L]) for _ in range(STATE_WIDTH)]
            + [TransitionConstraintDegree.with_cycles(2, [CYCLE_LENGTH])]
            + [TransitionConstraintDegree.with_cycles(1, [CYCLE_LENGTH])]
        )
        self.context = AirContext(trace_info, degrees, 26, options)
        self.message = pub_inputs.message
        self.pub_key = pub_inputs.pub_key

    def evaluate_transition(self, frame, periodic_values, result):
        cur = frame.current()
        nxt = frame.next()
        flag = periodic_values[0]
        ark1 = periodic_values[1 : 1 + STATE_WIDTH]
        ark2 = periodic_values[1 + STATE_WIDTH : 1 + 2 * STATE_WIDTH]
        first7 = periodic_values[1 + 2 * STATE_WIDTH]
        one = 1
        b = cur[BIT]

        def round_constraints(base):
            state = [cur[base + i] for i in range(STATE_WIDTH)]
            nstate = [nxt[base + i] for i in range(STATE_WIDTH)]
            s7 = [s**7 for s in state]
            fwd = mds_apply(s7, MDS)
            fwd = [f + ark1[i] for i, f in enumerate(fwd)]
            diff = [nstate[i] - ark2[i] for i in range(STATE_WIDTH)]
            bwd = [b**7 for b in mds_apply(diff, INV_MDS)]
            return [fwd[i] - bwd[i] for i in range(STATE_WIDTH)]

        round_a = round_constraints(A0)
        round_b = round_constraints(B0)

        # A absorb: next_A = [4, 0, 0, 0, free, free, free, free, 0, 0, 0, 0]
        absorb_a = [None] * STATE_WIDTH
        absorb_a[0] = nxt[A0] - 4
        for i in range(1, 4):
            absorb_a[i] = nxt[A0 + i]
        for i in range(4, 8):
            absorb_a[i] = cur[BIT] - cur[BIT]  # identically zero (free slot)
        for i in range(8, 12):
            absorb_a[i] = nxt[A0 + i]

        # B absorb: capacity carries; the revealed-side hash (A digest, in
        # cur A[4..8]) lands left when b == 0, right when b == 1; the other
        # side is a free witness
        absorb_b = [None] * STATE_WIDTH
        for i in range(4):
            absorb_b[i] = nxt[B0 + i] - cur[B0 + i]
        for i in range(4):
            absorb_b[4 + i] = (one - b) * (
                nxt[B0 + 4 + i] - cur[B0 + 4 + i] - cur[A0 + 4 + i]
            )
            absorb_b[8 + i] = b * (
                nxt[B0 + 8 + i] - cur[B0 + 8 + i] - cur[A0 + 4 + i]
            )

        copy_b = [nxt[B0 + i] - cur[B0 + i] for i in range(STATE_WIDTH)]

        for i in range(STATE_WIDTH):
            result[i] = flag * round_a[i] + (one - flag) * absorb_a[i]
        for i in range(STATE_WIDTH):
            regular = flag * round_b[i] + (one - flag) * absorb_b[i]
            result[STATE_WIDTH + i] = first7 * copy_b[i] + (one - first7) * regular
        result[BIT] = (one - flag) * b * (one - b)
        result[MSG] = flag * (nxt[MSG] - cur[MSG]) + (one - flag) * (
            nxt[MSG] - cur[MSG] - cur[MSG] - b
        )

    def get_assertions(self):
        last = self.trace_length() - 1
        k = self.trace_length() // CYCLE_LENGTH - 1
        assertions = [Assertion.single(A0, 0, 4)]
        for i in range(1, 4):
            assertions.append(Assertion.single(A0 + i, 0, 0))
        for i in range(8, 12):
            assertions.append(Assertion.single(A0 + i, 0, 0))
        assertions.append(Assertion.single(B0, 0, 8 * k))
        for i in range(1, 12):
            assertions.append(Assertion.single(B0 + i, 0, 0))
        assertions.append(Assertion.single(MSG, 0, 0))
        for i, v in enumerate(self.pub_key):
            assertions.append(Assertion.single(B0 + 4 + i, last, v))
        assertions.append(Assertion.single(MSG, last, self.message))
        return assertions

    def get_periodic_column_values(self):
        L = self.trace_length()
        flag = [1] * NUM_ROUNDS + [0] * (CYCLE_LENGTH - NUM_ROUNDS)
        cols = [flag]
        for i in range(STATE_WIDTH):
            cols.append([ARK1[r][i] for r in range(NUM_ROUNDS)] + [0])
        for i in range(STATE_WIDTH):
            cols.append([ARK2[r][i] for r in range(NUM_ROUNDS)] + [0])
        first7 = [1] * NUM_ROUNDS + [0] * (L - NUM_ROUNDS)
        cols.append(first7)
        return cols


# ---------------------------------------------------------------------------
# key generation / signing / trace building (host-side "wallet")
# ---------------------------------------------------------------------------


def keygen(k: int, seed: int = 0):
    """k message bits -> secrets[bit][side] (4 elements each) + pk pairs."""
    rng = np.random.default_rng(seed)
    secrets = [
        [
            [int(x) for x in rng.integers(0, fs.P, size=4, dtype=np.uint64)]
            for _ in range(2)
        ]
        for _ in range(k)
    ]
    pk_hashes = [
        [_hash4(secrets[i][0]), _hash4(secrets[i][1])] for i in range(k)
    ]
    flat = []
    for h0, h1 in pk_hashes:
        flat.extend(h0)
        flat.extend(h1)
    pub_key = _digest_elems(Rp64_256.hash_elements(flat))
    return secrets, pk_hashes, pub_key


def sign(secrets, pk_hashes, message: int, k: int):
    """Returns per-bit (revealed secret, other-side hash)."""
    sig = []
    for i in range(k):
        bit = (message >> (k - 1 - i)) & 1
        sig.append((secrets[i][bit], pk_hashes[i][1 - bit]))
    return sig


def build_lamport_trace(message: int, sig, k: int) -> TraceTable:
    length = CYCLE_LENGTH * (k + 1)
    cols = np.zeros((TRACE_WIDTH, length), dtype=np.uint64)
    a_state = [0] * STATE_WIDTH
    b_state = [8 * k] + [0] * (STATE_WIDTH - 1)
    m = 0
    for c in range(k + 1):
        base = c * CYCLE_LENGTH
        if c < k:
            bit = (message >> (k - 1 - c)) & 1
            revealed, other = sig[c]
            a_state = [4, 0, 0, 0] + [v % fs.P for v in revealed] + [0, 0, 0, 0]
        else:
            bit = 0
            a_state = [4, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]
        # write cycle rows
        a_cur = list(a_state)
        b_cur = list(b_state)
        for r in range(CYCLE_LENGTH):
            row = base + r
            cols[A0 : A0 + STATE_WIDTH, row] = a_cur
            cols[B0 : B0 + STATE_WIDTH, row] = b_cur
            cols[BIT, row] = bit
            cols[MSG, row] = m
            if r < NUM_ROUNDS:
                a_cur = _round_ints(a_cur, r)
                if c >= 1:  # B idles (copies) during cycle 0
                    b_cur = _round_ints(b_cur, r)
        # absorb transition into the next cycle's row 0
        if c < k:
            h = a_cur[4:8]  # A digest = hash of revealed secret
            left = list(other) if bit else list(h)
            right = list(h) if bit else list(other)
            nb = list(b_cur)
            for i in range(4):
                nb[4 + i] = (nb[4 + i] + left[i]) % fs.P
                nb[8 + i] = (nb[8 + i] + right[i]) % fs.P
            b_state = nb
            m = (2 * m + bit) % fs.P
    return TraceTable.from_u64_columns(cols)


def _hash4(elements):
    return _digest_elems(Rp64_256.hash_elements([v % fs.P for v in elements]))


def _digest_elems(digest: bytes):
    return [int.from_bytes(digest[i * 8 : (i + 1) * 8], "little") for i in range(4)]


class LamportProver(Prover):
    air_class = LamportAir

    def __init__(self, options, hasher):
        self._options = options
        self.hasher = hasher

    def get_pub_inputs(self, trace: TraceTable) -> LamportInputs:
        last = trace.length - 1
        pub_key = [trace.get(B0 + 4 + i, last) for i in range(4)]
        return LamportInputs(trace.get(MSG, last), pub_key)

    def options(self):
        return self._options
