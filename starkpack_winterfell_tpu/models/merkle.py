"""Merkle authentication-path AIR over Rp64_256.

Re-creation of the upstream Winterfell `merkle` example family (removed from
the fork — SURVEY.md §2.8), rebuilt on this framework's Rescue-Prime: the
trace proves knowledge of a private leaf and authentication path hashing to
a public root.  Each tree level is one Rp64_256 merge = 8 trace rows
(7 permutation rounds + 1 absorb row); a 13th column carries the index bit
that decides on which side the accumulated digest enters the next merge.

Transition constraints (13, combined by the round/absorb mask):
  round rows:  MDS(cur^7) + ARK1[r] == (INV_MDS(next - ARK2[r]))^7   (cols 0..11)
  absorb row:  next[0] == 8;  next[1..4] == 0
               (1-b) * (next[4+i] - cur[4+i]) == 0   i < 4   (digest left)
               b     * (next[8+i] - cur[4+i]) == 0   i < 4   (digest right)
  bit column:  (1-flag) * b * (1-b) == 0
"""

from __future__ import annotations

import numpy as np

from ..air import Air, AirContext, Assertion, TransitionConstraintDegree
from ..crypto.rescue import ARK1, ARK2, INV_MDS, MDS, NUM_ROUNDS, STATE_WIDTH
from ..math import scalar as fs
from ..ops.felt import mds_apply
from ..prover.pipeline import Prover
from ..prover.trace import TraceTable
from .rescue_chain import CYCLE_LENGTH, _round_ints

TRACE_WIDTH = STATE_WIDTH + 1  # 12 state columns + index bit


class MerklePathInputs:
    def __init__(self, root):
        self.root = list(root)  # 4 digest elements

    def to_elements(self):
        return list(self.root)


class MerklePathAir(Air):
    def __init__(self, trace_info, pub_inputs, options):
        degrees = [
            TransitionConstraintDegree.with_cycles(7, [CYCLE_LENGTH])
            for _ in range(STATE_WIDTH)
        ] + [TransitionConstraintDegree.with_cycles(3, [CYCLE_LENGTH])]
        self.context = AirContext(trace_info, degrees, 8, options)
        self.root = pub_inputs.root

    def evaluate_transition(self, frame, periodic_values, result):
        cur = frame.current()
        nxt = frame.next()
        flag = periodic_values[0]
        ark1 = periodic_values[1 : 1 + STATE_WIDTH]
        ark2 = periodic_values[1 + STATE_WIDTH : 1 + 2 * STATE_WIDTH]
        b = cur[STATE_WIDTH]
        one = 1

        cur7 = [cur[i] ** 7 for i in range(STATE_WIDTH)]
        fwd = mds_apply(cur7, MDS)
        fwd = [f + ark1[i] for i, f in enumerate(fwd)]
        diff = [nxt[i] - ark2[i] for i in range(STATE_WIDTH)]
        bwd = [b**7 for b in mds_apply(diff, INV_MDS)]

        # absorb-row constraints
        absorb = [None] * STATE_WIDTH
        absorb[0] = nxt[0] - 8
        for i in range(1, 4):
            absorb[i] = nxt[i]
        for i in range(4):
            absorb[4 + i] = (one - b) * (nxt[4 + i] - cur[4 + i])
            absorb[8 + i] = b * (nxt[8 + i] - cur[4 + i])

        for i in range(STATE_WIDTH):
            result[i] = flag * (fwd[i] - bwd[i]) + (one - flag) * absorb[i]
        result[STATE_WIDTH] = (one - flag) * b * (one - b)

    def get_assertions(self):
        last = self.trace_length() - 1
        assertions = [Assertion.single(0, 0, 8)]
        for i in range(1, 4):
            assertions.append(Assertion.single(i, 0, 0))
        for i, v in enumerate(self.root):
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


def build_merkle_path_trace(leaf, siblings, index: int) -> TraceTable:
    """leaf: 4 elements; siblings: list of 4-element digests (one per tree
    level); index: leaf position (bits select digest side per level)."""
    depth = len(siblings)
    length = CYCLE_LENGTH * depth
    cols = np.zeros((TRACE_WIDTH, length), dtype=np.uint64)
    digest = [v % fs.P for v in leaf]
    for lvl in range(depth):
        bit = (index >> lvl) & 1
        sib = [v % fs.P for v in siblings[lvl]]
        rate = sib + digest if bit else digest + sib
        state = [8, 0, 0, 0] + rate
        base = lvl * CYCLE_LENGTH
        cols[:STATE_WIDTH, base] = state
        cols[STATE_WIDTH, base : base + CYCLE_LENGTH] = bit
        for r in range(NUM_ROUNDS):
            state = _round_ints(state, r)
            cols[:STATE_WIDTH, base + r + 1] = state
        digest = state[4:8]
        # the absorb row (base+7 -> base+8) injects the next level's state;
        # the bit for the NEXT level governs that transition, so store it on
        # the absorb row of this cycle
        if lvl + 1 < depth:
            next_bit = (index >> (lvl + 1)) & 1
            cols[STATE_WIDTH, base + CYCLE_LENGTH - 1] = next_bit
    return TraceTable.from_u64_columns(cols)


def compute_root(leaf, siblings, index: int):
    """Host oracle: fold the path with Rp64_256 merges."""
    from ..crypto.rescue import Rp64_256

    digest = b"".join(int(v % fs.P).to_bytes(8, "little") for v in leaf)
    for lvl, sib in enumerate(siblings):
        sib_b = b"".join(int(v % fs.P).to_bytes(8, "little") for v in sib)
        bit = (index >> lvl) & 1
        digest = Rp64_256.merge(sib_b, digest) if bit else Rp64_256.merge(digest, sib_b)
    return [int.from_bytes(digest[i * 8 : (i + 1) * 8], "little") for i in range(4)]


class MerklePathProver(Prover):
    air_class = MerklePathAir

    def __init__(self, options, hasher):
        self._options = options
        self.hasher = hasher

    def get_pub_inputs(self, trace: TraceTable) -> MerklePathInputs:
        last = trace.length - 1
        return MerklePathInputs([trace.get(4 + i, last) for i in range(4)])

    def options(self):
        return self._options
