"""Evaluation domains — equivalent of prover/src/domain.rs.

Holds sizes and cached limb power-series arrays for the constraint
evaluation domain; twiddles live inside the field backend's stage cache.
"""

from __future__ import annotations

import numpy as np

from ..ops.backend import get_backend


class StarkDomain:
    def __init__(self, air, backend=None):
        self.B = backend if backend is not None else get_backend(
            air.field_spec().name
        )
        self.trace_length = air.trace_length()
        self.ce_size = air.ce_domain_size()
        self.lde_size = air.lde_domain_size()
        self.domain_offset = air.domain_offset()
        self.ce_to_lde_blowup = self.lde_size // self.ce_size
        self.trace_to_lde_blowup = self.lde_size // self.trace_length
        self.trace_to_ce_blowup = self.ce_size // self.trace_length
        self._ce_powers = None  # lazy limb component of g_ce^i

    def ce_domain_generator(self) -> int:
        return self.B.get_root_of_unity(self.ce_size.bit_length() - 1)

    def lde_domain_generator(self) -> int:
        return self.B.get_root_of_unity(self.lde_size.bit_length() - 1)

    def ce_powers(self):
        """g_ce^i for i in [0, ce_size) as a limb component."""
        if self._ce_powers is None:
            self._ce_powers = self.B.power_series(
                self.ce_domain_generator(), self.ce_size
            )
        return self._ce_powers

    def ce_x(self):
        """x_i = offset * g_ce^i over the ce domain (limb component, (ce,))."""
        off = self.B.b_from_int(self.domain_offset, (1,))
        return self.B.bmul(self.ce_powers(), off)
