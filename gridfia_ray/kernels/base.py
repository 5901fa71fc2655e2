"""Kernel protocol: pure numpy batch→batch raster calculations.

The tabular analog of the reference's ``ForestCalculation`` ABC
(``gridfia/core/calculations/base.py:34-131``): a kernel consumes a
*species stack* — all species layers of one tile, assembled by the keyed
groupby on ``cell_id`` — and returns one 2-D result tile.

Conventions (deliberate deltas from the reference, SURVEY.md §4.4):

* The pre-computed total layer is a row like any other
  (``species_code == '0000'``). Stacks arrive in *catalog order*:
  ``'0000'`` first (when included), then ascending species code — the
  tabular mirror of the reference's sorted-filename layer order
  (``gridfia/api.py:367``). Kernels split it off by code instead of the
  per-kernel ``exclude_total_layer`` branches.
* Math is float64 internally (the reference computes in float32); the
  declared ``output_dtype`` is applied at the sink. Unit tests pin
  closed-form values; the DuckDB oracle does the same double math.
* Whole-extent statistics (occurrence frequency, dominance percent, the
  any-biomass flag) are *global*, not per-chunk — kernels that need them
  declare it and read them from ``KernelContext``; a separate global
  aggregation pass computes them (fixes the reference's per-chunk
  frequency dependence, ``species.py:220-226``).
* Failure protocol: kernels raise; the pipeline catches per tile and
  emits the NaN / sentinel fill of the reference
  (``forest_metrics.py:440-483``) plus a status column.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

import numpy as np

TOTAL_CODE = "0000"


@dataclass
class KernelContext:
    """Broadcast global state for two-phase kernels.

    ``occurrence_freq``: species_code → fraction of extent pixels with
    biomass > threshold (for rare/common species).
    ``dominance_percent``: species_code → % of extent pixels where the
    species is the argmax (for species_dominance).
    ``extent_has_biomass``: whether any pixel in the whole extent has
    biomass (pins the inverse-Simpson empty-pixel value globally; the
    reference's per-chunk ``np.any(valid_mask)`` branch makes it
    chunk-dependent, ``diversity.py:178-197``).
    ``catalog``: full species-code order ([total, *sorted codes]) used
    for dominant-species index semantics.
    """

    occurrence_freq: dict[str, float] | None = None
    dominance_percent: dict[str, float] | None = None
    extent_has_biomass: bool = True
    catalog: list[str] = field(default_factory=list)
    extra: dict[str, Any] = field(default_factory=dict)


def split_total(stack: np.ndarray, codes: np.ndarray):
    """(total_layer | None, species_stack, species_codes)."""
    codes = np.asarray(codes)
    is_total = codes == TOTAL_CODE
    if is_total.any():
        ti = int(np.nonzero(is_total)[0][0])
        keep = ~is_total
        return stack[ti], stack[keep], codes[keep]
    return None, stack, codes


class Kernel:
    """Base: subclasses set ``name``, ``output_dtype``; override
    ``calculate(stack, codes, ctx) -> (h, w) ndarray``.

    ``needs_total`` — include the '0000' row in the stack.
    ``needs_global`` — tuple of required KernelContext fields.
    """

    name: str = "kernel"
    units: str = ""
    output_dtype = np.float32
    needs_total: bool = False
    needs_global: tuple[str, ...] = ()

    def __init__(self, **params: Any):
        self.params = params

    def calculate(
        self, stack: np.ndarray, codes: np.ndarray, ctx: KernelContext
    ) -> np.ndarray:  # pragma: no cover - abstract
        raise NotImplementedError

    def fill_value(self):
        """Sentinel for failed tiles — NaN for floats, -1 signed, max
        unsigned (reference ``base.py:7-24`` / ``forest_metrics.py:440-483``)."""
        dt = np.dtype(self.output_dtype)
        if np.issubdtype(dt, np.floating):
            return np.nan
        if np.issubdtype(dt, np.signedinteger):
            return -1
        return np.iinfo(dt).max
