"""The forest-metric kernels (M1–M15 of SURVEY.md §2.2).

Each class reproduces one reference calculation's semantics exactly
(citations per class); all are pure vectorized numpy over a
``(S, h, w)`` species stack. Math is dtype-preserving: production stacks
arrive float32 (the reference's own arithmetic precision, half the
memory traffic); oracle-precise runs feed float64 stacks.
"""

from __future__ import annotations

import numpy as np

from gridfia_ray.kernels.base import Kernel, KernelContext, split_total


def _species_only(stack, codes):
    _, sp, spc = split_total(stack, codes)
    return sp, spc


class SpeciesRichness(Kernel):
    """M1 — count of species with biomass > threshold per pixel.

    Reference: ``gridfia/core/calculations/diversity.py:17-56``.
    """

    name = "species_richness"
    units = "count"
    output_dtype = np.uint8

    def calculate(self, stack, codes, ctx):
        thr = float(self.params.get("biomass_threshold", 0.0))
        sp, _ = _species_only(stack, codes)
        return np.count_nonzero(sp > thr, axis=0).astype(np.int64)


class ShannonDiversity(Kernel):
    """M2 — H' = -Σ p·log p, masked (zero where total biomass == 0).

    Reference: ``diversity.py:59-129`` (the masked kernel, not the viz
    duplicate at ``mapper.py:374`` — SURVEY.md §4.4-2).
    """

    name = "shannon_diversity"
    units = "index"

    def calculate(self, stack, codes, ctx):
        base = str(self.params.get("base", "e"))
        sp, _ = _species_only(stack, codes)
        total = sp.sum(axis=0)
        out = np.zeros(sp.shape[1:], dtype=sp.dtype if np.issubdtype(sp.dtype, np.floating) else np.float64)
        valid = total > 0
        if valid.any():
            p = np.zeros_like(sp)
            p[:, valid] = sp[:, valid] / total[valid]
            log = np.log2 if base == "2" else np.log
            mask = p > 0
            contrib = np.zeros_like(p)
            contrib[mask] = -p[mask] * log(p[mask])
            out = contrib.sum(axis=0)
        return out


class SimpsonDiversity(Kernel):
    """M3 — D = Σ p²; returns 1/D when ``inverse`` (default True).

    Reference: ``diversity.py:132-200``. The reference's empty-pixel
    value under ``inverse`` depends on whether the *chunk* contains any
    biomass (``np.any(valid_mask)``); we pin it to the whole-extent
    answer via ``ctx.extent_has_biomass`` for partition invariance
    (SURVEY.md §4.4-1).
    """

    name = "simpson_diversity"
    units = "index"
    needs_global = ("extent_has_biomass",)

    def calculate(self, stack, codes, ctx: KernelContext):
        inverse = bool(self.params.get("inverse", True))
        sp, _ = _species_only(stack, codes)
        total = sp.sum(axis=0)
        out = np.zeros(sp.shape[1:], dtype=sp.dtype if np.issubdtype(sp.dtype, np.floating) else np.float64)
        valid = total > 0
        if ctx.extent_has_biomass:
            p = np.zeros_like(sp)
            if valid.any():
                p[:, valid] = sp[:, valid] / total[valid]
            d = (p**2).sum(axis=0)
            if inverse:
                res = np.ones_like(d)
                m = d > 0
                res[m] = 1.0 / d[m]
                d = res
            out = d
        return out


class Evenness(Kernel):
    """M4 — Pielou J = H'/ln(richness), only where richness > 1.

    Reference: ``diversity.py:203-253`` (composes M1 + M2).
    """

    name = "evenness"
    units = "index"

    def calculate(self, stack, codes, ctx):
        shannon = ShannonDiversity().calculate(stack, codes, ctx)
        richness = SpeciesRichness().calculate(stack, codes, ctx)
        out = np.zeros_like(shannon)
        m = richness > 1
        if m.any():
            out[m] = shannon[m] / np.log(richness[m].astype(shannon.dtype))
        return out


class TotalBiomass(Kernel):
    """M5 — Σ biomass over species layers per pixel.

    Reference: ``gridfia/core/calculations/biomass.py:17-51``.
    """

    name = "total_biomass"
    units = "Mg/ha"

    def calculate(self, stack, codes, ctx):
        sp, _ = _species_only(stack, codes)
        return sp.sum(axis=0)


class TotalBiomassComparison(Kernel):
    """M6 — |stored total ('0000' row) − Σ species|; NaN when no total row.

    Reference: ``biomass.py:54-88``.
    """

    name = "total_biomass_comparison"
    units = "Mg/ha"
    needs_total = True

    def calculate(self, stack, codes, ctx):
        total, sp, _ = split_total(stack, codes)
        if total is None or sp.shape[0] == 0:
            return np.full(stack.shape[1:], np.nan, dtype=np.float32)
        return np.abs(total - sp.sum(axis=0))


class SpeciesProportion(Kernel):
    """M7 — species biomass / total species biomass (0 where total == 0).

    Reference: ``biomass.py:91-145``. Selection by ``species_code``
    (the tabular replacement for layer index; index 0/total rejected
    there, '0000' rejected here).
    """

    name = "species_proportion"
    units = "fraction"

    def calculate(self, stack, codes, ctx):
        code = str(self.params["species_code"])
        if code == "0000":
            raise ValueError("cannot compute proportion of the total layer")
        sp, spc = _species_only(stack, codes)
        idx = np.nonzero(spc == code)[0]
        if idx.size == 0:
            raise ValueError(f"species {code} not in stack")
        sb = sp[int(idx[0])]
        total = sp.sum(axis=0)
        out = np.zeros_like(sb)
        m = total > 0
        out[m] = sb[m] / total[m]
        return out


class SpeciesPercentage(SpeciesProportion):
    """M8 — M7 × 100. Reference: ``biomass.py:148-173``."""

    name = "species_percentage"
    units = "percent"

    def calculate(self, stack, codes, ctx):
        return super().calculate(stack, codes, ctx) * 100.0


class SpeciesGroupProportion(Kernel):
    """M9 — Σ group biomass / Σ all-species biomass.

    Reference: ``biomass.py:176-230``; group = list of species codes
    (cf. ``cfg/species/southern_yellow_pine_config.yaml:60-67``).
    """

    name = "species_group_proportion"
    units = "fraction"

    def calculate(self, stack, codes, ctx):
        group = [str(c) for c in self.params["species_codes"]]
        if "0000" in group:
            raise ValueError("total layer cannot be part of a species group")
        sp, spc = _species_only(stack, codes)
        sel = np.isin(spc, group)
        if sel.sum() != len(set(group)):
            raise ValueError(f"group codes {group} not all present")
        gsum = sp[sel].sum(axis=0)
        total = sp.sum(axis=0)
        out = np.zeros_like(gsum)
        m = total > 0
        out[m] = gsum[m] / total[m]
        return out


class BiomassThreshold(Kernel):
    """M10 — (total biomass > t) as uint8 (or <= when ``above=False``).

    Reference: ``biomass.py:233-276``.
    """

    name = "biomass_threshold"
    units = "boolean"
    output_dtype = np.uint8

    def calculate(self, stack, codes, ctx):
        thr = float(self.params["threshold"])
        above = bool(self.params.get("above", True))
        total = TotalBiomass().calculate(stack, codes, ctx)
        return (total > thr).astype(np.int64) if above else (total <= thr).astype(np.int64)


class DominantSpecies(Kernel):
    """M11 — catalog index of the max-biomass species per pixel; 0 where
    max <= min_biomass.

    Reference: ``gridfia/core/calculations/species.py:17-69``. The
    reference returns layer index (+1 when the total layer is excluded);
    with catalog order = ['0000', *sorted codes] the catalog index is the
    same number. Ties: lowest catalog index wins (numpy argmax), matching
    the reference's sorted-file layer order.
    """

    name = "dominant_species"
    units = "species_index"
    output_dtype = np.uint8

    def calculate(self, stack, codes, ctx: KernelContext):
        min_biomass = float(self.params.get("min_biomass", 0.0))
        sp, spc = _species_only(stack, codes)
        order = np.argsort(spc, kind="stable")
        sp = sp[order]
        spc = spc[order]
        catalog = ctx.catalog or (["0000"] + sorted(spc.tolist()))
        cat_idx = np.asarray([catalog.index(c) for c in spc], dtype=np.int64)
        mx = sp.max(axis=0)
        am = np.argmax(sp, axis=0)
        out = np.zeros(sp.shape[1:], dtype=np.int64)
        m = mx > min_biomass
        out[m] = cat_idx[am[m]]
        return out


class SpeciesPresence(Kernel):
    """M12 — (species biomass > threshold) as uint8.

    Reference: ``species.py:72-121``.
    """

    name = "species_presence"
    units = "boolean"
    output_dtype = np.uint8

    def calculate(self, stack, codes, ctx):
        code = str(self.params["species_code"])
        thr = float(self.params.get("threshold", 0.0))
        idx = np.nonzero(np.asarray(codes) == code)[0]
        if idx.size == 0:
            raise ValueError(f"species {code} not in stack")
        return (stack[int(idx[0])] > thr).astype(np.int64)


class SpeciesDominance(Kernel):
    """M13 — % of extent pixels where the species is dominant, broadcast
    to every pixel.

    Reference: ``species.py:124-180`` computes it per chunk; the rebuild
    uses the *global* percentage from the two-phase pass
    (``ctx.dominance_percent``), making the result partition-invariant
    (SURVEY.md §4.4-1).
    """

    name = "species_dominance"
    units = "percent"
    needs_global = ("dominance_percent",)

    def calculate(self, stack, codes, ctx: KernelContext):
        code = str(self.params["species_code"])
        if code == "0000":
            raise ValueError("invalid species for dominance")
        if not ctx.dominance_percent or code not in ctx.dominance_percent:
            raise ValueError("global dominance stats missing from context")
        return np.full(stack.shape[1:], ctx.dominance_percent[code], dtype=np.float64)


class _OccurrenceCount(Kernel):
    rare: bool = True

    def calculate(self, stack, codes, ctx: KernelContext):
        occ_thr = float(
            self.params.get("occurrence_threshold", 0.01 if self.rare else 0.10)
        )
        bio_thr = float(self.params.get("biomass_threshold", 0.0))
        if ctx.occurrence_freq is None:
            raise ValueError("global occurrence frequencies missing from context")
        sp, spc = _species_only(stack, codes)
        out = np.zeros(sp.shape[1:], dtype=np.int64)
        for i, code in enumerate(spc):
            f = ctx.occurrence_freq.get(str(code), 0.0)
            selected = (f < occ_thr) if self.rare else (f >= occ_thr)
            if selected:
                out += (sp[i] > bio_thr).astype(np.int64)
        return out


class RareSpecies(_OccurrenceCount):
    """M14 — per-pixel count of present species whose whole-extent
    occurrence frequency is below ``occurrence_threshold`` (default 0.01).

    Reference: ``species.py:183-240`` (frequency made global, §4.4-1).
    """

    name = "rare_species"
    units = "count"
    output_dtype = np.uint8
    needs_global = ("occurrence_freq",)
    rare = True


class CommonSpecies(_OccurrenceCount):
    """M15 — like M14 with frequency >= threshold (default 0.10).

    Reference: ``species.py:243-300``.
    """

    name = "common_species"
    units = "count"
    output_dtype = np.uint8
    needs_global = ("occurrence_freq",)
    rare = False
