"""Kernel registry + config compiler (the T4 analog, SURVEY.md §2.3).

Mirrors the reference's ``CalculationRegistry``
(``gridfia/core/calculations/registry.py:27-117``): name → class, runtime
registration for user extensions (cf. ``examples/04_calculations.py:98-132``),
and instantiation from config dicts
(``registry.py:147-176`` / ``forest_metrics.py:283-314``).
"""

from __future__ import annotations

from typing import Iterable

from gridfia_ray.kernels import forest
from gridfia_ray.kernels.base import Kernel


class KernelRegistry:
    def __init__(self):
        self._classes: dict[str, type[Kernel]] = {}

    def register(self, cls: type[Kernel], name: str | None = None) -> None:
        key = name or cls.name
        if not issubclass(cls, Kernel):
            raise TypeError(f"{cls} is not a Kernel")
        self._classes[key] = cls

    def get(self, name: str) -> type[Kernel]:
        if name not in self._classes:
            raise KeyError(
                f"unknown kernel {name!r}; registered: {sorted(self._classes)}"
            )
        return self._classes[name]

    def names(self) -> list[str]:
        return sorted(self._classes)

    def create(self, name: str, **params) -> Kernel:
        return self.get(name)(**params)

    def from_configs(self, configs: Iterable[dict]) -> list[Kernel]:
        """Build kernels from config dicts:
        ``{"name": ..., "enabled": True, "parameters": {...}}``."""
        out = []
        for cfg in configs:
            if not cfg.get("enabled", True):
                continue
            out.append(self.create(cfg["name"], **cfg.get("parameters", {})))
        return out


registry = KernelRegistry()
for _cls in (
    forest.SpeciesRichness,
    forest.ShannonDiversity,
    forest.SimpsonDiversity,
    forest.Evenness,
    forest.TotalBiomass,
    forest.TotalBiomassComparison,
    forest.SpeciesProportion,
    forest.SpeciesPercentage,
    forest.SpeciesGroupProportion,
    forest.BiomassThreshold,
    forest.DominantSpecies,
    forest.SpeciesPresence,
    forest.SpeciesDominance,
    forest.RareSpecies,
    forest.CommonSpecies,
):
    registry.register(_cls)
