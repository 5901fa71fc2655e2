"""Config-driven job specs (S16 / T4, SURVEY.md §2.10).

Mirror of the reference's pydantic settings + calculation configs
(``gridfia/config.py:86-242``; e.g. ``cfg/nc_comprehensive_shannon_
config.yaml:38-79``): a validated document listing enabled calculations
with parameters, compiled into the kernel chain by the registry. YAML is
accepted when available, JSON always.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field

from gridfia_ray.exceptions import CalculationFailed


@dataclass
class CalculationConfig:
    name: str
    enabled: bool = True
    parameters: dict = field(default_factory=dict)
    output_name: str | None = None


@dataclass
class JobSpec:
    tiles_path: str
    calculations: list[CalculationConfig] = field(default_factory=list)
    output_dir: str | None = None
    n_shards: int = 8
    resume: bool = True
    precise: bool = False

    @classmethod
    def from_dict(cls, d: dict) -> "JobSpec":
        calcs = [
            CalculationConfig(**c) if isinstance(c, dict) else CalculationConfig(name=c)
            for c in d.get("calculations", [])
        ]
        spec = cls(
            tiles_path=d["tiles_path"],
            calculations=calcs,
            output_dir=d.get("output_dir"),
            n_shards=int(d.get("n_shards", 8)),
            resume=bool(d.get("resume", True)),
            precise=bool(d.get("precise", False)),
        )
        spec.validate()
        return spec

    @classmethod
    def load(cls, path: str) -> "JobSpec":
        with open(path) as f:
            text = f.read()
        if path.endswith((".yaml", ".yml")):
            try:
                import yaml  # type: ignore

                return cls.from_dict(yaml.safe_load(text))
            except ImportError as exc:
                raise CalculationFailed("YAML config requires pyyaml; use JSON") from exc
        return cls.from_dict(json.loads(text))

    def validate(self) -> None:
        from gridfia_ray.kernels.registry import registry

        enabled = [c for c in self.calculations if c.enabled]
        if not enabled:
            raise CalculationFailed("no enabled calculations in job spec")
        for c in enabled:
            registry.get(c.name)  # raises KeyError → surfaced typed below

    def build_kernels(self):
        from gridfia_ray.kernels.registry import registry

        return registry.from_configs(
            [
                {"name": c.name, "enabled": c.enabled, "parameters": c.parameters}
                for c in self.calculations
            ]
        )
