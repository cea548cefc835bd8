"""M2/M6 — the parameter registry (`setp_para`/`pars_para_mile`,
miletos/main.py:280-324, 3821-3926): name→index mapping, bounds,
labels, fixed-vs-varied split, and vector↔dict packing for the
samplers/optimizers.

The reference builds this registry by mutating a god object per model
type (dispatch at miletos/main.py:12178-12330); here it is a plain
immutable dataclass structure the inference UDFs close over — driver-
side metadata, never shipped row-wise.
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class ParamSpec:
    name: str
    lo: float
    hi: float
    label: str = ""
    fixed: bool = False
    value: float | None = None  # required when fixed

    def __post_init__(self):
        if self.lo > self.hi:
            raise ValueError(f"{self.name}: lo > hi")
        if self.fixed and self.value is None:
            raise ValueError(f"{self.name}: fixed without value")


@dataclass
class ParamRegistry:
    specs: list[ParamSpec] = field(default_factory=list)

    def add(self, spec: ParamSpec) -> "ParamRegistry":
        if any(s.name == spec.name for s in self.specs):
            raise ValueError(f"duplicate param {spec.name}")
        self.specs.append(spec)
        return self

    @property
    def varied(self) -> list[ParamSpec]:
        return [s for s in self.specs if not s.fixed]

    @property
    def index(self) -> dict[str, int]:
        """name → position in the VARIED vector (the sampler's view)."""
        return {s.name: i for i, s in enumerate(self.varied)}

    def pack(self, values: dict[str, float]) -> list[float]:
        """dict → varied vector (`pars_para` forward direction)."""
        return [values[s.name] for s in self.varied]

    def unpack(self, vector) -> dict[str, float]:
        """varied vector → full dict including fixed params."""
        out = {s.name: float(s.value) for s in self.specs if s.fixed}
        for s, v in zip(self.varied, vector):
            out[s.name] = float(v)
        return out

    def clip(self, vector) -> list[float]:
        """Clamp a varied vector into bounds (optimizer guard)."""
        return [
            min(max(float(v), s.lo), s.hi)
            for s, v in zip(self.varied, vector)
        ]

    def in_bounds(self, vector) -> bool:
        return all(
            s.lo <= float(v) <= s.hi for s, v in zip(self.varied, vector)
        )


def transit_registry(
    period: float,
    epoch_bounds: tuple[float, float],
    max_depth: float = 0.5,
    max_dura: float | None = None,
) -> ParamRegistry:
    """The PlanetarySystem-style registry for the trapezoid fit: period
    fixed (from the search stage prior, the reference's flow), epoch /
    depth / duration varied within physical bounds."""
    if max_dura is None:
        max_dura = period / 2.0
    return (
        ParamRegistry()
        .add(ParamSpec("period", period, period, "P [d]", fixed=True, value=period))
        .add(ParamSpec("epoch", epoch_bounds[0], epoch_bounds[1], "t0 [d]"))
        .add(ParamSpec("depth", 0.0, max_depth, "depth [rel]"))
        .add(ParamSpec("dura", 1e-6, max_dura, "T14 [d]"))
    )
