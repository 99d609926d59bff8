"""Schema introspection / drift detection (SURVEY.md §2.8).

The reference introspects INFORMATION_SCHEMA and fails or adapts when the
source schema drifts from the declared one. Our equivalent compares an
observed DataFrame schema against the registry's declared StructType.
Pure metadata — unit-tested, not a declared data query.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import types as T


@dataclass
class SchemaDrift:
    added: list[str] = field(default_factory=list)      # in observed, not declared
    removed: list[str] = field(default_factory=list)    # declared, missing from observed
    retyped: list[tuple[str, str, str]] = field(default_factory=list)  # (col, declared, observed)

    @property
    def is_drifted(self) -> bool:
        return bool(self.added or self.removed or self.retyped)


def detect_drift(declared: T.StructType, observed: T.StructType) -> SchemaDrift:
    dec = {f.name: f.dataType for f in declared.fields}
    obs = {f.name: f.dataType for f in observed.fields}
    drift = SchemaDrift(
        added=sorted(set(obs) - set(dec)),
        removed=sorted(set(dec) - set(obs)),
    )
    for name in sorted(set(dec) & set(obs)):
        if dec[name] != obs[name]:
            drift.retyped.append((name, dec[name].simpleString(), obs[name].simpleString()))
    return drift
