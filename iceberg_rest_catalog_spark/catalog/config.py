"""Engine bootstrap config — mirrors the reference's loader semantics.

The reference reads ``$GOICEBERG_HOME/.iceberg-go.yaml`` falling back to
``~/.iceberg-go.yaml`` (reference main.go:28-30,48-52), layers YAML over
defaults (main.go:60-73), and selects ``catalogs[default_catalog]``
(main.go:97-100). This loader reproduces that behavior with the engine's
own filename and env var; the selected catalog's properties bootstrap a
:class:`~.catalog.Catalog` instance.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

from . import errors as E
from .catalog import Catalog

ENV_HOME = "ICSB_SPARK_HOME"
CONFIG_NAME = ".iceberg-rest-spark.yaml"

_DEFAULTS = {
    # parallels the reference's defaults (debug logging, port/host —
    # main.go:60-73); ours are engine-side knobs
    "log_level": "info",
    "default_catalog": "default",
    "catalogs": {"default": {"type": "fs", "warehouse": "/tmp/icsb_warehouse"}},
}


@dataclass
class EngineConfig:
    log_level: str = "info"
    default_catalog: str = "default"
    catalogs: dict = field(default_factory=dict)

    def catalog_props(self, name: str | None = None) -> dict:
        name = name or self.default_catalog
        if name not in self.catalogs:  # main.go errors on missing default
            raise E.BadRequestException(f"catalog {name!r} not configured")
        return dict(self.catalogs[name])

    def open_catalog(self, name: str | None = None) -> Catalog:
        from .sql_catalog import open_catalog as _open

        return _open(self.catalog_props(name))


def _config_paths(explicit: str | None) -> list[str]:
    if explicit:
        return [explicit]
    out = []
    home = os.environ.get(ENV_HOME)
    if home:
        out.append(os.path.join(home, CONFIG_NAME))
    out.append(os.path.join(os.path.expanduser("~"), CONFIG_NAME))
    return out


def load_config(path: str | None = None) -> EngineConfig:
    """Layer the first existing config file over defaults (file wins,
    reference main.go:43-80); no file at all -> pure defaults."""
    import yaml

    merged = dict(_DEFAULTS)
    for p in _config_paths(path):
        if os.path.isfile(p):
            with open(p) as f:
                try:
                    doc = yaml.safe_load(f) or {}
                except yaml.YAMLError as exc:
                    raise E.BadRequestException(f"bad config {p}: {exc}") from exc
            if not isinstance(doc, dict):
                raise E.BadRequestException(f"bad config {p}: not a mapping")
            merged.update(doc)
            break
    return EngineConfig(
        log_level=str(merged.get("log_level", "info")),
        default_catalog=str(merged.get("default_catalog", "default")),
        catalogs=dict(merged.get("catalogs") or {}),
    )
