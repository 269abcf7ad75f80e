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
class LogConfig:
    """Mirror of the reference's logger config (logger/zerolog.go:10-17):
    ``file-name`` switches output from stdout to a size-rotated log file
    (lumberjack semantics — max-size in MB per file, max-backups retained,
    max-age days, optional gzip of rolled files)."""

    debug: bool = False
    file_name: str = ""
    max_size_mb: float = 100.0
    max_backups: int = 0  # 0 = keep all (lumberjack default)
    max_age_days: int = 0  # 0 = never expire by age
    compress: bool = False

    @classmethod
    def from_dict(cls, doc: dict) -> "LogConfig":
        return cls(
            debug=bool(doc.get("debug", False)),
            file_name=str(doc.get("file-name", doc.get("file_name", "")) or ""),
            max_size_mb=float(doc.get("max-size", doc.get("max_size", 100)) or 100),
            max_backups=int(doc.get("max-backups", doc.get("max_backups", 0)) or 0),
            max_age_days=int(doc.get("max-age", doc.get("max_age", 0)) or 0),
            compress=bool(doc.get("compress", False)),
        )


@dataclass
class EngineConfig:
    log_level: str = "info"
    default_catalog: str = "default"
    catalogs: dict = field(default_factory=dict)
    logger: LogConfig = field(default_factory=LogConfig)

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
        logger=LogConfig.from_dict(dict(merged.get("logger") or {})),
    )


class _RotatingGzipHandler:
    """Factory for the engine's size-rotating file handler.

    stdlib ``RotatingFileHandler`` supplies size-based rollover and backup
    count; the two lumberjack behaviors it lacks — gzip of rolled files
    (``compress``) and age-based expiry (``max-age``) — are layered on via
    the handler's ``rotator`` hook and a post-rollover sweep.
    """

    def __new__(cls, cfg: LogConfig):
        import gzip
        import logging.handlers
        import time

        # max_backups <= 0 means keep-all (lumberjack default). Numbered
        # rollover can't express that (its shuffle is O(backupCount) stat
        # calls inside the logging lock), so keep-all switches to
        # lumberjack-style TIMESTAMPED backup names: O(1) per rollover,
        # genuinely unbounded, and the age sweep still matches the prefix.
        keep_all = cfg.max_backups <= 0
        handler = logging.handlers.RotatingFileHandler(
            cfg.file_name,
            maxBytes=max(int(cfg.max_size_mb * 1024 * 1024), 1),
            backupCount=1 if keep_all else cfg.max_backups,
        )

        def _sweep_aged() -> None:
            if cfg.max_age_days <= 0:
                return
            cutoff = time.time() - cfg.max_age_days * 86400
            base = os.path.basename(cfg.file_name)
            d = os.path.dirname(cfg.file_name) or "."
            for name in os.listdir(d):
                p = os.path.join(d, name)
                if name.startswith(base + ".") and os.path.getmtime(p) < cutoff:
                    try:
                        os.remove(p)
                    except OSError:
                        pass

        def _rotate(source: str, dest: str) -> None:
            if keep_all:
                # ignore the numbered dest: stamp the rolled file uniquely
                dest = f"{source}.{time.time_ns()}"
                if cfg.compress:
                    dest += ".gz"
            if cfg.compress:
                with open(source, "rb") as fin, gzip.open(dest, "wb") as fout:
                    fout.writelines(fin)
                os.remove(source)
            else:
                os.replace(source, dest)
            _sweep_aged()

        handler.rotator = _rotate
        if cfg.compress and not keep_all:
            # backups are named base.N.gz so doRollover's existence checks
            # and N -> N+1 shuffling operate on the compressed files
            handler.namer = lambda name: name + ".gz"
        return handler


def configure_logging(cfg: LogConfig, level: str | None = None) -> None:
    """Apply the logger config to the engine's logger tree — parity with
    reference logger/zerolog.go NewLogger: debug flag selects the level
    (explicit ``level`` wins), and a non-empty ``file-name`` REPLACES
    stdout with the rotating file writer (the reference swaps the zerolog
    writer rather than teeing)."""
    import logging

    root = logging.getLogger("iceberg_rest_catalog_spark")
    root.setLevel(
        (level or ("debug" if cfg.debug else "info")).upper()
    )
    if cfg.file_name:
        for h in list(root.handlers):
            root.removeHandler(h)
        handler = _RotatingGzipHandler(cfg)
        handler.setFormatter(
            logging.Formatter(
                '{"time":"%(asctime)s","level":"%(levelname)s",'
                '"logger":"%(name)s","message":"%(message)s"}'
            )
        )
        root.addHandler(handler)
        root.propagate = False
