"""File-backed configuration and platform registry.

Re-expresses the reference's ``ixmp._config`` (reference _config.py:195–470:
``Config.get/set/register/save/add_platform/get_platform_info/
remove_platform``) for the Spark engine: a ``config.json`` under the first
existing data directory holds registered keys plus the ``platform``
registry mapping platform names to backend descriptors. The 'default'
platform key aliases another configured platform (reference
_config.py:374–422).

Backends here are Spark-native: ``warehouse`` (a local/parquet warehouse
root directory — the primary store, S1) and ``jdbc`` (an external RDBMS
source by URL, S2). The reference's Oracle/HyperSQL driver plumbing is
replaced by descriptors consumed by :class:`ixmp_spark.core.Platform` /
:mod:`ixmp_spark.sources.jdbc`.
"""

from __future__ import annotations

import json
import os
from pathlib import Path
from typing import Any

#: Recognized backend classes and their required positional arguments.
BACKENDS = {
    "warehouse": ("path",),
    "jdbc": ("url",),
}


def _iter_config_paths():
    """Yield candidate config directories in priority order (reference
    _config.py:28–43, with engine-specific names)."""
    if "IXMP_SPARK_DATA" in os.environ:
        yield "environment (IXMP_SPARK_DATA)", Path(
            os.environ["IXMP_SPARK_DATA"]
        ).resolve()
    if "XDG_DATA_HOME" in os.environ:
        yield "environment (XDG_DATA_HOME)", Path(
            os.environ["XDG_DATA_HOME"], "ixmp-spark"
        ).resolve()
    yield "default", Path.home().joinpath(".local", "share", "ixmp-spark")


class Config:
    """Registered key/value configuration + platform registry."""

    #: Keys always present, with their default factories.
    _BUILTIN = {"platform": dict}

    def __init__(self, read: bool = True):
        self.path: Path | None = None
        self._registered: dict[str, type] = dict(self._BUILTIN)
        self.values: dict[str, Any] = {k: t() for k, t in self._BUILTIN.items()}
        if read:
            self.read()

    # -- persistence

    def read(self) -> None:
        for _, directory in _iter_config_paths():
            p = directory / "config.json"
            if p.exists():
                self.path = p.resolve()
                data = json.loads(p.read_text())
                for key, value in data.items():
                    if key not in self._registered:
                        self.register(key, type(value))
                    self.values[key] = value
                return

    def save(self) -> None:
        """Write config to the first candidate directory (created if
        needed); only non-null values are written (reference
        _config.py:350–372)."""
        _, config_dir = next(_iter_config_paths())
        path = config_dir / "config.json"
        path.parent.mkdir(parents=True, exist_ok=True)
        values = {k: v for k, v in self.values.items() if v is not None}
        path.write_text(json.dumps(values, indent=2, default=str))
        self.path = path

    # -- keys

    def keys(self) -> tuple[str, ...]:
        return tuple(self._registered)

    def register(self, name: str, type_: type, default: Any = None) -> None:
        if name in self._registered:
            raise ValueError(f"configuration key {name!r} already registered")
        self._registered[name] = type_
        self.values[name] = default if default is not None else type_()

    def get(self, name: str) -> Any:
        return self.values[name]

    def set(self, name: str, value: Any, _strict: bool = True) -> None:
        if value is None:
            return
        if name not in self._registered:
            if _strict:
                raise KeyError(name)
            self.register(name, type(value))
        self.values[name] = value

    def clear(self) -> None:
        self.values = {k: t() for k, t in self._BUILTIN.items()}
        self._registered = dict(self._BUILTIN)

    # -- platform registry (reference _config.py:374–461)

    def add_platform(self, name: str, *args: str, **kwargs: Any) -> None:
        """Add or overwrite platform ``name``.

        ``add_platform('default', other_name)`` designates an existing
        platform as default; otherwise ``args[0]`` is the backend class
        ('warehouse' or 'jdbc') followed by its positional arguments."""
        if name == "default":
            if len(args) != 1:
                raise ValueError("'default' takes exactly one platform name")
            target = args[0]
            if target not in self.values["platform"]:
                raise ValueError(
                    f"Cannot set unknown {target!r} as default platform"
                )
            info: Any = target
        else:
            if not args:
                raise ValueError("Must give at least 1 arg: backend class")
            cls, *rest = args
            if cls not in BACKENDS:
                raise ValueError(
                    f"unknown backend class {cls!r}; expected one of "
                    f"{sorted(BACKENDS)}"
                )
            required = BACKENDS[cls]
            if len(rest) < len(required):
                raise ValueError(
                    f"backend {cls!r} needs positional args {required}"
                )
            info = {"class": cls}
            info.update(dict(zip(required, rest)))
            for extra in rest[len(required):]:
                k, _, v = extra.partition("=")
                if not _:
                    raise ValueError(
                        f"extra args must be NAME=VALUE, got {extra!r}"
                    )
                info[k] = v
            info.update(kwargs)
        self.values["platform"][name] = info

    def get_platform_info(self, name: str) -> tuple[str, dict[str, Any]]:
        if name == "default":
            name = self.values["platform"].get("default")
        try:
            return name, dict(self.values["platform"][name])
        except (KeyError, TypeError):
            raise ValueError(
                f"platform name {name!r} not among "
                f"{sorted(k for k in self.values['platform'] if k != 'default')!r}"
                + (f"\nfrom {self.path}" if self.path else "")
            ) from None

    def remove_platform(self, name: str) -> None:
        self.values["platform"].pop(name)


#: Default configuration object (reference _config.py:470).
config = Config()
