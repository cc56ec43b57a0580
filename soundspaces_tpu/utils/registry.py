"""Name -> class registry connecting config strings to implementations.

The same role as habitat's registry + the reference's BaselineRegistry
(ss_baselines/common/baseline_registry.py:28-66): config files select
trainers/envs/policies by string. One flat namespace-per-kind map, no
metaclasses."""

from __future__ import annotations

from typing import Any, Callable


class Registry:
    def __init__(self):
        self._store: dict[str, dict[str, Any]] = {}

    def _register(self, kind: str, name: str | None = None) -> Callable:
        def wrap(cls):
            self._store.setdefault(kind, {})[name or cls.__name__] = cls
            return cls

        return wrap

    def register_trainer(self, name: str | None = None):
        return self._register("trainer", name)

    def register_env(self, name: str | None = None):
        return self._register("env", name)

    def register_policy(self, name: str | None = None):
        return self._register("policy", name)

    def register_sensor(self, name: str | None = None):
        return self._register("sensor", name)

    def get(self, kind: str, name: str) -> Any:
        try:
            return self._store[kind][name]
        except KeyError:
            known = sorted(self._store.get(kind, {}))
            raise KeyError(f"no {kind} named {name!r}; known: {known}") from None

    def get_trainer(self, name: str) -> Any:
        return self.get("trainer", name)

    def get_env(self, name: str) -> Any:
        return self.get("env", name)

    def get_policy(self, name: str) -> Any:
        return self.get("policy", name)


registry = Registry()
