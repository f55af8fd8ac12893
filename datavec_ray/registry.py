"""Step / condition registry for declarative (JSON) pipeline serde.

Parity target: the reference auto-registers user subclasses of
Transform/Condition/Filter for JSON serde via classpath scan
(``transform/TransformProcess.java:483-584``). Here: an explicit
name→class registry; user extensions call ``register(kind)(cls)`` or
``register_class(kind, cls)`` before deserializing.
"""

from __future__ import annotations

from typing import Callable, Type

_REGISTRY: dict[str, dict[str, type]] = {}


def register(kind: str) -> Callable[[type], type]:
    def deco(cls: type) -> type:
        _REGISTRY.setdefault(kind, {})[cls.__name__] = cls
        return cls
    return deco


def register_class(kind: str, cls: type, name: str | None = None) -> None:
    _REGISTRY.setdefault(kind, {})[name or cls.__name__] = cls


def resolve(kind: str, name: str) -> Type:
    try:
        return _REGISTRY[kind][name]
    except KeyError:
        known = sorted(_REGISTRY.get(kind, {}))
        raise KeyError(f"no {kind} registered as {name!r}; known: {known}") from None


def registered(kind: str) -> dict[str, type]:
    return dict(_REGISTRY.get(kind, {}))
