"""Structured config: YAML + CLI-dotlist merge + ``_target_`` instantiation.

Lightweight analog of the reference recipes' OmegaConf/Hydra stack
(``build_config`` at ``examples/flava/native/utils.py:30-36``; ``_target_``
instantiation in ``examples/flava/native/configs/*.yaml``): plain nested
dicts, no dependency beyond pyyaml. Builders stay plain functions — this
layer only loads/merges/instantiates.
"""

from __future__ import annotations

import importlib
from typing import Any, Dict, List, Optional, Sequence


def load_yaml(path: str) -> Dict[str, Any]:
    import yaml

    with open(path) as f:
        cfg = yaml.safe_load(f)
    return cfg or {}


def merge(base: Dict[str, Any], override: Dict[str, Any]) -> Dict[str, Any]:
    """Deep-merge ``override`` into ``base`` (override wins), new dict out."""
    out = dict(base)
    for k, v in override.items():
        if isinstance(v, dict) and isinstance(out.get(k), dict):
            out[k] = merge(out[k], v)
        else:
            out[k] = v
    return out


def apply_dotlist(cfg: Dict[str, Any], dotlist: Sequence[str]) -> Dict[str, Any]:
    """Apply ``a.b.c=value`` overrides (values parsed as YAML scalars)."""
    import yaml

    out = dict(cfg)
    for item in dotlist:
        if "=" not in item:
            raise ValueError(f"dotlist entry must be key=value, got {item!r}")
        key, _, raw = item.partition("=")
        value = yaml.safe_load(raw)
        if isinstance(value, str):
            # YAML 1.1 misses dot-less exponent floats like "5e-4"
            try:
                value = float(value)
            except ValueError:
                pass
        node = out
        parts = key.strip().split(".")
        for p in parts[:-1]:
            nxt = node.get(p)
            node[p] = dict(nxt) if isinstance(nxt, dict) else {}
            node = node[p]
        node[parts[-1]] = value
    return out


def build_config(
    yaml_path: Optional[str] = None,
    overrides: Sequence[str] = (),
    defaults: Optional[Dict[str, Any]] = None,
) -> Dict[str, Any]:
    """defaults <- yaml <- CLI dotlist (reference ``build_config`` semantics)."""
    cfg: Dict[str, Any] = dict(defaults or {})
    if yaml_path:
        cfg = merge(cfg, load_yaml(yaml_path))
    return apply_dotlist(cfg, overrides)


def _resolve(path: str) -> Any:
    module_name, _, attr = path.rpartition(".")
    if not module_name:
        raise ValueError(f"_target_ must be a dotted path, got {path!r}")
    return getattr(importlib.import_module(module_name), attr)


def instantiate(cfg: Any, **kwargs: Any) -> Any:
    """Recursively instantiate ``{"_target_": "pkg.mod.fn", ...}`` nodes.

    Children are instantiated first (depth-first), then the target callable
    is invoked with the remaining keys (plus ``kwargs`` overrides) — the
    minimal useful subset of Hydra's ``instantiate``.
    """
    if isinstance(cfg, dict):
        resolved = {k: instantiate(v) for k, v in cfg.items() if k != "_target_"}
        if "_target_" in cfg:
            fn = _resolve(cfg["_target_"])
            resolved.update(kwargs)
            return fn(**resolved)
        return resolved
    if isinstance(cfg, list):
        return [instantiate(v) for v in cfg]
    return cfg
