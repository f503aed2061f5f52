"""CLI parsing with the reference's grammar (ref: scripts/train.py:2-30,
configs/method_configs.py:704-708).

``snt-train <method> [--nested.flag value ...] <dataparser-subcommand>
[--dataparser-flag value ...]`` — flags bind to the preceding subcommand,
defaults come from the method registry, dotted kebab-case paths address
nested dataclass fields (tyro-compatible surface, implemented standalone
since tyro isn't vendored on the image).
"""
from __future__ import annotations

import copy
import dataclasses
import sys
from pathlib import Path
from typing import Any, List, Optional, Sequence

from soccernerfs_tpu.configs.base import TrainerConfig


def _coerce(value_tokens: List[str], current: Any):
    """Coerce CLI tokens to the type of the field's current value."""
    if isinstance(current, bool):
        return value_tokens[0].lower() in ("true", "1", "yes")
    if isinstance(current, int) and not isinstance(current, bool):
        return int(value_tokens[0])
    if isinstance(current, float):
        return float(value_tokens[0])
    if isinstance(current, Path) or (current is None and len(value_tokens) == 1):
        tok = value_tokens[0]
        if current is None:
            # best-effort literal for untyped/None defaults
            for cast in (int, float):
                try:
                    return cast(tok)
                except ValueError:
                    pass
            if tok.lower() in ("true", "false"):
                return tok.lower() == "true"
            return tok
        return Path(tok)
    if isinstance(current, (tuple, list)):
        elems = []
        elem_proto = current[0] if len(current) else 0
        for t in value_tokens:
            elems.append(_coerce([t], elem_proto))
        return tuple(elems)
    return value_tokens[0]


def _resolve(obj: Any, parts: List[str]):
    """Walk dotted path to (parent, attr). Tries dataclass fields and
    frozen-dataclass replacement targets."""
    for p in parts[:-1]:
        obj = getattr(obj, p)
    return obj, parts[-1]


def _is_pair_tuple(v) -> bool:
    return (
        isinstance(v, tuple)
        and len(v) > 0
        and all(isinstance(e, tuple) and len(e) == 2 and isinstance(e[0], str) for e in v)
    )


def set_nested(config: Any, dotted: str, value_tokens: List[str]):
    parts = [p.replace("-", "_") for p in dotted.split(".")]
    # dict-style fields stored as tuples of (key, value) pairs — e.g.
    # --pipeline.model.loss-coefficients.space-tv-loss — address the key
    if len(parts) >= 2:
        try:
            parent, attr = _resolve(config, parts[:-1])
        except AttributeError:
            raise SystemExit(f"unknown option --{dotted}")
        if hasattr(parent, attr) and _is_pair_tuple(getattr(parent, attr)):
            table = dict(getattr(parent, attr))
            key = parts[-1]
            if key not in table:
                raise SystemExit(f"unknown key {key!r} in --{dotted}")
            table[key] = _coerce(value_tokens, table[key])
            _frozen_replace(config, parts[:-1], tuple(table.items()))
            return
    parent, attr = _resolve(config, parts)
    if not hasattr(parent, attr):
        raise SystemExit(f"unknown option --{dotted}")
    current = getattr(parent, attr)
    new_value = _coerce(value_tokens, current)
    if dataclasses.is_dataclass(parent) and getattr(
        type(parent), "__dataclass_params__"
    ).frozen:
        # frozen model configs: rebuild via replace up the chain
        _frozen_replace(config, parts, new_value)
    else:
        setattr(parent, attr, new_value)


def _frozen_replace(config: Any, parts: List[str], new_value: Any):
    """Replace a field inside (possibly nested) frozen dataclasses."""
    chain = [config]
    for p in parts[:-1]:
        chain.append(getattr(chain[-1], p))
    obj = dataclasses.replace(chain[-1], **{parts[-1]: new_value})
    for i in range(len(chain) - 2, -1, -1):
        parent = chain[i]
        name = parts[i]
        if dataclasses.is_dataclass(parent) and getattr(
            type(parent), "__dataclass_params__"
        ).frozen:
            obj = dataclasses.replace(parent, **{name: obj})
        else:
            setattr(parent, name, obj)
            return


def _collect_values(argv: Sequence[str], i: int, subcommands) -> tuple:
    """Consume value tokens for a flag starting at argv[i]."""
    values = []
    while i < len(argv) and not argv[i].startswith("--") and argv[i] not in subcommands:
        values.append(argv[i])
        i += 1
    return values, i


def parse_train_cli(argv: Optional[Sequence[str]] = None) -> TrainerConfig:
    """Build a TrainerConfig from the command line."""
    from soccernerfs_tpu.configs.method_configs import method_configs
    from soccernerfs_tpu.data.dataparsers import DATAPARSERS

    argv = list(sys.argv[1:] if argv is None else argv)
    if not argv or argv[0] in ("-h", "--help"):
        print("usage: snt-train <method> [--flags ...] [<dataparser-data> [--flags ...]]")
        print("methods:", ", ".join(sorted(method_configs)))
        print("dataparsers:", ", ".join(sorted(DATAPARSERS)))
        raise SystemExit(0)

    method = argv[0]
    if method not in method_configs:
        raise SystemExit(f"unknown method {method!r}; known: {sorted(method_configs)}")
    config: TrainerConfig = copy.deepcopy(method_configs[method])

    # context switches from the trainer config to the dataparser config
    target = config
    i = 1
    subcommands = set(DATAPARSERS)
    while i < len(argv):
        tok = argv[i]
        if tok in ("-h", "--help"):
            print(f"usage: snt-train {method} [--flags ...] "
                  "[<dataparser-data> [--flags ...]]")
            print("flags use dotted config paths, e.g. "
                  "--pipeline.model.multiscale-res 1 2 4 8 16, "
                  "--max-num-iterations 30000")
            print("dataparsers:", ", ".join(sorted(DATAPARSERS)))
            raise SystemExit(0)
        if tok in subcommands:
            dp_config = DATAPARSERS[tok]()
            config.pipeline.datamanager.dataparser = dp_config
            target = dp_config
            i += 1
        elif tok.startswith("--"):
            name = tok[2:]
            values, j = _collect_values(argv, i + 1, subcommands)
            if not values:
                raise SystemExit(f"flag --{name} needs a value")
            if target is config and name in ("data",):
                # --data alias applies to the active dataparser
                # (ref: scripts/train.py:221-223)
                config.data = Path(values[0])
            else:
                set_nested(target, name, values)
            i = j
        else:
            raise SystemExit(f"unexpected token {tok!r}")

    # propagate --data alias into the dataparser
    if config.data is not None and config.pipeline.datamanager.dataparser is not None:
        config.pipeline.datamanager.dataparser.data = Path(config.data)

    # --load-config replaces the entire config (ref: train.py:225-227)
    if config.load_config is not None:
        import yaml

        config = yaml.load(Path(config.load_config).read_text(), Loader=yaml.Loader)
    return config
