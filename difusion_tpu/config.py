"""Configuration system.

Feature-parity with the reference's ``ArgumentParserX`` (reference:
pytorch/utils/exp_util.py:12-112): a positional YAML/JSON "hyper" file whose
keys are auto-promoted to ``--flag`` overrides, YAML ``include_configs``
inheritance, lenient JSON parsing (Python-literal fixing), nested dict
sub-configs re-wrapped as namespaces, and an ``--exec`` escape hatch.
"""
from __future__ import annotations

import argparse
import json
from pathlib import Path
from typing import Optional

import yaml


def parse_config_json(json_path: Path, args: Optional[argparse.Namespace] = None) -> argparse.Namespace:
    """Parse a (possibly Python-literal-flavoured) JSON config into a namespace.

    Accepts either a dict or a list of dicts; keys named ``_`` are comments.
    """
    if args is None:
        args = argparse.Namespace()
    json_path = Path(json_path)
    text = json_path.read_text()
    try:
        raw = json.loads(text)
    except json.JSONDecodeError:
        # Lenient mode: fix Python literals that sneak into hand-written configs.
        text = (
            text.replace("'", '"')
            .replace("None", "null")
            .replace("False", "false")
            .replace("True", "true")
        )
        raw = json.loads(text)
    if isinstance(raw, dict):
        raw = [raw]
    for block in raw:
        for key, value in block.items():
            if key != "_":
                setattr(args, key, value)
    return args


def parse_config_yaml(yaml_path: Path, args: Optional[argparse.Namespace] = None,
                      override: bool = True) -> argparse.Namespace:
    """Parse a YAML config (with ``include_configs`` inheritance) into a namespace."""
    if args is None:
        args = argparse.Namespace()
    yaml_path = Path(yaml_path)
    with yaml_path.open() as f:
        configs = yaml.safe_load(f)
    if configs is None:
        return args
    if "include_configs" in configs:
        base_rel = configs.pop("include_configs")
        base_path = yaml_path.parent / base_rel
        with base_path.open() as f:
            base = yaml.safe_load(f) or {}
        base.update(configs)
        configs = base
    for key, value in configs.items():
        if override or key not in vars(args):
            setattr(args, key, value)
    return args


def dict_to_args(data: dict) -> argparse.Namespace:
    args = argparse.Namespace()
    for key, value in data.items():
        setattr(args, key, value)
    return args


def args_to_dict(args: argparse.Namespace) -> dict:
    out = {}
    for key, value in vars(args).items():
        out[key] = args_to_dict(value) if isinstance(value, argparse.Namespace) else value
    return out


class ArgumentParserX(argparse.ArgumentParser):
    """Argument parser whose flag surface is induced by the config file itself.

    Every top-level key of the hyper file becomes an optional ``--key`` override
    with the file value as default; ``--exec`` runs ``_args.``-prefixed
    statements for ad-hoc tweaks (reference: pytorch/utils/exp_util.py:78-112).
    """

    def __init__(self, base_config_path: Optional[str] = None, add_hyper_arg: bool = True, **kwargs):
        super().__init__(**kwargs)
        self.add_hyper_arg = add_hyper_arg
        self.base_config_path = base_config_path
        if self.add_hyper_arg:
            self.add_argument("hyper", type=str, help="Path to the yaml/json parameter file")
        self.add_argument("--exec", type=str, help="Code executed against the parsed args (prefix `_args.`)")

    def parse_args(self, args=None, namespace=None):
        known, _ = self.parse_known_args(args, namespace)
        file_args = argparse.Namespace()
        if self.base_config_path is not None:
            file_args = parse_config_yaml(Path(self.base_config_path), file_args)
        if self.add_hyper_arg:
            hyper = Path(known.hyper)
            if hyper.suffix == ".json":
                file_args = parse_config_json(hyper, file_args)
            else:
                file_args = parse_config_yaml(hyper, file_args)
            for key, value in vars(file_args).items():
                try:
                    self.add_argument("--" + key, type=type(value), default=value, required=False)
                except argparse.ArgumentError:
                    continue
        full = super().parse_args(args, namespace)
        if full.exec is not None:
            for statement in full.exec.split(";"):
                exec("_args." + statement.strip(), {"_args": full})  # noqa: S102 - explicit escape hatch
        return full


def load_yaml_args(path: str) -> argparse.Namespace:
    """Convenience: load a YAML config file directly into a namespace."""
    return parse_config_yaml(Path(path))
