"""A self-contained yacs-style configuration node.

Behavioral parity with the reference's ``detectron2.config.CfgNode``
(reference: detectron2/config/config.py:8-70, which subclasses fvcore/yacs) —
attribute access, freezing, ``merge_from_file`` with ``_BASE_`` inheritance,
``merge_from_list`` CLI overrides, type-checked merges, and YAML dump — but
implemented fresh with no yacs dependency.
"""

from __future__ import annotations

import ast
import copy
import io
import os
from typing import Any, Dict, List

import yaml

BASE_KEY = "_BASE_"

# Reference configs (ImbalanceDetection/configs/Base-RetinaNet.yaml:8) use the
# unsafe `!!python/object/apply:eval` YAML tag for computed anchor sizes.  We
# support the same construct with a constructor restricted to `eval` of simple
# arithmetic expressions rather than full unsafe_load.
_EVAL_ALLOWED_NAMES = {"__builtins__": {}, "range": range, "len": len}


def _eval_constructor(loader, node):
    args = loader.construct_sequence(node, deep=True)
    # tag form: !!python/object/apply:eval ["expr"]
    return eval(args[0], dict(_EVAL_ALLOWED_NAMES))  # noqa: S307 - restricted


class _CfgLoader(yaml.SafeLoader):
    pass


_CfgLoader.add_constructor("tag:yaml.org,2002:python/object/apply:eval", _eval_constructor)
_CfgLoader.add_constructor("tag:yaml.org,2002:python/tuple", lambda l, n: tuple(l.construct_sequence(n)))


class CfgNode(dict):
    """A dict with attribute access, immutability flags and yacs merge rules."""

    IMMUTABLE = "__immutable__"
    NEW_ALLOWED = "__new_allowed__"

    def __init__(self, init_dict: Dict | None = None, new_allowed: bool = False):
        init_dict = {} if init_dict is None else init_dict
        super().__init__()
        self.__dict__[CfgNode.IMMUTABLE] = False
        self.__dict__[CfgNode.NEW_ALLOWED] = new_allowed
        for k, v in init_dict.items():
            self[k] = self._to_cfg(v, new_allowed)

    @classmethod
    def _to_cfg(cls, value, new_allowed=False):
        if isinstance(value, dict) and not isinstance(value, CfgNode):
            return cls(value, new_allowed=new_allowed)
        return value

    # -- attribute access ---------------------------------------------------
    def __getattr__(self, name: str):
        if name in self:
            return self[name]
        raise AttributeError(
            "Attribute '{}' not found in CfgNode (keys: {})".format(name, list(self.keys())[:20])
        )

    def __setattr__(self, name: str, value):
        if self.is_frozen():
            raise AttributeError(
                "Attempted to set '{}' to '{}', but CfgNode is immutable".format(name, value)
            )
        self[name] = self._to_cfg(value)

    def __setitem__(self, name, value):
        if self.is_frozen():
            raise KeyError("CfgNode is immutable; cannot set key '{}'".format(name))
        super().__setitem__(name, self._to_cfg(value))

    # -- freezing -----------------------------------------------------------
    def freeze(self):
        self._set_immutable(True)
        return self

    def defrost(self):
        self._set_immutable(False)
        return self

    def is_frozen(self) -> bool:
        return self.__dict__[CfgNode.IMMUTABLE]

    def _set_immutable(self, flag: bool):
        self.__dict__[CfgNode.IMMUTABLE] = flag
        for v in self.values():
            if isinstance(v, CfgNode):
                v._set_immutable(flag)

    # -- clone / dump -------------------------------------------------------
    def clone(self) -> "CfgNode":
        return copy.deepcopy(self)

    def __deepcopy__(self, memo):
        out = CfgNode()
        memo[id(self)] = out
        for k, v in self.items():
            dict.__setitem__(out, copy.deepcopy(k, memo), copy.deepcopy(v, memo))
        out.__dict__[CfgNode.NEW_ALLOWED] = self.__dict__[CfgNode.NEW_ALLOWED]
        return out

    def _as_plain_dict(self):
        def convert(v):
            if isinstance(v, CfgNode):
                return {k: convert(x) for k, x in v.items()}
            if isinstance(v, tuple):
                return list(convert(x) for x in v)
            return v

        return convert(self)

    def dump(self, **kwargs) -> str:
        kwargs.setdefault("default_flow_style", None)
        return yaml.safe_dump(self._as_plain_dict(), **kwargs)

    def __str__(self):
        def _indent(s, n):
            pad = " " * n
            return "\n".join(pad + line if line else line for line in s.split("\n"))

        lines = []
        for k in sorted(self.keys()):
            v = self[k]
            if isinstance(v, CfgNode):
                lines.append("{}:".format(k))
                lines.append(_indent(str(v), 2))
            else:
                lines.append("{}: {}".format(k, v))
        return "\n".join(lines)

    def __repr__(self):
        return "{}({})".format(self.__class__.__name__, super().__repr__())

    # -- merging ------------------------------------------------------------
    @classmethod
    def load_yaml_with_base(cls, filename: str) -> Dict:
        """Load a YAML file, recursively resolving ``_BASE_`` inheritance."""
        with open(filename, "r") as f:
            cfg = yaml.load(f, Loader=_CfgLoader)
        if cfg is None:
            cfg = {}

        if BASE_KEY in cfg:
            base_filename = cfg.pop(BASE_KEY)
            if base_filename.startswith("~"):
                base_filename = os.path.expanduser(base_filename)
            if not base_filename.startswith("/"):
                base_filename = os.path.join(os.path.dirname(filename), base_filename)
            base_cfg = cls.load_yaml_with_base(base_filename)
            _merge_dict_a_into_b(cfg, base_cfg)
            return base_cfg
        return cfg

    def merge_from_file(self, cfg_filename: str, allow_unsafe: bool = True):
        """Merge a YAML config file (with ``_BASE_`` support) into self.

        Version handling mirrors detectron2/config/config.py:21-61: a loaded
        cfg at an older VERSION is auto-upgraded before merging.
        """
        loaded = self.load_yaml_with_base(cfg_filename)
        loaded = type(self)(loaded)

        from . import compat

        latest = self.get("VERSION", compat.LATEST_VERSION)
        loaded_ver = loaded.get("VERSION", None)
        if loaded_ver is None:
            loaded_ver = compat.guess_version(loaded, cfg_filename)
        if loaded_ver > latest:
            raise ValueError(
                "Config file {} has VERSION {} newer than this framework's {}".format(
                    cfg_filename, loaded_ver, latest
                )
            )
        if loaded_ver != latest:
            dict.__setitem__(loaded, "VERSION", loaded_ver)
            loaded = compat.upgrade_config(loaded, to_version=latest)
        self.merge_from_other_cfg(loaded)

    def merge_from_other_cfg(self, cfg_other: "CfgNode"):
        _merge_cfg_a_into_b(cfg_other, self, [])
        return self

    def merge_from_list(self, cfg_list: List[Any]):
        """Merge ``["KEY1", v1, "KEY2", v2, ...]`` CLI-style overrides."""
        assert len(cfg_list) % 2 == 0, "Override list has odd length: {}".format(cfg_list)
        for full_key, v in zip(cfg_list[0::2], cfg_list[1::2]):
            key_parts = full_key.split(".")
            d = self
            for sub in key_parts[:-1]:
                if sub not in d:
                    raise KeyError("Non-existent key: {}".format(full_key))
                d = d[sub]
            last = key_parts[-1]
            if last not in d and not d.__dict__[CfgNode.NEW_ALLOWED]:
                raise KeyError("Non-existent key: {}".format(full_key))
            value = _decode_value(v)
            if last in d:
                value = _check_value_type(value, d[last], full_key)
            dict.__setitem__(d, last, CfgNode._to_cfg(value))
        return self

    def set_new_allowed(self, flag: bool):
        self.__dict__[CfgNode.NEW_ALLOWED] = flag
        for v in self.values():
            if isinstance(v, CfgNode):
                v.set_new_allowed(flag)


def _decode_value(v):
    """Decode a CLI string override into a Python value when possible.

    yacs semantics (yacs/config.py _decode_cfg_value): try a Python literal
    first — this is what parses tuple overrides like ``"(15,)"`` — then fall
    back to YAML for scalars (``true``, ``1e-4``, ``null``), then the raw
    string.
    """
    if not isinstance(v, str):
        return v
    try:
        return ast.literal_eval(v)
    except (ValueError, SyntaxError):
        pass
    try:
        return yaml.load(v, Loader=_CfgLoader)
    except yaml.YAMLError:
        return v


def _check_value_type(replacement, original, full_key):
    """yacs coercion rules: allow list<->tuple and int->float casts."""
    orig_t, repl_t = type(original), type(replacement)
    if orig_t is repl_t or original is None or replacement is None:
        return replacement
    casts = [(tuple, list), (list, tuple), (int, float)]
    for src, dst in casts:
        if repl_t is src and orig_t is dst:
            return dst(replacement)
    if isinstance(original, CfgNode) and isinstance(replacement, dict):
        return replacement
    raise ValueError(
        "Type mismatch ({} vs {}) for key {}: {} vs {}".format(
            repl_t, orig_t, full_key, replacement, original
        )
    )


def _merge_cfg_a_into_b(a: CfgNode, b: CfgNode, key_path: List[str]):
    for k, v_ in a.items():
        full_key = ".".join(key_path + [str(k)])
        if k not in b:
            if b.__dict__.get(CfgNode.NEW_ALLOWED, False):
                dict.__setitem__(b, k, CfgNode._to_cfg(v_, new_allowed=True))
                continue
            raise KeyError("Non-existent config key: {}".format(full_key))
        if isinstance(v_, CfgNode) and isinstance(b[k], CfgNode):
            _merge_cfg_a_into_b(v_, b[k], key_path + [str(k)])
        else:
            # yacs semantics: file values that read as python literals decode
            # before type checking, so `TRAIN: ("coco_2017_train",)` in a yaml
            # (a plain string to the yaml parser) becomes a tuple
            if isinstance(v_, str) and not isinstance(b[k], str):
                import ast

                try:
                    v_ = ast.literal_eval(v_)
                except (ValueError, SyntaxError):
                    pass
            v = _check_value_type(v_, b[k], full_key)
            dict.__setitem__(b, k, CfgNode._to_cfg(v))


def _merge_dict_a_into_b(a: Dict, b: Dict):
    for k, v in a.items():
        if isinstance(v, dict) and k in b and isinstance(b[k], dict):
            _merge_dict_a_into_b(v, b[k])
        else:
            b[k] = v
