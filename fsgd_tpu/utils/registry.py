"""A string-keyed registry.

Same role as the fvcore ``Registry`` re-exported by the reference
(detectron2/utils/registry.py): the glue between config strings and component
classes for META_ARCH / BACKBONE / RPN_HEAD / ANCHOR_GENERATOR / ROI_HEADS /
GAMBLER_HEAD etc.
"""

from typing import Any, Dict, Iterator, Optional, Tuple


class Registry:
    def __init__(self, name: str):
        self._name = name
        self._obj_map: Dict[str, Any] = {}

    def _do_register(self, name: str, obj: Any) -> None:
        if name in self._obj_map:
            raise KeyError(
                "An object named '{}' was already registered in '{}' registry".format(
                    name, self._name
                )
            )
        self._obj_map[name] = obj

    def register(self, obj: Optional[Any] = None) -> Any:
        if obj is None:
            # used as a decorator
            def deco(func_or_class: Any) -> Any:
                self._do_register(func_or_class.__name__, func_or_class)
                return func_or_class

            return deco
        self._do_register(obj.__name__, obj)
        return obj

    def get(self, name: str) -> Any:
        ret = self._obj_map.get(name)
        if ret is None:
            raise KeyError(
                "No object named '{}' found in '{}' registry! Available: {}".format(
                    name, self._name, sorted(self._obj_map.keys())
                )
            )
        return ret

    def __contains__(self, name: str) -> bool:
        return name in self._obj_map

    def __iter__(self) -> Iterator[Tuple[str, Any]]:
        return iter(self._obj_map.items())

    def keys(self):
        return self._obj_map.keys()

    def __repr__(self) -> str:
        return "Registry(name={}, items={})".format(self._name, sorted(self._obj_map.keys()))
