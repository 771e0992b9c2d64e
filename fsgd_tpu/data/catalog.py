"""Dataset and metadata catalogs.

Parity with detectron2/data/catalog.py:12-211: ``DatasetCatalog`` maps names
to functions returning list-of-dict datasets; ``MetadataCatalog`` returns
singleton mutable ``Metadata`` per name with write-once semantics.
"""

from __future__ import annotations

import copy
import types
from typing import Callable, Dict, List

__all__ = ["DatasetCatalog", "MetadataCatalog", "Metadata"]


class _DatasetCatalog:
    def __init__(self):
        self._registry: Dict[str, Callable] = {}

    def register(self, name: str, func: Callable):
        assert callable(func), "You must register a function with DatasetCatalog.register!"
        if name in self._registry:
            raise ValueError("Dataset '{}' is already registered!".format(name))
        self._registry[name] = func

    def get(self, name: str) -> List[dict]:
        try:
            f = self._registry[name]
        except KeyError:
            raise KeyError(
                "Dataset '{}' is not registered! Available datasets: {}".format(
                    name, ", ".join(sorted(self._registry.keys()))
                )
            )
        return f()

    def list(self) -> List[str]:
        return sorted(self._registry.keys())

    def remove(self, name: str):
        self._registry.pop(name)

    def clear(self):
        self._registry.clear()

    def __contains__(self, name: str) -> bool:
        return name in self._registry


class Metadata(types.SimpleNamespace):
    """Write-once attribute namespace attached to a dataset name."""

    name: str = "N/A"

    _RENAMED = {
        "class_names": "thing_classes",
        "dataset_id_to_contiguous_id": "thing_dataset_id_to_contiguous_id",
        "stuff_class_names": "stuff_classes",
    }

    def __getattr__(self, key):
        if key in self._RENAMED:
            return getattr(self, self._RENAMED[key])
        raise AttributeError(
            "Attribute '{}' does not exist in the metadata of '{}'. Available keys: {}".format(
                key, self.name, ", ".join(sorted(self.__dict__.keys()))
            )
        )

    def __setattr__(self, key, val):
        if key in self._RENAMED:
            key = self._RENAMED[key]
        oldval = getattr(self, key, None)
        if oldval is not None and oldval != val:
            raise AttributeError(
                "Attribute '{}' of metadata '{}' cannot be set to a different value!\n{} != {}".format(
                    key, self.name, oldval, val
                )
            )
        super().__setattr__(key, val)

    def as_dict(self):
        return copy.copy(self.__dict__)

    def set(self, **kwargs):
        for k, v in kwargs.items():
            setattr(self, k, v)
        return self

    def get(self, key, default=None):
        try:
            return getattr(self, key)
        except AttributeError:
            return default


class _MetadataCatalog:
    def __init__(self):
        self._metadata: Dict[str, Metadata] = {}

    def get(self, name: str) -> Metadata:
        assert len(name)
        if name not in self._metadata:
            self._metadata[name] = Metadata(name=name)
        return self._metadata[name]

    def list(self):
        return sorted(self._metadata.keys())

    def __contains__(self, name):
        return name in self._metadata


DatasetCatalog = _DatasetCatalog()
MetadataCatalog = _MetadataCatalog()
