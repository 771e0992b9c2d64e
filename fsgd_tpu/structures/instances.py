"""Per-image typed field container.

Parity with detectron2/structures/instances.py:9-177: an ``Instances`` holds
equal-length per-instance fields (boxes, classes, scores, masks, ...) with
slicing, concatenation and attribute access.  TPU adaptation: registered as a
JAX pytree (array fields become leaves) so an ``Instances`` of padded arrays
can cross jit boundaries; host-only fields (e.g. ``PolygonMasks``) are carried
as leaves too but must not enter jit.
"""

from __future__ import annotations

import itertools
from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_pytree_node_class
class Instances:
    def __init__(self, image_size: Tuple[int, int], **kwargs: Any):
        self._image_size = tuple(int(x) for x in image_size)  # (h, w)
        self._fields: Dict[str, Any] = {}
        for k, v in kwargs.items():
            self.set(k, v)

    # -- pytree protocol ----------------------------------------------------
    def tree_flatten(self):
        keys = sorted(self._fields.keys())
        return tuple(self._fields[k] for k in keys), (self._image_size, tuple(keys))

    @classmethod
    def tree_unflatten(cls, aux, children):
        image_size, keys = aux
        obj = object.__new__(cls)
        obj._image_size = image_size
        obj._fields = dict(zip(keys, children))
        return obj

    @property
    def image_size(self) -> Tuple[int, int]:
        return self._image_size

    # -- attribute protocol -------------------------------------------------
    def __setattr__(self, name: str, val: Any) -> None:
        if name.startswith("_"):
            super().__setattr__(name, val)
        else:
            self.set(name, val)

    def __getattr__(self, name: str) -> Any:
        if name.startswith("_") or name not in self._fields:
            raise AttributeError("Cannot find field '{}' in the given Instances!".format(name))
        return self._fields[name]

    def set(self, name: str, value: Any) -> None:
        data_len = _field_len(value)
        if len(self._fields) and data_len is not None:
            cur = len(self)
            if cur is not None and data_len != cur:
                raise AssertionError(
                    "Adding a field '{}' of length {} to Instances of length {}".format(
                        name, data_len, cur
                    )
                )
        self._fields[name] = value

    def has(self, name: str) -> bool:
        return name in self._fields

    def remove(self, name: str) -> None:
        del self._fields[name]

    def get(self, name: str) -> Any:
        return self._fields[name]

    def get_fields(self) -> Dict[str, Any]:
        return self._fields

    # -- device / numpy -----------------------------------------------------
    def to(self, *args, **kwargs) -> "Instances":  # API compatibility no-op
        return self

    def numpy(self) -> "Instances":
        ret = Instances(self._image_size)
        for k, v in self._fields.items():
            if isinstance(v, (jnp.ndarray, jax.Array)):
                v = np.asarray(v)
            elif hasattr(v, "numpy"):
                v = type(v)(np.asarray(v.tensor)) if hasattr(v, "tensor") else v.numpy()
            ret.set(k, v)
        return ret

    # -- indexing -----------------------------------------------------------
    def __getitem__(self, item) -> "Instances":
        if isinstance(item, int):
            if item >= len(self) or item < -len(self):
                raise IndexError("Instances index out of range!")
            item = slice(item, None, len(self))
        ret = Instances(self._image_size)
        for k, v in self._fields.items():
            if hasattr(v, "__getitem__") and not isinstance(v, (str, bytes)):
                ret.set(k, v[item])
            else:
                ret.set(k, v)
        return ret

    def __len__(self) -> int:
        for v in self._fields.values():
            n = _field_len(v)
            if n is not None:
                return n
        raise NotImplementedError("Empty Instances does not support __len__!")

    def __iter__(self):
        raise NotImplementedError("`Instances` object is not iterable!")

    @staticmethod
    def cat(instance_lists: List["Instances"]) -> "Instances":
        assert all(isinstance(i, Instances) for i in instance_lists)
        assert len(instance_lists) > 0
        if len(instance_lists) == 1:
            return instance_lists[0]
        image_size = instance_lists[0].image_size
        for i in instance_lists[1:]:
            assert i.image_size == image_size
        ret = Instances(image_size)
        for k in instance_lists[0]._fields.keys():
            values = [i.get(k) for i in instance_lists]
            v0 = values[0]
            if isinstance(v0, (jnp.ndarray, jax.Array, np.ndarray)):
                ret.set(k, jnp.concatenate([jnp.asarray(v) for v in values], axis=0))
            elif isinstance(v0, list):
                ret.set(k, list(itertools.chain(*values)))
            elif hasattr(type(v0), "cat"):
                ret.set(k, type(v0).cat(values))
            else:
                raise ValueError("Unsupported type {} for concatenation".format(type(v0)))
        return ret

    def __repr__(self) -> str:
        s = self.__class__.__name__ + "("
        s += "num_instances={}, ".format(len(self) if len(self._fields) else 0)
        s += "image_height={}, ".format(self._image_size[0])
        s += "image_width={}, ".format(self._image_size[1])
        s += "fields=[{}])".format(", ".join(self._fields.keys()))
        return s


def _field_len(value) -> int | None:
    try:
        return len(value)
    except TypeError:
        return None
