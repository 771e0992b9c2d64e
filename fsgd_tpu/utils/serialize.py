"""Picklable wrapper for closures (parity with detectron2/utils/serialize.py:5-29)."""

import pickle


class PicklableWrapper:
    """Wrap an object so lambdas/closures survive pickling (uses cloudpickle if present)."""

    def __init__(self, obj):
        self._obj = obj
        try:
            import cloudpickle

            self._blob = cloudpickle.dumps(obj)
        except Exception:
            self._blob = None

    def __reduce__(self):
        if self._blob is not None:
            return (_unpickle_cloud, (self._blob,))
        return (PicklableWrapper, (self._obj,))

    def __call__(self, *args, **kwargs):
        return self._obj(*args, **kwargs)

    def __getattr__(self, attr):
        if attr not in ("_obj", "_blob"):
            return getattr(self._obj, attr)
        return getattr(self, attr)


def _unpickle_cloud(blob):
    import cloudpickle

    return PicklableWrapper(cloudpickle.loads(blob))
