"""fsgd_tpu — a TPU-native object-detection framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of
Melika-Ayoughi/Full-Scale-Gambler-for-Object-Detection (a Detectron2 v0.1 fork
plus the "gambler" imbalance-attacking auxiliary network).

Design stance (see SURVEY.md section 7):
  * functional models (flax.linen) with explicit param/state pytrees,
  * one jitted ``train_step`` containing forward + loss + grad + collective + update,
  * static padded shapes everywhere (images bucketed, GT padded with validity
    masks, NMS as fixed-size masked top-k),
  * data parallelism via ``jax.sharding.Mesh`` + jit sharding annotations
    (XLA inserts the ICI collectives),
  * Pallas kernels for the detection hot ops,
  * a detectron2-compatible public surface (``get_cfg``, ``build_model``,
    ``DefaultTrainer``, ``DefaultPredictor``, ``COCOEvaluator``) so the
    reference's YAML configs run unmodified.
"""

__version__ = "0.1.0"

import os as _os

if _os.environ.get("JAX_PLATFORMS"):
    # Honor an explicit JAX_PLATFORMS env var over any platform pinned by a
    # site hook (the axon sitecustomize calls jax.config.update at interpreter
    # start, which silently outranks the env var — `JAX_PLATFORMS=cpu
    # python tools/infer.py` would otherwise still run on the TPU tunnel).
    # No-op when they already agree or when a backend is already live.
    try:
        import jax as _jax

        if _jax.config.jax_platforms != _os.environ["JAX_PLATFORMS"]:
            _jax.config.update("jax_platforms", _os.environ["JAX_PLATFORMS"])
    except Exception:  # pragma: no cover - backend already initialized
        pass
del _os
