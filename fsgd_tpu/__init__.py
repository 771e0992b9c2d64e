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
