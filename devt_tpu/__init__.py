"""devt_tpu — TPU-native data-efficient video transformers.

A brand-new JAX/XLA/Pallas/pjit framework with the capabilities of
``ed-fish/data-efficient-video-transformers`` (reference mounted at
``/root/reference``): offline corpus tooling, a host-side fixed-shape data
pipeline, a family of video transformer models (spatial-temporal pyramid
transformers over multi-modal expert streams, frame/clip transformers with
multi-modal distillation, factorized space-time ViViT, temporal pyramid
networks, SimCLR-style contrastive pretraining with collaborative gating),
and a jitted training harness with data-parallel sharding over a device mesh.

The package name ``devt_tpu`` is the importable spelling of
``data-efficient-video-transformers_tpu``.

Layout (mirrors SURVEY.md §7):
  - :mod:`devt_tpu.config`     — typed config, reference ``config.yaml`` compatible
  - :mod:`devt_tpu.models`     — model family (pure flax modules + loss fns)
  - :mod:`devt_tpu.ops`        — Pallas TPU kernels (flash attention, fused ops)
  - :mod:`devt_tpu.parallel`   — mesh construction, shardings, train-step factory
  - :mod:`devt_tpu.data`       — host input pipeline (manifests, packing, augment)
  - :mod:`devt_tpu.train`      — harness, callbacks, metrics, checkpointing, logging
  - :mod:`devt_tpu.tools`      — retrieval / embedding-inspection tools
  - :mod:`devt_tpu.data_processing` — offline corpus tooling (shot cutting, manifests)
  - :mod:`devt_tpu.utils`      — pytree / torch-weight-port helpers
"""

from devt_tpu.version import __version__

__all__ = ["__version__"]
