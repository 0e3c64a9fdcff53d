"""situation_recognition_tpu — a TPU-native framework for grounded situation
recognition on the imSitu dataset.

A ground-up JAX/XLA/Pallas re-design of the capabilities of the reference
``vFones/situation-recognition`` (PyTorch, 4-GPU DataParallel):

* ``data``     — vocab encoder with device-resident lookup tables, imSitu
                 dataset, host-decode → device-augment input pipeline, and a
                 native C++ JPEG decode path.
* ``models``   — flax ResNet-152 / ViT backbones and the FCGGNN situation
                 model (GGNN over the verb's role graph).
* ``ops``      — GGNN propagation: plain-XLA reference impl, a masked-sum
                 formulation that eliminates the adjacency matmul, and a fused
                 Pallas TPU kernel.
* ``parallel`` — mesh construction and sharding rules (data-parallel over ICI,
                 optional model-axis sharding of the classifier heads).
* ``metrics``  — bit-compatible vectorized imsitu scorer.
* ``utils``    — checkpointing (msgpack, torch-checkpoint converter),
                 logging/profiling, plotting.

The public CLI (``sr.py`` at the repo root) preserves the reference's flags
and stdout format verbatim.
"""

__version__ = "0.1.0"

from situation_recognition_tpu.data.encoder import ImsituEncoder  # noqa: F401

# Lazy top-level re-exports of the user-facing API (PEP 562): the heavy
# modules (train pulls optax/flax, serving pulls jax.export) load only
# when first touched, so `import situation_recognition_tpu` stays cheap
# for encoder-only consumers.
_LAZY = {
    "Trainer": "situation_recognition_tpu.train",
    "TrainerConfig": "situation_recognition_tpu.train",
    "ImsituDataset": "situation_recognition_tpu.data.dataset",
    "ImsituLoader": "situation_recognition_tpu.data.dataset",
    "ImsituScorer": "situation_recognition_tpu.metrics.scorer",
    "mean_of_eight": "situation_recognition_tpu.metrics.scorer",
    "export_inference": "situation_recognition_tpu.serving",
    "load_inference": "situation_recognition_tpu.serving",
    "DynamicBatcher": "situation_recognition_tpu.server",
    "serve_http": "situation_recognition_tpu.server",
    "make_mesh": "situation_recognition_tpu.parallel.mesh",
}


def __getattr__(name):
    if name in _LAZY:
        import importlib

        return getattr(importlib.import_module(_LAZY[name]), name)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")


def __dir__():
    return sorted(list(globals()) + list(_LAZY))
