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
