"""Auto-imported at interpreter start for reference subprocesses (this
directory rides PYTHONPATH with the torchvision shim).

Seeds the stdlib RNG so the reference's UNSEEDED ``randrange`` subset
sampling (``/root/reference/sr.py:294-295``) draws the same index sequence
our CLI draws after ``random.seed(args.seed)`` with ``--seed 0`` — making
``--subset`` differentially comparable.  Neither stack consumes stdlib
randomness before that sampling point (torch/JAX/numpy RNGs are separate
streams), so seed-at-start aligns the first draws.
"""

import random

random.seed(0)
