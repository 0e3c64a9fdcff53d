"""imSitu vocabulary encoder with device-resident lookup tables.

Re-design of the reference encoder (``/root/reference/utils/imsitu_encoder.py``,
class ``imsitu_encoder``) for a TPU-native pipeline.  The reference builds its
vocab by scanning the train JSON in file order (imsitu_encoder.py:39-68) and
then, **per batch per training step**, runs Python loops on the host to build
role-id tensors (imsitu_encoder.py:172-180) and per-example (6,6) adjacency
matrices (imsitu_encoder.py:209-229) — a GIL-bound host bottleneck inside the
model forward.

Here the same vocabulary scan (identical insertion-order semantics, so verb /
role / label ids match the reference exactly) happens **once**, and every
per-verb structure is precomputed into dense NumPy tables:

* ``role_ids``    (V, R)    int32  — role ids per verb, padded with ``num_roles``
* ``role_counts`` (V,)      int32  — number of real roles per verb
* ``role_mask``   (V, R)    float32 — 1 for real roles, 0 for padding
* ``adjacency``   (V, R, R) float32 — the reference's ``get_adj_matrix_noself``
  matrix per verb (off-diagonal outer product of the role mask; diagonal 0 for
  real roles, 1 for pad roles)

At train time a batch's structures are a single device-side gather
(``role_ids[verbs]`` etc.) — no host round-trip.  The GGNN itself only needs
``role_mask`` (see ops/ggnn.py: the adjacency matmul reduces to a masked sum);
``adjacency`` is kept for parity testing and API compatibility.

Serialization is JSON (``save``/``load``) instead of the reference's pickle
(sr.py:442-447).
"""

from __future__ import annotations

import json
from typing import Dict, List, Mapping, Sequence, Tuple

import numpy as np


class ImsituEncoder:
    """Vocabulary + static graph tables for the imSitu dataset.

    Parameters
    ----------
    train_set:
        The train JSON mapping ``img_name -> {"verb": str,
        "frames": [{role: label, ...} x 3]}``.  Scanned in insertion order so
        that ids are identical to the reference encoder's.
    verbose:
        Print the reference's "train set stats" block (sr.py relies on this
        output; imsitu_encoder.py:65-68).
    """

    #: number of annotators per image in imSitu
    NUM_FRAMES = 3

    def __init__(self, train_set: Mapping[str, dict] | None = None, verbose: bool = True):
        self.verb_list: List[str] = []
        self.role_list: List[str] = []
        self.label_list: List[str] = []
        self.roles_per_verb: Dict[str, List[str]] = {}
        self.max_role_count: int = 0

        if train_set is not None:
            self._scan(train_set, verbose=verbose)
            self._build_tables()

    @classmethod
    def synthetic_full(cls, seed: int = 0) -> "ImsituEncoder":
        """Full-size synthetic vocabulary — the exact real-imSitu model
        shape (504 verbs / 190 roles / 2001 labels incl. '' and 'UNK' /
        max 6 roles) without the dataset.  Single source of truth for the
        benchmarks (bench.py, tools/bench_e2e.py): building the vocab by
        sampling annotations instead silently shrinks the label list
        (unsampled labels never enter it) and with it the nouns
        classifier, making benches not apples-to-apples."""
        enc = cls(None)
        enc.verb_list = [f"v{i}" for i in range(504)]
        enc.role_list = [f"r{i}" for i in range(190)]
        enc.label_list = [""] + [f"n{i}" for i in range(1999)] + ["UNK"]
        rng = np.random.default_rng(seed)
        enc.roles_per_verb = {
            v: [f"r{j}" for j in rng.choice(190, size=rng.integers(1, 7),
                                            replace=False)]
            for v in enc.verb_list}
        enc.max_role_count = 6
        enc._build_tables()
        return enc

    # ------------------------------------------------------------------ scan

    def _scan(self, train_set: Mapping[str, dict], verbose: bool) -> None:
        # Identical insertion-order semantics to imsitu_encoder.py:39-63, but
        # with O(1) membership sets instead of O(n) `x in list` scans.
        verb_seen = set()
        role_seen = set()
        label_seen = set()
        for img in train_set:
            annotations = train_set[img]
            current_verb = annotations["verb"]
            if current_verb not in verb_seen:
                verb_seen.add(current_verb)
                self.verb_list.append(current_verb)
                self.roles_per_verb[current_verb] = []
            verb_roles = self.roles_per_verb[current_verb]
            for annotation in annotations["frames"]:
                for role, label in annotation.items():
                    if role not in role_seen:
                        role_seen.add(role)
                        self.role_list.append(role)
                    if role not in verb_roles:
                        verb_roles.append(role)
                        if len(verb_roles) > self.max_role_count:
                            self.max_role_count = len(verb_roles)
                    if label not in label_seen:
                        label_seen.add(label)
                        self.label_list.append(label)

        if verbose:
            # Byte-identical to the reference's stats print (imsitu_encoder.py:65-68).
            print('train set stats: \n\t verb count:', len(self.verb_list),
                  '\n\t role count:', len(self.role_list),
                  '\n\t label count:', len(self.label_list),
                  '\n\t max role count:', self.max_role_count)

    # ---------------------------------------------------------------- tables

    def _build_tables(self) -> None:
        V, R = len(self.verb_list), self.max_role_count
        num_roles = len(self.role_list)

        role_index = {r: i for i, r in enumerate(self.role_list)}
        self._label_index = {l: i for i, l in enumerate(self.label_list)}
        self._verb_index = {v: i for i, v in enumerate(self.verb_list)}

        self.role_ids = np.full((V, R), num_roles, dtype=np.int32)
        self.role_counts = np.zeros((V,), dtype=np.int32)
        for v, verb in enumerate(self.verb_list):
            roles = self.roles_per_verb[verb]
            self.role_counts[v] = len(roles)
            for j, role in enumerate(roles):
                self.role_ids[v, j] = role_index[role]

        # role_mask[v, j] = 1 iff slot j is a real role of verb v
        self.role_mask = (
            np.arange(R)[None, :] < self.role_counts[:, None]
        ).astype(np.float32)

        # Reference adjacency (imsitu_encoder.py:209-229): outer product of the
        # role mask with the diagonal zeroed for real roles and set to 1 for
        # pad roles.  Precomputed once per verb; a batch is a gather.
        m = self.role_mask
        adj = m[:, :, None] * m[:, None, :]
        diag = np.arange(R)
        adj[:, diag, diag] = 1.0 - m  # 0 on real roles, 1 on pad roles
        self.adjacency = adj.astype(np.float32)

    # ----------------------------------------------------------- vocab sizes

    def get_num_verbs(self) -> int:
        return len(self.verb_list)

    def get_num_roles(self) -> int:
        return len(self.role_list)

    def get_num_labels(self) -> int:
        return len(self.label_list)

    def get_max_role_count(self) -> int:
        return self.max_role_count

    def get_role_count(self, verb_id: int) -> int:
        return int(self.role_counts[verb_id])

    # ------------------------------------------------------------- encoding

    def encode(self, item: dict) -> Tuple[int, np.ndarray]:
        """Encode one annotation record → (verb_id, labels (3, R) int32).

        Matches reference ``encode``/``get_label_ids``
        (imsitu_encoder.py:161-207): unseen labels map to ``UNK``, padding
        slots to ``num_labels``.
        """
        verb = self._verb_index[item["verb"]]
        labels = self.get_label_ids(item["verb"], item["frames"])
        return verb, labels

    def get_label_ids(self, verb: str, frames: Sequence[Mapping[str, str]]) -> np.ndarray:
        roles = self.roles_per_verb[verb]
        num_labels = len(self.label_list)
        unk = self._label_index.get("UNK")
        out = np.full((len(frames), self.max_role_count), num_labels, dtype=np.int32)
        for f, frame in enumerate(frames):
            for j, role in enumerate(roles):
                label = frame[role]
                idx = self._label_index.get(label)
                if idx is None:
                    if unk is None:
                        # reference raises ValueError via list.index
                        raise ValueError(f"unseen label {label!r} and no UNK in vocab")
                    idx = unk
                out[f, j] = idx
        return out

    # ------------------------------------------------- batch table lookups

    def get_role_ids(self, verb_id: int) -> np.ndarray:
        """(R,) role ids for one verb (pad = num_roles)."""
        return self.role_ids[verb_id]

    def get_role_ids_batch(self, verbs) -> np.ndarray:
        """(B, R) role ids — a single gather; replaces the reference's
        per-example Python loop (imsitu_encoder.py:172-180)."""
        return self.role_ids[np.asarray(verbs)]

    def get_adj_matrix_noself(self, verb_ids) -> np.ndarray:
        """(B, R, R) adjacency — replaces imsitu_encoder.py:209-229's loop."""
        return self.adjacency[np.asarray(verb_ids)]

    def get_verb2role_encoding_batch(self, verb_ids) -> np.ndarray:
        """(B, R) binary role mask per verb (imsitu_encoder.py:231-240)."""
        return self.role_mask[np.asarray(verb_ids)]

    # ------------------------------------------------------------ transforms

    def dev_transform(self, img) -> np.ndarray:
        """Eval preprocessing for one PIL image / HWC uint8 array →
        normalized (224, 224, 3) float32 (reference imsitu_encoder.py:31-36:
        Resize(224) + CenterCrop(224) + ToTensor + Normalize, realized as
        center 256-window + device resize; see data/transforms.py)."""
        from situation_recognition_tpu.data import transforms as T

        window = T.host_window(np.asarray(img), train=False)
        return np.asarray(T.eval_transform(window[None]))[0]

    def train_transform(self, img, rng: np.random.Generator) -> np.ndarray:
        """Train preprocessing (random crop + flip) for one image
        (reference imsitu_encoder.py:21-29).  ``rng`` is required — a
        silent OS-entropy fallback would make same-seed runs diverge
        with no error (the determinism contract host_window enforces)."""
        from situation_recognition_tpu.data import transforms as T

        window = T.host_window(np.asarray(img), train=True, rng=rng)
        flip = np.asarray([rng.random() < 0.5])
        return np.asarray(T.device_transform(window[None], flip))[0]

    # --------------------------------------------------------- serialization

    def to_dict(self) -> dict:
        return {
            "verb_list": self.verb_list,
            "role_list": self.role_list,
            "label_list": self.label_list,
            "roles_per_verb": self.roles_per_verb,
            "max_role_count": self.max_role_count,
        }

    @classmethod
    def from_dict(cls, d: dict) -> "ImsituEncoder":
        enc = cls(None)
        enc.verb_list = list(d["verb_list"])
        enc.role_list = list(d["role_list"])
        enc.label_list = list(d["label_list"])
        enc.roles_per_verb = {k: list(v) for k, v in d["roles_per_verb"].items()}
        enc.max_role_count = int(d["max_role_count"])
        enc._build_tables()
        return enc

    def save(self, path: str) -> None:
        with open(path, "w") as f:
            json.dump(self.to_dict(), f)

    @classmethod
    def load(cls, path: str) -> "ImsituEncoder":
        with open(path) as f:
            return cls.from_dict(json.load(f))
