"""Single-image inference and subset analysis (reference ``results`` /
``analize_subset``, ``/root/reference/sr.py:235-381``), stdout-identical.

Reproduced quirks (deliberately, for output parity):

* ``imsitu_space.json`` is loaded from the hardcoded ``imSitu/`` folder,
  ignoring ``--dataset_folder`` (sr.py:238).
* Role-noun "probabilities" are ``softmax(logits, dim=0)`` — normalized over
  the 6 roles, not the 2001 labels (sr.py:264, :324).
* The subset is sampled **with replacement** via ``randrange`` (sr.py:294-295).
* ``''``/``'UNK'`` labels print as ``'-'`` (sr.py:275-279).

One documented fix (not a quirk worth keeping): the reference hardcodes
``'resized_256/'`` when re-opening the image for display (sr.py:367); we use
the dataset's ``img_dir`` so ``--imgset_dir`` works in subset mode.
"""

from __future__ import annotations

import json
from os.path import isfile as pisfile, join as pjoin
from random import randrange
from typing import Dict, List, Tuple

import numpy as np

from situation_recognition_tpu.data.transforms import (
    host_window, host_window_exact)


def _softmax(x: np.ndarray, axis: int) -> np.ndarray:
    x = x - x.max(axis=axis, keepdims=True)
    e = np.exp(x)
    return e / e.sum(axis=axis, keepdims=True)


def _role_label_dict(encoder, nouns_space, verbs_space, verb_name,
                     noun_ids) -> Dict[str, str]:
    roles = list(verbs_space[verb_name]["roles"].keys())
    labels: Dict[str, str] = {}
    for count, i in enumerate(noun_ids[: len(roles)]):
        name = encoder.label_list[int(i)]
        if name == "" or name == "UNK":
            labels[roles[count]] = "-"
        else:
            labels[roles[count]] = nouns_space[name]["gloss"][0]
    return labels


def results(trainer, image: str, encoder, gt_verb: str,
            preproc: str = "window",
            ) -> Tuple[str, float, Dict[str, str], List[float]]:
    """Reference ``results`` (sr.py:235-281).  ``preproc='exact'`` swaps in
    the reference-exact host Resize(224)+CenterCrop(224) window
    (DIVERGENCES #5 escape hatch); the jitted inference path resizes by an
    identity matrix for 224 inputs, so no recompile semantics change."""
    from PIL import Image

    with open(pjoin("imSitu", "imsitu_space.json"), "r") as f:
        imsitu_space = json.load(f)
    nouns_space = imsitu_space["nouns"]
    verbs_space = imsitu_space["verbs"]

    img = np.asarray(Image.open(image).convert("RGB"))
    if preproc == "exact":
        window = host_window_exact(img)[None]     # batch of 1
    else:
        window = host_window(img, train=False)[None]

    if gt_verb and encoder.verb_list.count(gt_verb):
        verb_id = encoder.verb_list.index(gt_verb)
        verb_prob = 100.0
    else:
        print("No ground truth verb found, calculating by myself...")
        logits = np.asarray(trainer.infer_verb(window))[0]
        verb_id = int(np.argmax(logits))
        verb_prob = float(np.max(_softmax(logits[None], axis=1))) * 100

    logits = np.asarray(
        trainer.infer_nouns(window, np.array([verb_id], np.int32)))[0]
    noun_ids = np.argmax(logits, axis=1)

    probabilities = _softmax(logits, axis=0).max(axis=1)
    labels_prob = [float(p) * 100 for p in probabilities]

    verb_name = encoder.verb_list[verb_id]
    labels = _role_label_dict(encoder, nouns_space, verbs_space,
                              verb_name, noun_ids)
    return verb_name, verb_prob, labels, labels_prob


def analize_subset(trainer, dev_set, encoder, size: int) -> None:
    """Reference ``analize_subset`` (sr.py:284-381)."""
    from PIL import Image

    try:
        from IPython.display import display
    except Exception:  # pragma: no cover
        display = print

    with open(pjoin("imSitu", "imsitu_space.json"), "r") as f:
        imsitu_space = json.load(f)
    nouns_space = imsitu_space["nouns"]
    verbs_space = imsitu_space["verbs"]

    indices = [randrange(0, len(dev_set)) for _ in range(0, size)]

    for idx in indices:
        img_name = dev_set.names[idx]
        window = dev_set.load_window(idx, None)[None]
        gt_verb = int(dev_set.verbs[idx])
        gt_noun = dev_set.labels[idx]           # (3, R)

        logits = np.asarray(trainer.infer_verb(window))[0]
        verb_prob = float(np.max(_softmax(logits[None], axis=1))) * 100
        verb_id = int(np.argmax(logits))

        nlogits = np.asarray(
            trainer.infer_nouns(window, np.array([verb_id], np.int32)))[0]
        probabilities = _softmax(nlogits, axis=0).max(axis=1)
        labels_prob = [float(p) * 100 for p in probabilities]
        labels_tensor = np.argmax(nlogits, axis=1)

        verb_name = encoder.verb_list[verb_id]
        gt_verb_name = encoder.verb_list[gt_verb]

        labels = _role_label_dict(encoder, nouns_space, verbs_space,
                                  verb_name, labels_tensor)

        # gt labels: {role: (ann1, ann2, ann3)}; pad id -> '-'
        t_gt_noun = gt_noun.T                    # (R, 3)
        gt_roles = list(verbs_space[gt_verb_name]["roles"].keys())
        gt_labels = {}
        num_labels = encoder.get_num_labels()
        for count, i in enumerate(t_gt_noun[: len(gt_roles)]):
            t = ()
            for r in range(0, 3):
                idx_l = int(i[r]) if int(i[r]) != num_labels else -1
                if (idx_l == -1 or encoder.label_list[idx_l] == ""
                        or encoder.label_list[idx_l] == "UNK"):
                    t += ("-",)
                else:
                    t += (nouns_space[encoder.label_list[idx_l]]["gloss"][0],)
            gt_labels[gt_roles[count]] = (t[0], t[1], t[2])

        print("&" * 35)
        print("Analizing: ", img_name)
        path = pjoin(dev_set.img_dir, img_name)
        if pisfile(path):
            # reference display path (and its exact stdout repr)
            pil_im = Image.open(path, "r")
        else:
            # packed store without originals on disk: display pixels from
            # the dataset instead of crashing the whole analysis mid-loop
            pil_im = Image.fromarray(dev_set.load_image(idx))
        display(pil_im)

        print("action ({:.2f}%): {}".format(verb_prob, verb_name))

        c = 0
        for k, v in labels.items():
            print("{} ({:.2f}%): {}".format(k, labels_prob[c], v))
            c += 1

        print("---- Ground truth ----")
        print("action: {}".format(gt_verb_name))
        for k, v in gt_labels.items():
            print("{} = [{}, {}, {}]".format(k, v[0], v[1], v[2]))
