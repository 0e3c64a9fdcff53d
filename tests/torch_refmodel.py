"""Clean-room torch replica of the reference FCGGNN, used as a composed-model
differential oracle.

Replicates /root/reference/model.py:38-201 semantics with the reference's
literal op order and state_dict key layout (role_emb / verb_emb /
convnet_{verbs,nouns}.model.* / ggsnn.{W,U}_{p,z,r,h}.* /
{verb,nouns}_classifier.1.*) so that:

* ``convert_reference_checkpoint`` / ``convert_adamax_state`` can be
  exercised on realistic checkpoints without the published weights, and
* the COMPOSITION (3-branch forward with argmax-verb coupling, node init,
  GGSNN, classifiers, losses) is differentially tested end-to-end, not just
  the pieces.

Backbones are frozen at construction like the reference (model.py:17-18);
both convnets share identical weights (copied), matching the published
checkpoints.  Role ids / adjacency come from our encoder's precomputed
tables, which are themselves hand-verified in tests/test_encoder.py.
"""

import numpy as np
import torch
import torch.nn as nn

from tests.test_resnet import TorchResNet


class RefGGSNN(nn.Module):
    """model.py:38-86: 4 propagation steps; noun mode masks the expanded
    neighbour tensor, applies W_p per slot (bias fires for every slot), then
    sums; verb mode self-messages."""

    def __init__(self, d):
        super().__init__()
        self.W_p = nn.Linear(d, d)
        self.W_z = nn.Linear(d, d)
        self.U_z = nn.Linear(d, d)
        self.W_r = nn.Linear(d, d)
        self.U_r = nn.Linear(d, d)
        self.W_h = nn.Linear(d, d)
        self.U_h = nn.Linear(d, d)

    def forward(self, hidden, mask=None, verb=False):
        for _ in range(4):
            if verb:
                n = self.W_p(hidden)
            else:
                b, r = mask.shape[0], mask.shape[1]
                nb = hidden.contiguous().view(b, r, -1)
                nb = nb.unsqueeze(0).expand(r, b, r, nb.shape[-1])
                nb = nb.transpose(0, 1)                 # nb[b,i,j] = h[b,j]
                nb = nb * mask.unsqueeze(-1)
                nb = self.W_p(nb)                       # per-slot Linear
                n = torch.sum(nb, 2).contiguous().view(b * r, -1)
            z = torch.sigmoid(self.W_z(n) + self.U_z(hidden))
            rg = torch.sigmoid(self.W_r(n) + self.U_r(hidden))
            c = torch.tanh(self.W_h(n) + self.U_h(rg * hidden))
            hidden = (1 - z) * hidden + z * c
        return hidden


class _FrozenConvnet(nn.Module):
    """model.py:8-35: frozen backbone under attr 'model' (fc-less here; the
    reference's fc is Identity)."""

    def __init__(self, stage_sizes, width):
        super().__init__()
        self.model = TorchResNet(stage_sizes, width=width)
        for p in self.model.parameters():
            p.requires_grad = False

    def forward(self, x):
        return self.model(x)


class RefFCGGNN(nn.Module):
    """model.py:89-201 with our encoder's tables standing in for the
    reference's per-batch host loops (equivalence of the tables is tested in
    tests/test_encoder.py)."""

    def __init__(self, encoder, d, stage_sizes=(1, 1, 1, 1), width=2):
        super().__init__()
        self.encoder = encoder
        self.d = d
        self.role_emb = nn.Embedding(encoder.get_num_roles() + 1, d,
                                     padding_idx=encoder.get_num_roles())
        self.verb_emb = nn.Embedding(encoder.get_num_verbs(), d)
        self.convnet_verbs = _FrozenConvnet(stage_sizes, width)
        self.convnet_nouns = _FrozenConvnet(stage_sizes, width)
        # identical frozen copies, like the published checkpoints
        self.convnet_nouns.load_state_dict(self.convnet_verbs.state_dict())
        self.ggsnn = RefGGSNN(d)
        self.verb_classifier = nn.Sequential(
            nn.Dropout(0.5), nn.Linear(d, encoder.get_num_verbs()))
        self.nouns_classifier = nn.Sequential(
            nn.Dropout(0.5), nn.Linear(d, encoder.get_num_labels()))

    def predict_verb(self, img):
        feats = torch.relu(self.convnet_verbs(img))
        out = self.ggsnn(feats, mask=None, verb=True)
        return self.verb_classifier(out)

    def predict_nouns(self, img, verb_ids):
        b = img.shape[0]
        r = self.encoder.max_role_count
        feats = self.convnet_nouns(img)                     # (B, D)
        feats = feats[:, None, :].expand(b, r, self.d)
        feats = feats.contiguous().view(b * r, -1)
        verbs_np = verb_ids.detach().cpu().numpy()
        role_idx = torch.from_numpy(
            np.asarray(self.encoder.role_ids)[verbs_np].astype(np.int64))
        role_e = self.role_emb(role_idx).view(b * r, -1)
        verb_e = self.verb_emb(verb_ids)[:, None, :].expand(b, r, self.d)
        verb_e = verb_e.contiguous().view(b * r, -1)
        node = torch.relu(feats * role_e * verb_e)
        adj = torch.from_numpy(np.asarray(
            self.encoder.get_adj_matrix_noself(verbs_np), np.float32))
        out = self.ggsnn(node, mask=adj, verb=False)
        return self.nouns_classifier(out).view(b, r, -1)

    def forward(self, img, gt_verb):
        pred_verb = self.predict_verb(img)
        pred_nouns = self.predict_nouns(img, torch.argmax(pred_verb, 1))
        gt_pred_nouns = self.predict_nouns(img, gt_verb)
        return pred_verb, pred_nouns, gt_pred_nouns

    def verb_loss(self, pred_verb, gt_verb):
        return nn.CrossEntropyLoss()(pred_verb, gt_verb)

    def nouns_loss(self, pred_nouns, gt_nouns):
        lossfn = nn.CrossEntropyLoss(
            ignore_index=self.encoder.get_num_labels())
        total = 0
        logits = pred_nouns.transpose(1, 2)                 # (B, L, R)
        for i in range(3):
            total = total + lossfn(logits, gt_nouns[:, i, :])
        return total
