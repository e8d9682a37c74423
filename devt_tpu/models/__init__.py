"""Model family — flax modules + loss functions.

Capability map to the reference (SURVEY.md §2.2):
  vivit.py             ← src/models/vit.py (factorized space-time ViT)
  ptn.py               ← src/models/transformer.py (pyramid transformer)
  frame_transformer.py ← src/models/frame_transformer.py (+ distillation)
  resnet.py            ← src/models/custom_resnet.py + torchvision backbones
  tpn.py               ← src/models/TPN.py (temporal pyramid network)
  contrastive.py       ← src/models/contrastivemodel.py
  collab_gating.py     ← src/models/collabgating.py (vectorised)
  lstm.py              ← src/models/LSTM.py
  basicmlp.py          ← src/models/basicmlp.py
  losses.py            ← src/models/losses/ntxent.py + step losses
  pretrained.py        ← src/models/pretrained/models.py
"""
