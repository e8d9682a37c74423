"""Per-epoch reshuffle + step-exact data resume.

The reference trains under torch ``DataLoader(shuffle=True)`` — a fresh
permutation every epoch (src/dataloaders/mmx/MMX_Temporal_dl.py
train_dataloader) — and Lightning's ``Trainer(resume_from_checkpoint=…)``
restores the loop position.  Here both live in ``Loader.set_epoch``
(data/pipeline.py) driven by the Trainer (train/harness.py fit):

  * epoch ``e``'s order is a pure function of ``(seed, e)``;
  * a restored ``state.step`` maps back to ``(epoch, batch-within-epoch)``
    and the stream continues exactly there (index-level skip — no decode
    cost for the consumed prefix);
  * therefore interrupted-and-resumed training reproduces uninterrupted
    training bit-for-bit (rng already folds on ``state.step``).
"""

import jax
import numpy as np

from devt_tpu.config import Config
from devt_tpu.data.pipeline import Loader


class _ArrayDataset:
    def __init__(self, n: int, seed: int = 0):
        rng = np.random.default_rng(seed)
        self.experts = rng.standard_normal((n, 4, 2, 64)).astype(np.float32)
        self.label = (rng.random((n, 15)) < 0.3).astype(np.float32)
        self.label[:, 5] = 1.0

    def __len__(self):
        return len(self.experts)

    def __getitem__(self, i):
        return {"experts": self.experts[i], "label": self.label[i]}


def _collect(loader):
    return [{k: v.copy() for k, v in b.items()} for b in loader]


def test_set_epoch_reshuffles_and_reproduces():
    ds = _ArrayDataset(24)
    loader = Loader(ds, batch_size=4, shuffle=True, seed=7, num_workers=1,
                    process_index=0, process_count=1)
    loader.set_epoch(0)
    e0 = _collect(loader)
    loader.set_epoch(1)
    e1 = _collect(loader)
    loader.set_epoch(0)
    e0_again = _collect(loader)

    # different epochs → different order; same epoch → byte-identical
    assert not all(np.array_equal(a["experts"], b["experts"])
                   for a, b in zip(e0, e1))
    for a, b in zip(e0, e0_again):
        np.testing.assert_array_equal(a["experts"], b["experts"])
        np.testing.assert_array_equal(a["label"], b["label"])


def test_set_epoch_skip_continues_mid_epoch():
    ds = _ArrayDataset(24)
    loader = Loader(ds, batch_size=4, shuffle=True, seed=7, num_workers=1,
                    process_index=0, process_count=1)
    loader.set_epoch(3)
    full = _collect(loader)
    for k in (0, 2, len(full)):
        loader.set_epoch(3, skip_batches=k)
        tail = _collect(loader)
        assert len(tail) == len(full) - k
        for a, b in zip(full[k:], tail):
            np.testing.assert_array_equal(a["experts"], b["experts"])


class _DM:
    """Minimal datamodule: a Loader over the array dataset (ptn shapes)."""

    def __init__(self, cfg: Config, n: int = 16):
        self.cfg = cfg
        self.ds = _ArrayDataset(n, seed=3)
        self.train_steps = n // cfg.batch_size
        self.val_steps = 1

    def setup(self):
        return self

    def train_batches(self):
        return Loader(self.ds, self.cfg.batch_size, shuffle=True,
                      seed=self.cfg.seed, num_workers=1,
                      process_index=0, process_count=1)

    def val_batches(self):
        loader = Loader(self.ds, self.cfg.batch_size, num_workers=1,
                        process_index=0, process_count=1)
        return iter(loader)


def _fit(cfg, datamodule):
    from devt_tpu.models.ptn import PTN
    from devt_tpu.train.harness import Trainer

    model = PTN(input_dimension=64, nhead=2, nhid=64, nlayers=1,
                num_experts=2, seq_len=4, n_classes=15, dropout=0.0,
                attention_impl="xla")
    return Trainer(cfg).fit(model, datamodule)


def test_resumed_fit_matches_uninterrupted(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    from devt_tpu.train import checkpoint as ckpt

    base = Config(model="ptn", batch_size=4, seq_len=4, nlayers=1,
                  input_dimension=64, nhid=64, nhead=2, dropout=0.0,
                  n_classes=15, experts=("a", "b"), learning_rate=1e-3,
                  opt="adamW", precision="f32", attention_impl="xla",
                  eval_every_epochs=100, log_every=1000)

    # A: two epochs, uninterrupted
    cfg_a = base.replace(epochs=2, checkpoint_dir=str(tmp_path / "ck_a"))
    state_a = _fit(cfg_a, _DM(cfg_a))

    # B: stop MID-epoch-0 (max_steps=2 of 4), then resume to the same end
    cfg_b1 = base.replace(epochs=2, max_steps=2,
                          checkpoint_dir=str(tmp_path / "ck_b"))
    _fit(cfg_b1, _DM(cfg_b1))
    mid = ckpt.latest_checkpoint(str(tmp_path / "ck_b"))
    assert mid.endswith("step_2")
    cfg_b2 = base.replace(epochs=2, resume=mid,
                          checkpoint_dir=str(tmp_path / "ck_b2"))
    state_b = _fit(cfg_b2, _DM(cfg_b2))

    assert int(state_a.step) == int(state_b.step) == 8
    for a, b in zip(jax.tree_util.tree_leaves(state_a.params),
                    jax.tree_util.tree_leaves(state_b.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class _DM2Host(_DM):
    """Same datamodule but the Loader shards over process_count=2 — the
    harness must size its epoch from the PER-HOST loader length (2
    batches here), not the whole-dataset train_steps (4)."""

    def train_batches(self):
        return Loader(self.ds, self.cfg.batch_size, shuffle=True,
                      seed=self.cfg.seed, num_workers=1,
                      process_index=0, process_count=2)

    def val_batches(self):
        loader = Loader(self.ds, self.cfg.batch_size, num_workers=1,
                        process_index=0, process_count=2)
        return iter(loader)


def test_resume_uses_per_host_loader_length(tmp_path, monkeypatch):
    """Round-4 advisor (medium): with process_count=2 the loader yields
    (16//2)//4 = 2 batches/epoch while train_steps says 4.  The resume
    inversion must use the per-host count or a mid-run restart silently
    replays/skips batches.  Stop at step 3 (mid-epoch-1 in per-host
    terms), resume, and demand bit-identical params vs uninterrupted."""
    monkeypatch.chdir(tmp_path)
    from devt_tpu.train import checkpoint as ckpt

    base = Config(model="ptn", batch_size=4, seq_len=4, nlayers=1,
                  input_dimension=64, nhid=64, nhead=2, dropout=0.0,
                  n_classes=15, experts=("a", "b"), learning_rate=1e-3,
                  opt="adamW", precision="f32", attention_impl="xla",
                  eval_every_epochs=100, log_every=1000)

    cfg_a = base.replace(epochs=3, checkpoint_dir=str(tmp_path / "ck_a"))
    state_a = _fit(cfg_a, _DM2Host(cfg_a))
    assert int(state_a.step) == 6          # 3 epochs x 2 per-host batches

    cfg_b1 = base.replace(epochs=3, max_steps=3,
                          checkpoint_dir=str(tmp_path / "ck_b"))
    _fit(cfg_b1, _DM2Host(cfg_b1))
    mid = ckpt.latest_checkpoint(str(tmp_path / "ck_b"))
    assert mid.endswith("step_3")
    cfg_b2 = base.replace(epochs=3, resume=mid,
                          checkpoint_dir=str(tmp_path / "ck_b2"))
    state_b = _fit(cfg_b2, _DM2Host(cfg_b2))

    assert int(state_b.step) == 6
    for a, b in zip(jax.tree_util.tree_leaves(state_a.params),
                    jax.tree_util.tree_leaves(state_b.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_resume_accounts_for_unroll_tail_drop(tmp_path, monkeypatch):
    """Round-4 advisor (low): with unroll_steps=4 and 10 batches/epoch,
    _stacked drops the trailing partial group, so each epoch advances
    global_step by 8, not 10.  A resume at an epoch boundary (step 16 =
    2 full epochs) must restart at epoch 2 batch 0 — the old inversion
    (16 // 10 -> epoch 1, skip 6) re-trained mid-epoch-1 batches."""
    monkeypatch.chdir(tmp_path)
    from devt_tpu.train import checkpoint as ckpt

    base = Config(model="ptn", batch_size=4, seq_len=4, nlayers=1,
                  input_dimension=64, nhid=64, nhead=2, dropout=0.0,
                  n_classes=15, experts=("a", "b"), learning_rate=1e-3,
                  opt="adamW", precision="f32", attention_impl="xla",
                  eval_every_epochs=100, log_every=1000, unroll_steps=4)

    def dm(cfg):
        return _DM(cfg, n=40)              # 10 batches/epoch at bs=4

    cfg_a = base.replace(epochs=3, checkpoint_dir=str(tmp_path / "ck_a"))
    state_a = _fit(cfg_a, dm(cfg_a))
    assert int(state_a.step) == 24         # 3 epochs x 4*(10//4)

    cfg_b1 = base.replace(epochs=2, checkpoint_dir=str(tmp_path / "ck_b"))
    _fit(cfg_b1, dm(cfg_b1))
    mid = ckpt.latest_checkpoint(str(tmp_path / "ck_b"))
    assert mid.endswith("step_16")
    cfg_b2 = base.replace(epochs=3, resume=mid,
                          checkpoint_dir=str(tmp_path / "ck_b2"))
    state_b = _fit(cfg_b2, dm(cfg_b2))

    assert int(state_b.step) == 24
    for a, b in zip(jax.tree_util.tree_leaves(state_a.params),
                    jax.tree_util.tree_leaves(state_b.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
