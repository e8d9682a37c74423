"""Typed configuration for devt_tpu.

The reference drives everything from a flat ``config.yaml`` loaded with
``yaml.SafeLoader`` and wrapped in a ``wandb.config`` mapping
(reference: src/main.py:27-31), with models swallowing the dict via
``save_hyperparameters()`` (src/frame_transformer.py:84-86).  A second,
older confuse-style key set appears in the contrastive files
(src/models/contrastivemodel.py:15-20).

Here both key sets unify into one frozen dataclass that

  * loads the reference's flat ``config.yaml`` keys verbatim
    (reference: src/config.yaml:1-45),
  * also accepts the contrastive-model keys (``input_shape``,
    ``hidden_layer``, ``projection_size``, ``output_shape``,
    ``num_samples``, ``aggregation``, ``temperature``),
  * adds TPU-native execution knobs (precision, grad accumulation, mesh
    axes) that have no reference equivalent (the reference hard-codes
    ``gpus=1`` at src/main.py:87-88),
  * supports mapping-style access (``cfg["batch_size"]``) so call sites that
    mimic the reference's ``wandb.config`` reads keep working.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Iterator, Mapping, Sequence

import yaml

# Genre label sets used by the reference (they differ per dataset variant):
# 15-genre MMX temporal labels (src/dataloaders/mmx/MMX_Temporal_dl.py:118-132,
# also src/callbacks/callbacks.py:139-140).
MMX_GENRES_15 = (
    "Action", "Adventure", "Comedy", "Crime", "Documentary", "Drama",
    "Family", "Fantasy", "History", "Horror", "Music", "Mystery",
    "Science Fiction", "Thriller", "War",
)
# 19-genre MMX frame/light labels (src/callbacks/callbacks.py:31-32).
MMX_GENRES_19 = (
    "Action", "Animation", "Adventure", "Comedy", "Crime", "Documentary",
    "Drama", "Family", "Fantasy", "History", "Horror", "Music", "Romance",
    "Mystery", "TVMovie", "ScienceFiction", "Thriller", "War", "Western",
)

MODEL_NAMES = (
    # SimpleTransformer pyramid variants (src/main.py:37-38)
    "ptn", "ptn_shared",
    # LSTM baseline (src/main.py:39-42)
    "lstm",
    # FrameTransformer variants (src/main.py:43-44, src/frame_transformer.py:136-180)
    "frame_transformer", "distil", "sum", "sum_residual", "post_sum",
    "frame", "pre_modal", "vid",
    # additional capability-parity models (constructed directly in the
    # reference, not via main.py dispatch)
    "vivit", "tpn", "contrastive", "basicmlp",
)

DATASET_NAMES = ("mit", "mmx", "mmx-frame", "mmx-contrastive", "mit-contrastive", "synthetic")


@dataclasses.dataclass
class Config(Mapping[str, Any]):
    """Flat config covering the reference's key surface plus TPU knobs."""

    # --- General params (src/config.yaml:1-7) ---
    batch_size: int = 2
    learning_rate: float = 0.000005
    epochs: int = 500
    seq_len: int = 13
    frame_len: int = 12
    test: bool = False

    # --- Optimisation (src/config.yaml:9-16) ---
    dropout: float = 0.5
    momentum: float = 0.005
    weight_decay: float = 0.09
    scheduling: bool = True
    warm_up: int = 2
    n_classes: int = 15
    opt: str = "adamW"

    # --- Architecture (src/config.yaml:21-26) ---
    input_dimension: int = 2048
    nhead: int = 8
    token_embedding: int = 305
    nlayers: int = 8
    nhid: int = 2048
    projection_size: int = 305

    # --- Selectors (src/config.yaml:27-33) ---
    data_set: str = "mmx-frame"
    model: str = "vid"
    logger: str = "double_transformer"
    name: str = "devt-tpu-run"

    # --- Experts / tokens / mixing (src/config.yaml:36-42) ---
    experts: Sequence[str] = (
        "img-embeddings", "location-embeddings", "video-embeddings",
    )
    cls: int = 1
    mixing_method: str = "double_trans"

    # --- Paths / device (src/config.yaml:44-45) ---
    device: int = 1
    save_path: str = "trained_models/"

    # --- Contrastive-model key set (src/models/contrastivemodel.py:15-20,
    #     src/models/losses/ntxent.py:45) ---
    input_shape: int = 2048
    hidden_layer: int = 2048
    output_shape: int = 128
    num_samples: int = 50000
    aggregation: str = "none"
    temperature: float = 0.5

    # --- Data locations (src/main.py:48-63 hard-codes these) ---
    train_manifest: str = "data/mmx/mmx_train_temporal.pkl"
    val_manifest: str = "data/mmx/mmx_val_temporal.pkl"
    csv_manifest: str = "data/mmx/light/out.csv"

    # --- TPU-native execution knobs (no reference equivalent) ---
    seed: int = 1130                   # reference seeds torch with 1130 (src/main.py:25)
    precision: str = "bf16"            # "bf16" | "f32" (reference intent: main.py:85)
    accum_steps: int = 1               # reference intent: accumulate_grad_batches=8 (main.py:85)
    data_axis: str = "data"            # mesh axis for data parallelism
    model_axis: str = "model"          # mesh axis for tensor parallelism
    dp: int = -1                       # data-parallel size; -1 = all devices / mp
    mp: int = 1                        # model-parallel (tensor) size
    pp: int = 1                        # pipeline-parallel stages (>1: the
                                       # vivit space transformer's depth
                                       # splits over a "pipe" mesh axis and
                                       # runs the GPipe schedule —
                                       # parallel/pipeline.py; composes with
                                       # dp, and with mp as full 3-D
                                       # dp×pp×tp: each stage executes as
                                       # the Megatron TP block over the
                                       # model axis (needs the fused
                                       # kernels, i.e. attention_impl !=
                                       # "xla", and heads/mlp divisible by
                                       # mp); requires dropout == 0
                                       # and depth % pp == 0; the block
                                       # params stack (depth, ...) so pp
                                       # checkpoints differ from pp=1 trees)
    pp_microbatches: int = 0           # GPipe microbatches (0 = pp)
    sp: int = 1                        # sequence/context-parallel width
                                       # (>1: the vivit space
                                       # transformer's token axis shards
                                       # over a "seq" mesh axis and
                                       # attention runs the kv ring —
                                       # parallel/ring_attention.py;
                                       # composes with dp only, needs
                                       # dropout == 0 and the padded
                                       # token count divisible by sp;
                                       # declares the stacked pb_* param
                                       # layout, interchangeable with pp
                                       # checkpoints)
    attention_impl: str = "auto"       # "auto" | "pallas" | "xla"
    dp_mode: str = "auto"              # multi-device mp==1 strategy:
                                       # "auto" = shard_map over data (fused
                                       # Pallas kernels stay hot per chip);
                                       # "gspmd" forces the pjit path;
                                       # "fsdp" = ZeRO-3: params/moments live
                                       # sharded over data (parallel/fsdp.py,
                                       # explicit shard_map gather/scatter so
                                       # the fused kernels stay hot);
                                       # "fsdp_gspmd" = ZeRO-3 as a gspmd
                                       # trace (escape hatch)
    remat: bool = False                # jax.checkpoint the transformer stacks
    grad_clip_norm: float = 0.0        # >0: global-norm gradient clipping
    moe_experts: int = 0               # >0: switch-MoE FFNs in the vivit
                                       # space transformer (beyond parity)
    moe_every: int = 2                 # every k-th layer's FFN becomes MoE
    moe_aux_weight: float = 0.01       # router load-balance loss weight
    moe_capacity_factor: float = 1.25  # per-expert token capacity factor
    moe_ep: bool = False               # expert-parallel TRAINING: on a
                                       # dp_shard_map mesh the MoE FFNs
                                       # shard over the data axis (E/n
                                       # experts per device, two
                                       # all_to_alls per MoE layer —
                                       # parallel/moe.moe_ffn_ep_rows);
                                       # routing/updates bit-match the
                                       # dense path; needs
                                       # moe_experts % n_devices == 0
    moment_dtype: str = "f32"          # "bf16": Adam/AdamW first moments
                                       # (mu) kept in bfloat16 — halves the
                                       # momentum buffer's HBM. The second
                                       # moment (nu) stays f32: it
                                       # accumulates squares, where bf16's
                                       # 8-bit mantissa visibly biases the
                                       # adaptive denominator. For the full
                                       # optimizer-memory win use
                                       # opt="adafactor" (factored second
                                       # moments, ~params-sized state)
    log_every: int = 50
    eval_every_epochs: int = 1
    checkpoint_dir: str = "checkpoints"
    resume: str = ""                   # checkpoint path to restore
    best_metric: str = ""              # validation metric key (e.g.
                                       # "val/accuracy/epoch") that triggers
                                       # a best/ checkpoint when it improves
                                       # — the intent of the reference's
                                       # commented ModelCheckpoint
                                       # (src/main.py:57-58,
                                       # callbacks.py:100-102)
    best_mode: str = "max"             # "max" | "min" improvement direction
    keep_best_k: int = 1               # best/ checkpoints retained
    max_steps: int = -1                # -1 = unbounded (epochs governs)
    profile_dir: str = ""              # non-empty: jax.profiler trace of
                                       # train steps 2..8 written here
                                       # (TensorBoard-loadable XPlane)
    host_batch_prefetch: int = 2
    unroll_steps: int = 1              # >1: scan K full train steps into one
                                       # XLA program (amortizes dispatch;
                                       # parallel/train_step.make_multi_step)
    wire_format: str = "f32"           # "f32" | "u8": pixel batches cross the
                                       # host→device link as uint8 (4x fewer
                                       # bytes) and are normalized on device
                                       # (data/device_norm.py).  "u8_tokens"
                                       # (vivit): the native loader emits
                                       # pre-patchified ViT tokens at decode
                                       # time (native/devt_host.cpp:
                                       # devt_load_batch_u8_patches), so the
                                       # device step skips the conv patch
                                       # embed for one clean matmul

    # ------------------------------------------------------------------
    def __post_init__(self) -> None:
        if self.opt not in ("sgd", "adamW", "adagrad", "adam", "adafactor"):
            raise ValueError(f"unknown optimiser {self.opt!r}")
        if self.moment_dtype not in ("f32", "bf16"):
            raise ValueError(f"unknown moment_dtype {self.moment_dtype!r}")
        if self.precision not in ("bf16", "f32"):
            raise ValueError(f"unknown precision {self.precision!r}")
        # "fused_interpret" runs the fused Pallas kernels in interpret
        # mode — the off-TPU testing value (CPU-mesh CI of kernel-only
        # paths like pp x mp); production configs use "auto"
        if self.attention_impl not in ("auto", "pallas", "xla",
                                       "fused_interpret"):
            raise ValueError(f"unknown attention impl {self.attention_impl!r}")
        if self.wire_format not in ("f32", "u8", "u8_tokens"):
            raise ValueError(f"unknown wire format {self.wire_format!r}")
        if self.wire_format == "u8_tokens" and self.model != "vivit":
            raise ValueError(
                "wire_format 'u8_tokens' is the pre-patchified ViT token "
                "wire — only the vivit model consumes it")
        if self.dp_mode not in ("auto", "gspmd", "fsdp", "fsdp_gspmd"):
            raise ValueError(f"unknown dp_mode {self.dp_mode!r}")
        if self.pp > 1:
            if self.mp > 1 and self.attention_impl == "xla":
                raise ValueError(
                    "pp x mp (3-D parallelism) runs each pipeline stage "
                    "as the Megatron TP block on the fused Pallas "
                    "kernels; attention_impl='xla' cannot serve it "
                    "(models/layers.ViTTransformer._pipelined_stack)")
            if self.model != "vivit":
                raise ValueError("pipeline parallelism is implemented for "
                                 "the vivit depth stack (config.pp)")
            if self.dropout > 0.0:
                raise ValueError("pp > 1 requires dropout == 0.0 (the "
                                 "GPipe schedule does not plumb per-stage "
                                 "dropout rngs)")
            if self.moe_experts > 0:
                raise ValueError("pp > 1 does not compose with MoE blocks")
        if self.sp > 1:
            if self.mp > 1 or self.pp > 1:
                raise ValueError("sp composes with dp only (mp=pp=1)")
            if self.model != "vivit":
                raise ValueError("sequence parallelism is implemented "
                                 "for the vivit space transformer "
                                 "(config.sp)")
            if self.dropout > 0.0:
                raise ValueError("sp > 1 requires dropout == 0.0 (the "
                                 "ring block has no dropout sites)")
            if self.moe_experts > 0:
                raise ValueError("sp > 1 does not compose with MoE "
                                 "blocks")
        if self.moe_ep:
            if self.moe_experts <= 0:
                raise ValueError("moe_ep requires moe_experts > 0")
            if self.mp > 1 or self.pp > 1:
                raise ValueError("moe_ep rides the dp_shard_map data "
                                 "axis; it does not compose with mp/pp")
            if self.dp_mode not in ("auto",):
                raise ValueError("moe_ep requires dp_mode='auto' (the "
                                 "shard_map DP strategy; FSDP shards the "
                                 "expert leaves by shape instead)")
        if self.best_mode not in ("max", "min"):
            raise ValueError(f"unknown best_mode {self.best_mode!r}")

    # Mapping protocol — call sites written against the reference's
    # ``wandb.config`` dict access keep working (src/main.py:32,37).
    def __getitem__(self, key: str) -> Any:
        try:
            return getattr(self, key)
        except AttributeError:
            raise KeyError(key) from None

    def __iter__(self) -> Iterator[str]:
        return iter(f.name for f in dataclasses.fields(self))

    def __len__(self) -> int:
        return len(dataclasses.fields(self))

    def replace(self, **updates: Any) -> "Config":
        return dataclasses.replace(self, **updates)

    def to_dict(self) -> dict[str, Any]:
        d = dataclasses.asdict(self)
        d["experts"] = list(d["experts"])
        return d

    # ------------------------------------------------------------------
    @classmethod
    def from_dict(cls, raw: Mapping[str, Any], strict: bool = False) -> "Config":
        """Build from a flat dict, ignoring unknown keys unless ``strict``."""
        known = {f.name for f in dataclasses.fields(cls)}
        unknown = set(raw) - known
        if unknown and strict:
            raise KeyError(f"unknown config keys: {sorted(unknown)}")
        kwargs = {k: v for k, v in raw.items() if k in known}
        if "experts" in kwargs and kwargs["experts"] is not None:
            kwargs["experts"] = tuple(kwargs["experts"])
        return cls(**kwargs)

    @classmethod
    def from_yaml(cls, path: str, strict: bool = False) -> "Config":
        """Load the reference's flat ``config.yaml`` format (src/main.py:27-28)."""
        with open(path) as f:
            raw = yaml.safe_load(f) or {}
        return cls.from_dict(raw, strict=strict)

    def save_yaml(self, path: str) -> None:
        with open(path, "w") as f:
            yaml.safe_dump(self.to_dict(), f, sort_keys=False)

    # ------------------------------------------------------------------
    @property
    def effective_seq_len(self) -> int:
        """Sequence length after the optional CLS prepend.

        The reference mutates ``hparams.seq_len += 1`` when ``cls`` is set
        (src/transformer.py:33-34, src/frame_transformer.py:87-88); here the
        base value stays immutable and the derived value is explicit.
        """
        return self.seq_len + (1 if self.cls else 0)

    @property
    def num_genres(self) -> int:
        return self.n_classes
