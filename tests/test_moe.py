"""Expert-parallel MoE parity on the virtual 8-device mesh.

The reference has no mixture-of-experts (SURVEY §2.8 marks EP n/a — its
"experts" are modality extractors).  Like ring attention (SP) and the
GPipe schedule (PP), `parallel/moe.py` supplies the scaling axis beyond
parity; these tests prove the all_to_all dispatch reproduces the dense
single-device execution exactly, gradients included, with expert params
physically sharded.
"""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from devt_tpu.parallel import moe


def _mesh(n, axis=moe.EXPERT_AXIS):
    return Mesh(np.array(jax.devices()[:n]), (axis,))


def _setup(seed=0, n_experts=8, d=16, h=32, t=64):
    params = moe.init_moe_params(jax.random.PRNGKey(seed), n_experts, d, h)
    x = jax.random.normal(jax.random.PRNGKey(seed + 1), (t, d))
    return params, x


def _per_shard_dense(params, x, n_shards):
    """Dense execution shard by shard — the exact semantics moe_ffn
    promises (capacity is computed per token shard)."""
    xs = x.reshape(n_shards, -1, x.shape[-1])
    outs, auxs = zip(*(moe.moe_ffn_dense(params, xs[i])
                       for i in range(n_shards)))
    return jnp.concatenate(outs, 0), jnp.mean(jnp.stack(auxs))


def test_expert_parallel_matches_dense_forward():
    params, x = _setup()
    mesh = _mesh(4)
    y, aux = moe.moe_ffn(mesh, params, x)
    y_ref, aux_ref = _per_shard_dense(params, x, 4)
    # non-vacuity guard: routing must actually fill slots (a zero dispatch
    # tensor would make this parity trivially true)
    assert float(jnp.abs(y_ref).max()) > 1e-3
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               atol=1e-6, rtol=1e-6)
    np.testing.assert_allclose(float(aux), float(aux_ref), atol=1e-5)


def test_expert_parallel_one_expert_per_device():
    params, x = _setup(seed=3)
    mesh = _mesh(8)           # E == n_devices: E_local = 1
    y, _ = moe.moe_ffn(mesh, params, x)
    y_ref, _ = _per_shard_dense(params, x, 8)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               atol=1e-6, rtol=1e-6)


def test_expert_parallel_gradients_match_dense():
    params, x = _setup(seed=5)
    mesh = _mesh(4)

    def loss_ep(p, x):
        y, aux = moe.moe_ffn(mesh, p, x)
        return jnp.sum(y ** 2) + 0.01 * aux

    def loss_dense(p, x):
        y, aux = _per_shard_dense(p, x, 4)
        return jnp.sum(y ** 2) + 0.01 * aux

    g_ep = jax.grad(loss_ep)(params, x)
    g_ref = jax.grad(loss_dense)(params, x)
    for k in params:
        np.testing.assert_allclose(np.asarray(g_ep[k]), np.asarray(g_ref[k]),
                                   atol=2e-5, rtol=1e-4, err_msg=k)


def test_expert_params_physically_shard():
    """Under jit with sharded-in params, each device holds only its
    expert slice (the EP promise: expert weights are never replicated)."""
    params, x = _setup(seed=7)
    mesh = _mesh(4)
    spec = {"router": P(), "w1": P(moe.EXPERT_AXIS), "b1": P(moe.EXPERT_AXIS),
            "w2": P(moe.EXPERT_AXIS), "b2": P(moe.EXPERT_AXIS)}
    sharded = jax.device_put(
        params, {k: NamedSharding(mesh, s) for k, s in spec.items()})
    shard = sharded["w1"].addressable_shards[0]
    assert shard.data.shape[0] == 2        # 8 experts / 4 devices
    y, aux = jax.jit(lambda p, x: moe.moe_ffn(mesh, p, x))(sharded, x)
    y_ref, _ = _per_shard_dense(params, x, 4)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               atol=1e-6, rtol=1e-6)


def test_moe_composes_with_data_parallel():
    """(data=2, expert=4) mesh: tokens DP-sharded outside, the
    all_to_all dispatch inside each data group — expert params stay
    expert-sharded (replicated over data), and loss + parameter
    gradients match the dense per-shard execution on the global batch."""
    devs = np.array(jax.devices()[:8]).reshape(2, 4)
    mesh = Mesh(devs, ("data", moe.EXPERT_AXIS))
    params, x = _setup(seed=11, t=128)

    def replica_loss(p_local, xs):
        y, aux = moe.moe_ffn_local(p_local, xs, n_experts=8)
        loss = jnp.mean((xs + y) ** 2) + 0.01 * aux
        return jax.lax.pmean(loss, ("data", moe.EXPERT_AXIS))

    espec = {"router": P(), "w1": P(moe.EXPERT_AXIS),
             "b1": P(moe.EXPERT_AXIS), "w2": P(moe.EXPERT_AXIS),
             "b2": P(moe.EXPERT_AXIS)}

    def global_loss(p, xx):
        f = jax.shard_map(replica_loss, mesh=mesh,
                          in_specs=(espec, P(("data", moe.EXPERT_AXIS))),
                          out_specs=P())
        return f(p, xx)

    loss, grads = jax.jit(jax.value_and_grad(global_loss))(params, x)

    def dense_loss(p, xx):
        # 8 token shards (2 data groups x 4 expert shards), averaged —
        # exactly what per-shard capacity + the double pmean computes
        xs = xx.reshape(8, -1, xx.shape[-1])
        losses = []
        for i in range(8):
            y, aux = moe.moe_ffn_dense(p, xs[i])
            losses.append(jnp.mean((xs[i] + y) ** 2) + 0.01 * aux)
        return jnp.mean(jnp.stack(losses))

    want_loss, want_grads = jax.jit(jax.value_and_grad(dense_loss))(params, x)
    np.testing.assert_allclose(float(loss), float(want_loss), rtol=1e-5)
    for k in params:
        np.testing.assert_allclose(np.asarray(grads[k]),
                                   np.asarray(want_grads[k]),
                                   rtol=1e-4, atol=1e-6, err_msg=k)


def test_moe_vivit_trains_and_aux_reaches_loss():
    """The user-facing surface: config.moe_experts>0 swaps ViViT space
    FFNs for switch MoEs; the sown load-balance aux joins the objective
    (weighted) and surfaces in metrics; the loss decreases; eval works
    (sow is a no-op outside mutable-train)."""
    from devt_tpu.config import Config
    from devt_tpu.registry import build_model
    from devt_tpu.parallel.train_step import (make_eval_step,
                                              make_train_step)
    from devt_tpu.train.optimizers import build_optimizer
    from devt_tpu.train.state import TrainState

    cfg = Config(model="vivit", batch_size=4, frame_len=2, n_classes=5,
                 opt="adamW", learning_rate=1e-3, precision="f32",
                 dropout=0.0, attention_impl="xla", moe_experts=2)
    model = build_model(cfg).clone(image_size=32, dim=16, depth=2,
                                   heads=2, dim_head=8)
    assert model.moe_experts == 2
    rng = np.random.default_rng(0)
    batch = {"vid": rng.standard_normal((4, 2, 32, 32, 3),
                                        dtype=np.float32),
             "label": (rng.random((4, 5)) < 0.4).astype(np.float32)}
    variables = dict(model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        jnp.asarray(batch["vid"])))
    # init surfaces the sown collection; it is transient, not state
    assert "losses" in variables
    variables.pop("losses")
    state = TrainState.create(variables["params"], build_optimizer(cfg))
    # MoE expert params exist with a leading (E, ...) axis
    blk = state.params["space_transformer"]["block_1"]
    assert blk["moe_w1"].shape[0] == 2

    step = make_train_step(model, cfg)
    first = None
    for _ in range(15):
        state, metrics = step(state, batch, jax.random.PRNGKey(2))
        if first is None:
            first = float(metrics["loss"])
            assert np.isfinite(float(metrics["moe_aux"]))
            assert float(metrics["moe_aux"]) > 0.0
    assert float(metrics["loss"]) < first

    eval_loss, _ = make_eval_step(model, cfg)(state, batch)
    assert np.isfinite(float(eval_loss))


def test_moe_vivit_under_dp_mesh_matches_single_device():
    """MoE-ViViT on an 8-way DP mesh (shard_map step): each replica
    routes its batch shard, the load-balance aux pmeans with the loss,
    and — with capacity generous enough that no shard drops tokens —
    loss and moe_aux match the single-device global-batch step."""
    from devt_tpu.config import Config
    from devt_tpu.parallel.mesh import make_mesh, shard_batch
    from devt_tpu.parallel.train_step import (make_train_step,
                                              mesh_strategy)
    from devt_tpu.models.vivit import ViViT
    from devt_tpu.train.optimizers import build_optimizer
    from devt_tpu.train.state import TrainState

    cfg = Config(model="vivit", batch_size=8, frame_len=2, n_classes=5,
                 opt="adamW", learning_rate=1e-3, precision="f32",
                 dropout=0.0, attention_impl="xla", moe_experts=2,
                 moe_capacity_factor=2.0)
    model = ViViT(image_size=32, patch_size=16, num_classes=5,
                  num_frames=2, dim=16, depth=2, heads=2, dim_head=8,
                  channels_last=True, attention_impl="xla",
                  moe_experts=2, moe_capacity_factor=2.0)
    rng = np.random.default_rng(3)
    batch = {"vid": rng.standard_normal((8, 2, 32, 32, 3),
                                        dtype=np.float32),
             "label": (rng.random((8, 5)) < 0.4).astype(np.float32)}
    variables = dict(model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        jnp.asarray(batch["vid"])))
    variables.pop("losses", None)

    mesh = make_mesh(dp=8, mp=1)
    assert mesh_strategy(mesh, cfg) == "dp_shard_map"
    # the train step donates its state — give each run its own buffers
    params2 = jax.tree_util.tree_map(jnp.array, variables["params"])
    state = TrainState.create(variables["params"], build_optimizer(cfg))
    _, metrics = make_train_step(model, cfg, mesh=mesh)(
        state, shard_batch(batch, mesh), jax.random.PRNGKey(2))

    state2 = TrainState.create(params2, build_optimizer(cfg))
    _, ref = make_train_step(model, cfg)(state2, batch,
                                         jax.random.PRNGKey(2))
    # aux = E*sum(f*p) is a product of batch means, so the pmean of
    # per-shard values differs from the global-batch value at O(1/B) —
    # per-replica routing statistics, the DDP-BatchNorm semantics.  The
    # BASE loss (objective minus the weighted aux) must match tightly;
    # the aux itself only to the per-replica-statistics tolerance.
    base = float(metrics["loss"]) - 0.01 * float(metrics["moe_aux"])
    ref_base = float(ref["loss"]) - 0.01 * float(ref["moe_aux"])
    np.testing.assert_allclose(base, ref_base, rtol=1e-5)
    np.testing.assert_allclose(float(metrics["moe_aux"]),
                               float(ref["moe_aux"]), rtol=5e-3)


def test_moe_block_params_deploy_expert_parallel():
    """Weights trained through the dense model block run unchanged on
    the expert-parallel path: extract the (E, ...) params and execute
    via the all_to_all dispatch over the 8-device mesh."""
    from devt_tpu.models.layers import MoEViTBlock

    blk = MoEViTBlock(dim=16, heads=2, dim_head=8, mlp_dim=32,
                      n_experts=8, attention_impl="xla")
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 16))
    p = blk.init({"params": jax.random.PRNGKey(1)}, x)["params"]
    moe_params = {"router": p["moe_router"], "w1": p["moe_w1"],
                  "b1": p["moe_b1"], "w2": p["moe_w2"], "b2": p["moe_b2"]}
    tokens = jax.random.normal(jax.random.PRNGKey(2), (64, 16))
    y_ep, _ = moe.moe_ffn(_mesh(8), moe_params, tokens)
    y_ref, _ = _per_shard_dense(moe_params, tokens, 8)
    np.testing.assert_allclose(np.asarray(y_ep), np.asarray(y_ref),
                               atol=1e-6, rtol=1e-6)


def test_moe_vivit_tensor_parallel_shards_experts():
    """On a (data=4, model=2) TP mesh, the Megatron rules shard the MoE
    expert params over the model axis — GSPMD executes the expert FFNs
    locally per shard (EP over the model axis with zero bespoke code) —
    and the loss matches the single-device step."""
    from devt_tpu.config import Config
    from devt_tpu.models.vivit import ViViT
    from devt_tpu.parallel.mesh import make_mesh, shard_batch
    from devt_tpu.parallel.sharding import shard_variables
    from devt_tpu.parallel.train_step import make_train_step
    from devt_tpu.train.optimizers import build_optimizer
    from devt_tpu.train.state import TrainState

    cfg = Config(model="vivit", batch_size=4, frame_len=2, n_classes=5,
                 opt="adamW", learning_rate=1e-3, precision="f32",
                 dropout=0.0, attention_impl="xla", moe_experts=2, mp=2,
                 moe_capacity_factor=2.0)
    model = ViViT(image_size=32, patch_size=16, num_classes=5,
                  num_frames=2, dim=16, depth=2, heads=2, dim_head=8,
                  channels_last=True, attention_impl="xla",
                  moe_experts=2, moe_capacity_factor=2.0)
    rng = np.random.default_rng(5)
    batch = {"vid": rng.standard_normal((4, 2, 32, 32, 3),
                                        dtype=np.float32),
             "label": (rng.random((4, 5)) < 0.4).astype(np.float32)}
    variables = dict(model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        jnp.asarray(batch["vid"])))
    variables.pop("losses", None)
    params2 = jax.tree_util.tree_map(jnp.array, variables["params"])

    mesh = make_mesh(dp=4, mp=2)
    placed = shard_variables({"params": variables["params"]}, mesh)
    kern = placed["params"]["space_transformer"]["block_1"]["moe_w1"]
    assert kern.addressable_shards[0].data.shape[0] == 1   # 2 experts / 2
    state = TrainState.create(placed["params"], build_optimizer(cfg))
    _, metrics = make_train_step(model, cfg, mesh=mesh)(
        state, shard_batch(batch, mesh), jax.random.PRNGKey(2))

    state2 = TrainState.create(params2, build_optimizer(cfg))
    _, ref = make_train_step(model, cfg)(state2, batch,
                                         jax.random.PRNGKey(2))
    np.testing.assert_allclose(float(metrics["loss"]), float(ref["loss"]),
                               rtol=1e-5)


def test_capacity_drops_overflow_tokens():
    """Tokens past an expert's capacity get zero MoE output (switch
    semantics: the caller's residual passes them through unchanged)."""
    d = 8
    params = moe.init_moe_params(jax.random.PRNGKey(0), 2, d, 16)
    # force every token to expert 0: positive inputs x with router column 0
    # all-tens make logit 0 = 10·Σx > 0 = logit 1 for every token
    params["router"] = jnp.zeros_like(params["router"]).at[:, 0].set(10.0)
    x = jnp.abs(jax.random.normal(jax.random.PRNGKey(1), (8, d))) + 0.1
    y, _ = moe.moe_ffn_dense(params, x, capacity_factor=1.0)
    # capacity = 8/2*1.0 = 4: first 4 tokens routed, last 4 dropped
    assert not bool(jnp.all(y[:4] == 0.0))
    np.testing.assert_array_equal(np.asarray(y[4:]), 0.0)


def test_valid_mask_matches_dense_on_expert_parallel_path():
    """The EP wrapper threads the pad mask: masked execution over the
    mesh equals masked dense execution per shard."""
    params, x = _setup(seed=13)
    valid = (jax.random.uniform(jax.random.PRNGKey(14), (64,)) > 0.3)
    valid = valid.astype(jnp.float32)
    y, aux = moe.moe_ffn(_mesh(4), params, x, valid=valid)
    xs = x.reshape(4, 16, -1)
    vs = valid.reshape(4, 16)
    outs, auxs = zip(*(moe.moe_ffn_dense(params, xs[i], valid=vs[i])
                       for i in range(4)))
    y_ref = jnp.concatenate(outs, 0)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               atol=1e-6, rtol=1e-6)
    np.testing.assert_allclose(float(aux), float(jnp.mean(jnp.stack(auxs))),
                               atol=1e-5)
    # masked tokens produced zero MoE output
    np.testing.assert_array_equal(
        np.asarray(y)[np.asarray(valid) == 0.0], 0.0)


def test_invalid_tokens_never_consume_capacity():
    """``valid`` masking (the MoEViTBlock pad path): masked tokens get
    zero MoE output and do NOT evict real tokens from an expert's
    queue, and the aux statistics ignore them."""
    d = 8
    params = moe.init_moe_params(jax.random.PRNGKey(0), 2, d, 16)
    params["router"] = jnp.zeros_like(params["router"]).at[:, 0].set(10.0)
    x = jnp.abs(jax.random.normal(jax.random.PRNGKey(1), (8, d))) + 0.1
    # capacity = 4; WITHOUT the mask the first 4 (pad) tokens would fill
    # expert 0 and evict all 4 real tokens
    valid = jnp.array([0, 0, 0, 0, 1, 1, 1, 1], jnp.float32)
    y, aux = moe.moe_ffn_dense(params, x, capacity_factor=1.0, valid=valid)
    np.testing.assert_array_equal(np.asarray(y[:4]), 0.0)     # pads: zero
    assert bool(jnp.all(jnp.any(y[4:] != 0.0, axis=-1)))      # real: routed
    # aux over valid tokens only: all mass on expert 0 -> E * 1 * p0 ~= 2
    assert 1.5 < float(aux) <= 2.0 + 1e-6
    # parity with running ONLY the real tokens through the dense path
    y_ref, _ = moe.moe_ffn_dense(params, x[4:], capacity_factor=2.0)
    np.testing.assert_allclose(np.asarray(y[4:]), np.asarray(y_ref),
                               atol=1e-6, rtol=1e-6)


def test_grouped_routing_matches_per_group_dense():
    """``group_size`` routes each group independently with per-group
    capacity — identical to looping the dense path group by group
    (outputs AND aux mean), with or without a pad mask.  This is the
    linear-in-T formulation MoEViTBlock uses per sequence row; the
    global (T, E, C) dispatch is quadratic in T (see moe_ffn_dense)."""
    params, x = _setup(seed=21, t=64)
    y, aux = moe.moe_ffn_dense(params, x, group_size=16)
    xs = x.reshape(4, 16, -1)
    outs, auxs = zip(*(moe.moe_ffn_dense(params, xs[i]) for i in range(4)))
    np.testing.assert_allclose(np.asarray(y),
                               np.asarray(jnp.concatenate(outs, 0)),
                               atol=1e-6, rtol=1e-6)
    np.testing.assert_allclose(float(aux),
                               float(jnp.mean(jnp.stack(auxs))), atol=1e-6)
    valid = (jax.random.uniform(jax.random.PRNGKey(22), (64,)) > 0.3)
    valid = valid.astype(jnp.float32)
    yv, auxv = moe.moe_ffn_dense(params, x, valid=valid, group_size=16)
    vs = valid.reshape(4, 16)
    outs, auxs = zip(*(moe.moe_ffn_dense(params, xs[i], valid=vs[i])
                       for i in range(4)))
    np.testing.assert_allclose(np.asarray(yv),
                               np.asarray(jnp.concatenate(outs, 0)),
                               atol=1e-6, rtol=1e-6)
    np.testing.assert_allclose(float(auxv),
                               float(jnp.mean(jnp.stack(auxs))), atol=1e-6)
    # group_size == T is the ungrouped path (no vmap wrapper)
    y1, aux1 = moe.moe_ffn_dense(params, x, group_size=64)
    y0, aux0 = moe.moe_ffn_dense(params, x)
    np.testing.assert_array_equal(np.asarray(y1), np.asarray(y0))


def test_moe_vit_block_dispatch_is_linear_in_batch():
    """The block's per-row routing keeps the dispatch tensor linear in
    batch size: the jaxpr's largest intermediate grows ~2x from B=2 to
    B=4, not ~4x (the global formulation's (T, E, C) with C ∝ T OOMed
    the chip at real batches — r4 bench log)."""
    from devt_tpu.models.layers import MoEViTBlock

    blk = MoEViTBlock(dim=16, heads=2, dim_head=8, mlp_dim=32,
                      n_experts=4, attention_impl="xla")

    def largest_intermediate(b):
        x = jnp.zeros((b, 32, 16))
        p = blk.init({"params": jax.random.PRNGKey(1)}, x)["params"]
        jaxpr = jax.make_jaxpr(
            lambda p, x: blk.apply({"params": p}, x))(p, x)
        return max(int(np.prod(v.aval.shape))
                   for eqn in jaxpr.jaxpr.eqns for v in eqn.outvars)

    s2, s4 = largest_intermediate(2), largest_intermediate(4)
    assert s4 <= 2 * s2 + 1, (s2, s4)


# ---------------------------------------------------------------------------
# Product surface: config.moe_ep — expert-parallel TRAINING over the data
# axis (the dense-MoE trainer computes every expert on every device; EP
# shards the expert FFNs E/n per device with two all_to_alls per layer)
# ---------------------------------------------------------------------------


def _tiny_moe_vivit(moe_ep: bool, n_experts=8):
    from devt_tpu.config import Config
    from devt_tpu.models.vivit import ViViT
    from devt_tpu.train.optimizers import build_optimizer
    from devt_tpu.train.state import TrainState

    cfg = Config(model="vivit", batch_size=8, frame_len=2, n_classes=5,
                 opt="adamW", learning_rate=1e-3, precision="f32",
                 dropout=0.0, attention_impl="xla",
                 moe_experts=n_experts, moe_capacity_factor=2.0,
                 moe_ep=moe_ep)
    model = ViViT(image_size=32, patch_size=16, num_classes=5,
                  num_frames=2, dim=16, depth=2, heads=2, dim_head=8,
                  channels_last=True, attention_impl="xla",
                  moe_experts=n_experts, moe_capacity_factor=2.0)
    rng = np.random.default_rng(5)
    batch = {"vid": rng.standard_normal((8, 2, 32, 32, 3),
                                        dtype=np.float32),
             "label": (rng.random((8, 5)) < 0.4).astype(np.float32)}
    variables = dict(model.init(
        {"params": jax.random.PRNGKey(0),
         "dropout": jax.random.PRNGKey(1)}, jnp.asarray(batch["vid"])))
    variables.pop("losses", None)

    def fresh_state():
        params = jax.tree_util.tree_map(jnp.array, variables["params"])
        return TrainState.create(params, build_optimizer(cfg))

    return cfg, model, fresh_state, batch


def test_moe_ep_config_validation():
    import pytest

    from devt_tpu.config import Config

    Config(model="vivit", moe_experts=8, moe_ep=True)
    with pytest.raises(ValueError, match="moe_experts"):
        Config(model="vivit", moe_ep=True)
    with pytest.raises(ValueError, match="mp"):
        Config(model="vivit", moe_experts=8, moe_ep=True, mp=2)
    with pytest.raises(ValueError, match="dp_mode"):
        Config(model="vivit", moe_experts=8, moe_ep=True, dp_mode="fsdp")


def test_moe_ep_trainer_matches_dense_dp(monkeypatch):
    """config.moe_ep on a dp8 mesh: the EP step actually routes through
    moe_ffn_ep_rows (spy), and loss + params track the dense-DP twin to
    fp tolerance over 3 Adam steps — routing is per-row identical, the
    all_to_all only relocates the expert compute, and the grad pmean of
    the scattered expert slices equals the dense pmean.  Eval matches
    too (the roomier eval capacity flows through the EP path)."""
    from devt_tpu.parallel.mesh import make_mesh, shard_batch
    from devt_tpu.parallel.train_step import (make_eval_step,
                                              make_train_step,
                                              mesh_strategy)

    if len(jax.devices()) < 8:
        import pytest
        pytest.skip("needs the virtual 8-device mesh")

    calls = []
    real = moe.moe_ffn_ep_rows

    def spy(*a, **k):
        calls.append(k.get("n_shards"))
        return real(*a, **k)

    monkeypatch.setattr(moe, "moe_ffn_ep_rows", spy)

    cfg_ep, model, fresh_ep, batch = _tiny_moe_vivit(moe_ep=True)
    cfg_dn, _, fresh_dn, _ = _tiny_moe_vivit(moe_ep=False)
    mesh = make_mesh(dp=8, mp=1)
    assert mesh_strategy(mesh, cfg_ep) == "dp_shard_map"

    step_ep = make_train_step(model, cfg_ep, mesh=mesh)
    step_dn = make_train_step(model, cfg_dn, mesh=mesh)
    st_ep, st_dn = fresh_ep(), fresh_dn()
    for i in range(3):
        key = jax.random.PRNGKey(7 + i)
        st_ep, m_ep = step_ep(st_ep, shard_batch(batch, mesh), key)
        st_dn, m_dn = step_dn(st_dn, shard_batch(batch, mesh), key)
        np.testing.assert_allclose(float(m_ep["loss"]),
                                   float(m_dn["loss"]), rtol=1e-5)
        np.testing.assert_allclose(float(m_ep["moe_aux"]),
                                   float(m_dn["moe_aux"]), rtol=1e-5)
    assert calls and all(n == 8 for n in calls)
    for (ka, a), (kb, b) in zip(
            jax.tree_util.tree_leaves_with_path(st_ep.params),
            jax.tree_util.tree_leaves_with_path(st_dn.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6,
                                   err_msg=jax.tree_util.keystr(ka))

    loss_ep, aux_ep = make_eval_step(model, cfg_ep, mesh)(
        st_ep, shard_batch(batch, mesh))
    loss_dn, aux_dn = make_eval_step(model, cfg_dn, mesh)(
        st_dn, shard_batch(batch, mesh))
    np.testing.assert_allclose(float(loss_ep), float(loss_dn), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(aux_ep["probs"]),
                               np.asarray(aux_dn["probs"]),
                               atol=1e-5, rtol=1e-4)


def test_moe_ep_falls_back_when_experts_indivisible(monkeypatch):
    """E=4 on an 8-device mesh: 4 % 8 != 0 — the block silently keeps
    the dense path (semantically identical, just replicated compute)
    and never calls the EP body."""
    from devt_tpu.parallel.mesh import make_mesh, shard_batch
    from devt_tpu.parallel.train_step import make_train_step

    if len(jax.devices()) < 8:
        import pytest
        pytest.skip("needs the virtual 8-device mesh")

    calls = []
    real = moe.moe_ffn_ep_rows
    monkeypatch.setattr(
        moe, "moe_ffn_ep_rows",
        lambda *a, **k: calls.append(1) or real(*a, **k))

    cfg, model, fresh, batch = _tiny_moe_vivit(moe_ep=True, n_experts=4)
    mesh = make_mesh(dp=8, mp=1)
    st, metrics = make_train_step(model, cfg, mesh=mesh)(
        fresh(), shard_batch(batch, mesh), jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss"]))
    assert not calls


def test_main_entry_vivit_moe_ep(tmp_path, monkeypatch):
    """The config-driven EP-training surface end to end: --moe_ep true
    through main() on the dp8 mesh routes every MoE layer through the
    expert-parallel body (spy) and trains/evaluates to finite losses."""
    import pytest

    monkeypatch.chdir(tmp_path)
    if len(jax.devices()) < 8:
        pytest.skip("needs the virtual 8-device mesh")
    calls = []
    real = moe.moe_ffn_ep_rows
    monkeypatch.setattr(
        moe, "moe_ffn_ep_rows",
        lambda *a, **k: calls.append(k.get("n_shards")) or real(*a, **k))
    from devt_tpu import main as entry

    results = entry.main([
        "--model", "vivit", "--data_set", "synthetic", "--epochs", "1",
        "--batch_size", "8", "--frame_len", "2", "--n_classes", "7",
        "--precision", "f32", "--max_steps", "2",
        "--attention_impl", "xla", "--dropout", "0.0",
        "--moe_experts", "8", "--moe_ep", "true",
        "--checkpoint_dir", str(tmp_path / "ckpt"),
    ])
    assert "test/loss" in results and np.isfinite(results["test/loss"])
    assert calls and all(n == 8 for n in calls)


def test_moe_block_fused_attn_half_parity():
    """Round-5: MoEViTBlock's attention half runs as ONE Pallas kernel
    per pass (ops/fused_block.fused_attn_half) when eligible — fwd and
    grads must match the unfused xla branch, with the SAME param tree
    (checkpoints interchangeable between branches)."""
    from devt_tpu.models.layers import MoEViTBlock

    kw = dict(dim=32, heads=2, dim_head=16, mlp_dim=64, n_experts=4,
              capacity_factor=2.0, dropout=0.0)
    blk_x = MoEViTBlock(attention_impl="xla", **kw)
    blk_f = MoEViTBlock(attention_impl="fused_interpret", **kw)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 32)) * 0.5
    v = blk_x.init({"params": jax.random.PRNGKey(1)}, x)
    # identical tree either branch
    v2 = blk_f.init({"params": jax.random.PRNGKey(1)}, x)
    assert jax.tree_util.tree_structure(v["params"]) \
        == jax.tree_util.tree_structure(v2["params"])

    def run(blk, params, xin):
        y, state = blk.apply({"params": params}, xin, True, 13,
                             mutable=["losses"])
        aux = jax.tree_util.tree_leaves(state["losses"])
        return y, sum(jnp.sum(a) for a in aux)

    y_x, aux_x = run(blk_x, v["params"], x)
    y_f, aux_f = run(blk_f, v["params"], x)
    np.testing.assert_allclose(np.asarray(y_f)[:, :13],
                               np.asarray(y_x)[:, :13],
                               atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(float(aux_f), float(aux_x), rtol=1e-5)

    def loss(blk):
        def fn(params):
            y, aux = run(blk, params, x)
            return jnp.sum(y[:, :13].astype(jnp.float32) ** 2) + 0.01 * aux
        return fn

    g_x = jax.grad(loss(blk_x))(v["params"])
    g_f = jax.grad(loss(blk_f))(v["params"])
    flat_x = jax.tree_util.tree_leaves_with_path(g_x)
    flat_f = dict(jax.tree_util.tree_leaves_with_path(g_f))
    for path, a in flat_x:
        np.testing.assert_allclose(
            np.asarray(flat_f[tuple(path)]), np.asarray(a),
            atol=5e-4, rtol=5e-3,
            err_msg=jax.tree_util.keystr(path))
