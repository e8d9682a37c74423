"""FSDP (ZeRO-3) on the virtual 8-device mesh: parameters and Adam
moments live sharded over the data axis (parallel/fsdp.py), the gspmd
step keeps them sharded through the update, and the result matches the
replicated single-device step.  The reference trains replicated on one
GPU (src/main.py:87-88); this is the scaling axis that lets models
larger than one chip's HBM train at all.
"""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from devt_tpu.config import Config
from devt_tpu.parallel import fsdp
from devt_tpu.parallel.mesh import DATA_AXIS, make_mesh, shard_batch
from devt_tpu.parallel.train_step import make_train_step, mesh_strategy

from tests.test_training import _tiny_ptn_setup


def test_leaf_spec_picks_largest_divisible_dim():
    assert fsdp.leaf_spec((64, 192), 8) == P(None, DATA_AXIS)
    assert fsdp.leaf_spec((256, 48), 8) == P(DATA_AXIS, None)
    # largest dim indivisible -> next divisible one carries the axis
    assert fsdp.leaf_spec((100, 64), 8) == P(None, DATA_AXIS)
    # nothing divides -> replicated; vectors/scalars always replicated
    assert fsdp.leaf_spec((7, 13), 8) == P()
    assert fsdp.leaf_spec((512,), 8) == P()
    assert fsdp.leaf_spec((), 8) == P()
    # 1-device "mesh" degenerates to replicated
    assert fsdp.leaf_spec((64, 64), 1) == P()


def test_fsdp_state_physically_shards():
    """Every matrix-shaped leaf of the TrainState — params AND Adam
    moments — holds only 1/8 of its elements per device."""
    _, _, state, _ = _tiny_ptn_setup()
    mesh = make_mesh(dp=8, mp=1)
    placed = fsdp.shard_train_state(state, mesh)

    kern = placed.params["encoder_0"]["layer_0"]["linear1"]["kernel"]
    shard = kern.addressable_shards[0]
    assert shard.data.size == kern.size // 8
    # the Adam mu moment mirrors the param shape -> same shard rule
    mus = [l for l in jax.tree_util.tree_leaves(placed.opt_state)
           if getattr(l, "shape", ()) == kern.shape]
    assert mus and all(
        m.addressable_shards[0].data.size == m.size // 8 for m in mus)
    # biases / scalars replicated
    bias = placed.params["encoder_0"]["layer_0"]["linear1"]["bias"]
    assert bias.addressable_shards[0].data.shape == bias.shape


def test_fsdp_step_matches_single_device():
    """dp_mode='fsdp' trains sharded and reproduces the replicated
    single-device step: same loss, same updated params, and the updated
    state is still sharded (the optimizer never gathered it).  Since r4
    this runs the explicit shard_map ZeRO-3 body (gather at use via
    all_gather, whose transpose reduce_scatters the grads) instead of
    the gspmd trace — same contract, fused kernels stay eligible."""
    cfg, model, state, batch = _tiny_ptn_setup()
    cfg = cfg.replace(dp_mode="fsdp")
    mesh = make_mesh(dp=8, mp=1)
    assert mesh_strategy(mesh, cfg) == "fsdp_shard_map"

    placed_state = fsdp.shard_train_state(state, mesh)
    placed_batch = shard_batch(batch, mesh)
    step = make_train_step(model, cfg, mesh=mesh)
    new_state, metrics = step(placed_state, placed_batch,
                              jax.random.PRNGKey(0))

    cfg2, model2, state2, _ = _tiny_ptn_setup()
    step2 = make_train_step(model2, cfg2)
    ref_state, ref_metrics = step2(state2, batch, jax.random.PRNGKey(0))

    np.testing.assert_allclose(float(metrics["loss"]),
                               float(ref_metrics["loss"]), rtol=1e-5)
    # atol 1e-4 = 10% of one lr=1e-3 Adam step: reduce_scatter sums grads
    # in a different order than the local reduction, and Adam's
    # m/(sqrt(v)+eps) amplifies that float noise to O(lr) for params whose
    # grad is near zero (observed max 3.7e-5)
    for a, b in zip(jax.tree_util.tree_leaves(new_state.params),
                    jax.tree_util.tree_leaves(ref_state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4)
    # updated kernel is STILL distributed: no silent gather-to-replicated
    kern = new_state.params["encoder_0"]["layer_0"]["linear1"]["kernel"]
    assert kern.addressable_shards[0].data.size == kern.size // 8


def test_fsdp_composes_with_tensor_parallel():
    """(data=4, model=2) mesh: TP rules own the transformer kernels'
    ``model`` dim, FSDP owns a ``data`` dim of everything else — both are
    just PartitionSpecs, so the composition is pure GSPMD.  Loss matches
    the replicated single-device step and params stay distributed."""
    from devt_tpu.parallel.sharding import param_partition_specs
    from jax.sharding import NamedSharding

    cfg, model, state, batch = _tiny_ptn_setup()
    cfg = cfg.replace(dp_mode="fsdp", mp=2)
    mesh = make_mesh(dp=4, mp=2)

    tp_specs = param_partition_specs(state.params)

    def place(leaf, tp_spec):
        if tp_spec != P():
            # TP rule wins the kernel; add FSDP over data on the dim the
            # TP axis left free (classic Megatron+ZeRO layout)
            dims = list(tp_spec)
            for i, d in enumerate(dims):
                if d is None and leaf.shape[i] % 4 == 0:
                    dims[i] = DATA_AXIS
                    break
            return jax.device_put(leaf, NamedSharding(mesh, P(*dims)))
        return jax.device_put(
            leaf, NamedSharding(mesh, fsdp.leaf_spec(leaf.shape, 4)))

    placed_params = jax.tree_util.tree_map(place, state.params, tp_specs)
    placed = state.replace(
        params=placed_params,
        opt_state=jax.tree_util.tree_map(
            lambda l: jax.device_put(l, NamedSharding(
                mesh, fsdp.leaf_spec(getattr(l, "shape", ()), 4)))
            if hasattr(l, "shape") else l, state.opt_state))
    step = make_train_step(model, cfg, mesh=mesh)
    new_state, metrics = step(placed, shard_batch(batch, mesh),
                              jax.random.PRNGKey(0))

    cfg2, model2, state2, _ = _tiny_ptn_setup()
    _, ref_metrics = make_train_step(model2, cfg2)(state2, batch,
                                                   jax.random.PRNGKey(0))
    np.testing.assert_allclose(float(metrics["loss"]),
                               float(ref_metrics["loss"]), rtol=1e-5)
    # a TP-ruled kernel is sharded over model AND data (2x4 = 8 shards)
    kern = new_state.params["encoder_0"]["layer_0"]["linear1"]["kernel"]
    assert kern.addressable_shards[0].data.size == kern.size // 8


def test_fsdp_with_grad_accumulation():
    """FSDP composes with the lax.scan microbatch accumulator: the
    sharded accum-2 step reproduces the replicated full-batch step.
    (Under shard_map the accumulator splits the PER-DEVICE batch — same
    convention as dp_shard_map — so the global batch must give each of
    the 8 devices accum×k samples.)"""
    cfg, model, state, batch = _tiny_ptn_setup(accum=2, batch=16)
    cfg = cfg.replace(dp_mode="fsdp")
    mesh = make_mesh(dp=8, mp=1)
    placed = fsdp.shard_train_state(state, mesh)
    step = make_train_step(model, cfg, mesh=mesh)
    _, metrics = step(placed, shard_batch(batch, mesh),
                      jax.random.PRNGKey(0))

    cfg2, model2, state2, _ = _tiny_ptn_setup(accum=1, batch=16)
    _, ref = make_train_step(model2, cfg2)(state2, batch,
                                           jax.random.PRNGKey(0))
    np.testing.assert_allclose(float(metrics["loss"]), float(ref["loss"]),
                               rtol=1e-5)


def test_fsdp_checkpoint_roundtrip_stays_sharded(tmp_path):
    """Orbax save/restore of an FSDP-sharded TrainState: the save
    consolidates device shards, and restoring into a sharded template
    lands the arrays back distributed — the pod resume path."""
    from devt_tpu.train import checkpoint as ckpt_lib

    cfg, _, state, _ = _tiny_ptn_setup()
    mesh = make_mesh(dp=8, mp=1)
    placed = fsdp.shard_train_state(state, mesh)
    path = ckpt_lib.save(str(tmp_path / "ck"), placed, cfg)

    # restore into a differently-valued sharded template
    _, _, template, _ = _tiny_ptn_setup()
    template = fsdp.shard_train_state(
        jax.tree_util.tree_map(lambda a: a * 0 if hasattr(a, "ndim") else a,
                               template), mesh)
    restored = ckpt_lib.restore(path, template)
    kern = restored.params["encoder_0"]["layer_0"]["linear1"]["kernel"]
    assert kern.addressable_shards[0].data.size == kern.size // 8
    want = state.params["encoder_0"]["layer_0"]["linear1"]["kernel"]
    np.testing.assert_allclose(np.asarray(kern), np.asarray(want))


def test_fsdp_trains_via_harness_config():
    """The config path end to end: dp_mode='fsdp' through the Trainer's
    state placement (train/harness.py) decreases the loss."""
    cfg, model, state, batch = _tiny_ptn_setup()
    cfg = cfg.replace(dp_mode="fsdp")
    mesh = make_mesh(dp=8, mp=1)
    placed_state = fsdp.shard_train_state(state, mesh)
    placed_batch = shard_batch(batch, mesh)
    step = make_train_step(model, cfg, mesh=mesh)
    rng = jax.random.PRNGKey(0)
    first = None
    for _ in range(10):
        placed_state, metrics = step(placed_state, placed_batch, rng)
        if first is None:
            first = float(metrics["loss"])
    assert float(metrics["loss"]) < first


def test_fsdp_gspmd_formulation_matches_single_device():
    """dp_mode='fsdp_gspmd' keeps the r3 gspmd-trace ZeRO-3 formulation
    (escape hatch; also where 'fsdp' lands under global-norm clipping) —
    same parity contract as the shard_map body."""
    cfg, model, state, batch = _tiny_ptn_setup()
    cfg = cfg.replace(dp_mode="fsdp_gspmd")
    mesh = make_mesh(dp=8, mp=1)
    assert mesh_strategy(mesh, cfg) == "gspmd"

    placed_state = fsdp.shard_train_state(state, mesh)
    step = make_train_step(model, cfg, mesh=mesh)
    new_state, metrics = step(placed_state, shard_batch(batch, mesh),
                              jax.random.PRNGKey(0))

    cfg2, model2, state2, _ = _tiny_ptn_setup()
    _, ref_metrics = make_train_step(model2, cfg2)(state2, batch,
                                                   jax.random.PRNGKey(0))
    np.testing.assert_allclose(float(metrics["loss"]),
                               float(ref_metrics["loss"]), rtol=1e-5)
    kern = new_state.params["encoder_0"]["layer_0"]["linear1"]["kernel"]
    assert kern.addressable_shards[0].data.size == kern.size // 8


def test_fsdp_grad_clip_falls_back_to_gspmd():
    """clip_by_global_norm needs the full-tree norm; the shard_map body
    would compute a per-shard norm, so dp_mode='fsdp' with clipping on
    routes to the gspmd trace (which partitions the norm correctly) —
    and still matches the clipped single-device step."""
    cfg, model, state, batch = _tiny_ptn_setup()
    cfg = cfg.replace(dp_mode="fsdp", grad_clip_norm=0.01)
    mesh = make_mesh(dp=8, mp=1)
    assert mesh_strategy(mesh, cfg) == "gspmd"

    from devt_tpu.train.optimizers import build_optimizer
    from devt_tpu.train.state import TrainState
    state = TrainState.create(state.params, build_optimizer(cfg))
    placed = fsdp.shard_train_state(state, mesh)
    _, metrics = make_train_step(model, cfg, mesh=mesh)(
        placed, shard_batch(batch, mesh), jax.random.PRNGKey(0))

    cfg2, model2, state2, _ = _tiny_ptn_setup()
    cfg2 = cfg2.replace(grad_clip_norm=0.01)
    state2 = TrainState.create(state2.params, build_optimizer(cfg2))
    _, ref = make_train_step(model2, cfg2)(state2, batch,
                                           jax.random.PRNGKey(0))
    np.testing.assert_allclose(float(metrics["loss"]), float(ref["loss"]),
                               rtol=1e-5)


def test_fsdp_shard_map_keeps_fused_kernels():
    """The point of the shard_map ZeRO-3 body: per-device shapes are
    concrete, so the fused Pallas ViT block (interpret mode on CPU)
    serves the fwd/bwd — the gspmd trace had to disable it (chip row
    fsdp_vivit_train measured that tier at 2.65x the step cost)."""
    from devt_tpu.config import Config
    from devt_tpu.models.vivit import ViViT
    from devt_tpu.train.optimizers import build_optimizer
    from devt_tpu.train.state import TrainState
    import devt_tpu.models.layers as layers_mod

    cfg = Config(model="vivit", batch_size=8, n_classes=7, precision="f32",
                 opt="adamW", learning_rate=1e-3, dropout=0.0,
                 dp_mode="fsdp")
    kw = dict(image_size=32, patch_size=16, num_classes=7, num_frames=2,
              dim=32, depth=1, heads=2, dim_head=16, channels_last=True,
              temporal_attention_impl=None)
    rng = np.random.default_rng(3)
    batch = {"vid": rng.standard_normal((8, 2, 32, 32, 3),
                                        dtype=np.float32),
             "label": (rng.random((8, 7)) < 0.3).astype(np.float32)}
    fused = ViViT(attention_impl="fused_interpret", **kw)
    variables = fused.init(
        {"params": jax.random.PRNGKey(0),
         "dropout": jax.random.PRNGKey(1)}, jnp.asarray(batch["vid"]))
    state = TrainState.create(variables["params"], build_optimizer(cfg))

    mesh = make_mesh(dp=8, mp=1)
    assert mesh_strategy(mesh, cfg) == "fsdp_shard_map"
    placed = fsdp.shard_train_state(state, mesh)
    # fresh param copies for the replicated reference: device_put of
    # replicated leaves can alias the source buffers, and each donated
    # step deletes its operands (the documented device_put aliasing
    # gotcha)
    params2 = jax.tree_util.tree_map(jnp.array, variables["params"])
    state2 = TrainState.create(params2, build_optimizer(cfg))
    _, ref = make_train_step(fused, cfg)(state2, batch,
                                         jax.random.PRNGKey(0))

    calls = []
    real = layers_mod.fused_vit_block

    def spy(*a, **k):
        calls.append(True)
        return real(*a, **k)

    layers_mod.fused_vit_block = spy
    try:
        new_state, metrics = make_train_step(fused, cfg, mesh=mesh)(
            placed, shard_batch(batch, mesh), jax.random.PRNGKey(0))
        assert calls, "fused kernel not reached in the FSDP shard_map body"
    finally:
        layers_mod.fused_vit_block = real
    np.testing.assert_allclose(float(metrics["loss"]), float(ref["loss"]),
                               rtol=1e-5)
    # params still ZeRO-3 sharded after the update
    kern = jax.tree_util.tree_leaves(new_state.params)
    big = [k for k in kern if k.ndim >= 2 and k.shape[-1] % 8 == 0
           and k.size >= 8]
    assert big and any(
        k.addressable_shards[0].data.size == k.size // 8 for k in big)


def test_fsdp_eval_step_matches_single_device():
    """make_eval_step on an FSDP mesh: params gathered at use inside the
    shard_map body (state stays sharded at rest), loss and per-sample
    aux rows equal the single-device eval."""
    from devt_tpu.parallel.train_step import make_eval_step

    cfg, model, state, batch = _tiny_ptn_setup()
    cfg = cfg.replace(dp_mode="fsdp")
    mesh = make_mesh(dp=8, mp=1)
    placed = fsdp.shard_train_state(state, mesh)
    loss_m, aux_m = make_eval_step(model, cfg, mesh=mesh)(
        placed, shard_batch(batch, mesh))

    loss_s, aux_s = make_eval_step(model, cfg)(state, batch)
    np.testing.assert_allclose(float(loss_m), float(loss_s), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(aux_m["probs"]),
                               np.asarray(aux_s["probs"]), atol=1e-5)


def test_fsdp_multi_step_matches_single_steps():
    """make_multi_step under FSDP: the lax.scan executor runs inside the
    shard_map body, state stays sharded across the scanned updates, and
    the result matches n sequential sharded steps."""
    from devt_tpu.parallel.train_step import make_multi_step

    cfg, model, state, batch = _tiny_ptn_setup()
    cfg = cfg.replace(dp_mode="fsdp")
    mesh = make_mesh(dp=8, mp=1)
    rng = jax.random.PRNGKey(0)

    placed = fsdp.shard_train_state(state, mesh)
    batches = jax.tree_util.tree_map(
        lambda x: np.stack([x, x]), shard_batch(batch, mesh))
    multi = make_multi_step(model, cfg, n_steps=2, mesh=mesh)
    ms_state, _ = multi(placed, batches, rng)

    cfg2, model2, state2, _ = _tiny_ptn_setup()
    cfg2 = cfg2.replace(dp_mode="fsdp")
    placed2 = fsdp.shard_train_state(state2, mesh)
    step = make_train_step(model2, cfg2, mesh=mesh)
    for _ in range(2):
        placed2, _ = step(placed2, shard_batch(batch, mesh), rng)

    for a, b in zip(jax.tree_util.tree_leaves(ms_state.params),
                    jax.tree_util.tree_leaves(placed2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
    kern = ms_state.params["encoder_0"]["layer_0"]["linear1"]["kernel"]
    assert kern.addressable_shards[0].data.size == kern.size // 8
