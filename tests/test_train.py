"""Training subsystem tests: schedules/optimizers vs torch, end-to-end mini
training on the synthetic fixture, checkpointing, and DP-mesh consistency."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from jspsr_tpu.config.loader import AttrDict
from jspsr_tpu.train.optim import build_lr_schedule, build_optimizer, \
    set_learning_rate
from jspsr_tpu.train.early_stop import EarlyStopper, do_eval, validate_results
from jspsr_tpu.train.checkpoint import (
    load_checkpoint, save_checkpoint, load_params_filtered,
)
from jspsr_tpu.train.state import TrainState, deep_merge
from jspsr_tpu.train.step import make_eval_step, make_train_step


def _p(**kw):
    base = dict(
        optimizer="AdamW",
        optimizer_kwargs={"lr": 1e-3, "weight_decay": 1e-6, "momentum": 0.9},
        scheduler="WarmupStepLR",
        scheduler_kwargs={"max_lr": 1e-3, "step_size": 100, "gamma": 0.5,
                          "warmup_epoch": 3},
        epochs=300,
    )
    base.update(kw)
    return AttrDict(base)


def test_warmup_step_lr_matches_torch():
    p = _p()
    sched = build_lr_schedule(p)
    # torch oracle: SequentialLR(LambdaLR warmup, StepLR) stepped per epoch
    tp = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.AdamW([tp], lr=1e-3)
    warm = torch.optim.lr_scheduler.LambdaLR(
        opt, lambda e: 1 / (10 ** float(3 - e)))
    step = torch.optim.lr_scheduler.StepLR(opt, step_size=100, gamma=0.5)
    ts = torch.optim.lr_scheduler.SequentialLR(opt, [warm, step], [3])
    for epoch in range(300):
        ref = opt.param_groups[0]["lr"]
        got = sched(epoch)
        np.testing.assert_allclose(got, ref, rtol=1e-6, err_msg=f"epoch {epoch}")
        opt.step()
        ts.step()


@pytest.mark.parametrize("name", ["steplr", "cosineannealinglr", "constantlr"])
def test_other_schedules_match_torch(name):
    p = _p(scheduler=name, epochs=50,
           scheduler_kwargs={"step_size": 10, "gamma": 0.5})
    sched = build_lr_schedule(p)
    tp = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.SGD([tp], lr=1e-3)
    if name == "steplr":
        ts = torch.optim.lr_scheduler.StepLR(opt, step_size=10, gamma=0.5)
    elif name == "cosineannealinglr":
        ts = torch.optim.lr_scheduler.CosineAnnealingLR(opt, T_max=50,
                                                        eta_min=1e-6)
    else:
        ts = torch.optim.lr_scheduler.LambdaLR(opt, lambda e: 1)
    for epoch in range(50):
        np.testing.assert_allclose(sched(epoch), opt.param_groups[0]["lr"],
                                   rtol=1e-5, err_msg=f"{name} epoch {epoch}")
        opt.step()
        ts.step()


def test_adamw_step_matches_torch():
    rng = np.random.default_rng(0)
    w0 = rng.normal(size=(4, 3)).astype(np.float32)
    g = rng.normal(size=(4, 3)).astype(np.float32)

    tw = torch.nn.Parameter(torch.from_numpy(w0.copy()))
    topt = torch.optim.AdamW([tw], lr=1e-3, weight_decay=1e-2)
    tw.grad = torch.from_numpy(g.copy())
    for _ in range(3):
        topt.step()

    p = _p(optimizer_kwargs={"lr": 1e-3, "weight_decay": 1e-2, "momentum": 0.9})
    params = {"w": jnp.asarray(w0)}
    opt = build_optimizer(p, params)
    state = opt.init(params)
    import optax
    for _ in range(3):
        updates, state = opt.update({"w": jnp.asarray(g)}, state, params)
        params = optax.apply_updates(params, updates)
    np.testing.assert_allclose(np.asarray(params["w"]), tw.detach().numpy(),
                               rtol=1e-5, atol=1e-6)


def test_set_learning_rate():
    p = _p()
    params = {"w": jnp.zeros((2, 2))}
    opt = build_optimizer(p, params)
    state = opt.init(params)
    set_learning_rate(state, 0.5)
    assert float(state.hyperparams["learning_rate"]) == 0.5


def test_deep_merge():
    old = {"a": {"x": 1, "y": 2}, "b": {"z": 3}}
    new = {"a": {"y": 20}}
    merged = deep_merge(old, new)
    assert merged == {"a": {"x": 1, "y": 20}, "b": {"z": 3}}


def test_early_stopper_and_cadence():
    es = EarlyStopper(patience=2, monitor="val_rmse")
    assert not es(1.0) and not es(0.9)
    assert not es(0.95)          # worse x1
    assert es(0.96)              # worse x2 -> stop
    es2 = EarlyStopper(patience=2, monitor="val_psnr")
    assert not es2(30.0) and not es2(31.0)
    assert not es2(30.5) and es2(30.4)  # higher-better semantics

    assert do_eval(0, 300, val_interval=5, val_start_epoch=1, warmup_epoch=3)is False
    assert do_eval(3, 300, val_interval=5, warmup_epoch=3)  # first post-warmup
    assert do_eval(4, 300, val_interval=5)  # (4+1) % 5 == 0
    assert do_eval(297, 300, val_interval=50)  # last 3 epochs always
    assert validate_results(None, {"RMSE": 1.0})
    assert validate_results({"RMSE": 1.0}, {"RMSE": 0.9})
    assert not validate_results({"RMSE": 1.0}, {"RMSE": 1.1})
    assert validate_results({"PSNR": 30.0}, {"PSNR": 31.0}, "PSNR")


def _tiny_model_and_data(seed=0):
    from jspsr_tpu.models.jspsr import JSPSR

    model = JSPSR({"lr_dem": 1, "image": 3}, num_feature=8, layers=(1, 1, 1, 1))
    params, bn = model.init(jax.random.PRNGKey(seed))
    rng = np.random.default_rng(seed)
    dem = rng.uniform(0.3, 0.6, (4, 32, 32, 1)).astype(np.float32)
    img = rng.uniform(0, 1, (4, 32, 32, 3)).astype(np.float32)
    gt = np.clip(dem + 0.05 * rng.normal(size=dem.shape).astype(np.float32),
                 0, 1)
    return model, params, bn, [jnp.asarray(dem), jnp.asarray(img)], jnp.asarray(gt)


def test_train_step_reduces_loss():
    from jspsr_tpu.losses import build_criterion

    model, params, bn, inputs, gt = _tiny_model_and_data()
    p = _p()
    criterion = build_criterion({"L1": 1, "L2": 1, "Grad": 0.1})
    opt = build_optimizer(p, params)
    state = TrainState(params, bn, opt.init(params), jnp.zeros((), jnp.int32))
    train_step = make_train_step(model, criterion, opt, donate=False)
    set_learning_rate(state.opt_state, 1e-3)
    losses0 = None
    for i in range(8):
        state, losses = train_step(state, inputs, gt)
        if losses0 is None:
            losses0 = float(losses["Total"])
    assert float(losses["Total"]) < losses0
    assert int(state.step) == 8
    # BN running stats actually moved
    assert not np.allclose(
        np.asarray(state.bn_state["conv_img"]["bn"]["mean"]), 0.0
    )


def test_train_trace_with_conv_vjp_matches():
    """Multi-step training with the manual-dgrad conv VJP on tracks the
    autodiff-lowering trace (integration check beyond the one-shot
    gradient-equality test: optimizer state, BN stats and loss evolve
    through 8 steps with only fp reorder noise)."""
    from jspsr_tpu.losses import build_criterion
    from jspsr_tpu.nn import layers as L

    model, params, bn, inputs, gt = _tiny_model_and_data()
    p = _p()
    criterion = build_criterion({"L1": 1, "L2": 1, "Grad": 0.1})

    def run():
        opt = build_optimizer(p, params)
        state = TrainState(params, bn, opt.init(params),
                           jnp.zeros((), jnp.int32))
        step = make_train_step(model, criterion, opt, donate=False)
        set_learning_rate(state.opt_state, 1e-3)
        trace = []
        for _ in range(8):
            state, losses = step(state, inputs, gt)
            trace.append(float(losses["Total"]))
        return trace

    ref = run()
    L.set_conv_s1_custom_vjp(True)
    try:
        got = run()
    finally:
        L.set_conv_s1_custom_vjp(False)
    np.testing.assert_allclose(got, ref, rtol=1e-4)


def test_checkpoint_roundtrip(tmp_path):
    from jspsr_tpu.losses import build_criterion

    model, params, bn, inputs, gt = _tiny_model_and_data()
    p = _p()
    opt = build_optimizer(p, params)
    opt_state = opt.init(params)
    path = tmp_path / "ck.npz"
    save_checkpoint(path, params, bn, opt_state, epoch=7,
                    best_result={"RMSE": 1.23})
    ck = load_checkpoint(path, opt_state)
    assert ck["epoch"] == 7
    assert ck["best_result"]["RMSE"] == 1.23
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(ck["params"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree_util.tree_leaves(opt_state),
                    jax.tree_util.tree_leaves(ck["opt_state"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # shape-filtered partial load
    bigger = {"w": jnp.zeros((3, 3))}
    merged = load_params_filtered(bigger, {"w": jnp.ones((2, 2))})
    assert merged["w"].shape == (3, 3)


def test_data_parallel_matches_single_device():
    """Same step on a 1-device vs 8-device DP mesh -> identical params."""
    from jspsr_tpu.losses import build_criterion
    from jspsr_tpu.parallel.mesh import make_mesh, shard_batch

    assert jax.device_count() >= 8, "conftest must force 8 CPU devices"
    model, params, bn, inputs, gt = _tiny_model_and_data(3)
    p = _p()
    criterion = build_criterion({"L1": 1, "L2": 1})
    opt = build_optimizer(p, params)

    @jax.jit
    def loss_and_grad(prm, binputs, bgt):
        def loss_fn(q):
            pred, _ = model(q, bn, binputs, train=True)
            return criterion(pred, bgt)["Total"]

        return jax.value_and_grad(loss_fn)(prm)

    def run(mesh):
        binputs = shard_batch(mesh, [np.asarray(x) for x in inputs])
        bgt = shard_batch(mesh, np.asarray(gt))
        return loss_and_grad(params, binputs, bgt)

    mesh1 = make_mesh(jax.devices()[:1])
    mesh4 = make_mesh(jax.devices()[:4])  # batch 4 -> 4-way DP
    l1, g1 = run(mesh1)
    l4, g4 = run(mesh4)
    # The all-reduce reorders float sums, and deformable-sampling gradients
    # are discontinuous at integer lattice positions (a 1e-7 difference can
    # flip floor() and change a few offset-grad elements) — tolerances cover
    # those two effects, not systematic error.
    np.testing.assert_allclose(float(l1), float(l4), rtol=1e-4)
    a = np.concatenate([np.asarray(x).ravel()
                        for x in jax.tree_util.tree_leaves(g1)])
    b = np.concatenate([np.asarray(x).ravel()
                        for x in jax.tree_util.tree_leaves(g4)])
    close = np.isclose(a, b, rtol=1e-3, atol=1e-5)
    assert close.mean() > 0.99, f"only {close.mean():.2%} of grads close"
    assert np.abs(a - b).max() < 1e-3


def test_diff_lr_groups():
    """diff_lr: 'postprocessor' params get DIFF_LR scaled by the schedule."""
    from jspsr_tpu.train.optim import DIFF_LR
    import optax

    p = _p(optimizer_kwargs={"lr": 1e-3, "weight_decay": 0.0,
                             "momentum": 0.9, "diff_lr": True})
    params = {"conv": {"w": jnp.ones((2, 2))},
              "postprocessor": {"w": jnp.ones((2, 2))}}
    opt = build_optimizer(p, params)
    state = opt.init(params)
    set_learning_rate(state, 5e-4, base_lr=1e-3)  # factor 0.5
    lrs = {}
    for name, inner in state.inner_states.items():
        s = inner.inner_state if hasattr(inner, "inner_state") else inner
        lrs[name] = float(s.hyperparams["learning_rate"])
    assert lrs["base"] == pytest.approx(5e-4)
    assert lrs["diff"] == pytest.approx(DIFF_LR * 0.5)
    # gradient step actually moves both groups differently
    g = {"conv": {"w": jnp.ones((2, 2))},
         "postprocessor": {"w": jnp.ones((2, 2))}}
    updates, _ = opt.update(g, state, params)
    new = optax.apply_updates(params, updates)
    d_base = float(jnp.abs(new["conv"]["w"] - 1).mean())
    d_diff = float(jnp.abs(new["postprocessor"]["w"] - 1).mean())
    assert d_base > 0 and d_diff > 0 and abs(d_base - d_diff) > 1e-6


def test_spatial_sharding_matches_replicated():
    """H-sharded forward (XLA halo exchange) == replicated forward."""
    from jspsr_tpu.parallel.mesh import make_2d_mesh, spatial_sharding
    from jax.sharding import NamedSharding, PartitionSpec as P

    model, params, bn, inputs, gt = _tiny_model_and_data(5)
    mesh = make_2d_mesh(2, 2, jax.devices()[:4])
    fn = jax.jit(lambda d, i: model(params, bn, [d, i], train=False)[0])
    sh = spatial_sharding(mesh)
    rep = NamedSharding(mesh, P())
    y_sharded = fn(jax.device_put(inputs[0], sh), jax.device_put(inputs[1], sh))
    y_repl = fn(jax.device_put(inputs[0], rep), jax.device_put(inputs[1], rep))
    np.testing.assert_allclose(np.asarray(y_sharded), np.asarray(y_repl),
                               rtol=1e-4, atol=1e-5)


def test_remat_train_step_matches_plain():
    """jax.checkpoint remat: identical loss/params, lower activation memory."""
    from jspsr_tpu.losses import build_criterion

    model, params, bn, inputs, gt = _tiny_model_and_data(6)
    p = _p()
    criterion = build_criterion({"L1": 1, "L2": 1})
    opt = build_optimizer(p, params)

    def run(remat):
        state = TrainState(params, bn, opt.init(params),
                           jnp.zeros((), jnp.int32))
        set_learning_rate(state.opt_state, 1e-3)
        step = make_train_step(model, criterion, opt, donate=False,
                               remat=remat)
        state, losses = step(state, inputs, gt)
        return float(losses["Total"]), state

    l0, s0 = run(False)
    l1, s1 = run(True)
    np.testing.assert_allclose(l0, l1, rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(s0.params),
                    jax.tree_util.tree_leaves(s1.params)):
        # recompute reorders float ops slightly; Adam normalizes tiny diffs
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=2e-5)


def test_stage_remat_matches_plain():
    from jspsr_tpu.losses import build_criterion
    from jspsr_tpu.models.jspsr import JSPSR

    rng = np.random.default_rng(7)
    dem = jnp.asarray(rng.uniform(0.3, 0.6, (2, 32, 32, 1)).astype(np.float32))
    img = jnp.asarray(rng.uniform(0, 1, (2, 32, 32, 3)).astype(np.float32))
    gt = jnp.clip(dem + 0.02, 0, 1)
    criterion = build_criterion({"L1": 1, "L2": 1})

    def grads(remat_stages):
        model = JSPSR({"lr_dem": 1, "image": 3}, num_feature=8,
                      layers=(1, 1, 1, 1), remat_stages=remat_stages)
        params, bn = model.init(jax.random.PRNGKey(0))

        def loss(prm):
            pred, _ = model(prm, bn, [dem, img], train=True)
            return criterion(pred, gt)["Total"]

        return jax.jit(jax.value_and_grad(loss))(params)

    (l0, g0), (l1, g1) = grads(False), grads(True)
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(g0),
                    jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)


def test_preload_dataset(tmp_path):
    from jspsr_tpu.data.synthetic import generate_mini_dfc30
    from jspsr_tpu.data.dfc30 import DFC30
    from jspsr_tpu.data.transforms import build_transforms

    root, train, valid = generate_mini_dfc30(
        tmp_path / "d", train_cities=("Brest",), valid_cities=("Vannes",),
        n_per_city=2, size=32)
    p = AttrDict({
        "dataset": "DFC30", "dataset_path": str(root), "resolution": 8,
        "train_set": train, "valid_set": valid, "preload": True,
        "input_data": {"lr_dem": 1, "COP30": 1, "image": 3},
        "relative": True, "patch_size": 32, "crop_mode": "tile",
        "patches_per_image": 1, "augment": False,
        "tensor_kwargs": {"log": True, "min": -80, "max": 929},
    })
    _, eval_tf = build_transforms(p)
    ds = DFC30(split="train", transform=eval_tf, **p)
    assert len(ds._cache.data) == 6  # 2 samples x 3 modalities preloaded
    s = ds[0]
    assert s["lr_dem"].shape == (32, 32, 1)


def test_train_step_with_rng_for_stochastic_models():
    """rng threading: LRRU stochastic depth gets per-step keys."""
    from jspsr_tpu.losses import build_criterion
    from jspsr_tpu.models.lrru import LRRU

    model = LRRU({"lr_dem": 1, "image": 3}, bc=4, prob=0.5)
    params, bn = model.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    dem = jnp.asarray(rng.uniform(0.3, 0.6, (1, 32, 32, 1)).astype(np.float32))
    img = jnp.asarray(rng.uniform(0, 1, (1, 32, 32, 3)).astype(np.float32))
    gt = jnp.clip(dem + 0.02, 0, 1)
    criterion = build_criterion({"L1": 1})
    p = _p()
    opt = build_optimizer(p, params)
    state = TrainState(params, bn, opt.init(params), jnp.zeros((), jnp.int32))
    set_learning_rate(state.opt_state, 1e-3)
    step = make_train_step(model, criterion, opt, donate=False, rng_seed=0)
    state, losses = step(state, [dem, img], gt)
    assert np.isfinite(float(losses["Total"]))
    # JSPSR ignores rng but accepts it
    from jspsr_tpu.models.jspsr import JSPSR

    m2 = JSPSR({"lr_dem": 1, "image": 3}, num_feature=8, layers=(1, 1, 1, 1))
    p2, b2 = m2.init(jax.random.PRNGKey(0))
    y, _ = m2(p2, b2, [dem, img], train=True, rng=jax.random.PRNGKey(1))
    assert np.isfinite(np.asarray(y)).all()


def test_spatial_sharded_gradients_match():
    """Backward pass under H-sharding (XLA halo exchange) == replicated."""
    from jspsr_tpu.losses import build_criterion
    from jspsr_tpu.parallel.mesh import make_2d_mesh, spatial_sharding
    from jax.sharding import NamedSharding, PartitionSpec as P

    model, params, bn, inputs, gt = _tiny_model_and_data(8)
    criterion = build_criterion({"L1": 1, "L2": 1})
    mesh = make_2d_mesh(2, 2, jax.devices()[:4])

    @jax.jit
    def grads(prm, d, i, g):
        def loss(q):
            pred, _ = model(q, bn, [d, i], train=True)
            return criterion(pred, g)["Total"]
        return jax.grad(loss)(prm)

    sh = spatial_sharding(mesh)
    rep = NamedSharding(mesh, P())
    g_sh = grads(params, jax.device_put(inputs[0], sh),
                 jax.device_put(inputs[1], sh), jax.device_put(gt, sh))
    g_rp = grads(params, jax.device_put(inputs[0], rep),
                 jax.device_put(inputs[1], rep), jax.device_put(gt, rep))
    a = np.concatenate([np.asarray(x).ravel()
                        for x in jax.tree_util.tree_leaves(g_sh)])
    b = np.concatenate([np.asarray(x).ravel()
                        for x in jax.tree_util.tree_leaves(g_rp)])
    close = np.isclose(a, b, rtol=1e-3, atol=1e-5)
    assert close.mean() > 0.99  # deform floor-flip tolerance (see DP test)
    assert np.abs(a - b).max() < 1e-3


def test_spatial_sharded_gradients_with_conv_vjp():
    """The manual-dgrad conv VJP (nn.layers.conv2d_s1_same) composes with
    H-sharding: the backward's flipped forward conv must get the same halo
    exchange as autodiff's dgrad. Forced on (its TPU-only "auto" default
    means the CPU dryrun never exercises this combination otherwise)."""
    from jspsr_tpu.losses import build_criterion
    from jspsr_tpu.nn import layers as L
    from jspsr_tpu.parallel.mesh import make_2d_mesh, spatial_sharding
    from jax.sharding import NamedSharding, PartitionSpec as P

    model, params, bn, inputs, gt = _tiny_model_and_data(8)
    criterion = build_criterion({"L1": 1, "L2": 1})
    mesh = make_2d_mesh(2, 2, jax.devices()[:4])
    sh = spatial_sharding(mesh)
    rep = NamedSharding(mesh, P())

    def grads(prm, d, i, g):
        def loss(q):
            pred, _ = model(q, bn, [d, i], train=True)
            return criterion(pred, g)["Total"]
        return jax.grad(loss)(prm)

    L.set_conv_s1_custom_vjp(True)
    try:
        g_sh = jax.jit(grads)(params, jax.device_put(inputs[0], sh),
                              jax.device_put(inputs[1], sh),
                              jax.device_put(gt, sh))
    finally:
        L.set_conv_s1_custom_vjp(False)
    g_rp = jax.jit(grads)(params, jax.device_put(inputs[0], rep),
                          jax.device_put(inputs[1], rep),
                          jax.device_put(gt, rep))
    a = np.concatenate([np.asarray(x).ravel()
                        for x in jax.tree_util.tree_leaves(g_sh)])
    b = np.concatenate([np.asarray(x).ravel()
                        for x in jax.tree_util.tree_leaves(g_rp)])
    close = np.isclose(a, b, rtol=1e-3, atol=1e-5)
    assert close.mean() > 0.99  # deform floor-flip tolerance (see DP test)
    assert np.abs(a - b).max() < 1e-3


def test_monitor_ranges_in_train_step():
    from jspsr_tpu.losses import build_criterion

    model, params, bn, inputs, gt = _tiny_model_and_data(9)
    p = _p()
    criterion = build_criterion({"L1": 1})
    opt = build_optimizer(p, params)
    state = TrainState(params, bn, opt.init(params), jnp.zeros((), jnp.int32))
    set_learning_rate(state.opt_state, 1e-3)
    step = make_train_step(model, criterion, opt, donate=False, monitor=True)
    state, losses = step(state, inputs, gt)
    for k in ("grad_min", "grad_max", "input_min", "input_max",
              "pred_min", "pred_max"):
        assert k in losses and np.isfinite(float(losses[k]))
    assert float(losses["grad_min"]) <= float(losses["grad_max"])


def test_accum_steps_matches_full_batch_on_duplicated_microbatches():
    """Gradient accumulation (accum_steps=2): with the two microbatches
    IDENTICAL, per-microbatch BN statistics equal the full-batch statistics,
    so the accumulated update must match the plain full-batch step exactly
    (mean-of-means == full mean for the equal-size reductions)."""
    from jspsr_tpu.losses import build_criterion

    model, params, bn, inputs, gt = _tiny_model_and_data(3)
    # duplicate: batch = [x; x] so both microbatches are the same samples
    inputs2 = [jnp.concatenate([x, x], axis=0) for x in inputs]
    gt2 = jnp.concatenate([gt, gt], axis=0)
    # SGD: the update is proportional to the gradient, so near-zero-grad
    # coordinates stay near-zero under fp reordering. (Adam normalizes a
    # tiny sign-flipped gradient to a full +-lr step — false mismatch.)
    p = _p(optimizer="SGD",
           optimizer_kwargs={"lr": 1e-3, "weight_decay": 0.0,
                             "momentum": 0.0})
    criterion = build_criterion({"L1": 1, "L2": 1, "Grad": 0.1})
    opt = build_optimizer(p, params)

    def run(accum):
        state = TrainState(params, bn, opt.init(params),
                           jnp.zeros((), jnp.int32))
        set_learning_rate(state.opt_state, 1e-3)
        step = make_train_step(model, criterion, opt, donate=False,
                               accum_steps=accum)
        state, losses = step(state, inputs2, gt2)
        return losses, state

    l0, s0 = run(1)
    l1, s1 = run(2)
    # mean-of-two-identical-microbatch losses == full-batch loss up to fp32
    # reduction reordering (~2e-6 observed with single-pass BN stats)
    np.testing.assert_allclose(float(l0["Total"]), float(l1["Total"]),
                               rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(s0.params),
                    jax.tree_util.tree_leaves(s1.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=2e-5)
    # BN running MEANS agree exactly; running VARs differ only by the
    # unbiased n/(n-1) factor applied at microbatch size (4/3 vs 8/7) —
    # the documented semantic caveat of gradient accumulation (same as
    # torch). Bound: momentum * batch_var * (4/3 - 8/7) ~= 0.02*var.
    np.testing.assert_allclose(
        np.asarray(s0.bn_state["conv_img"]["bn"]["mean"]),
        np.asarray(s1.bn_state["conv_img"]["bn"]["mean"]),
        rtol=1e-5, atol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(s0.bn_state),
                    jax.tree_util.tree_leaves(s1.bn_state)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=3e-3, atol=3e-3)


def test_accum_steps_trains():
    """accum_steps=2 on a real (non-duplicated) batch: loss decreases."""
    from jspsr_tpu.losses import build_criterion

    model, params, bn, inputs, gt = _tiny_model_and_data(4)
    p = _p()
    criterion = build_criterion({"L1": 1, "L2": 1})
    opt = build_optimizer(p, params)
    state = TrainState(params, bn, opt.init(params), jnp.zeros((), jnp.int32))
    set_learning_rate(state.opt_state, 1e-3)
    step = make_train_step(model, criterion, opt, donate=False, accum_steps=2)
    first = None
    for _ in range(6):
        state, losses = step(state, inputs, gt)
        if first is None:
            first = float(losses["Total"])
    assert float(losses["Total"]) < first
    assert int(state.step) == 6  # one optimizer step per call, not per micro
