"""Jitted train/eval steps.

One compiled XLA program per step: forward, loss, backward, optimizer update
and BatchNorm-state merge all fuse under a single jit (donated buffers — no
reallocation of params/opt_state per step). Contrast with the reference's
per-op eager dispatch (train/train_utils.py:205-268).

Under a device mesh, the same step function is used unchanged: inputs are
sharded batch-wise (NamedSharding), and XLA inserts the gradient all-reduce
over ICI (see jspsr_tpu.parallel).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from jspsr_tpu.train.state import TrainState, deep_merge


def make_train_step(model, criterion, optimizer, donate: bool = True,
                    remat: bool = False, rng_seed: int | None = None,
                    monitor: bool = False, accum_steps: int = 1):
    """Returns train_step(state, inputs, gt) -> (state, loss_dict).

    remat=True rematerializes the forward during the backward pass
    (jax.checkpoint): activation memory drops to the forward live set at the
    cost of ~one extra forward — the standard TPU trade of FLOPs (abundant)
    for HBM (the constraint). Lets the flagship train at 2x the batch.

    accum_steps=N splits the batch into N microbatches inside the SAME
    compiled step (lax.scan) and applies ONE optimizer update with the
    mean gradient — activation memory shrinks by N while the optimizer
    sees the full batch, so the reference's shipped batch sizes (70/50,
    configs/*.yml) train on a single 16G chip. BatchNorm batch statistics
    are computed per microbatch and the running-stat updates averaged —
    the same semantic caveat as torch gradient accumulation. Batch must
    divide by N.

    rng_seed: when set, a per-step PRNG key (folded with state.step) is
    passed to the model as ``rng=`` — used by stochastic layers (LRRU
    stochastic depth, PVT drop-path)."""

    base_key = None if rng_seed is None else jax.random.PRNGKey(rng_seed)

    def train_step(state: TrainState, inputs, gt):
        step_key = (None if base_key is None
                    else jax.random.fold_in(base_key, state.step))

        def fwd(params, inputs, rng):
            kw = {} if rng is None else {"rng": rng}
            return model(params, state.bn_state, inputs, train=True, **kw)

        fwd_fn = jax.checkpoint(fwd) if remat else fwd

        def loss_fn(params, inputs, gt, rng=None):
            pred, bn_updates = fwd_fn(params, inputs, rng)
            losses = criterion(pred, gt)
            return losses["Total"], (losses, bn_updates, pred)

        if accum_steps > 1:
            b = gt.shape[0]
            assert b % accum_steps == 0, (b, accum_steps)
            mb = b // accum_steps

            def split(x):
                return x.reshape(accum_steps, mb, *x.shape[1:])

            micro_in = [split(x) for x in inputs]
            micro_gt = split(gt)
            micro_idx = jnp.arange(accum_steps)

            def body(carry, micro):
                g_sum, l_sum, bn_sum = carry
                m_inputs, m_gt, idx = micro
                # per-microbatch rng: each microbatch draws independent
                # stochastic-layer masks, as the full batch would
                rng = (None if step_key is None
                       else jax.random.fold_in(step_key, idx))
                (_, (losses, bn_up, pred)), grads = jax.value_and_grad(
                    loss_fn, has_aux=True
                )(state.params, list(m_inputs), m_gt, rng)
                g_sum = jax.tree_util.tree_map(jax.lax.add, g_sum, grads)
                l_sum = jax.tree_util.tree_map(jax.lax.add, l_sum, losses)
                bn_sum = jax.tree_util.tree_map(jax.lax.add, bn_sum, bn_up)
                return (g_sum, l_sum, bn_sum), pred

            # abstract-trace one microbatch for the accumulator structure
            init_shapes = jax.eval_shape(
                lambda p: jax.value_and_grad(loss_fn, has_aux=True)(
                    p, [x[0] for x in micro_in], micro_gt[0], step_key),
                state.params,
            )
            (_, (l_shape, bn_shape, _)), g_shape = init_shapes

            mk_zeros = lambda sh: jax.tree_util.tree_map(
                lambda s: jnp.zeros(s.shape, s.dtype), sh)
            carry0 = (mk_zeros(g_shape), mk_zeros(l_shape),
                      mk_zeros(bn_shape))
            (g_sum, l_sum, bn_sum), preds = jax.lax.scan(
                body, carry0, (tuple(micro_in), micro_gt, micro_idx))
            inv = 1.0 / accum_steps
            grads = jax.tree_util.tree_map(lambda g: g * inv, g_sum)
            losses = jax.tree_util.tree_map(lambda l: l * inv, l_sum)
            bn_updates = jax.tree_util.tree_map(lambda s: s * inv, bn_sum)
            pred = preds.reshape(b, *preds.shape[2:])
        else:
            (_, (losses, bn_updates, pred)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(state.params, inputs, gt, step_key)
        if monitor:
            # reference tqdm-postfix monitors (train_utils.py:241-267):
            # grad/input/pred value ranges, computed on device
            gleaves = jax.tree_util.tree_leaves(grads)
            losses = dict(losses)
            losses["grad_min"] = jnp.min(
                jnp.stack([jnp.min(g) for g in gleaves]))
            losses["grad_max"] = jnp.max(
                jnp.stack([jnp.max(g) for g in gleaves]))
            losses["input_min"] = jnp.min(inputs[0])
            losses["input_max"] = jnp.max(inputs[0])
            losses["pred_min"] = jnp.min(pred)
            losses["pred_max"] = jnp.max(pred)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        bn_state = deep_merge(state.bn_state, bn_updates)
        new_state = TrainState(params, bn_state, opt_state, state.step + 1)
        return new_state, losses

    return jax.jit(train_step, donate_argnums=(0,) if donate else ())


def make_eval_step(model, criterion=None):
    """Returns eval_step(params, bn_state, inputs, gt) -> (pred, loss_dict).

    loss_dict carries an extra ``_total_per_sample`` (B,) entry: the
    criterion evaluated per sample (vmap over the batch). This keeps the
    batched-eval fast path EXACTLY equal to the reference's bs=1 protocol —
    including batch-statistic losses like BerHu, whose threshold is computed
    per sample at bs=1 — and lets the loop drop padded samples from the
    remainder batch."""

    def eval_step(params, bn_state, inputs, gt=None):
        pred, _ = model(params, bn_state, inputs, train=False)
        losses = {}
        if criterion is not None and gt is not None:
            losses = dict(criterion(pred, gt))
            losses["_total_per_sample"] = jax.vmap(
                lambda pr, g: criterion(pr[None], g[None])["Total"]
            )(pred, gt)
        return pred, losses

    return jax.jit(eval_step)


def make_forward(model):
    """Plain jitted inference forward: (params, bn_state, inputs) -> pred."""

    @jax.jit
    def forward(params, bn_state, inputs):
        pred, _ = model(params, bn_state, inputs, train=False)
        return pred

    return forward
