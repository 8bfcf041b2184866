"""Optimizers: the reference's two-optimizer, multi-group structure.

Rebuilds ``set_group_lr`` (main_avss_resize.py:50-72), ``group_weight``
(engine/utils.py:642-688), the ``lr_step`` group scaling
(trainer_cavp_avss_image.py:78-91), and the Adam audio optimizer
(main_avss_resize.py:133) as one optax ``multi_transform`` over the
unified CAVP param tree:

- ``seg_*``  : everything under ``segment`` — SGD, lr x10;
- ``bkb_*``  : everything under ``backbone`` — SGD, lr x1;
- ``fusion`` : ``cross_att`` + ``visual_projector`` — SGD, lr x1, with
  weight decay on *all* params (the reference appends these as plain
  param groups, so unlike group_weight'd modules their biases/norms DO
  decay);
- ``audio``  : ``audio_net`` — Adam at a constant ``args.lr`` (the
  reference never schedules the audio optimizer; lr_audio == args.lr).

``*_decay`` vs ``*_nodecay`` replicates group_weight: conv/linear
kernels decay; biases and norm scales don't. Torch-SGD semantics
(decoupled nothing — wd added to the gradient before momentum) are
preserved by the add_decayed_weights -> trace -> scale ordering.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Dict, NamedTuple

import jax
import jax.numpy as jnp
import optax


@functools.partial(jax.jit, inline=True)
def _one_minus_pow(decay, count):
    """Mirror of the ``1 - decay**count`` inside optax's jit-inlined
    ``optax.tree.bias_correction`` (same traced-arg signature). Needed
    for bitwise equality with ``optax.adam`` under EAGER execution:
    eager ``b2 ** count`` constant-folds pow with both operands known,
    while the jitted helper computes a runtime pow — at count=3 the
    two differ by ~1e-5 relative after the catastrophic ``1 - 0.999^c``
    cancellation. Under an outer jit both inline to identical HLO."""
    return 1 - decay ** count


def _flat_path(path) -> str:
    return "/".join(str(getattr(p, "key", getattr(p, "idx", p))) for p in path)


def param_label(path, leaf) -> str:
    """Assign an optimizer group label to a param tree path."""
    flat = _flat_path(path)
    leaf_name = flat.rsplit("/", 1)[-1]
    is_decay = leaf_name == "kernel"
    if flat.startswith("audio_net"):
        return "audio"
    if flat.startswith("segment"):
        return "seg_decay" if is_decay else "seg_nodecay"
    if flat.startswith("backbone"):
        return "bkb_decay" if is_decay else "bkb_nodecay"
    # cross_att + visual_projector: single plain group, wd on everything
    return "fusion"


def label_params(params) -> Any:
    return jax.tree_util.tree_map_with_path(param_label, params)


def sgd_group(schedule: Callable, lr_multiplier: float, momentum: float,
              weight_decay: float,
              base_lr: float = None) -> optax.GradientTransformation:
    """Torch SGD: grad += wd * param; buf = momentum*buf + grad;
    param -= lr * buf.

    LR indexing matches the reference exactly: the trainer updates the
    param-group lr AFTER optimizer.step() (trainer_cavp_avss_image.py:
    224-240), so step i runs at schedule(i-1) and step 0 runs at the
    constructor lr (args.lr x multiplier) — NOT the warmup value.
    """
    chain = []
    if weight_decay:
        chain.append(optax.add_decayed_weights(weight_decay))
    chain.append(optax.trace(decay=momentum, nesterov=False))

    def lr_at(count):
        lagged = schedule(jnp.maximum(count - 1, 0))
        first = schedule(0) if base_lr is None else base_lr
        return jnp.where(count == 0, first, lagged)

    chain.append(optax.scale_by_schedule(
        lambda count: -lr_multiplier * lr_at(count)))
    return optax.chain(*chain)


class FusedOptState(NamedTuple):
    """State of :func:`fused_optimizer`: one shared step counter and a
    per-leaf buffer tuple — ``(trace,)`` for SGD leaves, ``(mu, nu)``
    for Adam (audio) leaves. Structurally a pytree, so it checkpoints
    like any optax state."""
    count: jnp.ndarray
    slots: Any


def fused_optimizer(config, schedule) -> optax.GradientTransformation:
    """The exact update of :func:`make_optimizer`'s 6-group
    ``multi_transform``, hand-fused into ONE tree pass.

    Semantics are op-for-op identical to the optax chain (torch-SGD
    ``g+wd*p -> momentum trace -> -mult*lr(count-1)`` per group;
    bias-corrected Adam at constant ``args.lr`` on the audio tower;
    the same post-step lr lag), pinned by tests/test_fused_optim.py. The
    motivation is runtime structure, not math: one ``tree_map`` with
    per-leaf statically-baked (group, mult, wd) gives XLA one fusion
    per leaf instead of the multi_transform's per-group masked chains
    (measured machinery cost: scripts/bench_optim_probe.py).
    """
    base = config.lr
    momentum = config.momentum
    wd = config.weight_decay
    b1, b2, eps = 0.9, 0.999, 1e-8  # optax.adam defaults == torch Adam

    def lr_at(count):
        lagged = schedule(jnp.maximum(count - 1, 0))
        return jnp.where(count == 0, base, lagged)

    def leaf_init(path, p):
        if param_label(path, p) == "audio":
            return (jnp.zeros_like(p), jnp.zeros_like(p))
        return (jnp.zeros_like(p),)

    def init(params):
        return FusedOptState(
            count=jnp.zeros([], jnp.int32),
            slots=jax.tree_util.tree_map_with_path(leaf_init, params))

    def update(updates, state, params):
        count = state.count
        lr = lr_at(count)  # pre-increment, like scale_by_schedule
        count_inc = optax.safe_increment(count)
        # Adam bias corrections, shared across audio leaves (computed
        # through the jit-inline mirror for bitwise optax equality)
        bc1 = _one_minus_pow(b1, count_inc)
        bc2 = _one_minus_pow(b2, count_inc)

        def leaf_up(path, g, p, slot):
            label = param_label(path, g)
            if label == "audio":
                mu, nu = slot
                mu = b1 * mu + (1.0 - b1) * g
                nu = b2 * nu + (1.0 - b2) * (g * g)
                upd = (-base) * ((mu / bc1) / (jnp.sqrt(nu / bc2) + eps))
                return upd, (mu, nu)
            mult = 10.0 if label.startswith("seg") else 1.0
            u = g + wd * p if (wd and label in
                               ("seg_decay", "bkb_decay", "fusion")) else g
            (buf,) = slot
            buf = u + momentum * buf          # optax.trace op order
            return (-mult * lr) * buf, (buf,)

        pairs = jax.tree_util.tree_map_with_path(
            leaf_up, updates, params, state.slots)
        treedef = jax.tree_util.tree_structure(updates)
        flat = treedef.flatten_up_to(pairs)
        new_updates = treedef.unflatten([t[0] for t in flat])
        new_slots = treedef.unflatten([t[1] for t in flat])
        return new_updates, FusedOptState(count=count_inc, slots=new_slots)

    return optax.GradientTransformation(init, update)


def make_optimizer(config, steps_per_epoch: int = None):
    """The full two-optimizer structure over one param tree.
    Returns (tx, schedule)."""
    from cavp_tpu.engine.schedules import warmup_poly_schedule

    if steps_per_epoch is None:
        steps_per_epoch = getattr(config, "steps_per_epoch", 1000)
    total_iters = steps_per_epoch * config.epochs
    schedule = warmup_poly_schedule(
        config.lr, config.lr_power, total_iters,
        steps_per_epoch * config.warm_up_epoch)

    if getattr(config, "fused_optimizer", False):
        return fused_optimizer(config, schedule), schedule

    base = config.lr  # step-0 lr: the optimizer's constructor value
    transforms: Dict[str, optax.GradientTransformation] = {
        "seg_decay": sgd_group(schedule, 10.0, config.momentum,
                               config.weight_decay, base_lr=base),
        "seg_nodecay": sgd_group(schedule, 10.0, config.momentum, 0.0,
                                 base_lr=base),
        "bkb_decay": sgd_group(schedule, 1.0, config.momentum,
                               config.weight_decay, base_lr=base),
        "bkb_nodecay": sgd_group(schedule, 1.0, config.momentum, 0.0,
                                 base_lr=base),
        "fusion": sgd_group(schedule, 1.0, config.momentum,
                            config.weight_decay, base_lr=base),
        # Audio: Adam at constant args.lr (main_avss_resize.py:133);
        # the scheduler never touches it (trainer lr_step:89).
        "audio": optax.adam(config.lr),
    }
    return optax.multi_transform(transforms, label_params), schedule


def current_lrs(schedule: Callable, config, count) -> Dict[str, jnp.ndarray]:
    """The lr_step display values (trainer_cavp_avss_image.py:86-91)."""
    lr = schedule(count)
    return {
        "lr/lr_seg": lr * 10.0,
        "lr/lr_bkb": lr,
        "lr/lr_attn": lr,
        "lr/lr_audio": jnp.asarray(config.lr),
    }
