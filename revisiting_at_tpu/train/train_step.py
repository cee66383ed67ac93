"""The fused adversarial train step — one jit, nothing leaves the chip.

Replaces the reference's WrappedModel + train_loop composition
(main.py:260-301, 944-1026): per step it runs
  mixup/cutmix (on-device) -> APGD/FGSM attack scan (model in eval mode)
  -> training forward (stochastic) -> loss -> weight grads -> optax update
  -> EMA update
inside a single compiled program. Under a NamedSharding'd batch and
replicated/FSDP params, XLA inserts the gradient all-reduce over ICI —
the DDP capability with no process groups (SURVEY.md §2.3).

Key semantics preserved from the reference:
  * model is deterministic (eval-mode) during attack generation and
    stochastic (droppath/BN-updating) for the training forward
    (main.py:279,289)
  * training consumes the attack's best-loss point x_best (main.py:291-293)
  * the adversarial example is detached — no gradient flows through the
    attack into the weights
  * loss: SoftTargetCE when mixup is active, plain CE otherwise
    (main.py:461-466)
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import jax
import jax.numpy as jnp
import optax

from ..attacks import apgd_attack, fgsm_train
from ..data.augment import RandAugmentConfig, augment_batch
from ..data.mixup import MixupConfig, mixup_cutmix
from ..ops.losses import ce_indiv, soft_target_ce
from .ema import ema_update
from .state import TrainState


def input_grad_view(m):
    """Attack-closure view of a model: the fused Pallas block-tail backward
    computes ONLY the input cotangent (weight cotangents are structurally
    discarded by the attack, but a monolithic pallas_call is not
    dead-code-eliminable — ops/block_mlp.py grad_mode). No-op for models
    without the knob."""
    if hasattr(m, "pallas_grad_mode"):
        return m.clone(pallas_grad_mode="input")
    inner = getattr(m, "model", None)  # NormalizedModel wrapper
    if inner is not None and hasattr(inner, "pallas_grad_mode"):
        return m.clone(model=inner.clone(pallas_grad_mode="input"))
    return m


def to_unit_pixels(images: jax.Array) -> jax.Array:
    """Canonical [0,1] float pixels. uint8 batches (the tf.data folder
    pipeline ships uint8 — 4x cheaper host->device) are scaled by 1/255;
    float batches are assumed already in [0,1] (reference contract:
    ToTensor only, no normalize, dataset_convnext_like.py:60-61)."""
    if images.dtype == jnp.uint8:
        return images.astype(jnp.float32) / 255.0
    return images.astype(jnp.float32)


@dataclasses.dataclass(frozen=True)
class AdvConfig:
    """Mirror of the reference 'adv' config section (main.py:180-189)."""

    attack: str = "none"  # 'none' | 'fgsm' | 'apgd'
    norm: str = "Linf"
    eps: float = 4.0 / 255.0
    n_iter: int = 2
    alpha: float = 1.25  # fgsm step multiplier
    noise_level: float = 1.0
    skip_projection: bool = False
    loss: str = "ce"


def make_train_step(
    model,
    tx,
    *,
    adv: AdvConfig,
    mixup: MixupConfig | None,
    randaug: RandAugmentConfig | None = None,
    ema_decay: float = 0.0,
    seed: int = 0,
    has_batch_stats: bool = False,
    donate: bool = True,
    mesh=None,
    state_specs: TrainState | None = None,
    data_axes: tuple[str, ...] = ("data", "fsdp"),
) -> Callable[[TrainState, jax.Array, jax.Array], tuple[TrainState, dict]]:
    """Build the jitted train step: (state, images NHWC [0,1], int labels) ->
    (state, metrics).

    mesh=None: rely on jit + NamedSharding auto-partitioning (XLA inserts the
    gradient all-reduce). mesh given: wrap the whole step in `shard_map` over
    the batch axes with explicit collectives — this makes every op inside
    (including Pallas custom calls, which the auto-partitioner would
    otherwise gather to full batch) shard-local.

    state_specs: a TrainState of PartitionSpecs (params/EMA/adam moments by
    the _fsdp_spec rule). None/all-replicated = pure DP. With "fsdp"-sharded
    specs the step runs manual ZeRO-3: params are all-gathered over the fsdp
    axis inside the (differentiable) loss — AD's transpose of all_gather is
    psum_scatter, so each device keeps only its shard's gradient, and the
    optimizer/EMA update runs on sharded leaves.
    """

    root_key = jax.random.PRNGKey(seed)
    shard_mode = mesh is not None
    fsdp_size = mesh.shape.get("fsdp", 1) if shard_mode else 1
    param_specs = state_specs.params if state_specs is not None else None
    attack_model = input_grad_view(model)

    def _gather_params(params):
        """all_gather fsdp-sharded leaves back to full size (differentiable)."""
        if param_specs is None or fsdp_size <= 1:
            return params

        def gather(leaf, spec):
            if spec is None:
                return leaf
            for ax, name in enumerate(spec):
                if name == "fsdp" or (isinstance(name, tuple) and "fsdp" in name):
                    return jax.lax.all_gather(leaf, "fsdp", axis=ax, tiled=True)
            return leaf

        return jax.tree.map(gather, params, param_specs)

    def step_fn(state: TrainState, images: jax.Array, labels: jax.Array):
        rng = jax.random.fold_in(root_key, state.step)
        if shard_mode:
            # k_mix stays shard-invariant (batch-mode mixup draws ONE lam);
            # per-sample randomness (attack noise, droppath) decorrelates
            k_mix = jax.random.fold_in(rng, 1)
            local = rng
            for ax in data_axes:
                local = jax.random.fold_in(local, jax.lax.axis_index(ax))
            _, k_attack, k_drop, k_aug = jax.random.split(local, 4)
        else:
            k_mix, k_attack, k_drop, k_aug = jax.random.split(rng, 4)

        images = to_unit_pixels(images)
        # on-device RandAugment/erasing/hflip INSIDE the fused step: no extra
        # dispatch, XLA overlaps it with the H2D of the next batch (the FFCV
        # role, SURVEY.md §7 'input pipeline throughput')
        if randaug is not None:
            images = augment_batch(k_aug, images, randaug)
        if mixup is not None:
            images, targets = mixup_cutmix(k_mix, images, labels, mixup)
        else:
            targets = labels

        # --- adversarial example generation: eval-mode, frozen stats ---
        # (attack params are stop-gradient'd; the gather here is pure compute)
        eval_vars = dict(state.variables())
        eval_vars["params"] = _gather_params(state.params)

        def eval_logits(xa):
            return attack_model.apply(eval_vars, xa, train=False)

        adv_acc = jnp.asarray(1.0)
        if adv.attack == "apgd":
            res = apgd_attack(
                eval_logits,
                images,
                targets,
                norm=adv.norm,
                eps=adv.eps,
                n_iter=adv.n_iter,
                loss=adv.loss,
                is_train=True,
            )
            x_use = jax.lax.stop_gradient(res.x_best)
            adv_acc = jnp.mean(res.acc.astype(jnp.float32))
        elif adv.attack == "fgsm":
            x_use = jax.lax.stop_gradient(
                fgsm_train(
                    eval_logits,
                    images,
                    targets,
                    eps=adv.eps,
                    rng=k_attack,
                    loss=adv.loss,
                    alpha=adv.alpha,
                    use_rs=True,
                    noise_level=adv.noise_level,
                    skip_projection=adv.skip_projection,
                )
            )
            # real eval-mode robust accuracy at the FGSM point (the APGD
            # branch gets this free from the attack's tracked acc); one
            # extra forward — still ~3x cheaper than a 2-iter APGD step
            adv_acc = jnp.mean(
                (jnp.argmax(eval_logits(x_use), -1) == labels).astype(jnp.float32)
            )
        elif adv.attack == "none":
            x_use = images
        else:
            raise ValueError(f"unknown attack {adv.attack!r}")

        # --- training forward/backward on the adversarial points ---
        def loss_fn(params):
            # differentiable gather: AD's transpose (psum_scatter over fsdp)
            # leaves each device with exactly its shard's gradient
            variables = {"params": _gather_params(params)}
            if has_batch_stats:
                variables["batch_stats"] = state.batch_stats
                logits, mutated = model.apply(
                    variables,
                    x_use,
                    train=True,
                    rngs={"dropout": k_drop},
                    mutable=["batch_stats"],
                )
                new_stats = mutated["batch_stats"]
            else:
                logits = model.apply(variables, x_use, train=True, rngs={"dropout": k_drop})
                new_stats = None
            if mixup is not None:
                loss = soft_target_ce(logits, targets)
            else:
                loss = jnp.mean(ce_indiv(logits, targets))
            return loss, (logits, new_stats)

        (loss, (logits, new_stats)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )

        def _leaf_fsdp_sharded(spec) -> bool:
            return spec is not None and any(
                n == "fsdp" or (isinstance(n, tuple) and "fsdp" in n) for n in spec
            )

        if shard_mode:
            if param_specs is not None and fsdp_size > 1:
                # sharded leaves: AD already summed over fsdp (psum_scatter);
                # average over data, then divide by the fsdp-group size so
                # every leaf ends up at the global-mean gradient
                def reduce_grad(g, spec):
                    if _leaf_fsdp_sharded(spec):
                        return jax.lax.pmean(g, "data") / fsdp_size
                    return jax.lax.pmean(g, data_axes)

                grads = jax.tree.map(reduce_grad, grads, param_specs)
            else:
                grads = jax.lax.pmean(grads, data_axes)
            loss = jax.lax.pmean(loss, data_axes)
            if new_stats is not None:
                new_stats = jax.lax.pmean(new_stats, data_axes)

        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)

        new_ema = state.ema_params
        new_ema_stats = state.ema_batch_stats
        if ema_decay > 0.0 and state.ema_params is not None:
            new_ema = ema_update(state.ema_params, new_params, ema_decay)
            if has_batch_stats and state.ema_batch_stats is not None:
                new_ema_stats = ema_update(state.ema_batch_stats, new_stats, ema_decay)

        hard = labels  # accuracy vs the original labels, pre-mixup
        train_acc = jnp.mean((jnp.argmax(logits, -1) == hard).astype(jnp.float32))

        new_state = state.replace(
            step=state.step + 1,
            params=new_params,
            opt_state=new_opt_state,
            ema_params=new_ema,
            batch_stats=new_stats if has_batch_stats else state.batch_stats,
            ema_batch_stats=new_ema_stats,
        )
        if shard_mode and param_specs is not None and fsdp_size > 1:
            # shard-local sumsq for fsdp-sharded leaves needs a psum to be a
            # true global norm (and to satisfy the replicated out_spec)
            gl, sl = jax.tree.flatten(grads)[0], jax.tree.flatten(param_specs)[0]
            ss_sh = sum(
                (jnp.sum(jnp.square(g.astype(jnp.float32)))
                 for g, s in zip(gl, sl) if _leaf_fsdp_sharded(s)),
                start=jnp.zeros((), jnp.float32),
            )
            ss_rep = sum(
                (jnp.sum(jnp.square(g.astype(jnp.float32)))
                 for g, s in zip(gl, sl) if not _leaf_fsdp_sharded(s)),
                start=jnp.zeros((), jnp.float32),
            )
            grad_norm = jnp.sqrt(jax.lax.psum(ss_sh, "fsdp") + ss_rep)
        else:
            grad_norm = optax.global_norm(grads)

        metrics = {
            "loss": loss,
            "train_acc": train_acc,
            "adv_acc": adv_acc,
            "grad_norm": grad_norm,
        }
        if shard_mode:
            metrics = {
                k: jax.lax.pmean(v, data_axes) if k != "grad_norm" else v
                for k, v in metrics.items()
            }
        return new_state, metrics

    if shard_mode:
        from jax import shard_map
        from jax.sharding import PartitionSpec as P

        batch_spec = P(data_axes)
        state_spec_tree = state_specs if state_specs is not None else P()
        # check_vma=False: Pallas out_shapes don't carry vma annotations
        fn = shard_map(
            step_fn,
            mesh=mesh,
            in_specs=(state_spec_tree, batch_spec, batch_spec),
            out_specs=(state_spec_tree, P()),
            check_vma=False,
        )
        return jax.jit(fn, donate_argnums=(0,) if donate else ())

    return jax.jit(step_fn, donate_argnums=(0,) if donate else ())


def make_eval_step(model, *, lr_tta: bool = False, use_ema: bool = False):
    """Clean-accuracy eval step (reference single_val, main.py:897-939)."""

    def eval_fn(state: TrainState, images: jax.Array, labels: jax.Array):
        variables = state.ema_variables() if use_ema else state.variables()
        x = to_unit_pixels(images)
        logits = model.apply(variables, x, train=False)
        if lr_tta:
            # hflip TTA (reference main.py:918-919); flip W AFTER the unit
            # conversion — uint8 folder batches must not hit the model raw
            logits = logits + model.apply(variables, x[:, :, ::-1, :], train=False)
        top1 = jnp.argmax(logits, -1) == labels
        top5 = jnp.any(
            jax.lax.top_k(logits, 5)[1] == labels[:, None], axis=-1
        )
        return jnp.sum(top1.astype(jnp.int32)), jnp.sum(top5.astype(jnp.int32))

    return jax.jit(eval_fn)


def make_adv_eval_step(model, *, adv: AdvConfig, use_ema: bool = False):
    """In-training adversarial validation step: quick APGD-CE against the
    training threat model, robust-correct count over the batch (the
    reference's best_adv_weights intent, main.py:1069-1072 — it tracks the
    best robust checkpoint but never re-evaluates; we actually attack)."""
    from ..attacks.apgd import apgd_attack

    attack_view = input_grad_view(model)

    def fn(state: TrainState, images: jax.Array, labels: jax.Array, rng):
        variables = state.ema_variables() if use_ema else state.variables()
        x = to_unit_pixels(images)

        def logits_fn(xb):
            return attack_view.apply(variables, xb, train=False)

        res = apgd_attack(
            logits_fn, x, labels, norm=adv.norm, eps=adv.eps,
            n_iter=adv.n_iter, loss="ce", is_train=False, rng=rng,
        )
        logits = model.apply(variables, res.x_best_adv, train=False)
        robust = jnp.argmax(logits, -1) == labels
        return jnp.sum(robust.astype(jnp.int32))

    return jax.jit(fn)
