"""Jitted training engine: state, step function, DP sharding, grad accumulation.

Replaces the reference's epoch loop (``main_synapse.py:253-325``): the entire
optimizer step — forward, loss, backward, BN-stat update, SGD+schedule — is one
XLA-compiled function with donated buffers. Mixed precision is a bf16 input policy
(no GradScaler needed on TPU; fp32 islands live inside the layers). Gradient
accumulation (a dead flag in the reference, ``main_synapse.py:64``) is implemented
for real via ``lax.scan`` over microbatches.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import optax

from cenet_tpu.core.config import ExperimentConfig
from cenet_tpu.core.mesh import batch_sharding, replicated
from cenet_tpu.models.cenet import CENet, CENetOrg
from cenet_tpu.train.losses import Criterion
from cenet_tpu.train.optim import make_optimizer, make_schedule


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class TrainState:
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jnp.ndarray

    def as_variables(self):
        return {"params": self.params, "batch_stats": self.batch_stats}


def build_model(cfg: ExperimentConfig):
    m = cfg.model
    if m.model_version == "cenet_org":
        return CENetOrg(
            input_channels=m.input_channels,
            num_classes=m.num_classes,
            scale_factors=m.scale_factors[:2],
            num_heads=m.diffatt_num_heads,
            encoder=m.encoder,
            skip_mode=m.skip_mode,
            attn_impl=m.attn_impl,
            drop_path_rate=m.drop_path_rate,
        )
    return CENet(
        input_channels=m.input_channels,
        num_classes=m.num_classes,
        scale_factors=m.scale_factors,
        diffatt_num_heads=m.diffatt_num_heads,
        encoder=m.encoder,
        skip_mode=m.skip_mode,
        dec_up_block=m.dec_up_block,
        out_merge_mode=m.out_merge_mode,
        out_up_block=m.out_up_block,
        out_up_ks=m.out_up_ks,
        skip_use_command=m.skip_use_command,
        attn_impl=m.attn_impl,
        drop_path_rate=m.drop_path_rate,
        remat=cfg.train.remat,
    )


class Trainer:
    """Owns model, optimizer, and the compiled train/eval step functions."""

    def __init__(self, cfg: ExperimentConfig, max_iterations: int, mesh=None, iters_per_epoch: int = 1):
        # Register (or clear) the module-global attention mesh: a mesh-less
        # Trainer constructed after a meshed one must not inherit the stale mesh,
        # or '@model'-suffixed impls would shard_map over a mesh it doesn't own.
        from cenet_tpu.core.mesh import set_attention_mesh

        set_attention_mesh(mesh)
        if mesh is not None:
            # Under tensor parallelism (model axis > 1) tag the attention impl
            # with '@model' so the cores run head-local inside shard_map instead
            # of being all-gathered by GSPMD (which cannot partition Pallas
            # custom calls) — ops/flash_attention.shard_heads, tests/test_tp_attention.py.
            # 'ring' is exempt: its '@axis' names the SEQ axis (defaults to 'seq'),
            # not a TP head axis.
            if (
                mesh.shape.get("model", 1) > 1
                and "@" not in cfg.model.attn_impl
                and not cfg.model.attn_impl.startswith("ring")
            ):
                cfg = cfg.replace(
                    model=dataclasses.replace(cfg.model, attn_impl=cfg.model.attn_impl + "@model")
                )
        self.cfg = cfg
        self.model = build_model(cfg)
        self.criterion = Criterion(cfg.model.num_classes, cfg.train.loss_type, cfg.train.loss_weights)
        self.schedule = make_schedule(
            cfg.train.scheduler, cfg.train.base_lr, max_iterations,
            cfg.train.max_epochs, iters_per_epoch,
        )
        self.tx = make_optimizer(cfg.train.optimizer, self.schedule, cfg.train.weight_decay, cfg.train.grad_clip)
        if cfg.model.freeze_bb:
            from cenet_tpu.train.optim import freeze_subtree

            self.tx = freeze_subtree(self.tx, "backbone")
        # NB: optax.flatten measured NET NEGATIVE under deep multi-step dispatch
        # (+4.2 ms device for the 133 MB param concat/split vs −12 ms of per-call
        # buffer marshaling that K≥50 dispatch already amortizes) — PERF_NOTES.
        self.mesh = mesh
        self.compute_dtype = jnp.bfloat16 if cfg.train.amp else jnp.float32
        self._train_step = None
        self._eval_step = None

    # -- state ---------------------------------------------------------------

    def init_state(self, rng: jax.Array, sample_batch_shape) -> TrainState:
        x = jnp.zeros(sample_batch_shape, jnp.float32)
        variables = jax.jit(lambda k, x: self.model.init(k, x, train=False))(rng, x)
        params = variables["params"]
        batch_stats = variables.get("batch_stats", {})
        opt_state = self.tx.init(params)
        state = TrainState(params, batch_stats, opt_state, jnp.zeros((), jnp.int32))
        if self.mesh is not None:
            rep = replicated(self.mesh)
            state = jax.tree.map(lambda a: jax.device_put(a, rep), state)
        return state

    # -- compiled steps ------------------------------------------------------

    def _register_mesh(self):
        """Trace-time attention-mesh registration (ADVICE r4 construction-order
        hazard): step functions trace lazily at first call, so the module global
        set in __init__ could be clobbered by a later mesh-less Trainer before
        this trainer's first trace — silently dropping the '@model' shard_map.
        Called as the first statement INSIDE each step body, it re-runs at every
        (re)trace, before any attention router reads the global, while the
        returned callables stay plain jitted functions (keeping .lower/.as_text
        for the profiling tools)."""
        from cenet_tpu.core.mesh import set_attention_mesh

        set_attention_mesh(self.mesh)

    def loss_fn(self, params, batch_stats, images, labels, rng):
        self._register_mesh()
        out, mutated = self.model.apply(
            {"params": params, "batch_stats": batch_stats},
            images.astype(self.compute_dtype),
            train=True,
            deterministic=False,
            mutable=["batch_stats"],
            rngs={"dropout": rng},
        )
        loss = self.criterion(out.astype(jnp.float32), labels)
        return loss, mutated["batch_stats"]

    def make_train_step(self) -> Callable:
        accum = max(self.cfg.train.grad_accum_steps, 1)

        def train_step(state: TrainState, images, labels, rng):
            if accum == 1:
                (loss, new_bs), grads = jax.value_and_grad(self.loss_fn, has_aux=True)(
                    state.params, state.batch_stats, images, labels, rng
                )
            else:
                # microbatch accumulation via scan: images (A, b, H, W, C)
                def micro(carry, inp):
                    g_acc, l_acc, bs = carry
                    im, lb, r = inp
                    (l, bs2), g = jax.value_and_grad(self.loss_fn, has_aux=True)(
                        state.params, bs, im, lb, r
                    )
                    g_acc = jax.tree.map(jnp.add, g_acc, g)
                    return (g_acc, l_acc + l, bs2), None

                zeros = jax.tree.map(jnp.zeros_like, state.params)
                rngs = jax.random.split(rng, accum)
                (grads, loss, new_bs), _ = jax.lax.scan(
                    micro, (zeros, jnp.zeros((), jnp.float32), state.batch_stats), (images, labels, rngs)
                )
                grads = jax.tree.map(lambda g: g / accum, grads)
                loss = loss / accum
            updates, new_opt = self.tx.update(grads, state.opt_state, state.params)
            new_params = optax.apply_updates(state.params, updates)
            new_state = TrainState(new_params, new_bs, new_opt, state.step + 1)
            return new_state, loss

        donate = (0,)
        if self.mesh is not None:
            # State shardings are inherited from the arrays themselves (replicated
            # for pure DP; TP rules may shard attention weights over 'model') —
            # constraining them here would silently undo tensor parallelism.
            in_shardings = (None, batch_sharding(self.mesh), batch_sharding(self.mesh), None)
            return jax.jit(train_step, donate_argnums=donate, in_shardings=in_shardings)
        return jax.jit(train_step, donate_argnums=donate)

    def make_multi_step(self, n_steps: int) -> Callable:
        """One dispatch runs ``n_steps`` optimizer steps over stacked batches.

        ``images``/``labels`` carry a leading (n_steps,) axis — distinct batches per
        step. Amortizes host→device dispatch latency (essential when the host link
        is slow, e.g. the axon tunnel's ~30 ms per call); the loader's prefetch
        depth should cover n_steps batches.
        """
        def train_step_body(state: TrainState, images, labels, rng):
            (loss, new_bs), grads = jax.value_and_grad(self.loss_fn, has_aux=True)(
                state.params, state.batch_stats, images, labels, rng
            )
            updates, new_opt = self.tx.update(grads, state.opt_state, state.params)
            new_params = optax.apply_updates(state.params, updates)
            return TrainState(new_params, new_bs, new_opt, state.step + 1), loss

        def multi_step(state: TrainState, images, labels, rng):
            def body(carry, inp):
                st, _ = carry
                im, lb, r = inp
                st, loss = train_step_body(st, im, lb, r)
                return (st, loss), None

            rngs = jax.random.split(rng, n_steps)
            (state, loss), _ = jax.lax.scan(
                body, (state, jnp.zeros((), jnp.float32)), (images, labels, rngs)
            )
            return state, loss

        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            stacked = NamedSharding(self.mesh, P(None, "data"))  # (steps, batch, ...)
            in_shardings = (None, stacked, stacked, None)
            return jax.jit(multi_step, donate_argnums=(0,), in_shardings=in_shardings)
        return jax.jit(multi_step, donate_argnums=(0,))

    def make_eval_step(self) -> Callable:
        def eval_step(state: TrainState, images):
            self._register_mesh()
            out = self.model.apply(state.as_variables(), images.astype(self.compute_dtype), train=False)
            return jax.nn.softmax(out.astype(jnp.float32), axis=-1)

        if self.mesh is not None:
            # Params inherit their own shardings (replicated for DP, 'model'-axis
            # sharded under TP) exactly like make_train_step — pinning them
            # replicated here would re-gather TP-sharded attention weights.
            return jax.jit(eval_step, in_shardings=(None, batch_sharding(self.mesh)),
                           out_shardings=batch_sharding(self.mesh))
        return jax.jit(eval_step)

    def make_multi_eval_step(self, n_chunks: int) -> Callable:
        """One dispatch runs ``n_chunks`` forward chunks (stacked on a leading axis)
        via ``lax.scan`` — amortizes host dispatch latency for eval/volume inference
        the same way ``make_multi_step`` does for training."""

        def multi_eval(state: TrainState, images):
            self._register_mesh()

            def body(_, im):
                out = self.model.apply(state.as_variables(), im.astype(self.compute_dtype), train=False)
                return None, jnp.argmax(out, axis=-1).astype(jnp.uint8)

            _, preds = jax.lax.scan(body, None, images)
            return preds

        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            stacked = NamedSharding(self.mesh, P(None, "data"))
            return jax.jit(multi_eval, in_shardings=(None, stacked), out_shardings=stacked)
        return jax.jit(multi_eval)

    @property
    def train_step(self):
        if self._train_step is None:
            self._train_step = self.make_train_step()
        return self._train_step

    @property
    def eval_step(self):
        if self._eval_step is None:
            self._eval_step = self.make_eval_step()
        return self._eval_step
