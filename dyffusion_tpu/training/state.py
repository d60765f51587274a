"""Train state: params + EMA + optimizer state + rng + step, as one pytree.

Replaces the reference's scattered Lightning state (module params, ``LitEma``
buffers, optimizer state, global step; ``_base_experiment.py:97-135,262-277``)
with a single immutable flax.struct dataclass — the unit of checkpointing
(orbax) and of sharding (replicated over the data mesh axis).
"""
from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct

Params = Any


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Params
    model_state: Params  # non-param variable collections (e.g. batch_stats); {} if none
    ema_params: Optional[Params]
    ema_num_updates: jnp.ndarray
    opt_state: optax.OptState
    rng: jax.Array

    # static (not traced)
    tx: optax.GradientTransformation = struct.field(pytree_node=False)
    use_ema: bool = struct.field(pytree_node=False, default=True)
    ema_decay: float = struct.field(pytree_node=False, default=0.9999)
    # trainer.fold_accumulation_into_batch: how many accumulation
    # micro-batches one apply_gradients call represents (1 = unfolded). The
    # unfolded run updates the EMA once per MICRO-batch (Lightning's
    # on_train_batch_end cadence — k-1 updates against unchanged params,
    # then one against the freshly-stepped params) and counts `step` per
    # micro-batch; a folded step replays exactly that (k-1 stale-params EMA
    # updates + 1 fresh) and advances `step` by k, so folded and unfolded
    # runs produce IDENTICAL EMA trajectories and step units
    # (tests/test_fold_accumulation.py).
    fold_factor: int = struct.field(pytree_node=False, default=1)

    @classmethod
    def create(
        cls,
        params: Params,
        tx: optax.GradientTransformation,
        rng: jax.Array,
        model_state: Optional[Params] = None,
        use_ema: bool = True,
        ema_decay: float = 0.9999,
        fold_factor: int = 1,
    ) -> "TrainState":
        from dyffusion_tpu.training.ema import init_ema

        return cls(
            step=jnp.zeros((), jnp.int32),
            params=params,
            model_state=model_state or {},
            ema_params=init_ema(params) if use_ema else None,
            ema_num_updates=jnp.zeros((), jnp.int32),
            opt_state=tx.init(params),
            rng=rng,
            tx=tx,
            use_ema=use_ema,
            ema_decay=ema_decay,
            fold_factor=fold_factor,
        )

    def apply_gradients(self, grads: Params, model_state_updates: Optional[Params] = None) -> "TrainState":
        from dyffusion_tpu.training.ema import ema_update

        updates, new_opt_state = self.tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        if self.use_ema:
            new_ema, new_n = self.ema_params, self.ema_num_updates
            # folded accumulation: replay the k-1 micro-batch EMA updates the
            # unfolded run performs against the not-yet-stepped params (the
            # warmup decay advances per update, so the loop is not one
            # power-of-decay update); unrolled — fold factors are tiny (<=4)
            for _ in range(self.fold_factor - 1):
                new_ema, new_n = ema_update(new_ema, self.params, new_n, self.ema_decay)
            new_ema, new_n = ema_update(new_ema, new_params, new_n, self.ema_decay)
        else:
            new_ema, new_n = self.ema_params, self.ema_num_updates
        return self.replace(
            # step counts MICRO-batches in every layout, so max_steps, resume
            # counters and logging cadence keep one unit under folding
            step=self.step + self.fold_factor,
            params=new_params,
            model_state=model_state_updates if model_state_updates is not None else self.model_state,
            ema_params=new_ema,
            ema_num_updates=new_n,
            opt_state=new_opt_state,
        )

    @property
    def eval_params(self) -> Params:
        """Parameters to evaluate with: EMA shadow if enabled (the functional
        form of the reference's ``ema_scope``, ``_base_experiment.py:262-277``)."""
        return self.ema_params if self.use_ema else self.params

    def eval_variables(self) -> dict:
        """Full variables dict for apply-fns at eval time."""
        return {"params": self.eval_params, **self.model_state}

    def train_variables(self) -> dict:
        return {"params": self.params, **self.model_state}
