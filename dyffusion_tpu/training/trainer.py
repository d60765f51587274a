"""The trainer: jitted train/eval steps, metric aggregation, ckpt, resume.

Replaces the reference's PyTorch-Lightning loop (``pl.Trainer.fit`` +
``BaseExperiment.training_step/validation_step``,
``src/experiment_types/_base_experiment.py:391-712``) with an explicit
functional loop:

- ONE jitted ``train_step`` (value_and_grad over params, optax update, EMA
  update) with donated state — params/opt/EMA stay resident in HBM;
- an ensemble eval loop whose per-batch work (sampler + MC-dropout members)
  is a single jitted function; epoch-end CRPS/SSR/MSE aggregation mirrors
  ``_eval_ensemble_predictions`` (``:617-640``);
- best-by-monitor + last checkpointing, resume, and step/epoch wall-clock
  telemetry (``time/train/step`` etc., ref ``:453-465``).

Data parallelism: params replicated, batch sharded over the 'data' mesh axis
via ``dyffusion_tpu.parallel`` (jit + sharding constraints — XLA inserts the
gradient all-reduce).
"""
from __future__ import annotations

import time
from collections import defaultdict
from typing import Any, Callable, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from dyffusion_tpu.training.checkpoint import CheckpointManager
from dyffusion_tpu.training.state import TrainState
from dyffusion_tpu.utils.evaluation import evaluate_ensemble_prediction


def make_train_step(loss_fn: Callable, grad_clip_metrics: bool = True):
    """Build the jitted train step.

    ``loss_fn(variables, batch, rng) -> (loss, (metrics, model_state_updates))``
    where variables = {'params': ..., **model_state}; differentiation is wrt
    the 'params' leaf only (the frozen interpolator and batch stats are not
    touched — the functional analogue of ``requires_grad=False`` +
    strip-interpolator-keys, ref ``forecasting_multi_horizon.py:422-424``).
    """

    def train_step(state: TrainState, batch):
        rng, step_rng = jax.random.split(state.rng)

        def wrapped(params):
            variables = {"params": params, **state.model_state}
            loss, (metrics, updates) = loss_fn(variables, batch, step_rng)
            return loss, (metrics, updates)

        (loss, (metrics, updates)), grads = jax.value_and_grad(wrapped, has_aux=True)(state.params)
        new_state = state.apply_gradients(grads, model_state_updates=updates or None).replace(rng=rng)
        if grad_clip_metrics:
            leaves = jax.tree_util.tree_leaves(grads)
            gnorm = jnp.sqrt(sum(jnp.sum(g.astype(jnp.float32) ** 2) for g in leaves))
            # zero-gradient fraction diagnostic (ref _base_experiment.py:449-452)
            n_zero = sum(jnp.sum(g == 0).astype(jnp.float32) for g in leaves)
            n_total = sum(g.size for g in leaves)
            metrics = {**metrics, "grad_norm": gnorm, "zero_grad_frac": n_zero / n_total}
        return new_state, metrics

    return jax.jit(train_step, donate_argnums=(0,))


class Trainer:
    """Minimal functional trainer (the L0/L2 glue of SURVEY.md §1)."""

    def __init__(
        self,
        experiment,
        datamodule,
        state: TrainState,
        loss_fn: Callable,
        eval_fns: Dict[str, Callable],  # split -> eval_fn
        run_dir: str,
        max_epochs: int = 10,
        max_steps: Optional[int] = None,
        seed: int = 0,
        monitor: Optional[str] = None,
        monitor_mode: str = "min",
        val_every_n_epochs: int = 1,
        save_checkpoints: bool = True,
        log_fn: Optional[Callable[[Dict[str, float], int], None]] = None,
        early_stopping_patience: Optional[int] = None,
    ):
        self.experiment = experiment
        self.datamodule = datamodule
        self.state = state
        self.train_step = make_train_step(loss_fn)
        self.eval_fns = {k: jax.jit(v) for k, v in eval_fns.items()}
        self.max_epochs = max_epochs
        self.max_steps = max_steps
        self.seed = seed
        self.monitor = monitor or experiment.monitor
        self.val_every_n_epochs = val_every_n_epochs
        self.save_checkpoints = save_checkpoints
        self.log_fn = log_fn or (lambda metrics, step: None)
        self.ckpt = CheckpointManager(run_dir, self.monitor, monitor_mode) if save_checkpoints else None
        self.history: List[Dict[str, float]] = []
        self._np_rng = np.random.default_rng(seed)
        # early stopping on the monitored metric (ref configs/callbacks
        # early_stopping, e.g. OISST patience=10)
        self.early_stopping_patience = early_stopping_patience
        self._epochs_without_improvement = 0
        self.monitor_mode = monitor_mode

    # ------------------------------------------------------------------
    def _state_tree(self):
        s = self.state
        return {
            "step": s.step,
            "params": s.params,
            "model_state": s.model_state,
            "ema_params": s.ema_params,
            "ema_num_updates": s.ema_num_updates,
            "opt_state": s.opt_state,
            "rng": jax.random.key_data(s.rng),
        }

    def _load_state_tree(self, tree):
        self.state = self.state.replace(
            step=jnp.asarray(tree["step"]),
            params=tree["params"],
            model_state=tree["model_state"],
            ema_params=tree["ema_params"],
            ema_num_updates=jnp.asarray(tree["ema_num_updates"]),
            opt_state=tree["opt_state"],
            rng=jax.random.wrap_key_data(jnp.asarray(tree["rng"])),
        )

    def maybe_resume(self, slot: str = "last") -> bool:
        """Resume from 'last' (training) or 'best' (test-mode reload)
        (ref ``train.py:44-69``: last.ckpt on resume, best ckpt for test)."""
        if self.ckpt is None or not self.ckpt.has(slot):
            return False
        tree = self.ckpt.restore(self._state_tree(), slot)
        self._load_state_tree(tree)
        return True

    # ------------------------------------------------------------------
    def fit(self) -> float:
        """Train with periodic validation; returns the best monitored score
        (ref ``run_model`` returning the optimized metric, ``train.py:110-127``)."""
        best = np.nan
        step = int(self.state.step)
        done = False
        def _to_device(batch):
            return {k: jnp.asarray(v) for k, v in batch.items()}

        for epoch in range(self.max_epochs):
            epoch_start = time.time()
            n_batches, loss_sum = 0, 0.0
            # prefetching loader: native batch gather + background device
            # staging, overlapping host assembly with the jitted step
            for batch in self.datamodule.train_loader(rng=self._np_rng, device_put=_to_device):
                t0 = time.time()
                self.state, metrics = self.train_step(self.state, batch)
                loss_sum += float(metrics["loss"])
                n_batches += 1
                step += 1
                if step % 50 == 0:
                    self.log_fn(
                        {"train/loss": float(metrics["loss"]), "time/train/step": time.time() - t0},
                        step,
                    )
                if self.max_steps and step >= self.max_steps:
                    done = True
                    break
            epoch_metrics = {
                "train/loss_epoch": loss_sum / max(n_batches, 1),
                "time/train": time.time() - epoch_start,
                "epoch": epoch,
            }

            if (epoch + 1) % self.val_every_n_epochs == 0 or done or epoch == self.max_epochs - 1:
                val_start = time.time()
                val_metrics = self.evaluate("val")
                epoch_metrics.update(val_metrics)
                epoch_metrics["time/validation"] = time.time() - val_start
                score = val_metrics.get(self.monitor, np.nan)
                improved = False
                if self.ckpt is not None:
                    improved = self.ckpt.save_best_if_improved(self._state_tree(), score, step)
                    self.ckpt.save_last(self._state_tree(), step)
                if np.isfinite(score):
                    prev_best = best
                    best = score if np.isnan(best) else (
                        min(best, score) if self.monitor_mode == "min" else max(best, score)
                    )
                    improved = improved or np.isnan(prev_best) or best != prev_best
                if self.early_stopping_patience is not None:
                    self._epochs_without_improvement = 0 if improved else self._epochs_without_improvement + 1
                    if self._epochs_without_improvement >= self.early_stopping_patience:
                        done = True
            self.history.append(epoch_metrics)
            self.log_fn(epoch_metrics, step)
            if done:
                break
        return float(best) if np.isfinite(best) else float("nan")

    # ------------------------------------------------------------------
    def evaluate(self, split: str = "val", autoregressive: Optional[bool] = None) -> Dict[str, float]:
        """Ensemble evaluation over a split; returns {split/t{i}/mse,
        split/avg/mse, split/crps, split/ssr, split/mse} mirroring the
        reference metric grammar (``_base_experiment.py:609-640``)."""
        eval_fn = self.eval_fns[split]
        batches = {
            "val": self.datamodule.val_batches,
            "test": self.datamodule.test_batches,
            "predict": self.datamodule.predict_batches,
        }[split]()
        eval_rng = jax.random.key(self.seed + {"val": 1, "test": 2, "predict": 3}[split])

        acc: Dict[str, List[np.ndarray]] = defaultdict(list)
        variables = self.state.eval_variables()
        sample_start = time.time()
        for bi, batch in enumerate(batches):
            batch = {k: jnp.asarray(v) for k, v in batch.items()}
            out = eval_fn(variables, batch, jax.random.fold_in(eval_rng, bi))
            for k, v in out.items():
                acc[k].append(np.asarray(v))
        sampling_time = time.time() - sample_start

        # concat over batches: preds on axis 1 (member axis leads), targets axis 0
        results: Dict[str, np.ndarray] = {}
        for k, vs in acc.items():
            axis = 1 if k.endswith("_preds") else 0
            results[k] = np.concatenate(vs, axis=axis)

        metrics: Dict[str, float] = {}
        per_metric_values = defaultdict(list)
        for k in sorted(results):
            if not k.endswith("_preds"):
                continue
            prefix = k[: -len("_preds")]
            tkey = f"{prefix}_targets"
            if tkey not in results:
                continue
            m = evaluate_ensemble_prediction(results[k], results[tkey])
            for name, v in m.items():
                metrics[f"{split}/{prefix}/{name}"] = float(v)
                per_metric_values[name].append(float(v))
        for name, vals in per_metric_values.items():
            metrics[f"{split}/avg/{name}"] = float(np.mean(vals))
        # canonical short names (monitor targets)
        for name in ("crps", "mse", "ssr"):
            if f"{split}/avg/{name}" in metrics:
                metrics[f"{split}/{name}"] = metrics[f"{split}/avg/{name}"]
        # sampler throughput as a first-class metric (SURVEY.md §5.1 / the
        # BASELINE.md north-star quantity): ensemble-member frames per second
        # per chip produced by the eval sampler
        n_frames = sum(
            v.shape[0] * v.shape[1] for k, v in results.items() if k.endswith("_preds")
        )
        if n_frames and sampling_time > 0:
            metrics[f"{split}/frames_per_sec_per_chip"] = n_frames / sampling_time / max(
                1, jax.device_count()
            )
        return metrics

    def test(self) -> Dict[str, float]:
        return self.evaluate("test")
