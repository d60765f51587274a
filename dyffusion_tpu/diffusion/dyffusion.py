"""DYffusion: dynamics-informed diffusion, TPU-native.

Re-implements the capabilities of the reference's core contribution
(``src/diffusion/dyffusion.py:17-567``) as pure functions over JAX arrays:

- diffusion-step -> interpolation-step mapping with the ``linear`` and
  ``before_t1_only`` schedules incl. k auxiliary steps (ref ``:44-138``),
- the sampling-schedule DSL (``only_dynamics``, ``only_dynamics_plusN`` /
  ``_discrete``, ``everyN``, ``firstN``/``firstFLOAT``; ref ``:246-333``),
- cold/naive sampling (ref ``sample_loop :335-426``) as a single
  ``jax.lax.scan`` resident in HBM — no host round-trips per step — with the
  two interpolator calls of each cold step fused into ONE 2B-batch forward,
- refinement of intermediate predictions as one batched interpolator forward
  (ref ``:408-422``),
- the two-term training loss ``p_losses`` (ref ``:496-567``) reformulated with
  static shapes: the interpolator runs on all rows and rows are masked with
  ``where`` instead of boolean indexing.

Design notes (TPU-first):
- All tensors are NHWC; channel-concats act on the last axis.
- The schedule is static: every per-step quantity (s, s_next, interpolation
  times, is-dynamics flags, output slots) is precomputed into arrays that the
  scan consumes, so XLA compiles one fused loop body.
- MC-dropout ensembling is a ``vmap`` over member rng keys (see
  ``sample_ensemble``), replacing the reference's (N*B)-tiled batches
  (``_base_experiment.py:503-538``).
"""
from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

Array = jnp.ndarray
Params = Any

# (params, x, time, condition, dropout_rng) -> prediction.
# ``dropout_rng=None`` means deterministic (no dropout).
ApplyFn = Callable[[Params, Array, Optional[Array], Optional[Array], Optional[jax.Array]], Array]


# --------------------------------------------------------------------------
# Step mapping (ref dyffusion.py:44-138)
# --------------------------------------------------------------------------


@dataclass(frozen=True)
class StepMapping:
    """Static diffusion-step <-> interpolation-step mapping.

    ``num_timesteps`` is the TOTAL number of diffusion steps N (horizon plus
    auxiliary steps). Construct via :meth:`create`.
    """

    schedule: str  # 'linear' | 'before_t1_only'
    horizon: int
    num_timesteps: int
    additional_steps: int  # J: total auxiliary diffusion steps added
    di_to_ti_add: int  # only for 'linear'
    factor: int  # additional_interpolation_steps_factor, only for 'linear'

    @classmethod
    def create(
        cls,
        horizon: int,
        schedule: str = "before_t1_only",
        additional_interpolation_steps: int = 0,
        additional_interpolation_steps_factor: int = 0,
        interpolate_before_t1: bool = False,
    ) -> "StepMapping":
        assert horizon > 1, f"horizon must be > 1, got {horizon}"
        if schedule == "linear":
            assert additional_interpolation_steps == 0, (
                "additional_interpolation_steps must be 0 for the linear schedule"
            )
            if interpolate_before_t1:
                interpolated_steps = horizon - 1
                di_to_ti_add = 0
            else:
                interpolated_steps = horizon - 2
                di_to_ti_add = additional_interpolation_steps_factor
            additional = additional_interpolation_steps_factor * interpolated_steps
            return cls(
                schedule=schedule,
                horizon=horizon,
                num_timesteps=horizon + additional,
                additional_steps=additional,
                di_to_ti_add=di_to_ti_add,
                factor=additional_interpolation_steps_factor,
            )
        elif schedule == "before_t1_only":
            assert additional_interpolation_steps_factor == 0, (
                "additional_interpolation_steps_factor must be 0 for before_t1_only"
            )
            assert interpolate_before_t1, "interpolate_before_t1 must be True for before_t1_only"
            additional = additional_interpolation_steps
            return cls(
                schedule=schedule,
                horizon=horizon,
                num_timesteps=horizon + additional,
                additional_steps=additional,
                di_to_ti_add=0,
                factor=0,
            )
        raise ValueError(f"Invalid schedule: {schedule}")

    # -- mapping ------------------------------------------------------------
    def to_interpolation_step(self, d):
        """d -> i. Works on python scalars, numpy and jnp arrays.

        linear: i = (d + add) / (factor + 1)                       (ref :119)
        before_t1_only: d >= J+1 -> d - J, else d / (J+1)          (ref :126-134)
        """
        if self.schedule == "linear":
            return (d + self.di_to_ti_add) / (self.factor + 1)
        J = self.additional_steps
        if isinstance(d, (int, float)):
            return float(d - J) if d >= J + 1 else d / (J + 1)
        d = jnp.asarray(d, jnp.float32)
        return jnp.where(d >= J + 1, d - J, d / (J + 1))

    def i_of(self, d: Union[int, float]) -> float:
        """Python-scalar version of :meth:`to_interpolation_step`."""
        if self.schedule == "linear":
            return (d + self.di_to_ti_add) / (self.factor + 1)
        J = self.additional_steps
        return float(d - J) if d >= J + 1 else d / (J + 1)

    @property
    def diffusion_steps(self) -> List[int]:
        return list(range(self.num_timesteps))

    @property
    def d_to_i(self) -> Dict[int, float]:
        return {d: self.i_of(d) for d in range(1, self.num_timesteps)}

    @property
    def dynamical_steps(self) -> Dict[int, float]:
        """Diffusion steps whose interpolation step is an integer (ref :72)."""
        return {d: i for d, i in self.d_to_i.items() if float(i).is_integer()}

    @property
    def artificial_interpolation_steps(self) -> Dict[int, float]:
        return {d: i for d, i in self.d_to_i.items() if not float(i).is_integer()}

    def validate(self) -> None:
        """Check float/array agreement of the mapping (ref :76-80)."""
        for d, i in self.d_to_i.items():
            i2 = float(self.to_interpolation_step(jnp.asarray(float(d))))
            assert math.isclose(i, i2, abs_tol=4e-6), f"d={d}: {i} != {i2}"


# --------------------------------------------------------------------------
# Sampling-schedule DSL (ref dyffusion.py:246-333)
# --------------------------------------------------------------------------


def parse_sampling_schedule(
    schedule: Union[None, str, Sequence[Union[int, float]]],
    mapping: StepMapping,
) -> List[Union[int, float]]:
    """Resolve a sampling-schedule spec into a sorted list of diffusion steps.

    Supported string specs (ref docstring ``:247-260``):
    - ``only_dynamics``              — only the dynamical steps
    - ``only_dynamics_plusN``        — plus N (possibly fractional) steps in [0, h_0)
    - ``only_dynamics_plusN_discrete`` — same but floored to ints
    - ``everyN``                     — every N-th artificial step + dynamical
    - ``firstN`` / ``first0.F``      — first N (or frac) artificial steps + dynamical
    """
    N = mapping.num_timesteps
    if schedule in (None, "None"):
        return list(range(N))
    if not isinstance(schedule, str):
        sched = list(schedule)
    else:
        name = schedule
        base = [0] + list(mapping.dynamical_steps.keys())
        artificial = list(mapping.artificial_interpolation_steps.keys())
        if "only_dynamics" in name:
            if "only_dynamics_plus" in name:
                plus_n = int(name.replace("only_dynamics_plus", "").replace("_discrete", ""))
                sched = list(np.linspace(0, base[1], plus_n + 1, endpoint=False))
                if "_discrete" in name:
                    sched = [int(np.floor(s)) for s in sched]
            else:
                assert name == "only_dynamics", f"Invalid sampling schedule: {name}"
                sched = []
        elif name.startswith("every"):
            n = int(name.replace("every", "").replace("th", "").replace("nd", "").replace("rd", ""))
            assert 1 <= n <= N, f"Invalid sampling schedule: {name}"
            sched = artificial[::n]
        elif name.startswith("first"):
            first_n = float(name.replace("first", "").replace("v2", ""))
            if first_n < 1:
                assert 0 < first_n < 1, f"Invalid sampling schedule: {name}"
                first_n = int(np.ceil(first_n * len(artificial)))
            else:
                assert float(first_n).is_integer(), f"firstN with N>=1 must be an integer: {first_n}"
                assert 1 <= first_n <= N, f"Invalid sampling schedule: {name}"
            sched = artificial[: int(first_n)]
        else:
            raise ValueError(f"Invalid sampling schedule: ``{name}``")
        sched = sorted(set(sched + base))

    assert 1 <= sched[-1] <= N, f"Invalid sampling schedule end: {sched}"
    if sched[0] != 0:
        sched = [0] + sched
    for a, b in zip(sched, sched[1:]):
        assert b > a, f"Sampling schedule not strictly increasing: {sched}"
    if all(float(s).is_integer() for s in sched):
        sched = [int(s) for s in sched]
    return sched


# --------------------------------------------------------------------------
# Engine config
# --------------------------------------------------------------------------


@dataclass(frozen=True)
class DyffusionConfig:
    """Hyperparameters of the DYffusion engine (ref ``dyffusion.py:18-35,448-458``)."""

    timesteps: int  # == horizon of the data / interpolator
    forward_conditioning: str = "data"  # 'data' | 'none' | 'data+noise'
    schedule: str = "before_t1_only"  # step-mapping schedule
    additional_interpolation_steps: int = 0
    additional_interpolation_steps_factor: int = 0
    interpolate_before_t1: bool = True
    sampling_type: str = "cold"  # 'cold' | 'naive'
    sampling_schedule: Union[None, str, Tuple[float, ...]] = None
    time_encoding: str = "dynamics"  # 'discrete' | 'normalized' | 'dynamics'
    refine_intermediate_predictions: bool = False
    prediction_timesteps: Optional[Tuple[float, ...]] = None
    enable_interpolator_dropout: bool = True
    use_cold_sampling_for_last_step: bool = False
    lambda_reconstruction: float = 1.0
    lambda_reconstruction2: float = 0.0
    num_input_channels: int = 1  # C of a single dynamics frame (for x_s init slice)
    scan_unroll: int = 1  # lax.scan unroll factor for the sampler body
    # mixed-precision TRAINING lever: run the frozen interpolator's forwards
    # inside p_losses in bf16 (params + inputs cast per call, outputs back to
    # f32; forecaster + loss + grads stay f32). The first q_sample carries no
    # gradient at all (pure data path); the λ2 q_sample backprops through its
    # INPUT in bf16 — the same autocast boundary Lightning precision=16 would
    # use on the ref's frozen interpolator (``dyffusion.py:496-567``).
    train_interpolator_dtype: Optional[str] = None  # None | 'bfloat16'

    def __post_init__(self):
        assert self.forward_conditioning in ("data", "none", "data+noise")
        assert self.sampling_type in ("cold", "naive")
        assert self.time_encoding in ("discrete", "normalized", "dynamics")


@dataclass(frozen=True)
class _SampleSteps:
    """Precomputed static per-step arrays consumed by the sampling scan."""

    s: np.ndarray  # (K-1,) float32 — all schedule steps except the last
    i_next: np.ndarray  # (K-1,) float32 — interpolation time of s_next
    i_cur: np.ndarray  # (K-1,) float32 — interpolation time of s (clamped at s=0)
    s_pos: np.ndarray  # (K-1,) float32 — 1.0 where s > 0 (cold second q_sample)
    is_dyn: np.ndarray  # (K-1,) bool — records a dynamical output this step
    slot: np.ndarray  # (K-1,) int32 — output slot (junk slot when not is_dyn)
    last_s: float  # final schedule step
    last_is_N_minus_1: bool
    n_outputs: int  # number of dynamical outputs (== horizon for full schedules)


class DyffusionEngine:
    """Stateless DYffusion engine over a forecaster and a (frozen) interpolator.

    Args:
        config: engine hyperparameters.
        forecaster_apply: ``(params, x, time, condition, rng) -> x_last_pred``.
        interpolator_apply: ``(params, x, time, condition, rng) -> x_i`` where
            ``x = concat([initial_condition, x_last], axis=-1)`` (the engine
            performs this concat; ref ``:480-494``).
        interpolator_horizon: horizon the interpolator was trained with; must
            equal ``i(N-1) + 1`` (ref ``:472-478``).
        criterion: loss fn ``(preds, targets, mask=None) -> scalar``.
    """

    def __init__(
        self,
        config: DyffusionConfig,
        forecaster_apply: ApplyFn,
        interpolator_apply: ApplyFn,
        interpolator_horizon: Optional[int] = None,
        criterion: Optional[Callable] = None,
        forecaster_train_apply: Optional[Callable] = None,
    ):
        from dyffusion_tpu.utils.loss import mse_loss

        self.cfg = config
        self.forecaster_apply = forecaster_apply
        # train-mode apply returning (out, non-param-state updates); used for
        # the first forecaster call of p_losses so BatchNorm running stats
        # keep updating during stage-2 training (torch trains the forecaster
        # module in train mode). Defaults to the inference apply.
        self.forecaster_train_apply = forecaster_train_apply
        self.interpolator_apply = interpolator_apply
        self.criterion = criterion or mse_loss
        self.mapping = StepMapping.create(
            horizon=config.timesteps,
            schedule=config.schedule,
            additional_interpolation_steps=config.additional_interpolation_steps,
            additional_interpolation_steps_factor=config.additional_interpolation_steps_factor,
            interpolate_before_t1=config.interpolate_before_t1,
        )
        self.num_timesteps = self.mapping.num_timesteps
        ih = interpolator_horizon
        last_i = self.mapping.i_of(self.num_timesteps - 1)
        if ih is not None and ih != last_i + 1:
            raise ValueError(
                f"interpolator horizon {ih} must equal the last interpolation step + 1 = {last_i + 1}"
            )
        self.sampling_schedule = parse_sampling_schedule(config.sampling_schedule, self.mapping)
        self._steps = self._precompute_steps(self.sampling_schedule)
        # valid interpolation-time range for clamping masked compute
        self._i_min = self.mapping.i_of(1) if self.mapping.i_of(1) > 0 else 1e-3
        self._i_max = float(last_i)

    # ------------------------------------------------------------------
    # static schedule precomputation
    # ------------------------------------------------------------------
    def _precompute_steps(self, sched: List[Union[int, float]]) -> _SampleSteps:
        N = self.num_timesteps
        mp = self.mapping
        last_is_full = sched[-1] == N - 1
        # steps run in the scan: all but the last schedule element
        body = sched[:-1]
        s_next = sched[1:]
        i_next, i_cur, is_dyn, slot, s_pos = [], [], [], [], []
        n_outputs = mp.horizon  # t1..th slots 0..h-1 (th written by the peeled last step)
        for s, sn in zip(body, s_next):
            ti_n = mp.i_of(sn)
            dyn = float(ti_n).is_integer()
            i_next.append(ti_n)
            i_cur.append(np.clip(mp.i_of(s) if s > 0 else mp.i_of(max(s, 1)), 1e-6, None))
            s_pos.append(1.0 if s > 0 else 0.0)
            is_dyn.append(dyn)
            slot.append(int(ti_n) - 1 if dyn else n_outputs)  # junk slot = n_outputs
        return _SampleSteps(
            s=np.asarray(body, np.float32),
            i_next=np.asarray(i_next, np.float32),
            i_cur=np.asarray(i_cur, np.float32),
            s_pos=np.asarray(s_pos, np.float32),
            is_dyn=np.asarray(is_dyn, bool),
            slot=np.asarray(slot, np.int32),
            last_s=float(sched[-1]),
            last_is_N_minus_1=last_is_full,
            n_outputs=n_outputs,
        )

    # ------------------------------------------------------------------
    # building blocks
    # ------------------------------------------------------------------
    def _encode_time(self, t: Array) -> Array:
        """Forecaster time encoding (ref ``_predict_last_dynamics :192-203``)."""
        enc = self.cfg.time_encoding
        if enc == "discrete":
            return t
        if enc == "normalized":
            return t / self.num_timesteps
        return self.mapping.to_interpolation_step(t)

    def _forward_condition(self, condition: Optional[Array], t: Array, rng: Optional[jax.Array]) -> Optional[Array]:
        """Apply ``forward_conditioning`` (ref ``predict_x_last :205-239``)."""
        mode = self.cfg.forward_conditioning
        if mode == "none" or condition is None:
            return None
        if mode == "data":
            return condition
        # data+noise: blend condition with N(0,1) noise by t/(N-1)
        tfac = (t / (self.num_timesteps - 1)).reshape((-1,) + (1,) * (condition.ndim - 1))
        noise = jax.random.normal(rng, condition.shape, condition.dtype)
        return tfac * condition + (1.0 - tfac) * noise

    def predict_x_last(
        self,
        fc_params: Params,
        condition: Optional[Array],
        x_t: Array,
        t: Array,
        static_condition: Optional[Array] = None,
        dropout_rng: Optional[jax.Array] = None,
        noise_rng: Optional[jax.Array] = None,
    ) -> Array:
        """Forecaster forward F(x_t, t) with conditioning (ref ``:205-239``)."""
        fcond = self._forward_condition(condition, t, noise_rng)
        if static_condition is not None:
            fcond = static_condition if fcond is None else jnp.concatenate([fcond, static_condition], axis=-1)
        time = self._encode_time(t)
        return self.forecaster_apply(fc_params, x_t, time, fcond, dropout_rng)

    def interpolate(
        self,
        ip_params: Params,
        initial_condition: Array,
        x_last: Array,
        interpolation_time: Array,
        static_condition: Optional[Array] = None,
        dropout_rng: Optional[jax.Array] = None,
    ) -> Array:
        """Stochastic interpolator I(x0, x_h, i) (ref ``_interpolate :480-494``).

        ``interpolation_time`` is already in interpolation units (use
        :meth:`q_sample` to pass diffusion steps). Dropout rng should be live
        (MC-dropout forced on; ref ``q_sample :140-163``).
        """
        inputs = jnp.concatenate([initial_condition, x_last], axis=-1)
        return self.interpolator_apply(ip_params, inputs, interpolation_time, static_condition, dropout_rng)

    def q_sample(
        self,
        ip_params: Params,
        x0: Array,
        x_end: Array,
        t: Array,
        static_condition: Optional[Array] = None,
        dropout_rng: Optional[jax.Array] = None,
    ) -> Array:
        """Forward process = the stochastic interpolator at i(t) (ref ``:140-163``).

        Note the naming flip: ``x0`` is the LAST dynamical frame (diffusion's
        x0), ``x_end`` the initial condition.
        """
        i_t = jnp.clip(self.mapping.to_interpolation_step(t), self._i_min, self._i_max)
        return self.interpolate(ip_params, x_end, x0, i_t, static_condition, dropout_rng)

    # ------------------------------------------------------------------
    # training loss (ref p_losses :496-567)
    # ------------------------------------------------------------------
    def p_losses(
        self,
        fc_params: Params,
        ip_params: Params,
        rng: jax.Array,
        xt_last: Array,
        condition: Array,
        t: Array,
        static_condition: Optional[Array] = None,
    ) -> Tuple[Array, Dict[str, Array]]:
        """Two-term DYffusion loss for a batch with per-row diffusion steps ``t``.

        λ1·‖F(x_t,t)−x_h‖ + λ2·‖F(D(F(x_t,t),t+1),t+1)−x_h‖ where D is the
        frozen interpolator. Static-shape version of ref ``:496-567``: rows
        with t==0 use the raw condition (interpolator output masked out), and
        the λ2 term is masked over rows with t > N-2.
        """
        cfg = self.cfg
        lam1, lam2 = cfg.lambda_reconstruction, cfg.lambda_reconstruction2
        if condition.shape[-1] != xt_last.shape[-1]:
            # The reference breaks identically for window>1 training: ref
            # ``dyffusion.py:513-527`` assigns the C-channel interpolator
            # output into the (window*C)-channel condition clone, which
            # errors for C>1 and silently broadcasts for C==1. Fail loudly
            # instead of tracing a silently-wrong jnp.where broadcast.
            raise ValueError(
                "DYffusion training requires a single-frame condition "
                f"(datamodule.window=1): condition has {condition.shape[-1]} "
                f"channels but the target frame has {xt_last.shape[-1]}."
            )
        k_ip1, k_fc1, k_n1, k_ip2, k_fc2, k_n2 = jax.random.split(rng, 6)
        # interpolator dropout is always on during training (ref q_sample :154:
        # ``do_enable = self.training or self.enable_interpolator_dropout``)
        ip_rng1 = k_ip1

        # frozen-interpolator mixed precision (train_interpolator_dtype)
        ip_dt = (
            jnp.bfloat16
            if cfg.train_interpolator_dtype in ("bfloat16", "bf16")
            else None
        )
        if ip_dt is not None:
            ip_params_run = jax.tree_util.tree_map(
                lambda x: x.astype(ip_dt)
                if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating)
                else x,
                ip_params,
            )
            sc_run = None if static_condition is None else static_condition.astype(ip_dt)
        else:
            ip_params_run, sc_run = ip_params, static_condition

        def run_q_sample(x0, x_end, t_q, key):
            """q_sample at the engine's interpolator precision; f32 out."""
            if ip_dt is None:
                return self.q_sample(
                    ip_params, x0=x0, x_end=x_end, t=t_q,
                    static_condition=static_condition, dropout_rng=key,
                )
            out = self.q_sample(
                ip_params_run, x0=x0.astype(ip_dt), x_end=x_end.astype(ip_dt),
                t=t_q, static_condition=sc_run, dropout_rng=key,
            )
            return out.astype(jnp.float32)

        t = t.astype(jnp.float32)
        # 1) build forecaster inputs: x_t = interpolated frame for t>0, condition for t==0
        t_safe = jnp.maximum(t, 1.0)
        x_interpolated = run_q_sample(xt_last, condition, t_safe, ip_rng1)
        nonzero = (t > 0).reshape((-1,) + (1,) * (condition.ndim - 1))
        x_t = jnp.where(nonzero, x_interpolated.astype(condition.dtype), condition)

        # 2) forward loss (train-mode forecaster apply when provided, so
        #    BatchNorm stats update)
        updates = {}
        if self.forecaster_train_apply is not None:
            fcond = self._forward_condition(condition, t, k_n1)
            if static_condition is not None:
                fcond = static_condition if fcond is None else jnp.concatenate(
                    [fcond, static_condition], axis=-1
                )
            xt_last_pred, updates = self.forecaster_train_apply(
                fc_params, x_t, self._encode_time(t), fcond, k_fc1
            )
        else:
            xt_last_pred = self.predict_x_last(
                fc_params, condition, x_t, t, static_condition, dropout_rng=k_fc1, noise_rng=k_n1
            )
        loss_forward = self.criterion(xt_last_pred, xt_last)

        # 3) one-step diffusion-emulation loss (λ2 term)
        if lam2 > 0:
            mask2 = (t <= self.num_timesteps - 2).astype(jnp.float32)
            t2 = jnp.minimum(t + 1.0, float(self.num_timesteps - 1))
            x_interpolated2 = run_q_sample(xt_last_pred, condition, t2, k_ip2)
            x_last_pred2 = self.predict_x_last(
                fc_params, condition, x_interpolated2, t2, static_condition,
                dropout_rng=k_fc2, noise_rng=k_n2,
            )
            loss_forward2 = self.criterion(x_last_pred2, xt_last, mask=mask2)
        else:
            loss_forward2 = jnp.zeros((), loss_forward.dtype)

        loss = lam1 * loss_forward + lam2 * loss_forward2
        aux = {"loss": loss, "loss_forward": loss_forward, "loss_forward2": loss_forward2}
        if updates:
            aux["_model_state_updates"] = updates
        return loss, aux

    def loss(
        self,
        fc_params: Params,
        ip_params: Params,
        rng: jax.Array,
        xt_last: Array,
        condition: Array,
        static_condition: Optional[Array] = None,
    ) -> Tuple[Array, Dict[str, Array]]:
        """Sample t ~ U{0..N-1} per row and compute :meth:`p_losses`
        (ref ``_base_diffusion.py:81-106``)."""
        rng_t, rng_loss = jax.random.split(rng)
        t = jax.random.randint(rng_t, (condition.shape[0],), 0, self.num_timesteps)
        return self.p_losses(fc_params, ip_params, rng_loss, xt_last, condition, t, static_condition)

    # ------------------------------------------------------------------
    # sampling (ref sample_loop :335-426) — one lax.scan, no host round-trips
    # ------------------------------------------------------------------
    def sample(
        self,
        fc_params: Params,
        ip_params: Params,
        rng: jax.Array,
        initial_condition: Array,
        static_condition: Optional[Array] = None,
    ) -> Array:
        """Run the full sampler for one ensemble member.

        Args:
            initial_condition: (B, H, W, window*C) window-stacked condition.
        Returns:
            (B, h, H, W, C) array of the h dynamical predictions t1..th.
        """
        cfg = self.cfg
        st = self._steps
        mp = self.mapping
        B = initial_condition.shape[0]
        C = cfg.num_input_channels
        x_s0 = initial_condition[..., -C:]
        n_body = len(st.s)
        cold = cfg.sampling_type == "cold"

        # per-step rng keys derived by fold_in (static schedule => static count)
        base_rng = rng

        ipol_dropout = cfg.enable_interpolator_dropout

        def step_rngs(j, n=3):
            k = jax.random.fold_in(base_rng, j)
            return jax.random.split(k, n)

        # outputs buffer with one junk slot at index n_outputs
        out0 = jnp.zeros((st.n_outputs + 1, B) + x_s0.shape[1:], x_s0.dtype)

        xs = (
            jnp.asarray(st.s),
            jnp.asarray(st.i_next),
            jnp.asarray(st.i_cur),
            jnp.asarray(st.s_pos),
            jnp.asarray(st.is_dyn),
            jnp.asarray(st.slot),
            jnp.arange(n_body),
        )

        def body(carry, inp):
            x_s, out = carry
            s, i_next, i_cur, s_pos, is_dyn, slot, j = inp
            k_ip, k_fc_noise, _ = step_rngs(j)
            t_b = jnp.full((B,), s, jnp.float32)
            x0_hat = self.predict_x_last(
                fc_params, initial_condition, x_s, t_b,
                static_condition, dropout_rng=None, noise_rng=k_fc_noise,
            )
            ip_rng = k_ip if ipol_dropout else None
            if cold:
                # fused 2B-batch interpolator call for i_next and i_cur
                ic2 = jnp.concatenate([initial_condition, initial_condition], axis=0)
                x02 = jnp.concatenate([x0_hat, x0_hat], axis=0)
                t2 = jnp.concatenate([jnp.full((B,), i_next), jnp.full((B,), i_cur)])
                sc2 = None if static_condition is None else jnp.concatenate(
                    [static_condition, static_condition], axis=0
                )
                x_pair = self.interpolate(ip_params, ic2, x02, t2, sc2, dropout_rng=ip_rng)
                x_ip_next, x_ip_cur = x_pair[:B], x_pair[B:]
                # for s == 0 the "current" interpolation is x_s itself (ref :386-388)
                x_ip_cur = s_pos * x_ip_cur + (1.0 - s_pos) * x_s
                x_new = x_s - x_ip_cur + x_ip_next
            else:
                t_next_b = jnp.full((B,), i_next)
                x_new = self.interpolate(
                    ip_params, initial_condition, x0_hat, t_next_b, static_condition, dropout_rng=ip_rng
                )
            x_new = x_new.astype(out.dtype)  # keep low-precision path consistent
            write_slot = jnp.where(is_dyn, slot, st.n_outputs)
            out = jax.lax.dynamic_update_index_in_dim(out, x_new, write_slot, 0)
            return (x_new, out), None

        (x_s, out), _ = jax.lax.scan(body, (x_s0, out0), xs, unroll=cfg.scan_unroll)

        # ---- peeled final step (s = last schedule element) ----
        k_ip, k_fc_noise, k_ref = step_rngs(n_body)
        s_last = st.last_s
        t_b = jnp.full((B,), s_last, jnp.float32)
        x0_hat = self.predict_x_last(
            fc_params, initial_condition, x_s, t_b, static_condition,
            dropout_rng=None, noise_rng=k_fc_noise,
        )
        if st.last_is_N_minus_1:
            if cold and cfg.use_cold_sampling_for_last_step:
                i_last = jnp.full((B,), mp.i_of(int(s_last)), jnp.float32)
                x_ip_cur = self.interpolate(
                    ip_params, initial_condition, x0_hat, i_last, static_condition,
                    dropout_rng=k_ip if ipol_dropout else None,
                )
                x_final = x_s - x_ip_cur + x0_hat
            else:
                x_final = x0_hat
            out = jax.lax.dynamic_update_index_in_dim(out, x_final.astype(out.dtype), mp.horizon - 1, 0)
        # early-stopped schedules (last < N-1): the carry already holds the
        # latest dynamical estimate; outputs past it stay zero (ref :424-426).

        # ---- refinement of intermediate predictions (ref :408-422) ----
        if cfg.refine_intermediate_predictions:
            dyn_times = list(cfg.prediction_timesteps or mp.dynamical_steps.values())
            dyn_times = [i for i in dyn_times if i < self.num_timesteps and i < mp.horizon]
            if dyn_times:
                # sequential scan over refined times at batch B each — one
                # giant (n_i*B) batch OOMs on large backbones (the NS
                # unet_simple works at 256x256 internally), and the refine
                # pass is a negligible fraction of sampler time anyway
                def refine_one(i, t_and_key):
                    t_val, j = t_and_key
                    t_b = jnp.full((B,), t_val)
                    r = self.interpolate(
                        ip_params, initial_condition, x0_hat, t_b, static_condition,
                        dropout_rng=jax.random.fold_in(k_ref, j) if ipol_dropout else None,
                    )
                    return i, r

                times_arr = jnp.asarray(dyn_times, jnp.float32)
                _, refined = jax.lax.scan(
                    refine_one, 0, (times_arr, jnp.arange(len(dyn_times)))
                )
                refined = refined.astype(out.dtype)  # (n_i, B, ...)
                for idx, i_n in enumerate(dyn_times):
                    if float(i_n).is_integer():
                        out = out.at[int(i_n) - 1].set(refined[idx])

        preds = out[: st.n_outputs]  # (h, B, H, W, C)
        return jnp.moveaxis(preds, 0, 1)  # (B, h, H, W, C)

    def sample_at_times(
        self,
        fc_params: Params,
        ip_params: Params,
        rng: jax.Array,
        initial_condition: Array,
        times: Sequence[float],
        static_condition: Optional[Array] = None,
    ) -> Tuple[Array, Array]:
        """Predictions at arbitrary (possibly fractional) dynamical times.

        Runs the full sampler, then one batched interpolator forward from the
        final x-last estimate at each requested time in (0, horizon) — the
        mechanism behind the reference's fractional ``prediction_timesteps``
        (ref ``sample_loop`` refine pass ``:408-422`` with
        ``hparams.prediction_timesteps``).

        Returns:
            (dyn_preds (B, h, ...), time_preds (B, len(times), ...)).
        """
        preds = self.sample(fc_params, ip_params, rng, initial_condition, static_condition)
        x_last = preds[:, -1]
        B = initial_condition.shape[0]
        n_i = len(times)
        ic_r = jnp.tile(initial_condition, (n_i,) + (1,) * (initial_condition.ndim - 1))
        x0_r = jnp.tile(x_last, (n_i,) + (1,) * (x_last.ndim - 1))
        t_r = jnp.repeat(jnp.asarray(times, jnp.float32), B)
        sc_r = None if static_condition is None else jnp.tile(
            static_condition, (n_i,) + (1,) * (static_condition.ndim - 1)
        )
        k_ref = jax.random.fold_in(rng, 987654)
        refined = self.interpolate(
            ip_params, ic_r, x0_r, t_r, sc_r,
            dropout_rng=k_ref if self.cfg.enable_interpolator_dropout else None,
        )
        refined = refined.reshape((n_i, B) + refined.shape[1:])
        return preds, jnp.moveaxis(refined, 0, 1)

    def sample_ensemble(
        self,
        fc_params: Params,
        ip_params: Params,
        rng: jax.Array,
        initial_condition: Array,
        static_condition: Optional[Array] = None,
        num_predictions: int = 1,
        inputs_noise: float = 0.0,
    ) -> Array:
        """vmapped MC-dropout ensemble of :meth:`sample`.

        Returns (N, B, h, H, W, C). Replaces the reference's ensemble-input
        tiling (``_base_experiment.py:503-538``) with a member-axis vmap; the
        optional ``inputs_noise`` perturbation (ref ``:522-529``) is applied
        per member inside the vmap.
        """
        member_keys = jax.random.split(rng, num_predictions)

        def one_member(key):
            if inputs_noise > 0.0:
                k_noise, key = jax.random.split(key)
                ic = initial_condition + inputs_noise * jax.random.normal(
                    k_noise, initial_condition.shape, initial_condition.dtype
                )
            else:
                ic = initial_condition
            return self.sample(fc_params, ip_params, key, ic, static_condition)

        return jax.vmap(one_member)(member_keys)
