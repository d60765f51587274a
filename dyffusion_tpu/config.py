"""Config system: experiment presets + dotted overrides.

Capability parity with the reference's Hydra taxonomy (SURVEY.md §5.6): an
experiment preset = dataset x method, composed from dataset and method layers,
overridable from the CLI with ``key.subkey=value`` strings (the semantics of
``python run.py experiment=navier_stokes_dyffusion diffusion.lambda_reconstruction=1``).

No external config framework: plain nested dicts, deep-merged, with a parser
for dotted overrides. Interpolated defaults (e.g. ``diffusion.timesteps:
${datamodule.horizon}``) become explicit resolution in :func:`resolve`.
"""
from __future__ import annotations

import ast
import copy
from typing import Any, Dict, List, Optional, Tuple

# ---------------------------------------------------------------------------
# layers
# ---------------------------------------------------------------------------

_BASE: Dict[str, Any] = {
    "seed": 7,
    "registry_dir": "runs",
    "experiment": None,  # 'interpolation' | 'dyffusion' | 'time_conditioned' | 'simultaneous'
    "datamodule": {"name": "synthetic", "window": 1, "horizon": 8, "batch_size": 16},
    "model": {"name": "unet_resnet", "dim": 32, "with_time_emb": True},
    "diffusion": None,
    "module": {
        "num_predictions": 20,
        "num_predictions_test": 50,
        "prediction_inputs_noise": 0.0,
        "enable_inference_dropout": True,
        "loss_function": "mse",
        "use_ema": False,  # reference default; enable per-run with module.use_ema=true
        "ema_decay": 0.9999,
        "optimizer": {"name": "adamw", "lr": 3e-4, "weight_decay": 1e-5},
        "scheduler": None,
        "monitor": None,
    },
    "trainer": {"max_epochs": 10, "gradient_clip_val": 1.0, "val_every_n_epochs": 1},
}

# dataset layers (ref configs/experiment/{spring_mesh,navier_stokes,oisst_pacific}.yaml)
_DATASETS: Dict[str, Dict[str, Any]] = {
    "synthetic": {
        "datamodule": {"name": "synthetic", "horizon": 8, "window": 1, "batch_size": 16},
        "model": {"name": "unet_resnet", "dim": 32, "dim_mults": [1, 2]},
    },
    "spring_mesh": {
        "datamodule": {
            "name": "physical-systems", "physical_system": "spring-mesh",
            "batch_size": 64, "eval_batch_size": 16, "horizon": 134,
            "prediction_horizon": 804, "window": 1,
        },
        "model": {"name": "cnn_simple", "dim": 64, "net_normalization": "batch_norm"},  # ref model/cnn_simple.yaml:7 dim 64
        "module": {"optimizer": {"name": "adamw", "lr": 4e-4, "weight_decay": 1e-4}},
        "trainer": {"max_epochs": 300, "gradient_clip_val": 1.0, "accumulate_grad_batches": 1},  # ref spring_mesh.yaml:28
    },
    "navier_stokes": {
        "datamodule": {
            "name": "physical-systems", "physical_system": "navier-stokes",
            "batch_size": 32, "eval_batch_size": 4, "horizon": 16,
            "prediction_horizon": 64, "window": 1,
        },
        "model": {
            "name": "unet_simple", "dim": 64, "outer_sample_mode": "bilinear",
            "upsample_dims": [256, 256], "dropout": 0.15,
        },
        "module": {"optimizer": {"name": "adamw", "lr": 3e-4, "weight_decay": 1e-4}},
        # accumulate_grad_batches: 2 (ref experiment/navier_stokes.yaml:30)
        "trainer": {"max_epochs": 200, "gradient_clip_val": 1.0, "accumulate_grad_batches": 2},
    },
    "oisst_pacific": {
        "datamodule": {
            "name": "oisstv2", "batch_size": 64, "eval_batch_size": 6,
            "horizon": 7, "prediction_horizon": 7, "window": 1,
            "boxes": [84, 85, 86, 87, 88, 89, 108, 109, 110, 111, 112],
        },
        "model": {
            "name": "unet_resnet", "dim": 64, "dim_mults": [1, 2, 4],
            "block_dropout": 0.3, "block_dropout1": 0.0, "attn_dropout": 0.1,
        },
        "module": {"optimizer": {"name": "adamw", "lr": 1e-4, "weight_decay": 1e-5}},
        # accumulate=4 + early-stop patience 10 (ref experiment/oisst_pacific.yaml:29-33)
        "trainer": {
            "max_epochs": 50, "gradient_clip_val": 1.0,
            "accumulate_grad_batches": 4, "early_stopping_patience": 10,
        },
        "seed": 8,
    },
}

# method layers (ref configs/experiment/*_{interpolation,dyffusion,...}.yaml)
_METHODS: Dict[str, Dict[str, Any]] = {
    "interpolation": {
        "experiment": "interpolation",
        "model": {"with_time_emb": True},
    },
    "dyffusion": {
        "experiment": "dyffusion",
        "model": {"with_time_emb": True},
        "diffusion": {
            "name": "dyffusion",
            "loss_function": "l1",  # ref configs/diffusion/_base.yaml:14
            "interpolator_run_id": None,
            "interpolator_use_ema": False,
            "lambda_reconstruction": 0.5,
            "lambda_reconstruction2": 0.5,
            "forward_conditioning": "data",
            "schedule": "before_t1_only",
            "additional_interpolation_steps": 0,
            "additional_interpolation_steps_factor": 0,
            "interpolate_before_t1": True,
            "time_encoding": "dynamics",
            "enable_interpolator_dropout": True,
            "sampling_type": "cold",
            "sampling_schedule": None,
            "refine_intermediate_predictions": False,
            "use_cold_sampling_for_last_step": False,
            "timesteps": "${datamodule.horizon}",
        },
    },
    "time_conditioned": {
        "experiment": "time_conditioned",
        "model": {"with_time_emb": True},
    },
    "simultaneous": {
        "experiment": "simultaneous",
        "model": {"with_time_emb": False},
    },
    "ddpm": {
        "experiment": "simultaneous",
        "model": {"with_time_emb": True},
        "diffusion": {
            "name": "ddpm",
            "loss_function": "l1",  # ref configs/diffusion/_base.yaml:14
            "hardcode_betaN": False,  # ref configs/diffusion/denoising.yaml:10
            "timesteps": 1000,
            "sampling_timesteps": None,
            "objective": "pred_noise",
            "beta_schedule": "cosine",
            "ddim_sampling_eta": 1.0,
        },
    },
    # LDM-style second DDPM variant (ref configs/diffusion/denoising_v2.yaml
    # -> src/diffusion/ddpm.py:28-424), selectable exactly like the reference
    "ddpm_v2": {
        "experiment": "simultaneous",
        "model": {"with_time_emb": True},
        "diffusion": {
            "name": "ddpm_v2",
            "loss_function": "l1",  # ref configs/diffusion/_base.yaml:14
            "timesteps": 1000,
            "beta_schedule": "linear",
            "parameterization": "pred_noise",  # ref objective: "pred_noise"
            "linear_start": 0.0015,
            "linear_end": 0.0195,
            "cosine_s": 8e-3,
            "original_elbo_weight": 0.0,
            "v_posterior": 0.0,
            "l_simple_weight": 1.0,
            "learn_logvar": False,
            "logvar_init": 0.0,
            "hardcode_betaN": False,
        },
    },
    # MCVD video-diffusion baseline (ref configs/diffusion/ddpm_mcvd.yaml +
    # experiment/*_mcvd.yaml — keeps the dataset backbone; model.name=ncsnpp
    # selects the NCSN++ score network)
    "mcvd": {
        "experiment": "simultaneous",
        "model": {"with_time_emb": True},
        "diffusion": {
            "name": "mcvd",
            "loss_function": "l1",  # ref configs/diffusion/_base.yaml:14
            "version": "DDPM",
            "timesteps": 1000,
            "beta_schedule": "linear",
            "sigma_begin": 0.02,
            "sigma_end": 0.0001,
            "gamma": False,
            "noise_in_cond": False,
            "sampling_denoise": True,
            # ref _base.yaml sampling_timesteps: null — the reference samples
            # with ALL timesteps (subsampling stays a user override)
            "sampling_timesteps": None,
        },
    },
}

# dataset-x-method extra tweaks, audited line-by-line against the reference
# experiment yamls (ref configs/experiment/{ds}_{method}.yaml — see each entry)
_COMBO: Dict[str, Dict[str, Any]] = {
    # ref oisst_pacific_dyffusion.yaml:14-18: k=25, refine=False, data+noise
    "oisst_pacific_dyffusion": {
        "diffusion": {
            "additional_interpolation_steps": 25,
            "refine_intermediate_predictions": False,
            "forward_conditioning": "data+noise",
        },
    },
    # ref navier_stokes_dyffusion.yaml:14-16: refine=True, conditioning "none"
    "navier_stokes_dyffusion": {
        "diffusion": {
            "refine_intermediate_predictions": True,
            "forward_conditioning": "none",
        },
    },
    # ref spring_mesh_dyffusion.yaml:14-17: refine=True, "data", no cold-last
    "spring_mesh_dyffusion": {
        "diffusion": {
            "refine_intermediate_predictions": True,
            "forward_conditioning": "data",
            "use_cold_sampling_for_last_step": False,
        },
    },
    # ref oisst_pacific_interpolation.yaml:14-22
    "oisst_pacific_interpolation": {
        "model": {"block_dropout": 0.6, "block_dropout1": 0.2, "attn_dropout": 0.6},
        "module": {"optimizer": {"lr": 3e-4}},
    },
    # ref spring_mesh_interpolation.yaml:13-14
    "spring_mesh_interpolation": {"model": {"dropout": 0.05}},
    # ref oisst_pacific_time_conditioned.yaml:12-19
    "oisst_pacific_time_conditioned": {
        "model": {"block_dropout": 0.6, "block_dropout1": 0.3, "attn_dropout": 0.6},
        "module": {"optimizer": {"lr": 3e-4}},
    },
    # ref navier_stokes_time_conditioned.yaml:14-15
    "navier_stokes_time_conditioned": {"model": {"dropout": 0.2}},
    # ref spring_mesh_time_conditioned.yaml:13-14
    "spring_mesh_time_conditioned": {"model": {"dropout": 0.05}},
    # ref oisst_pacific_ddpm.yaml: unlike navier_stokes_ddpm / spring_mesh_ddpm
    # / oisst_pacific_mcvd, this experiment does NOT set model.with_time_emb
    # back to True — the module group (with_time_emb False) composes after
    # diffusion/_base (True), so the literal reference runs OISST-DDPM with
    # the time embedding OFF. Preserved for exact preset parity.
    "oisst_pacific_ddpm": {"model": {"with_time_emb": False}},
    # same literal-composition quirk: spring_mesh_{ddpm,mcvd} never set
    # model.with_time_emb back to True either (only the NS ddpm/mcvd and
    # OISST mcvd experiment bodies do)
    "spring_mesh_ddpm": {"model": {"with_time_emb": False}},
    "spring_mesh_mcvd": {"model": {"with_time_emb": False}},
    # ref oisst_pacific_at_once.yaml:12-20 (the "Simultaneous" baseline)
    "oisst_pacific_simultaneous": {
        "model": {"block_dropout": 0.6, "block_dropout1": 0.3, "attn_dropout": 0.6},
        "module": {"optimizer": {"lr": 3e-4}},
    },
}


# Measured per-workload EXECUTION-LAYOUT recipes (PERF.md train-perf matrix,
# TPU v5e): opt in with `perf=measured`. Each recipe keeps the SCIENCE of the
# parity default — same effective batch, same mean gradient, same run id
# (utils/naming.py hashes the effective batch) — and changes only how the
# micro-batches are executed. Presets without an entry are measured no-ops:
# NS's 256x256 internal resample already runs ~51% MFU at the reference
# accumulated layout (folding loses there), and spring-mesh is dispatch-bound
# at 10x10 (KB-scale activations, nothing to fold). Ref recipes:
# configs/experiment/oisst_pacific.yaml:29-33, navier_stokes.yaml:30,
# spring_mesh.yaml:28.
_PERF_MEASURED: Dict[str, Dict[str, Any]] = {
    # stage-1 fold fully: B64 x acc4 -> B256 physical, +39% ex/s (PERF.md r3)
    "oisst_pacific_interpolation": {
        "trainer": {"fold_accumulation_into_batch": True},
    },
    # stage-2 half-fold + remat: B128 x acc2, same eff-256 gradient, +14.2%
    # (full fold needs ~20 GB > v5e HBM). Assumes the default
    # module.use_ema=false: with EMA on, manual re-batching forks the
    # per-micro-batch EMA cadence (see PERF.md r3).
    "oisst_pacific_dyffusion": {
        "datamodule": {"batch_size": 128},
        "trainer": {"accumulate_grad_batches": 2},
        "model": {"remat": True},
    },
}
_PERF_MODES = ("parity", "measured")


def deep_merge(base: Dict[str, Any], override: Dict[str, Any]) -> Dict[str, Any]:
    out = copy.deepcopy(base)
    for k, v in (override or {}).items():
        if isinstance(v, dict) and isinstance(out.get(k), dict):
            out[k] = deep_merge(out[k], v)
        else:
            out[k] = copy.deepcopy(v)
    return out


def list_presets() -> List[str]:
    return sorted(f"{d}_{m}" for d in _DATASETS for m in _METHODS)


def get_config(preset: Optional[str] = None, overrides: Optional[List[str]] = None) -> Dict[str, Any]:
    """Compose base + dataset + method (+ combo) layers and apply dotted
    overrides, then resolve interpolations."""
    cfg = copy.deepcopy(_BASE)
    if preset:
        dataset = next((d for d in sorted(_DATASETS, key=len, reverse=True) if preset.startswith(d)), None)
        if dataset is None:
            raise ValueError(f"Unknown preset '{preset}'. Known: {list_presets()}")
        method = preset[len(dataset) :].lstrip("_") or "interpolation"
        if method not in _METHODS:
            raise ValueError(f"Unknown method '{method}' in preset '{preset}'. Methods: {sorted(_METHODS)}")
        cfg = deep_merge(cfg, _DATASETS[dataset])
        cfg = deep_merge(cfg, _METHODS[method])
        cfg = deep_merge(cfg, _COMBO.get(preset, {}))
        cfg["preset"] = preset
    # perf=measured applies the measured execution-layout recipe for this
    # preset (PERF.md) BEFORE the dotted overrides, so explicit user keys
    # still win; perf=parity (the default) is the untouched reference layout.
    # Every perf token is validated ('+perf=...' included) and the LAST one
    # wins, matching override semantics.
    rest, perf = [], None
    for ov in overrides or []:
        key, _, val = ov.partition("=")
        if key.strip().lstrip("+") == "perf":
            val = val.strip()
            if val not in _PERF_MODES:
                raise ValueError(
                    f"unknown perf mode '{val}' (choose from {list(_PERF_MODES)})"
                )
            perf = val
        else:
            rest.append(ov)
    recipe = _PERF_MEASURED.get(preset or "", {}) if perf == "measured" else {}
    if recipe:
        cfg = deep_merge(cfg, recipe)
    if perf:
        cfg["perf"] = perf
    extra_ok = set()
    for ov in rest:
        key, was_plus = apply_override(cfg, ov)
        if was_plus:
            extra_ok.add(key)
    if (
        recipe.get("trainer", {}).get("accumulate_grad_batches") is not None
        and (cfg.get("module") or {}).get("use_ema")
    ):
        # the half-fold recipe re-batches the accumulation micro-batches;
        # with EMA on, the per-micro-batch shadow-update cadence is part of
        # the science (naming.py hashes it) — refuse instead of silently
        # changing the EMA trajectory under a "layout-only" switch
        raise ValueError(
            f"perf=measured on preset '{preset}' re-batches gradient "
            "accumulation, which changes the EMA update cadence when "
            "module.use_ema=true. Use perf=parity with "
            "trainer.fold_accumulation_into_batch=true (replays the "
            "cadence), or turn EMA off."
        )
    return resolve(cfg, extra_ok=extra_ok)


def apply_override(cfg: Dict[str, Any], override: str) -> Tuple[str, bool]:
    """Apply one 'a.b.c=value' override (hydra CLI semantics): values parse
    as Python literals when possible; lowercase ``true``/``false``/``null``
    parse as ``True``/``False``/``None``. A ``+`` prefix (``+a.b.c=value``)
    marks the key as intentionally new, exempting it from
    :func:`validate_config`'s unknown-key check. Returns (dotted key,
    had_plus_prefix)."""
    key, _, raw = override.partition("=")
    if not _:
        raise ValueError(f"override '{override}' must look like key=value")
    key = key.strip()
    allow_new = key.startswith("+")
    if allow_new:
        key = key[1:]
    low = raw.strip().lower()
    if low in ("true", "false"):
        value = low == "true"
    elif raw.strip() in ("null", "None"):
        value = None
    else:
        try:
            value = ast.literal_eval(raw)
        except (ValueError, SyntaxError):
            value = raw
    node = cfg
    parts = key.split(".")
    for p in parts[:-1]:
        if node.get(p) is None:
            node[p] = {}
        node = node[p]
    node[parts[-1]] = value
    return key, allow_new


# The trainer/module namespaces are CLOSED consumer surfaces (every key is
# read by name in interface.py / training/trainer.py / optim.py), unlike
# datamodule/model/diffusion whose keys pass through to constructors and are
# validated there. A typo'd key in a closed namespace would otherwise be
# silently ignored (the reference's hydra struct mode rejects unknown keys).
_TOP_LEVEL_KEYS = {
    "seed", "registry_dir", "experiment", "preset", "datamodule", "model",
    "diffusion", "module", "trainer", "debug", "run_id", "jax_debug_nans",
    "matmul_precision", "torch_matmul_precision", "use_wandb", "perf",
}
_TRAINER_KEYS = {
    "max_epochs", "max_steps", "val_every_n_epochs", "save_checkpoints",
    "devices", "spatial_shards", "spatial_axis", "precision",
    "gradient_clip_val", "accumulate_grad_batches",
    "early_stopping_patience", "fold_accumulation_into_batch",
    "log_every_n_steps", "watch_gradients",
}
# kept in sync with ExperimentConfig.__dataclass_fields__ by
# tests/test_preset_parity.py::test_module_key_whitelist_matches_dataclass
_MODULE_KEYS = {
    "ema_decay", "enable_inference_dropout", "eval_dtype",
    "fold_members_into_batch", "horizon", "loss_function", "monitor",
    "num_predictions", "num_predictions_test", "optimizer",
    "prediction_horizon", "prediction_inputs_noise", "scheduler",
    "train_dtype", "use_ema", "window",
}


def validate_config(cfg: Dict[str, Any], extra_ok=()) -> None:
    """Reject unknown keys in the closed namespaces (top level, trainer.*,
    module.*) with a did-you-mean hint. ``extra_ok`` holds dotted keys added
    deliberately via '+key=value' overrides."""
    import difflib

    extra_ok = set(extra_ok)

    def _exempt(dotted: str) -> bool:
        # '+a.b.c=...' exempts 'a.b.c' and every ancestor namespace it created
        return any(e == dotted or e.startswith(dotted + ".") for e in extra_ok)

    def check(prefix: str, keys, allowed) -> None:
        for k in keys:
            dotted = f"{prefix}{k}"
            if k not in allowed and not _exempt(dotted):
                hint = difflib.get_close_matches(k, allowed, n=1)
                did = f" — did you mean '{prefix}{hint[0]}'?" if hint else ""
                raise ValueError(
                    f"unknown config key '{dotted}'{did} "
                    f"(prefix the override with '+' to add a new key)"
                )

    check("", cfg.keys(), _TOP_LEVEL_KEYS)
    check("trainer.", (cfg.get("trainer") or {}).keys(), _TRAINER_KEYS)
    check("module.", (cfg.get("module") or {}).keys(), _MODULE_KEYS)


def resolve(cfg: Dict[str, Any], extra_ok=()) -> Dict[str, Any]:
    """Resolve ``${a.b}`` interpolations and consistency rules
    (the semantics of the reference's OmegaConf interpolation +
    ``check_config_values``, ``config_utils.py:423-473``)."""
    validate_config(cfg, extra_ok=extra_ok)

    def lookup(path: str):
        node: Any = cfg
        for p in path.split("."):
            node = node[p]
        return node

    def walk(node):
        if isinstance(node, dict):
            return {k: walk(v) for k, v in node.items()}
        if isinstance(node, list):
            return [walk(v) for v in node]
        if isinstance(node, str) and node.startswith("${") and node.endswith("}"):
            return lookup(node[2:-1])
        return node

    cfg = walk(cfg)
    # debug mode (ref configs/mode/debug.yaml + config_utils.py:119-135):
    # tiny fast run with NaN checking
    if cfg.get("debug"):
        cfg["trainer"] = deep_merge(
            cfg.get("trainer", {}),
            {"max_epochs": 1, "max_steps": 2, "val_every_n_epochs": 1, "save_checkpoints": False},
        )
        cfg["module"] = deep_merge(cfg.get("module", {}), {"num_predictions": 2, "num_predictions_test": 2})
        cfg["jax_debug_nans"] = True
    # rule: DYffusion timesteps == horizon (ref forecasting_multi_horizon.py:404)
    diff = cfg.get("diffusion")
    if diff and diff.get("name") == "dyffusion":
        diff["timesteps"] = cfg["datamodule"]["horizon"]
    # rule: module window/horizon mirror datamodule (ref check_config_values)
    cfg.setdefault("module", {})
    cfg["module"]["window"] = cfg["datamodule"].get("window", 1)
    cfg["module"]["horizon"] = cfg["datamodule"]["horizon"]
    cfg["module"]["prediction_horizon"] = cfg["datamodule"].get("prediction_horizon")
    return cfg
