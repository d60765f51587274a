"""Golden tests: composed presets must match the reference experiment configs.

Each assertion mirrors a line of ``/root/reference/src/configs/experiment/*.yaml``
(cited inline). These guard against preset drift — the reference's paper
reproductions depend on exact hparams (VERDICT round 1, Missing #3).
"""
from dyffusion_tpu.config import get_config


def test_navier_stokes_dyffusion_matches_reference():
    cfg = get_config("navier_stokes_dyffusion")
    d = cfg["diffusion"]
    # ref navier_stokes_dyffusion.yaml:14-16
    assert d["refine_intermediate_predictions"] is True
    assert d["forward_conditioning"] == "none"
    # ref navier_stokes.yaml:12-30
    assert cfg["datamodule"]["batch_size"] == 32
    assert cfg["datamodule"]["eval_batch_size"] == 4
    assert cfg["datamodule"]["horizon"] == 16
    assert cfg["datamodule"]["prediction_horizon"] == 64
    assert cfg["trainer"]["accumulate_grad_batches"] == 2
    assert cfg["trainer"]["max_epochs"] == 200
    assert cfg["module"]["optimizer"]["lr"] == 3e-4
    assert cfg["module"]["optimizer"]["weight_decay"] == 1e-4
    assert cfg["model"]["dropout"] == 0.15
    # rule: timesteps == horizon (ref forecasting_multi_horizon.py:404)
    assert d["timesteps"] == 16


def test_oisst_pacific_dyffusion_matches_reference():
    cfg = get_config("oisst_pacific_dyffusion")
    d = cfg["diffusion"]
    # ref oisst_pacific_dyffusion.yaml:14-18
    assert d["additional_interpolation_steps"] == 25
    assert d["refine_intermediate_predictions"] is False
    assert d["forward_conditioning"] == "data+noise"
    # ref oisst_pacific.yaml:12-33
    assert cfg["datamodule"]["batch_size"] == 64
    assert cfg["datamodule"]["eval_batch_size"] == 6
    assert cfg["datamodule"]["horizon"] == 7
    assert cfg["trainer"]["accumulate_grad_batches"] == 4
    assert cfg["trainer"]["early_stopping_patience"] == 10
    assert cfg["trainer"]["max_epochs"] == 50
    assert cfg["module"]["optimizer"]["lr"] == 1e-4
    assert cfg["model"]["block_dropout"] == 0.3
    assert cfg["model"]["block_dropout1"] == 0.0
    assert cfg["model"]["attn_dropout"] == 0.1
    assert cfg["seed"] == 8
    assert d["timesteps"] == 7


def test_spring_mesh_dyffusion_matches_reference():
    cfg = get_config("spring_mesh_dyffusion")
    d = cfg["diffusion"]
    # ref spring_mesh_dyffusion.yaml:14-17
    assert d["refine_intermediate_predictions"] is True
    assert d["forward_conditioning"] == "data"
    assert d["use_cold_sampling_for_last_step"] is False
    # ref spring_mesh.yaml:12-31
    assert cfg["datamodule"]["batch_size"] == 64
    assert cfg["datamodule"]["eval_batch_size"] == 16
    assert cfg["datamodule"]["horizon"] == 134
    assert cfg["datamodule"]["prediction_horizon"] == 804
    assert cfg["trainer"].get("accumulate_grad_batches", 1) == 1
    assert cfg["trainer"]["max_epochs"] == 300
    assert cfg["module"]["optimizer"]["lr"] == 4e-4
    assert d["timesteps"] == 134


def test_interpolation_and_baseline_combos():
    # ref oisst_pacific_interpolation.yaml:14-22
    cfg = get_config("oisst_pacific_interpolation")
    assert cfg["model"]["block_dropout"] == 0.6
    assert cfg["model"]["block_dropout1"] == 0.2
    assert cfg["model"]["attn_dropout"] == 0.6
    assert cfg["module"]["optimizer"]["lr"] == 3e-4
    # ref spring_mesh_interpolation.yaml:13-14
    assert get_config("spring_mesh_interpolation")["model"]["dropout"] == 0.05
    # ref navier_stokes_time_conditioned.yaml:14-15
    assert get_config("navier_stokes_time_conditioned")["model"]["dropout"] == 0.2
    # ref oisst_pacific_time_conditioned.yaml:12-19
    cfg = get_config("oisst_pacific_time_conditioned")
    assert cfg["model"]["block_dropout"] == 0.6
    assert cfg["module"]["optimizer"]["lr"] == 3e-4
    # ref oisst_pacific_at_once.yaml:12-20
    cfg = get_config("oisst_pacific_simultaneous")
    assert cfg["model"]["block_dropout"] == 0.6
    assert cfg["model"]["block_dropout1"] == 0.3
    assert cfg["module"]["optimizer"]["lr"] == 3e-4


def test_overrides_still_win_over_combos():
    cfg = get_config(
        "navier_stokes_dyffusion", ["diffusion.forward_conditioning=data"]
    )
    assert cfg["diffusion"]["forward_conditioning"] == "data"


def test_perf_measured_applies_per_workload_recipe():
    """perf=measured applies the MEASURED execution-layout recipe per preset
    (PERF.md train-perf matrix) without touching the science: same effective
    batch, same run id as the parity default (EMA off)."""
    import pytest

    from dyffusion_tpu.utils.naming import get_run_id

    # SST stage-1: fold the accumulation into the physical batch (+39%)
    parity = get_config("oisst_pacific_interpolation")
    measured = get_config("oisst_pacific_interpolation", ["perf=measured"])
    assert "fold_accumulation_into_batch" not in parity["trainer"]
    assert measured["trainer"]["fold_accumulation_into_batch"] is True
    assert measured["perf"] == "measured"
    assert get_run_id(measured) == get_run_id(parity)

    # SST stage-2: half-fold + remat (B128 x acc2, same eff-256 gradient)
    parity2 = get_config("oisst_pacific_dyffusion")
    measured2 = get_config("oisst_pacific_dyffusion", ["perf=measured"])
    assert (parity2["datamodule"]["batch_size"], parity2["trainer"]["accumulate_grad_batches"]) == (64, 4)
    assert (measured2["datamodule"]["batch_size"], measured2["trainer"]["accumulate_grad_batches"]) == (128, 2)
    assert measured2["model"]["remat"] is True
    assert get_run_id(measured2) == get_run_id(parity2)

    # NS / spring: the measured best IS the reference layout -> no-op
    for preset in ("navier_stokes_dyffusion", "spring_mesh_interpolation"):
        a = get_config(preset)
        b = get_config(preset, ["perf=measured"])
        b.pop("perf")
        assert a == b

    # explicit user overrides still win over the recipe
    over = get_config(
        "oisst_pacific_dyffusion", ["perf=measured", "datamodule.batch_size=32"]
    )
    assert over["datamodule"]["batch_size"] == 32

    # perf=parity is the untouched default; unknown modes fail loudly
    assert get_config("oisst_pacific_interpolation", ["perf=parity"])["trainer"] == parity["trainer"]
    with pytest.raises(ValueError, match="perf mode"):
        get_config("oisst_pacific_interpolation", ["perf=turbo"])


def test_perf_measured_guards(  # round-5 review fixes
):
    """(a) perf=measured + use_ema on a re-batching recipe fails loudly
    instead of silently changing the EMA cadence; (b) '+perf=...' is
    validated like 'perf=...'; (c) repeated perf tokens: last one wins and
    no stale recipe is applied."""
    import pytest

    with pytest.raises(ValueError, match="EMA update cadence"):
        get_config("oisst_pacific_dyffusion", ["perf=measured", "module.use_ema=true"])
    # the fold recipe (stage-1) does NOT re-batch -> EMA stays allowed
    cfg = get_config(
        "oisst_pacific_interpolation", ["perf=measured", "module.use_ema=true"]
    )
    assert cfg["trainer"]["fold_accumulation_into_batch"] is True

    with pytest.raises(ValueError, match="perf mode"):
        get_config("oisst_pacific_interpolation", ["+perf=turbo"])

    cfg = get_config("oisst_pacific_dyffusion", ["perf=measured", "perf=parity"])
    assert cfg["perf"] == "parity"
    assert cfg["datamodule"]["batch_size"] == 64  # measured recipe NOT applied
