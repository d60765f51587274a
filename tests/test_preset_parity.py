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
