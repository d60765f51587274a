"""Round-3 review fixes: distributed-init idempotency, crash-save epoch
metadata, and run-identity vs device count (see PERF.md / commit history).
"""
import json
import os

import numpy as np
import pytest

from dyffusion_tpu.config import get_config
from dyffusion_tpu.interface import run_experiment

TINY = [
    "datamodule.n_traj=4",
    "datamodule.n_time=16",
    "datamodule.spatial=(8,8)",
    "datamodule.channels=1",
    "datamodule.horizon=3",
    "datamodule.batch_size=4",
    "model.dim=8",
    "model.dim_mults=(1,)",
    "module.num_predictions=2",
    "trainer.max_epochs=2",
]


def test_init_distributed_idempotent(monkeypatch):
    """Drivers that train then reload-and-test in one process call
    init_distributed() twice; jax.distributed.initialize() may only ever run
    once, so the second call must no-op."""
    import jax

    from dyffusion_tpu.parallel.distributed import init_distributed

    calls = []
    monkeypatch.setattr(jax.distributed, "is_initialized", lambda: True)
    monkeypatch.setattr(
        jax.distributed, "initialize", lambda **kw: calls.append(kw)
    )
    monkeypatch.setenv("JAX_COORDINATOR_ADDRESS", "127.0.0.1:9999")
    monkeypatch.setenv("JAX_NUM_PROCESSES", "2")
    monkeypatch.setenv("JAX_PROCESS_ID", "0")
    init_distributed()  # already initialized -> must not call initialize()
    assert calls == []


def test_crash_save_writes_matching_epochs_done(tmp_path, monkeypatch):
    """A crash mid-run must persist epochs_done alongside the 'last' params it
    snapshots — a stale count would make resume replay finished epochs on top
    of weights that already contain them."""
    from dyffusion_tpu.training.trainer import Trainer

    # crash at the SECOND epoch's validation: epoch 0 completed + saved
    # normally (val_every_n_epochs=1), epoch 1's train steps ran, then boom
    real_evaluate = Trainer.evaluate
    state = {"n": 0}

    def exploding_evaluate(self, split="val"):
        state["n"] += 1
        if state["n"] >= 2:
            raise RuntimeError("injected crash")
        return real_evaluate(self, split)

    monkeypatch.setattr(Trainer, "evaluate", exploding_evaluate)
    cfg = get_config(
        "synthetic_interpolation",
        TINY + [f"registry_dir={tmp_path}", "trainer.max_epochs=3"],
    )
    with pytest.raises(RuntimeError, match="injected crash"):
        run_experiment(cfg)

    run_dir = next(p for p in (tmp_path).iterdir() if p.is_dir())
    meta = json.loads((run_dir / "meta.json").read_text())
    # epoch 0 fully done; epoch 1 completed its batches before the val crash
    assert meta["epochs_done"] == 2
    # the crash-path 'last' save recorded the crash-time step, not epoch 0's
    assert meta["last_step"] > 0
    assert os.path.isdir(run_dir / "last")

    # resume trains ONLY the remaining epoch (start at epoch 2 of 3)
    monkeypatch.setattr(Trainer, "evaluate", real_evaluate)
    trainer2, best2 = run_experiment(cfg)
    assert [h["epoch"] for h in trainer2.history] == [2]
    assert np.isfinite(best2)


def test_run_identity_includes_effective_batch():
    """devices=8/batch=8 and devices=1/batch=64 are the same science (same
    global batch) -> same id; same per-device batch at different device
    counts differs -> different runs that must not resume each other."""
    from dyffusion_tpu.utils.naming import get_run_id

    a = get_run_id(
        get_config("synthetic_interpolation", TINY + ["trainer.devices=8", "datamodule.batch_size=8"])
    )
    b = get_run_id(
        get_config("synthetic_interpolation", TINY + ["trainer.devices=1", "datamodule.batch_size=64"])
    )
    c = get_run_id(
        get_config("synthetic_interpolation", TINY + ["trainer.devices=1", "datamodule.batch_size=8"])
    )
    assert a == b
    assert c != a


def test_epochs_completed_tracks_partial_epochs(tmp_path):
    """max_steps breaking mid-epoch leaves that epoch out of the count, so a
    mid-epoch out-of-band save resumes at the interrupted epoch's start."""
    cfg = get_config(
        "synthetic_interpolation",
        TINY + [f"registry_dir={tmp_path}", "trainer.max_steps=3", "trainer.save_checkpoints=False"],
    )
    trainer, _ = run_experiment(cfg)
    # 4 traj x (16-3) windows... batch 4 -> >3 steps per epoch: break mid-epoch 0
    assert trainer.epochs_completed == 0
    assert int(trainer.state.step) == 3


def test_run_identity_spatial_layout_invariant():
    """Spatial (model-axis) sharding is execution layout: devices=8 with
    spatial_shards=4 leaves a 2-wide data axis, so it is the same science as
    devices=2 pure-DP (test_spatial_parallel proves sharded == single-device)
    and must share a run id — and differ from devices=8 pure-DP (4x the
    global batch)."""
    from dyffusion_tpu.utils.naming import get_run_id

    sp = get_run_id(
        get_config(
            "synthetic_interpolation",
            TINY + ["trainer.devices=8", "trainer.spatial_shards=4", "datamodule.batch_size=8"],
        )
    )
    dp2 = get_run_id(
        get_config("synthetic_interpolation", TINY + ["trainer.devices=2", "datamodule.batch_size=8"])
    )
    dp8 = get_run_id(
        get_config("synthetic_interpolation", TINY + ["trainer.devices=8", "datamodule.batch_size=8"])
    )
    assert sp == dp2
    assert sp != dp8


def test_max_steps_save_records_completed_epochs_only(tmp_path):
    """When max_steps stops training mid-epoch, the val-block save_last must
    persist the COMPLETED epoch count (0 here), not epoch+1 — else resume
    skips the interrupted epoch's remainder and every relaunch of a
    maxed-out run creeps the counter."""
    cfg = get_config(
        "synthetic_interpolation",
        TINY + [f"registry_dir={tmp_path}", "trainer.max_steps=3"],
    )
    trainer, _ = run_experiment(cfg)
    assert trainer.epochs_completed == 0
    meta_path = os.path.join(trainer.ckpt.run_dir, "meta.json")
    with open(meta_path) as f:
        meta = json.load(f)
    assert meta["epochs_done"] == 0

    # relaunching the maxed-out run must not creep the counter either
    trainer2, _ = run_experiment(cfg)
    with open(meta_path) as f:
        meta2 = json.load(f)
    assert meta2["epochs_done"] == 0


def test_fresh_start_resets_stale_registry_state(tmp_path):
    """run_experiment(resume=False) over a dir with previous state must clear
    the stale best_score/epochs_done: an inherited best would suppress every
    best-slot save of the fresh run, and a crash would persist the OLD run's
    epochs_done next to NEW params."""
    cfg = get_config("synthetic_interpolation", TINY + [f"registry_dir={tmp_path}"])
    trainer, _ = run_experiment(cfg)
    run_dir = trainer.ckpt.run_dir
    meta_path = os.path.join(run_dir, "meta.json")

    # poison the meta with an unbeatable best (as a stale prior run would)
    with open(meta_path) as f:
        meta = json.load(f)
    meta["best_score"] = -1.0
    meta["epochs_done"] = 99
    with open(meta_path, "w") as f:
        json.dump(meta, f)

    trainer2, best2 = run_experiment(cfg, resume=False)
    with open(meta_path) as f:
        meta2 = json.load(f)
    # the fresh run's (worse) score replaced the poisoned one: reset happened
    assert np.isfinite(best2) and best2 > 0
    assert meta2["best_score"] == pytest.approx(best2)
    assert meta2["epochs_done"] == cfg["trainer"]["max_epochs"]
    assert trainer2.ckpt.has("best") and trainer2.ckpt.has("last")


def test_tpu_pod_env_triggers_auto_init(monkeypatch):
    """The documented Cloud-TPU-pod auto-detection must be reachable: with
    the launcher's TPU_WORKER_HOSTNAMES set (and no JAX_* overrides),
    init_distributed calls jax.distributed.initialize()."""
    import jax

    from dyffusion_tpu.parallel.distributed import init_distributed

    calls = []
    monkeypatch.setattr(jax.distributed, "is_initialized", lambda: False)
    monkeypatch.setattr(
        jax.distributed,
        "initialize",
        lambda coordinator_address=None, num_processes=None, process_id=None: calls.append(1),
    )
    for var in ("JAX_COORDINATOR_ADDRESS", "JAX_NUM_PROCESSES", "JAX_PROCESS_ID"):
        monkeypatch.delenv(var, raising=False)

    monkeypatch.delenv("TPU_WORKER_HOSTNAMES", raising=False)
    monkeypatch.delenv("TPU_WORKER_COUNT", raising=False)
    init_distributed()
    assert calls == []  # single host: still a no-op

    monkeypatch.setenv("TPU_WORKER_HOSTNAMES", "host-a,host-b")
    init_distributed()
    assert calls == [1]  # pod: auto-init reached


# ---- fourth review pass (config/interface/models/training) ----------------


def test_override_lowercase_booleans_parse():
    """'=false' must become False, not the truthy string 'false' (README
    documents the lowercase hydra spelling)."""
    cfg = get_config("synthetic_interpolation", ["debug=false", "module.use_ema=false"])
    assert cfg["debug"] is False and cfg["module"]["use_ema"] is False
    cfg = get_config("synthetic_interpolation", ["debug=true", "module.use_ema=True"])
    assert cfg["debug"] is True and cfg["module"]["use_ema"] is True
    assert get_config("synthetic_interpolation", ["module.scheduler=null"])["module"]["scheduler"] is None


def test_override_unknown_closed_namespace_keys_rejected():
    """Typos in the closed namespaces (top level / trainer.* / module.*)
    raise with a did-you-mean hint; '+key=value' adds new keys."""
    for bad in ("trainer.max_epoch=3", "module.use_emaa=true", "registryy_dir=/tmp/x"):
        with pytest.raises(ValueError, match="unknown config key"):
            get_config("synthetic_interpolation", [bad])
    cfg = get_config("synthetic_interpolation", ["+trainer.my_flag=2", "+custom.key=1"])
    assert cfg["trainer"]["my_flag"] == 2 and cfg["custom"]["key"] == 1
    # open namespaces (constructor kwargs) are untouched
    get_config("synthetic_interpolation", ["datamodule.n_traj=4"])


def test_module_key_whitelist_matches_dataclass():
    from dyffusion_tpu.config import _MODULE_KEYS
    from dyffusion_tpu.experiments.base import ExperimentConfig

    assert _MODULE_KEYS == set(ExperimentConfig.__dataclass_fields__)


def test_adamw_weight_decay_skips_fourier_features():
    """GaussianFourierProjection W is a fixed buffer in the reference;
    decoupled weight decay must not shrink it (grads are stop_gradient'ed
    to zero, but adamw's decay term is grad-independent)."""
    import jax
    import jax.numpy as jnp

    from dyffusion_tpu.training.optim import build_optimizer

    tx = build_optimizer("adamw", lr=0.1, weight_decay=0.5)
    params = {"m": {"fourier_emb": {"W": jnp.ones(3)}, "kernel": jnp.ones(3)}}
    state = tx.init(params)
    grads = jax.tree_util.tree_map(jnp.zeros_like, params)
    upd, _ = tx.update(grads, state, params)
    np.testing.assert_array_equal(np.asarray(upd["m"]["fourier_emb"]["W"]), 0.0)
    assert float(np.abs(np.asarray(upd["m"]["kernel"])).sum()) > 0.0


def test_stage2_rejects_interpolator_trained_at_other_horizon(tmp_path):
    """The engine's horizon guard must compare against the horizon the
    stage-1 interpolator was TRAINED with (from its persisted config), not
    the stage-2 config's own horizon (ref dyffusion.py:472-478)."""
    reg = str(tmp_path / "reg")
    cfg1 = get_config("synthetic_interpolation", TINY + [f"registry_dir={reg}"])
    trainer1, _ = run_experiment(cfg1)
    run1 = os.path.basename(trainer1.ckpt.run_dir)

    overrides = [o for o in TINY if not o.startswith("datamodule.horizon")]
    cfg2 = get_config(
        "synthetic_dyffusion",
        overrides + [
            "datamodule.horizon=5",  # != the stage-1 horizon 3
            f"registry_dir={reg}",
            f"diffusion.interpolator_run_id={run1}",
        ],
    )
    with pytest.raises(ValueError, match="interpolator horizon"):
        run_experiment(cfg2)


def test_resumed_run_at_max_steps_does_not_overshoot(tmp_path):
    """Relaunching a run whose checkpoint already sits at max_steps must not
    train an extra batch and creep the step counter."""
    reg = str(tmp_path / "reg")
    ov = TINY + [f"registry_dir={reg}", "trainer.max_steps=3", "trainer.max_epochs=50"]
    cfg = get_config("synthetic_interpolation", ov)
    trainer1, _ = run_experiment(cfg)
    step1 = int(trainer1.state.step)
    assert step1 >= 3
    cfg2 = get_config("synthetic_interpolation", ov)
    trainer2, _ = run_experiment(cfg2)
    assert int(trainer2.state.step) == step1
