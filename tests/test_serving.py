"""AOT serving export: jax.export artifact of a trained run's sampler.

The exported artifact must (a) embed the trained weights (no checkpoint or
model code needed at load time), (b) reproduce the in-framework predict
path to recompilation tolerance — serializing canonicalizes the StableHLO,
so XLA recompiles it with different (valid) fusion/reassociation choices
than the direct trace: identical math, different float associativity, ~3e-4
max relative drift measured — while the serialize->deserialize round trip
itself is deterministic, (c) carry a manifest describing the exact I/O
contract, (d) serve ANY batch size via the symbolic batch dimension, and
(e) ship the REAL product: a stage-2 DYffusion forecasting run with the
frozen interpolator inside the cold sampler and autoregressive window
chaining. Serving analogue of the reference's test-mode reload (ref
``run.py mode=test`` + ``src/train.py:44-67``).
"""
import json
import os

import jax
import numpy as np
import pytest

from dyffusion_tpu.config import get_config
from dyffusion_tpu.interface import run_experiment
from dyffusion_tpu.serving import _main, build_predict_fn, export_run, load_exported

TINY = [
    "datamodule.n_traj=4",
    "datamodule.n_time=16",
    "datamodule.spatial=(8,8)",
    "datamodule.channels=1",
    "datamodule.horizon=3",
    "datamodule.batch_size=4",
    "datamodule.eval_batch_size=4",
    "model.dim=8",
    "model.dim_mults=(1,)",
    "model.block_dropout=0.2",
    "module.num_predictions=2",
    "module.num_predictions_test=3",
    "trainer.max_epochs=1",
]


def _batch_from_specs(specs, batch_size=None, seed=0):
    rng = np.random.default_rng(seed)
    out = {}
    for k, s in specs.items():
        shape = (batch_size,) + s.shape[1:] if batch_size else s.shape
        out[k] = rng.standard_normal(shape).astype(s.dtype)
    return out


@pytest.fixture(scope="module")
def trained_run(tmp_path_factory):
    registry = str(tmp_path_factory.mktemp("registry"))
    cfg = get_config("synthetic_interpolation", TINY + [f"registry_dir={registry}"])
    trainer, best = run_experiment(cfg)
    assert np.isfinite(best)
    return registry, os.path.basename(trainer.ckpt.run_dir)


@pytest.fixture(scope="module")
def dyffusion_run(trained_run):
    """Stage-2 DYffusion forecasting run in the same registry: frozen stage-1
    interpolator inside the cold sampler, prediction_horizon=6 > horizon=3 so
    test-split eval chains TWO autoregressive windows."""
    registry, stage1_id = trained_run
    cfg = get_config(
        "synthetic_dyffusion",
        TINY
        + [
            "datamodule.prediction_horizon=6",
            f"diffusion.interpolator_run_id={stage1_id}",
            f"registry_dir={registry}",
        ],
    )
    trainer, best = run_experiment(cfg)
    assert np.isfinite(best)
    return registry, os.path.basename(trainer.ckpt.run_dir)


def test_export_roundtrip_matches_direct_call(trained_run, tmp_path):
    registry, run_id = trained_run
    predict, specs, info = build_predict_fn(registry, run_id)
    batch = _batch_from_specs(specs)
    seed = np.uint32(123)
    direct = np.asarray(predict(batch, seed))
    # (N, B, T, H, W, C): ensemble members x batch x horizon steps
    assert direct.shape[0] == info["ensemble_members"]
    assert direct.shape[1] == batch["dynamics"].shape[0]
    assert direct.dtype == np.float32

    out_dir = str(tmp_path / "artifact")
    path = export_run(registry, run_id, out_dir)
    assert os.path.exists(path)

    served, manifest = load_exported(out_dir, compilation_cache=False)
    out = np.asarray(served(batch, 123))
    # Recompilation tolerance, NOT bitwise: the serialized StableHLO module
    # is canonicalized, so XLA compiles it with different fusion/
    # reassociation decisions than the directly jitted trace — same math,
    # different float associativity (measured max rel ~3e-4 on this path).
    np.testing.assert_allclose(out, direct, rtol=1e-3, atol=1e-5)
    # a different seed must produce a different stochastic ensemble
    assert not np.allclose(np.asarray(served(batch, 7)), out)


def test_artifact_is_deterministic(trained_run, tmp_path):
    """The artifact itself is bit-stable: same bytes -> same executable ->
    bitwise identical outputs across loads and repeat calls (the drift in the
    roundtrip test above lives entirely in the direct-jit comparison)."""
    registry, run_id = trained_run
    out_dir = str(tmp_path / "artifact")
    export_run(registry, run_id, out_dir)
    _, specs, _ = build_predict_fn(registry, run_id)
    batch = _batch_from_specs(specs)
    served_a, _ = load_exported(out_dir, compilation_cache=False)
    served_b, _ = load_exported(out_dir, compilation_cache=False)
    a = np.asarray(served_a(batch, 42))
    np.testing.assert_array_equal(a, np.asarray(served_a(batch, 42)))
    np.testing.assert_array_equal(a, np.asarray(served_b(batch, 42)))


def test_polymorphic_batch_serves_any_size(trained_run, tmp_path):
    """Default export has a SYMBOLIC batch dim: one artifact, any B."""
    registry, run_id = trained_run
    _, specs, info = build_predict_fn(registry, run_id)
    out_dir = str(tmp_path / "artifact")
    export_run(registry, run_id, out_dir)
    served, manifest = load_exported(out_dir, compilation_cache=False)
    assert manifest["polymorphic_batch"] is True
    assert manifest["inputs"]["dynamics"]["shape"][0] == "b"
    for B in (1, 2, 5):
        out = np.asarray(served(_batch_from_specs(specs, batch_size=B), 0))
        assert out.shape[0] == info["ensemble_members"]
        assert out.shape[1] == B
        assert np.isfinite(out).all()


def test_static_export_pins_batch_size(trained_run, tmp_path):
    registry, run_id = trained_run
    out_dir = str(tmp_path / "artifact")
    export_run(registry, run_id, out_dir, batch_size=2, polymorphic_batch=False)
    served, manifest = load_exported(out_dir, compilation_cache=False)
    assert manifest["polymorphic_batch"] is False
    assert manifest["batch_size"] == 2
    assert manifest["inputs"]["dynamics"]["shape"][0] == 2
    _, specs, _ = build_predict_fn(registry, run_id, batch_size=2)
    out = np.asarray(served(_batch_from_specs(specs), 0))
    assert out.shape[1] == 2 and np.isfinite(out).all()


def test_stage2_dyffusion_export_roundtrip(dyffusion_run, tmp_path):
    """The REAL deployment artifact: a stage-2 DYffusion forecasting run —
    frozen interpolator inside the cold sampler, test-split ensemble size,
    TWO chained autoregressive windows (prediction_horizon=6, horizon=3)."""
    registry, run_id = dyffusion_run
    predict, specs, info = build_predict_fn(registry, run_id, split="test")
    assert info["experiment"] == "DyffusionForecastingExperiment"
    assert info["ensemble_members"] == 3  # num_predictions_test
    # forecasting conditions on the window only — no dead input slots
    assert info["dynamics_frames"] == 1
    assert info["dynamics_frames_read"] == [0]

    batch = _batch_from_specs(specs)
    direct = np.asarray(predict(batch, np.uint32(5)))
    # AR chaining: t1..t6 stacked on the time axis
    assert direct.shape[2] == 6

    out_dir = str(tmp_path / "artifact")
    export_run(registry, run_id, out_dir, split="test")
    served, manifest = load_exported(out_dir, compilation_cache=False)
    assert manifest["output"]["shape"][2] == 6
    out = np.asarray(served(batch, 5))
    # wider than the stage-1 roundtrip: the 2-window AR chain feeds window-1
    # recompile drift (see test_export_roundtrip_matches_direct_call) back
    # through 32 more sampler steps, amplifying it (measured ~2e-3 max rel)
    np.testing.assert_allclose(out, direct, rtol=5e-3, atol=1e-4)
    # the artifact still serves any batch size
    out2 = np.asarray(served(_batch_from_specs(specs, batch_size=2), 5))
    assert out2.shape[0] == direct.shape[0]  # same ensemble size
    assert out2.shape[1] == 2  # the new batch size
    assert out2.shape[2:] == direct.shape[2:]  # same (T, H, W, C)


def test_multi_platform_export(trained_run, tmp_path):
    """A ("cpu", "tpu") artifact lowers both platforms (Pallas kernels are
    swapped for XLA fallbacks at trace time) so TPU-built artifacts can be
    smoke-tested on CPU hosts (ref analogue: the reference's CPU fallbacks
    for its CUDA ops, ``op/upfirdn2d.py:16-17``)."""
    registry, run_id = trained_run
    out_dir = str(tmp_path / "artifact")
    export_run(registry, run_id, out_dir, platforms=("cpu", "tpu"))
    served, manifest = load_exported(out_dir, compilation_cache=False)
    assert set(manifest["platforms"]) == {"cpu", "tpu"}
    assert manifest["attention_kernel"] == "xla"
    _, specs, _ = build_predict_fn(registry, run_id)
    out = np.asarray(served(_batch_from_specs(specs, batch_size=2), 0))
    assert np.isfinite(out).all()


def test_manifest_describes_contract(trained_run, tmp_path):
    registry, run_id = trained_run
    out_dir = str(tmp_path / "artifact")
    export_run(registry, run_id, out_dir)
    with open(os.path.join(out_dir, "manifest.json")) as f:
        manifest = json.load(f)
    assert manifest["run_id"] == run_id
    assert manifest["slot"] == "best"
    # interpolation consumes window + horizon conditioning frames...
    assert manifest["dynamics_frames"] == 1 + 3
    # ...but READS only the window prefix and the last frame — the dead
    # in-between slots are documented so callers know to zero-fill them
    assert manifest["dynamics_frames_read"] == [0, 3]
    dyn = manifest["inputs"]["dynamics"]
    assert dyn["shape"][1] == manifest["dynamics_frames"]
    assert manifest["output"]["shape"][0] == manifest["ensemble_members"]
    assert manifest["seed"] == {"shape": [], "dtype": "uint32"}
    assert jax.default_backend() in manifest["platforms"]
    # host-portability: single-device weights, recorded
    assert manifest["devices"] == 1


def test_dead_input_frames_are_truly_dead(trained_run, tmp_path):
    """Interpolation serving: the frames NOT in dynamics_frames_read must not
    influence the output (they are DCE'd shape padding)."""
    registry, run_id = trained_run
    out_dir = str(tmp_path / "artifact")
    export_run(registry, run_id, out_dir)
    served, manifest = load_exported(out_dir, compilation_cache=False)
    _, specs, _ = build_predict_fn(registry, run_id)
    batch = _batch_from_specs(specs, batch_size=2)
    ref = np.asarray(served(batch, 9))
    dead = [i for i in range(manifest["dynamics_frames"])
            if i not in manifest["dynamics_frames_read"]]
    assert dead  # window=1, horizon=3 -> frames 1, 2 are dead
    batch2 = dict(batch)
    batch2["dynamics"] = batch["dynamics"].copy()
    batch2["dynamics"][:, dead] = 0.0
    np.testing.assert_array_equal(np.asarray(served(batch2, 9)), ref)


def test_artifact_is_self_contained(trained_run, tmp_path):
    """The artifact directory alone (moved away from the registry and the
    export process) must load and run — weights live inside it."""
    import shutil

    registry, run_id = trained_run
    _, specs, _ = build_predict_fn(registry, run_id)
    out_dir = str(tmp_path / "artifact")
    export_run(registry, run_id, out_dir)
    moved = str(tmp_path / "shipped_to_serving_host")
    shutil.copytree(out_dir, moved)
    shutil.rmtree(out_dir)
    batch = {k: np.zeros((3,) + s.shape[1:], s.dtype) for k, s in specs.items()}
    served, _ = load_exported(moved, compilation_cache=False)
    out = np.asarray(served(batch, 0))
    assert np.isfinite(out).all()


@pytest.fixture(scope="module")
def spring_dyffusion_run(tmp_path_factory):
    """Two-stage spring-mesh DYffusion through the real registry handoff:
    the physical-systems workload whose datamodule overrides the
    boundary-condition hook (pinned nodes re-imposed on every prediction,
    ref ``physical_systems_benchmark.py:274-296``)."""
    from dyffusion_tpu.data.physical_systems import write_fake_benchmark_dir

    root = str(tmp_path_factory.mktemp("bench"))
    write_fake_benchmark_dir(root, "spring-mesh", n_time=16)
    registry = str(tmp_path_factory.mktemp("registry_spring"))
    tiny = [
        f"datamodule.data_dir={root}",
        "datamodule.horizon=4",
        "datamodule.prediction_horizon=8",  # 2 AR windows at test/predict
        "datamodule.batch_size=4",
        "datamodule.eval_batch_size=2",
        "model.dim=8",
        "module.num_predictions=2",
        "module.num_predictions_test=2",
        "trainer.max_epochs=1",
        f"registry_dir={registry}",
    ]
    cfg1 = get_config("spring_mesh_interpolation", tiny)
    trainer1, best1 = run_experiment(cfg1)
    assert np.isfinite(best1)
    run1 = os.path.basename(trainer1.ckpt.run_dir)
    cfg2 = get_config(
        "spring_mesh_dyffusion", tiny + [f"diffusion.interpolator_run_id={run1}"]
    )
    trainer2, best2 = run_experiment(cfg2)
    assert np.isfinite(best2)
    return registry, os.path.basename(trainer2.ckpt.run_dir), trainer2


def test_spring_export_applies_boundary_conditions(spring_dyffusion_run, tmp_path):
    """The physics boundary hook lives INSIDE the artifact: pinned spring-mesh
    nodes (fixed_mask) must carry the base positions and zero momentum in
    every served ensemble member, at every AR-chained step."""
    registry, run_id, trainer = spring_dyffusion_run
    out_dir = str(tmp_path / "artifact")
    export_run(registry, run_id, out_dir, split="test")
    served, manifest = load_exported(out_dir, compilation_cache=False)
    assert manifest["output"]["shape"][2] == 8  # 2 chained windows of h=4

    # REAL batch (metadata matters for the boundary hook), reduced to the
    # serving contract: conditioning window + statics
    example = next(iter(trainer._eval_batches("test")))
    B = next(iter(manifest["inputs"].values()))["shape"][0]
    B = 2 if B == "b" else B
    batch = {
        k: np.asarray(v)[:B, : manifest["dynamics_frames"]]
        if k == "dynamics" else np.asarray(v)[:B]
        for k, v in example.items()
    }
    out = np.asarray(served(batch, 3))  # (N, B, T, H, W, C)
    assert np.isfinite(out).all()
    fixed = np.asarray(batch["metadata_fixed_mask"], bool)  # (B, H, W, C)
    base_q = np.asarray(batch["metadata_base_q"])
    for n in range(out.shape[0]):
        for t in range(out.shape[2]):
            for b in range(out.shape[1]):
                fq = fixed[b][..., 2:]
                np.testing.assert_allclose(
                    out[n, b, t][..., 2:][fq], base_q[b][fq], rtol=1e-4, atol=1e-5
                )
                fp = fixed[b][..., :2]
                assert np.all(out[n, b, t][..., :2][fp] == 0.0)


def test_data_parallel_export_serves_on_device_mesh(trained_run, tmp_path):
    """``devices=4`` exports a DATA-PARALLEL artifact: batch dim sharded over
    a 4-device mesh, weights GSPMD-replicated. Served output must match the
    1-device artifact on the same inputs (recompilation tolerance)."""
    if jax.device_count() < 4:
        pytest.skip("needs >=4 devices (canonical suite runs with 8)")
    registry, run_id = trained_run
    _, specs, _ = build_predict_fn(registry, run_id, batch_size=4)
    batch = _batch_from_specs(specs)

    solo_dir = str(tmp_path / "solo")
    export_run(registry, run_id, solo_dir, batch_size=4, polymorphic_batch=False)
    solo, _ = load_exported(solo_dir, compilation_cache=False)
    ref = np.asarray(solo(batch, 11))

    dp_dir = str(tmp_path / "dp4")
    export_run(
        registry, run_id, dp_dir, batch_size=4, polymorphic_batch=False, devices=4
    )
    served, manifest = load_exported(dp_dir, compilation_cache=False)
    assert manifest["devices"] == 4
    out = np.asarray(served(batch, 11))
    np.testing.assert_allclose(out, ref, rtol=1e-3, atol=1e-5)

    # misuse fails loudly at export time
    with pytest.raises(ValueError, match="divisible"):
        export_run(registry, run_id, str(tmp_path / "bad"), batch_size=3,
                   polymorphic_batch=False, devices=4)
    with pytest.raises(ValueError, match="polymorphic_batch"):
        export_run(registry, run_id, str(tmp_path / "bad2"), devices=4)


def test_data_parallel_artifact_rejects_small_host(trained_run, tmp_path, monkeypatch):
    """A devices=N artifact on a host with fewer devices must fail with the
    re-export instruction, not a cryptic XLA error."""
    if jax.device_count() < 4:
        pytest.skip("needs >=4 devices")
    registry, run_id = trained_run
    out_dir = str(tmp_path / "dp4")
    export_run(registry, run_id, out_dir, batch_size=4, polymorphic_batch=False,
               devices=4)
    import dyffusion_tpu.serving as serving_mod

    monkeypatch.setattr(serving_mod.jax, "device_count", lambda: 2)
    with pytest.raises(RuntimeError, match="re-export"):
        load_exported(out_dir, compilation_cache=False)


def test_load_exported_populates_compilation_cache(trained_run, tmp_path):
    """``load_exported(compilation_cache=True)`` colocates a persistent XLA
    compilation cache with the artifact: after the first call the cache dir
    holds the compiled executable. OPT-IN since round 5 — on the measured
    tunneled-TPU host reloading the persisted executable is SLOWER than
    recompiling (PERF.md serving-restart table); this test pins the
    mechanism, not a speed claim."""
    registry, run_id = trained_run
    out_dir = str(tmp_path / "artifact")
    export_run(registry, run_id, out_dir)

    prev_dir = getattr(jax.config, "jax_compilation_cache_dir", None)
    prev_min = getattr(jax.config, "jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_compilation_cache_dir", None)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    # drop jax's IN-MEMORY compilation-cache layer: it is keyed by HLO hash
    # (not by cache dir), so an identical graph compiled earlier in this
    # process — e.g. under the suite-wide .jax_cache_tests — would satisfy
    # this compile from memory and never write to the artifact's own dir.
    # Private API, so guarded: if a jax upgrade moves it, skip rather than
    # fail on an import error unrelated to the serving contract.
    try:
        from jax._src import compilation_cache as _cc

        _reset = _cc.reset_cache
    except (ImportError, AttributeError):
        pytest.skip("jax compilation-cache reset API moved; mechanism untestable here")
    _reset()
    try:
        served, manifest = load_exported(out_dir, compilation_cache=True)
        cache_dir = os.path.join(out_dir, "xla_cache")
        assert getattr(jax.config, "jax_compilation_cache_dir", None) == cache_dir
        batch = _batch_from_specs(
            {k: jax.ShapeDtypeStruct([2 if d == "b" else d for d in v["shape"]],
                                     np.dtype(v["dtype"]))
             for k, v in manifest["inputs"].items()}
        )
        out = np.asarray(served(batch, 7))
        assert np.isfinite(out).all()
        assert os.path.isdir(cache_dir) and os.listdir(cache_dir)
    finally:
        jax.config.update("jax_compilation_cache_dir", prev_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", prev_min)
        _reset()  # detach from the artifact dir removed with tmp_path


def test_empty_split_raises_clear_error(trained_run, monkeypatch):
    from dyffusion_tpu.training.trainer import Trainer

    registry, run_id = trained_run
    monkeypatch.setattr(Trainer, "_eval_batches", lambda self, split: iter(()))
    with pytest.raises(ValueError, match="empty"):
        build_predict_fn(registry, run_id)


def test_cli_rejects_malformed_args():
    with pytest.raises(SystemExit, match="run_id"):
        _main([])  # missing required args -> explicit usage error, not assert
    with pytest.raises(SystemExit, match="key=value"):
        _main(["run_id=x", "out=y", "oops-no-equals"])
    with pytest.raises(SystemExit, match="polymorphic_batch"):
        _main(["run_id=x", "out=y", "polymorphic_batch=maybe"])


@pytest.fixture(scope="module")
def ns_dyffusion_run(tmp_path_factory):
    """Two-stage Navier-Stokes DYffusion run (UNetSimple backbone,
    forward_conditioning='none' + refined intermediates per the
    navier_stokes_dyffusion preset): the workload whose boundary condition is
    TIME-DEPENDENT — the parabolic inflow profile driven by per-example
    ``t0``/``dt`` metadata across AR windows (ref
    ``physical_systems_benchmark.py:245-273,299-303``)."""
    from dyffusion_tpu.data.physical_systems import write_fake_benchmark_dir

    root = str(tmp_path_factory.mktemp("bench_ns"))
    write_fake_benchmark_dir(root, "navier-stokes", n_time=12)
    registry = str(tmp_path_factory.mktemp("registry_ns"))
    tiny = [
        f"datamodule.data_dir={root}",
        "datamodule.horizon=4",
        "datamodule.prediction_horizon=8",  # 2 AR windows at test/predict
        "datamodule.batch_size=4",
        "datamodule.eval_batch_size=2",
        "model.dim=8",
        "model.upsample_dims=(64,64)",
        "module.num_predictions=2",
        "module.num_predictions_test=2",
        "trainer.max_epochs=1",
        "trainer.max_steps=2",
        f"registry_dir={registry}",
    ]
    cfg1 = get_config("navier_stokes_interpolation", tiny)
    trainer1, best1 = run_experiment(cfg1)
    assert np.isfinite(best1)
    run1 = os.path.basename(trainer1.ckpt.run_dir)
    cfg2 = get_config(
        "navier_stokes_dyffusion", tiny + [f"diffusion.interpolator_run_id={run1}"]
    )
    trainer2, best2 = run_experiment(cfg2)
    assert np.isfinite(best2)
    return registry, os.path.basename(trainer2.ckpt.run_dir), trainer2


def test_ns_export_applies_time_dependent_boundary_conditions(ns_dyffusion_run, tmp_path):
    """The HARD boundary case lives inside the artifact: the NS parabolic
    inflow ``4 v y (0.41-y)/0.41^2 (1 - e^{-5t})`` evaluated at the ABSOLUTE
    simulation time ``t0 + dt * step`` of every AR-chained step, with
    ``t0``/``dt`` read from per-example batch metadata (not baked constants),
    plus fixed-mask zeroing — in every served ensemble member (ref
    ``physical_systems_benchmark.py:245-273,299-303``)."""
    registry, run_id, trainer = ns_dyffusion_run
    out_dir = str(tmp_path / "artifact")
    export_run(registry, run_id, out_dir, split="test")
    served, manifest = load_exported(out_dir, compilation_cache=False)
    assert manifest["output"]["shape"][2] == 8  # 2 chained windows of h=4

    # REAL example (metadata layout matters), tiled to B=2 rows with
    # DISTINCT per-row t0/dt so metadata plumb-through is observable
    example = next(iter(trainer._eval_batches("test")))
    B = 2
    batch = {}
    for k, v in example.items():
        v = np.asarray(v)
        v = v[:, : manifest["dynamics_frames"]] if k == "dynamics" else v
        reps = (B,) + (1,) * (v.ndim - 1)
        batch[k] = np.tile(v[:1], reps) if v.shape[0] < B else v[:B]
    t0 = np.array([0.3, 1.7], np.float32)
    dt = np.array([0.1, 0.25], np.float32)
    batch["metadata_t0"] = t0
    batch["metadata_dt"] = dt

    out = np.asarray(served(batch, 3))  # (N, B, T, H, W, C)
    assert np.isfinite(out).all()
    v = np.asarray(batch["metadata_in_velocity"])  # (B,)
    vy = np.asarray(batch["metadata_vertex_y"])  # (B, W)
    fixed = np.asarray(batch["metadata_fixed_mask"], bool)  # (B, H, W, 3)
    for b in range(B):
        for t in range(out.shape[2]):
            # absolute simulation time of AR step t (1-based horizon steps)
            abs_t = t0[b] + dt[b] * (t + 1)
            lb = v[b] * 4.0 * vy[b] * (0.41 - vy[b]) / 0.41**2 * (
                1.0 - np.exp(-5.0 * abs_t)
            )
            for n in range(out.shape[0]):
                np.testing.assert_allclose(
                    out[n, b, t][0, :, 0], lb, rtol=1e-4, atol=1e-5,
                    err_msg=f"inflow row wrong at member {n} batch {b} step {t}",
                )
                # fixed-mask zeroing away from the inflow row
                inner = fixed[b, 1:, :, :]
                assert np.all(out[n, b, t][1:, :, :][inner] == 0.0)
    # the time dependence is real: the same row differs between chained steps
    assert not np.allclose(out[0, 0, 0][0, :, 0], out[0, 0, 7][0, :, 0])
    # ...and between rows with different t0/dt
    assert not np.allclose(out[0, 0, 0][0, :, 0], out[0, 1, 0][0, :, 0])


def test_reduced_artifact_ships_ensemble_stats(trained_run, tmp_path):
    """``reduce='mean_std'`` reduces the ensemble ON DEVICE: the artifact
    returns (2, B, T, ...) = [mean, std] over members instead of the raw
    (N, B, T, ...) field — the fix for output-transfer-bound serving
    (PERF.md NS serving row: member download dominates the served rate)."""
    registry, run_id = trained_run
    full_dir, red_dir = str(tmp_path / "full"), str(tmp_path / "red")
    export_run(registry, run_id, full_dir)
    export_run(registry, run_id, red_dir, reduce="mean_std")
    full, m_full = load_exported(full_dir, compilation_cache=False)
    red, m_red = load_exported(red_dir, compilation_cache=False)
    assert m_red["reduce"] == "mean_std"
    assert m_red["output"]["shape"][0] == 2
    assert m_red["output"]["axes"][0] == "stat(mean,std)"

    _, specs, info = build_predict_fn(registry, run_id)
    batch = _batch_from_specs(specs, batch_size=2)
    members = np.asarray(full(batch, 21))  # (N, B, T, ...)
    stats = np.asarray(red(batch, 21))  # (2, B, T, ...)
    assert members.shape[0] == info["ensemble_members"]
    assert stats.shape == (2,) + members.shape[1:]
    # same seed -> same members inside both artifacts; stats must agree with
    # host-side reduction to recompilation tolerance
    np.testing.assert_allclose(stats[0], members.mean(axis=0), rtol=1e-3, atol=1e-5)
    np.testing.assert_allclose(stats[1], members.std(axis=0), rtol=1e-2, atol=1e-4)
    # misuse fails loudly
    with pytest.raises(ValueError, match="reduce"):
        export_run(registry, run_id, str(tmp_path / "bad"), reduce="median")
