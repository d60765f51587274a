"""AOT serving export: a trained run's full ensemble sampler as ONE
self-contained artifact.

The deployment analogue of the reference's test-mode reload (ref ``run.py
mode=test`` + ``src/train.py:44-67``: wandb ckpt -> Lightning module ->
predict loop), redesigned TPU-first: instead of shipping the framework +
model code + checkpoint to the serving fleet, :func:`export_run` lowers the
jitted product predict path (the SAME folded-ensemble/bf16 sampler
``Trainer.evaluate`` runs) through ``jax.export`` into a serialized
StableHLO artifact with the trained weights embedded as constants. The
artifact is loadable with :func:`load_exported` (or plain
``jax.export.deserialize``) in a process that imports nothing from this
package — one compile, no Python model code on the serving host.

Numerics contract: the serialize -> deserialize round trip is BIT-STABLE
(same StableHLO bytes, same executable). Against the directly jitted
in-framework predict path the artifact agrees to recompilation tolerance
only (~1e-3 relative): serializing canonicalizes the StableHLO module, so
XLA recompiles it with (validly) different fusion/reassociation decisions
than the direct trace — identical math, different float associativity.

Portability contract: the reload is forced single-device (overrides
``trainer.devices=1`` / ``trainer.spatial_shards=1``), so the embedded
weights are unsharded and the default artifact runs on any 1-device
serving host; ``manifest.json`` records ``devices``. Pass ``devices=N``
(with a pinned batch divisible by N) for a DATA-PARALLEL artifact: the
batch dimension is sharded over a 1-axis mesh and GSPMD replicates the
weights, so an N-chip serving host runs N-chip batches — the host must
have exactly N devices (:func:`load_exported` checks). By default the
batch dimension is SYMBOLIC (``jax.export.symbolic_shape``): one artifact
serves any batch size >= 1 (TPU-only Pallas kernels are swapped for their
XLA fallbacks at trace time, which polymorphic shapes require). Pass
``polymorphic_batch=False`` to pin the batch and keep Pallas kernels in a
single-platform TPU artifact.

Input contract: ``predict(batch, seed) -> (N, B, T, H, W, C)`` float32
ensemble forecast, where ``batch`` is a dict of arrays (``dynamics`` = the
conditioning frames — ``window`` frames for forecasting runs,
``window + horizon`` for interpolation runs — plus the run's static
``condition`` / ``metadata_*`` arrays if its datamodule provides them) and
``seed`` is a uint32 scalar seeding the MC-dropout/sampling noise. For
interpolation runs only the ``window`` prefix frames and the LAST frame are
read (the in-between slots exist for shape compatibility with the training
layout and may be zero-filled); ``manifest.json`` records the exact
read set as ``dynamics_frames_read`` alongside the full input/output specs.
"""
from __future__ import annotations

import contextlib
import json
import os
import re
from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

_ARTIFACT = "sampler.jaxexport"
_MANIFEST = "manifest.json"


def _dynamics_frame_contract(exp) -> Tuple[int, list]:
    """(frames, frames_read) of ``batch['dynamics']`` for the predict path:
    forecasting consumes the conditioning window; interpolation needs
    ``window + horizon`` frames for shape compatibility but READS only the
    window prefix and the last frame (both interpolation endpoints are
    inputs, ``experiments/interpolation.py:get_inputs``) — the in-between
    slots are dead inputs a serving caller may zero-fill."""
    from dyffusion_tpu.experiments.interpolation import InterpolationExperiment

    if isinstance(exp, InterpolationExperiment):
        w, h = exp.cfg.window, exp.cfg.horizon
        return w + h, list(range(w)) + [w + h - 1]
    w = exp.cfg.window
    return w, list(range(w))


def _t_index(key: str) -> int:
    m = re.fullmatch(r"t(\d+)_preds", key)
    return int(m.group(1)) if m else -1


def build_predict_fn(
    registry_dir: str,
    run_id: str,
    overrides: Optional[Sequence[str]] = None,
    slot: str = "best",
    split: str = "predict",
    batch_size: Optional[int] = None,
    reduce: Optional[str] = None,
) -> Tuple[Any, Dict[str, jax.ShapeDtypeStruct], Dict[str, Any]]:
    """Reload a finished run and close its eval path over the trained
    weights: returns ``(predict, input_specs, info)`` where
    ``predict(batch, seed_uint32)`` is a pure jittable function producing the
    (N, B, T, ...) ensemble forecast, ``input_specs`` is the batch spec pytree
    (dtype/shape layout from the run's own ``split`` data, dynamics truncated
    to the conditioning frames, leading dim = ``batch_size``), and ``info``
    describes the run for the manifest.

    The reload is forced single-device (``trainer.devices=1``): exported
    weights must be unsharded constants so the artifact runs on any serving
    host regardless of its device count.

    ``split`` picks the ensemble size (``predict``/``val`` =
    ``module.num_predictions``, ``test`` = ``num_predictions_test``);
    ``batch_size`` defaults to the run's ``eval_batch_size``.

    ``reduce='mean_std'`` reduces the ensemble ON DEVICE: the artifact
    returns ``(2, B, T, ...)`` — ``[ensemble mean, ensemble std]`` — instead
    of all N members, cutting the device->host output bytes N/2-fold. This
    is the fix for output-transfer-bound serving (PERF.md NS serving row:
    the 20-member NS field is ~143 MB/call and dominates the served rate;
    the reduced artifact ships ~14 MB). Hosts that need the full member
    field keep the default ``reduce=None``."""
    if reduce not in (None, "mean_std"):
        # validate BEFORE the expensive checkpoint reload so CLI typos fail
        # in milliseconds, not after minutes of trainer construction
        raise ValueError(f"unknown reduce '{reduce}' (choose None or 'mean_std')")
    from dyffusion_tpu.interface import reload_trainer

    trainer = reload_trainer(
        registry_dir,
        run_id,
        list(overrides or []) + ["trainer.devices=1", "trainer.spatial_shards=1"],
        slot=slot,
    )
    exp = trainer.experiment
    eval_fn = trainer.eval_fns[split]
    variables = trainer._eval_vars()  # best-slot params (+EMA when enabled), pre-cast

    # input spec from the run's own data layout, reduced to what serving
    # actually feeds: conditioning dynamics + per-example statics
    example = next(iter(trainer._eval_batches(split)), None)
    if example is None:
        raise ValueError(
            f"run {run_id}: split '{split}' is empty — cannot derive the "
            "serving input spec (choose another split or add data)"
        )
    frames, frames_read = _dynamics_frame_contract(exp)
    if batch_size is None:
        batch_size = int(trainer.datamodule.eval_batch_size)
    if batch_size < 1:
        raise ValueError(f"batch_size must be >= 1, got {batch_size}")
    input_specs = {}
    for k, v in example.items():
        v = np.asarray(v)
        tail = (frames,) + v.shape[2:] if k == "dynamics" else v.shape[1:]
        input_specs[k] = jax.ShapeDtypeStruct((batch_size,) + tail, v.dtype)

    def predict(batch: Dict[str, jax.Array], seed: jax.Array) -> jax.Array:
        out = eval_fn(variables, batch, jax.random.key(seed))
        keys = sorted((k for k in out if _t_index(k) > 0), key=_t_index)
        members = jnp.stack([out[k] for k in keys], axis=2)  # (N, B, T, ...)
        if reduce == "mean_std":
            # on-device ensemble reduction: ship stats, not members
            return jnp.stack([members.mean(axis=0), members.std(axis=0)], axis=0)
        return members

    n_members = exp.num_members(split)
    info = {
        "run_id": run_id,
        "slot": slot,
        "experiment": type(exp).__name__,
        "ensemble_members": int(n_members),
        "dynamics_frames": int(frames),
        "dynamics_frames_read": [int(i) for i in frames_read],
        "devices": 1,
        "batch_size": int(batch_size),
        "reduce": reduce,
    }
    return predict, input_specs, info


def export_run(
    registry_dir: str,
    run_id: str,
    out_dir: str,
    overrides: Optional[Sequence[str]] = None,
    slot: str = "best",
    split: str = "predict",
    platforms: Optional[Sequence[str]] = None,
    batch_size: Optional[int] = None,
    polymorphic_batch: bool = True,
    devices: int = 1,
    reduce: Optional[str] = None,
) -> str:
    """Export ``run_id``'s trained sampler to ``out_dir`` as a serialized
    ``jax.export`` artifact (weights embedded) + ``manifest.json``.

    ``platforms=None`` lowers for the current backend; pass e.g.
    ``("cpu", "tpu")`` for a multi-platform artifact (TPU-only Pallas
    kernels are swapped for their XLA fallbacks at trace time).

    ``polymorphic_batch=True`` (default) exports a SYMBOLIC batch dimension
    — one artifact serves any batch size — which also requires the XLA
    kernel paths. ``polymorphic_batch=False`` pins the batch to
    ``batch_size`` (default: the run's eval_batch_size) and keeps Pallas
    kernels when exporting for TPU only. Returns the artifact path.

    ``devices=N`` exports a DATA-PARALLEL artifact for an N-chip serving
    host: the batch dimension is sharded over a 1-axis device mesh (GSPMD
    replicates the embedded weights and partitions the sampler), so one
    artifact serves N-chip batches at N-chip throughput. Requires a pinned
    batch (``polymorphic_batch=False``) divisible by N; the serving host
    must have exactly N devices (recorded in the manifest, checked loudly
    by :func:`load_exported`).

    ``reduce='mean_std'`` ships the on-device ensemble reduction instead of
    the raw members (see :func:`build_predict_fn`) — the fix for
    output-transfer-bound serving (PERF.md NS serving row)."""
    predict, input_specs, info = build_predict_fn(
        registry_dir, run_id, overrides, slot=slot, split=split,
        batch_size=batch_size, reduce=reduce,
    )
    seed_spec = jax.ShapeDtypeStruct((), jnp.uint32)
    kwargs = {"platforms": list(platforms)} if platforms else {}

    multi_platform = platforms is not None and len(set(platforms)) > 1
    cross_platform = platforms is not None and set(platforms) != {jax.default_backend()}
    need_xla_paths = polymorphic_batch or multi_platform or cross_platform or devices > 1
    if devices > 1:
        if polymorphic_batch:
            raise ValueError(
                "devices>1 requires polymorphic_batch=False: the batch must "
                "be pinned to shard it over the device mesh"
            )
        bsz = next(iter(input_specs.values())).shape[0]
        if bsz % devices:
            raise ValueError(
                f"batch_size={bsz} is not divisible by devices={devices}"
            )
        if devices > jax.device_count():
            raise ValueError(
                f"devices={devices} exceeds the {jax.device_count()} devices "
                "visible at export time"
            )
    if polymorphic_batch:
        (b,) = jax.export.symbolic_shape("b")
        export_specs = {
            k: jax.ShapeDtypeStruct((b,) + s.shape[1:], s.dtype)
            for k, s in input_specs.items()
        }
    else:
        export_specs = input_specs

    if devices > 1:
        from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

        mesh = Mesh(np.array(jax.devices()[:devices]), ("data",))
        fn = jax.jit(
            predict,
            in_shardings=(
                {k: NamedSharding(mesh, P("data")) for k in export_specs},
                NamedSharding(mesh, P()),
            ),
            # (N_members, B, T, ...): batch is axis 1
            out_shardings=NamedSharding(mesh, P(None, "data")),
        )
    else:
        fn = jax.jit(predict)

    if need_xla_paths:
        from dyffusion_tpu.ops.pallas_attention import force_xla_path

        ctx = force_xla_path()
    else:
        ctx = contextlib.nullcontext()
    with ctx:
        exported = jax.export.export(fn, **kwargs)(export_specs, seed_spec)

    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, _ARTIFACT)
    with open(path, "wb") as f:
        f.write(exported.serialize())

    def _dims(shape) -> list:
        return [int(d) if isinstance(d, int) else str(d) for d in shape]

    out_aval = exported.out_avals[0]
    manifest = {
        **info,
        "devices": int(devices),  # serving host must have exactly this many
        "platforms": list(exported.platforms),
        "polymorphic_batch": bool(polymorphic_batch),
        "attention_kernel": "xla" if need_xla_paths else "auto",
        "inputs": {
            k: {"shape": _dims(s.shape), "dtype": str(np.dtype(s.dtype))}
            for k, s in export_specs.items()
        },
        "seed": {"shape": [], "dtype": "uint32"},
        "output": {
            "shape": _dims(out_aval.shape),
            "dtype": str(out_aval.dtype),
            "axes": (["stat(mean,std)"] if reduce == "mean_std" else ["member"])
            + ["batch", "time", "..."],
        },
    }
    with open(os.path.join(out_dir, _MANIFEST), "w") as f:
        json.dump(manifest, f, indent=2)
    return path


def load_exported(out_dir: str, compilation_cache: bool = False):
    """Load an :func:`export_run` artifact; returns ``(predict, manifest)``
    where ``predict(batch, seed)`` executes the compiled sampler. Needs only
    jax — no framework imports, model code or checkpoint.

    ``compilation_cache=True`` points JAX's persistent compilation cache at
    ``<out_dir>/xla_cache`` (unless the process already configured one), so
    a process restart can reload the compiled executable instead of
    recompiling the StableHLO. It is OPT-IN because on the measured
    deployment host it LOSES (PERF.md serving-restart table, TPU v5e via the
    axon tunnel, 2026-08-20): a restart recompile measured 55-166 s across
    sessions while reloading the 180 MB persisted executable measured
    210-790 s — the deserialize + device upload through the tunnel dominates
    and the ordering held in every pairing. On a
    directly-attached TPU host the cache is typically the win; measure YOUR
    topology with ``scripts/bench_serving.py --restart-only <artifact>``
    before enabling. The calls are routed through ``jax.jit`` so they hit
    the cache when enabled (one entry per concrete batch shape under a
    polymorphic-batch artifact)."""
    if compilation_cache and not getattr(jax.config, "jax_compilation_cache_dir", None):
        jax.config.update(
            "jax_compilation_cache_dir", os.path.join(out_dir, "xla_cache")
        )
    with open(os.path.join(out_dir, _ARTIFACT), "rb") as f:
        exported = jax.export.deserialize(f.read())
    with open(os.path.join(out_dir, _MANIFEST)) as f:
        manifest = json.load(f)
    need = int(manifest.get("devices", 1))
    if need > 1 and jax.device_count() < need:
        raise RuntimeError(
            f"artifact was exported data-parallel over {need} devices but "
            f"this host has {jax.device_count()} — re-export with devices="
            f"{jax.device_count()} (or 1) for this topology"
        )

    if need > 1:
        # rebuild the export-time placement on THIS host's devices: batch dim
        # sharded over a 1-axis data mesh, seed replicated (export_run's
        # devices=N contract)
        from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

        mesh = Mesh(np.array(jax.devices()[:need]), ("data",))
        _call = jax.jit(
            exported.call,
            in_shardings=(
                {k: NamedSharding(mesh, P("data")) for k in manifest["inputs"]},
                NamedSharding(mesh, P()),
            ),
            out_shardings=NamedSharding(mesh, P(None, "data")),
        )
    else:
        _call = jax.jit(exported.call)

    def predict(batch: Dict[str, jax.Array], seed) -> jax.Array:
        # numpy scalar, not jnp: an uncommitted input lets the jit place the
        # seed per the artifact's sharding (replicated on a devices>1 mesh)
        return _call(batch, np.uint32(seed))

    return predict, manifest


def _main(argv: Optional[Sequence[str]] = None) -> str:
    """CLI: ``python -m dyffusion_tpu.serving run_id=<id> out=<dir>
    [registry_dir=runs] [slot=best] [split=predict] [platforms=tpu,cpu]
    [batch_size=N] [polymorphic_batch=false] [devices=N] [reduce=mean_std]
    [key.subkey=value ...]`` — export a trained run's sampler artifact."""
    import sys

    def usage(msg: str) -> "SystemExit":
        return SystemExit(f"error: {msg}\n\n{_main.__doc__}")

    args: Dict[str, Any] = dict(
        registry_dir="runs", slot="best", split="predict", platforms=None,
        batch_size=None, polymorphic_batch=True, devices=1, reduce=None,
    )
    overrides = []
    for arg in sys.argv[1:] if argv is None else argv:
        k, eq, v = arg.partition("=")
        if not eq or not k:
            raise usage(f"argument {arg!r} is not of the form key=value")
        if k in ("run_id", "out", "registry_dir", "slot", "split", "reduce"):
            args[k] = v
        elif k == "platforms":
            args["platforms"] = v.split(",")
        elif k in ("batch_size", "devices"):
            args[k] = int(v)
        elif k == "polymorphic_batch":
            if v.lower() not in ("true", "false"):
                raise usage(f"polymorphic_batch must be true or false, got {v!r}")
            args["polymorphic_batch"] = v.lower() == "true"
        else:
            overrides.append(arg)
    if "run_id" not in args or "out" not in args:
        raise usage("run_id=<id> and out=<dir> are required")
    path = export_run(
        args["registry_dir"], args["run_id"], args.pop("out"),
        overrides=overrides, slot=args["slot"], split=args["split"],
        platforms=args["platforms"], batch_size=args["batch_size"],
        polymorphic_batch=args["polymorphic_batch"], devices=args["devices"],
        reduce=args["reduce"],
    )
    print(path)
    return path


if __name__ == "__main__":
    _main()
