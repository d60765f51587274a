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
package — static shapes, one compile, no Python model code on the serving
host.

Contract: ``predict(batch, seed) -> (N, B, T, H, W, C)`` float32 ensemble
forecast, where ``batch`` is a dict of arrays (``dynamics`` = the
conditioning frames — ``window`` frames for forecasting runs,
``window + horizon`` for interpolation runs — plus the run's static
``condition`` / ``metadata_*`` arrays if its datamodule provides them) and
``seed`` is a uint32 scalar seeding the MC-dropout/sampling noise. The
sidecar ``manifest.json`` records the exact input/output specs.
"""
from __future__ import annotations

import json
import os
import re
from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

_ARTIFACT = "sampler.jaxexport"
_MANIFEST = "manifest.json"


def _min_dynamics_frames(exp) -> int:
    """Frames of ``batch['dynamics']`` the predict path consumes: the
    conditioning window for forecasting; window + horizon for interpolation
    (both endpoints are inputs, ``experiments/interpolation.py:get_inputs``)."""
    from dyffusion_tpu.experiments.interpolation import InterpolationExperiment

    if isinstance(exp, InterpolationExperiment):
        return exp.cfg.window + exp.cfg.horizon
    return exp.cfg.window


def _t_index(key: str) -> int:
    m = re.fullmatch(r"t(\d+)_preds", key)
    return int(m.group(1)) if m else -1


def build_predict_fn(
    registry_dir: str,
    run_id: str,
    overrides: Optional[Sequence[str]] = None,
    slot: str = "best",
    split: str = "predict",
) -> Tuple[Any, Dict[str, jax.ShapeDtypeStruct], Dict[str, Any]]:
    """Reload a finished run and close its eval path over the trained
    weights: returns ``(predict, input_specs, info)`` where
    ``predict(batch, seed_uint32)`` is a pure jittable function producing the
    (N, B, T, ...) ensemble forecast, ``input_specs`` is the batch spec pytree
    (an example batch from the run's own predict split, dynamics truncated to
    the conditioning frames), and ``info`` describes the run for the manifest.

    ``split`` picks the ensemble size (``predict``/``val`` =
    ``module.num_predictions``, ``test`` = ``num_predictions_test``)."""
    from dyffusion_tpu.interface import reload_trainer

    trainer = reload_trainer(registry_dir, run_id, list(overrides or []), slot=slot)
    exp = trainer.experiment
    eval_fn = trainer.eval_fns[split]
    variables = trainer._eval_vars()  # best-slot params (+EMA when enabled), pre-cast

    # example batch from the run's own data layout, reduced to what serving
    # actually feeds: conditioning dynamics + per-example statics
    batches = trainer._eval_batches(split)
    example = next(iter(batches))
    frames = _min_dynamics_frames(exp)
    example = {
        k: np.asarray(v)[:, :frames] if k == "dynamics" else np.asarray(v)
        for k, v in example.items()
    }
    input_specs = {
        k: jax.ShapeDtypeStruct(v.shape, v.dtype) for k, v in example.items()
    }

    def predict(batch: Dict[str, jax.Array], seed: jax.Array) -> jax.Array:
        out = eval_fn(variables, batch, jax.random.key(seed))
        keys = sorted((k for k in out if _t_index(k) > 0), key=_t_index)
        return jnp.stack([out[k] for k in keys], axis=2)

    n_members = exp.num_members(split)
    info = {
        "run_id": run_id,
        "slot": slot,
        "experiment": type(exp).__name__,
        "ensemble_members": int(n_members),
        "dynamics_frames": int(frames),
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
) -> str:
    """Export ``run_id``'s trained sampler to ``out_dir`` as a serialized
    ``jax.export`` artifact (weights embedded) + ``manifest.json``.

    ``platforms=None`` lowers for the current backend; pass e.g.
    ``("tpu",)`` on a TPU host to pin, or multiple for a multi-platform
    artifact (note: TPU-only custom kernels preclude adding "cpu" to a TPU
    export). Returns the artifact path."""
    predict, input_specs, info = build_predict_fn(
        registry_dir, run_id, overrides, slot=slot, split=split
    )
    seed_spec = jax.ShapeDtypeStruct((), jnp.uint32)
    kwargs = {"platforms": list(platforms)} if platforms else {}
    exported = jax.export.export(jax.jit(predict), **kwargs)(input_specs, seed_spec)

    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, _ARTIFACT)
    with open(path, "wb") as f:
        f.write(exported.serialize())
    out_aval = exported.out_avals[0]
    manifest = {
        **info,
        "platforms": list(exported.platforms),
        "inputs": {
            k: {"shape": list(s.shape), "dtype": str(np.dtype(s.dtype))}
            for k, s in input_specs.items()
        },
        "seed": {"shape": [], "dtype": "uint32"},
        "output": {
            "shape": list(out_aval.shape),
            "dtype": str(out_aval.dtype),
            "axes": ["member", "batch", "time", "..."],
        },
    }
    with open(os.path.join(out_dir, _MANIFEST), "w") as f:
        json.dump(manifest, f, indent=2)
    return path


def load_exported(out_dir: str):
    """Load an :func:`export_run` artifact; returns ``(predict, manifest)``
    where ``predict(batch, seed)`` executes the compiled sampler. Needs only
    jax — no framework imports, model code or checkpoint."""
    with open(os.path.join(out_dir, _ARTIFACT), "rb") as f:
        exported = jax.export.deserialize(f.read())
    with open(os.path.join(out_dir, _MANIFEST)) as f:
        manifest = json.load(f)

    def predict(batch: Dict[str, jax.Array], seed) -> jax.Array:
        return exported.call(batch, jnp.asarray(seed, jnp.uint32))

    return predict, manifest


def _main(argv: Optional[Sequence[str]] = None) -> str:
    """CLI: ``python -m dyffusion_tpu.serving run_id=<id> out=<dir>
    [registry_dir=runs] [slot=best] [split=predict] [platforms=tpu,cpu]
    [key.subkey=value ...]`` — export a trained run's sampler artifact."""
    import sys

    args = dict(registry_dir="runs", slot="best", split="predict", platforms=None)
    overrides = []
    for arg in sys.argv[1:] if argv is None else argv:
        k, _, v = arg.partition("=")
        if k in ("run_id", "out", "registry_dir", "slot", "split"):
            args[k] = v
        elif k == "platforms":
            args["platforms"] = v.split(",")
        else:
            overrides.append(arg)
    assert "run_id" in args and "out" in args, _main.__doc__
    path = export_run(
        args["registry_dir"], args["run_id"], args.pop("out"),
        overrides=overrides, slot=args["slot"], split=args["split"],
        platforms=args["platforms"],
    )
    print(path)
    return path


if __name__ == "__main__":
    _main()
