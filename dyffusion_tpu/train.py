"""CLI entry point.

Capability parity with the reference's ``run.py`` + ``src/train.py``:

    python -m dyffusion_tpu.train experiment=synthetic_interpolation \
        trainer.max_epochs=3 datamodule.horizon=8

Any ``key.subkey=value`` override is accepted; ``experiment=<preset>`` picks a
dataset-x-method preset (see ``dyffusion_tpu.config.list_presets``). Prints
the metric history and returns the best monitored score (ref
``run_model -> float``, ``src/train.py:18``).

Sweeps (the analogue of Hydra multirun, ref ``run.py:9`` ``python run.py -m
param=a,b,c``): pass ``-m``/``--multirun`` and comma-separate the values to
sweep — every comma-valued override expands cartesian-product style and the
runs execute sequentially, each under its own deterministic run id:

    python -m dyffusion_tpu.train -m experiment=synthetic_interpolation \
        module.optimizer.lr=1e-4,3e-4 model.dim=32,64

Commas INSIDE brackets stay literal (``model.dim_mults=(1,2)`` is one value).
Analyze sweep results with ``dyffusion_tpu.utils.registry_api`` (the local
analogue of the reference's ``wandb_api.get_runs_df``).
"""
from __future__ import annotations

import json
import sys
from typing import List, Optional

from dyffusion_tpu.config import get_config, list_presets
from dyffusion_tpu.interface import run_experiment


def _split_sweep_values(value: str) -> List[str]:
    """Split on top-level commas only: ``1e-4,3e-4`` sweeps, but bracketed
    tuples/lists like ``(1,2)`` or ``[60,60]`` stay ONE value (the same
    disambiguation Hydra's sweeper applies)."""
    parts, depth, cur = [], 0, ""
    for ch in value:
        if ch in "([":
            depth += 1
        elif ch in ")]":
            depth -= 1
        if ch == "," and depth == 0:
            parts.append(cur)
            cur = ""
        else:
            cur += ch
    parts.append(cur)
    return parts


def expand_multirun(args: List[str]) -> List[List[str]]:
    """Cartesian expansion of comma-valued ``key=value`` args (Hydra ``-m``
    semantics, ref ``run.py:9``): returns one arg-list per run, in
    lexicographic sweep order."""
    import itertools

    fixed: List[str] = []
    sweep_keys: List[str] = []
    sweep_vals: List[List[str]] = []
    positions: List[int] = []  # keep each swept arg at its original slot
    for i, arg in enumerate(args):
        k, eq, v = arg.partition("=")
        vals = _split_sweep_values(v) if eq else [v]
        if len(vals) > 1:
            sweep_keys.append(k)
            sweep_vals.append(vals)
            positions.append(i)
        else:
            fixed.append(arg)
    if not sweep_keys:
        return [args]
    combos = []
    for combo in itertools.product(*sweep_vals):
        run_args = list(args)
        for pos, k, v in zip(positions, sweep_keys, combo):
            run_args[pos] = f"{k}={v}"
        combos.append(run_args)
    return combos


def main(argv: Optional[List[str]] = None) -> float:
    argv = list(sys.argv[1:] if argv is None else argv)
    if "-m" in argv or "--multirun" in argv:
        argv = [a for a in argv if a not in ("-m", "--multirun")]
        combos = expand_multirun(argv)
        if len(combos) > 1:
            results = []
            for i, run_args in enumerate(combos):
                print(f"[multirun {i + 1}/{len(combos)}] {' '.join(run_args)}")
                results.append({"args": run_args, "best": main(run_args)})
            finite = [r for r in results if r["best"] == r["best"]]
            # all preset monitors minimize (crps / mse)
            best = min((r["best"] for r in finite), default=float("nan"))
            print(json.dumps({"multirun": len(combos), "best": best,
                              "results": results}))
            return best
    preset, mode, run_id, registry = None, "train", None, "runs"
    overrides = []
    for arg in argv:
        if arg.startswith("experiment="):
            preset = arg.split("=", 1)[1]
        elif arg.startswith("mode="):
            mode = arg.split("=", 1)[1]  # 'train' | 'test' (ref mode=test)
        elif arg.startswith("run_id="):
            run_id = arg.split("=", 1)[1]
        elif arg in ("--help", "-h"):
            print(__doc__)
            print("presets:", ", ".join(list_presets()))
            return 0.0
        else:
            overrides.append(arg)
            if arg.startswith("registry_dir="):
                registry = arg.split("=", 1)[1]

    if mode == "test":
        # reload a finished run and evaluate with the 50-member test ensemble
        # (ref ``python run.py mode=test logger.wandb.id=<id>``)
        from dyffusion_tpu.interface import reload_and_test

        assert run_id, "mode=test requires run_id=<id>"
        metrics = reload_and_test(registry, run_id, overrides)
        print(json.dumps(metrics))
        return metrics.get("test/crps", float("nan"))

    config = get_config(preset, overrides)
    trainer, best = run_experiment(config)
    print(json.dumps({"best": best, "monitor": trainer.monitor, "run_dir": trainer.ckpt.run_dir if trainer.ckpt else None}))
    return best


def cli() -> int:
    """Console-script entry (``dyffusion-tpu`` from ``pyproject.toml``).

    ``main`` returns the best monitored SCORE (a float, ref ``run_model ->
    float``); a console script's return value becomes the process exit status,
    so wrap it: any finished run exits 0, only raised exceptions exit nonzero.
    """
    main()
    return 0


if __name__ == "__main__":
    main()
