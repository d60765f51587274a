"""CLI entry point.

Capability parity with the reference's ``run.py`` + ``src/train.py``:

    python -m dyffusion_tpu.train experiment=synthetic_interpolation \
        trainer.max_epochs=3 datamodule.horizon=8

Any ``key.subkey=value`` override is accepted; ``experiment=<preset>`` picks a
dataset-x-method preset (see ``dyffusion_tpu.config.list_presets``). Prints
the metric history and returns the best monitored score (ref
``run_model -> float``, ``src/train.py:18``).
"""
from __future__ import annotations

import json
import sys
from typing import List, Optional

from dyffusion_tpu.config import get_config, list_presets
from dyffusion_tpu.interface import run_experiment


def main(argv: Optional[List[str]] = None) -> float:
    argv = list(sys.argv[1:] if argv is None else argv)
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
