"""Deterministic run/group naming.

Capability parity with ``src/utilities/naming.py:46-306``: run names encode
the salient hyperparameters so that runs are identifiable and resumable by
name (the reference's resume-by-group mechanism, ``config_utils.py:230-270``).
"""
from __future__ import annotations

import hashlib
import json
from typing import Any, Dict


def clean_name(s: str) -> str:
    return str(s).replace(" ", "").replace("/", "-").replace(":", "-")


def get_group_name(config: Dict[str, Any]) -> str:
    """Hparams-derived group name (ref ``naming.py:280``)."""
    dm = config.get("datamodule", {})
    md = config.get("model", {})
    parts = [
        clean_name(dm.get("name", "data")),
        clean_name(config.get("experiment", "exp")),
        clean_name(md.get("name", "model")),
        f"h{dm.get('horizon', '?')}",
        f"w{dm.get('window', 1)}",
    ]
    diff = config.get("diffusion")
    if diff:
        parts.append(clean_name(diff.get("name", "diffusion")))
        if diff.get("additional_interpolation_steps"):
            parts.append(f"k{diff['additional_interpolation_steps']}")
        if diff.get("forward_conditioning") and diff["forward_conditioning"] != "data":
            parts.append(clean_name(diff["forward_conditioning"]))
    name = "_".join(parts)
    return name[:100]  # W&B-style 128-char guard (ref naming.py:233-238)


def get_run_id(config: Dict[str, Any]) -> str:
    """Deterministic run id = group name + seed + short config hash, so a
    relaunch with identical config resumes the same run directory (the
    duplicate-run detection of ``config_utils.py:242-283``)."""
    group = get_group_name(config)
    seed = config.get("seed", 0)
    digest = hashlib.sha256(
        json.dumps(config, sort_keys=True, default=str).encode()
    ).hexdigest()[:8]
    return f"{group}_seed{seed}_{digest}"
