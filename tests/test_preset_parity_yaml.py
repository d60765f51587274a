"""Preset parity driven by the LITERAL reference Hydra yamls.

A minimal Hydra-defaults composer replays the reference's composition order
(``main_config.yaml``: group configs compose first — trainer, model,
diffusion, datamodule, module, with ``override /group:`` redirects from both
group files and the experiment chain — then the experiment bodies
parent-first; "Configs can only override stuff that appears before it in the
defaults list"). Every hyperparameter key both sides share is then asserted
equal against our composed preset, so preset drift in EITHER repo fails
here. Keys our selected backbone genuinely has but the preset omits are
compared against the backbone class's field default (config omission =
class default, same as the reference's Hydra-instantiate semantics).
"""
import os

import pytest

yaml = pytest.importorskip("yaml")

from dyffusion_tpu.config import get_config

CFG_ROOT = "/root/reference/src/configs"

# main_config.yaml defaults: selection + composition order of the hparam
# groups (callbacks/logger/mode are logging infra, skipped)
MAIN_SELECTION = {
    "trainer": "default.yaml",
    "model": "unet_simple_navier_stokes.yaml",
    "diffusion": None,
    "datamodule": "physical_systems.yaml",
    "module": "forecasting_multi_horizon_at_once.yaml",
}
GROUP_ORDER = ["trainer", "model", "diffusion", "datamodule", "module"]


def _load(path):
    with open(path) as f:
        text = f.read()
    data = yaml.safe_load(text) or {}
    return data, "@package _global_" in text[:300]


def _deep_merge(a, b):
    out = dict(a)
    for k, v in (b or {}).items():
        out[k] = _deep_merge(out[k], v) if isinstance(v, dict) and isinstance(out.get(k), dict) else v
    return out


def _entry_group(key):
    """'override /module' / '/module@_here_' / '/optimizer@module.optimizer'
    -> (group, package-or-None)."""
    key = key.replace("override ", "").strip()
    if not key.startswith("/"):
        return None, None
    gk = key[1:]
    return (gk.split("@", 1) + [None])[:2] if "@" in gk else (gk, None)


def _compose_group_file(group, name, redirects):
    """Compose configs/<group>/<name> with its same-group bases; record any
    cross-group redirects it requests into ``redirects``."""
    path = os.path.join(CFG_ROOT, group, name if name.endswith(".yaml") else name + ".yaml")
    data, is_global = _load(path)
    defaults = data.pop("defaults", ["_self_"])
    body = data if is_global else {group: data}

    out, self_seen = {}, False
    for entry in defaults:
        if entry == "_self_":
            out = _deep_merge(out, body)
            self_seen = True
        elif isinstance(entry, str):
            out = _deep_merge(out, _compose_group_file(group, entry, redirects))
        elif isinstance(entry, dict):
            (key, val), = entry.items()
            g, pkg = _entry_group(key)
            if g is None or val is None:
                continue
            if key.strip().startswith("override "):
                if g in GROUP_ORDER:
                    redirects[g] = val  # e.g. diffusion/_base -> /model
            elif g in GROUP_ORDER and pkg in (None, "_here_"):
                out = _deep_merge(out, _compose_group_file(g, val, redirects))
            elif g == "optimizer" and pkg == "module.optimizer":
                opt, _ = _load(os.path.join(CFG_ROOT, "optimizer", val))
                opt.pop("defaults", None)
                out = _deep_merge(out, {"module": {"optimizer": opt}})
    if not self_seen:
        out = _deep_merge(out, body)
    return out


REF_TARGET_OF_OURS = {
    "unet_resnet": ".unet.Unet",
    "unet_simple": ".unet_simple.UNet",
    "cnn_simple": ".simple_conv_net.SimpleConvNet",
}


def compose_experiment(name):
    """Hydra-order composition of configs/experiment/<name>."""
    exp_redirects, bodies = {}, []

    def walk(nm):
        data, _ = _load(os.path.join(CFG_ROOT, "experiment",
                                     nm if nm.endswith(".yaml") else nm + ".yaml"))
        defaults = data.pop("defaults", ["_self_"])
        for entry in defaults:
            if isinstance(entry, str) and entry != "_self_":
                walk(entry)  # parent experiment composes first
            elif isinstance(entry, dict):
                (key, val), = entry.items()
                g, _pkg = _entry_group(key)
                if g in GROUP_ORDER and val is not None:
                    exp_redirects[g] = val
        bodies.append(data)

    walk(name)

    # selection: main defaults < group-internal redirects < experiment chain
    group_redirects = {}
    sel = dict(MAIN_SELECTION)
    sel.update(exp_redirects)
    for _ in range(3):  # fixpoint: a selected group file may redirect others
        for g in GROUP_ORDER:
            if sel.get(g):
                _compose_group_file(g, sel[g], group_redirects)
        new_sel = dict(MAIN_SELECTION)
        new_sel.update(group_redirects)
        new_sel.update(exp_redirects)  # the experiment node is last -> wins
        if new_sel == sel:
            break
        sel = new_sel

    out = {}
    for g in GROUP_ORDER:
        if sel.get(g):
            out = _deep_merge(out, _compose_group_file(g, sel[g], {}))
    body_model_keys = set()
    for body in bodies:  # experiment bodies last, parent-first
        body_model_keys |= set((body.get("model") or {}).keys())
        out = _deep_merge(out, body)
    return _resolve(out), body_model_keys


def _resolve(cfg):
    def lookup(path):
        node = cfg
        for p in path.split("."):
            if not isinstance(node, dict) or p not in node:
                return None
            node = node[p]
        return node

    def walk(node):
        if isinstance(node, dict):
            return {k: walk(v) for k, v in node.items()}
        if isinstance(node, str) and node.startswith("${") and node.endswith("}"):
            v = lookup(node[2:-1])
            return v if v is not None else node
        return node

    return walk(cfg)


def _our_backbone_fields(model_name):
    from dyffusion_tpu.models import ncsnpp, simple_conv_net, unet, unet_simple

    cls = {
        "unet_resnet": unet.Unet,
        "unet_simple": unet_simple.UNetSimple,
        "cnn_simple": simple_conv_net.SimpleConvNet,
        "ncsnpp": ncsnpp.NCSNpp,
    }[model_name]
    import dataclasses

    return {f.name: f.default for f in dataclasses.fields(cls)}


# reference experiment yaml -> our preset name
PAIRS = [
    ("spring_mesh_interpolation", "spring_mesh_interpolation"),
    ("spring_mesh_dyffusion", "spring_mesh_dyffusion"),
    ("spring_mesh_time_conditioned", "spring_mesh_time_conditioned"),
    ("spring_mesh_ddpm", "spring_mesh_ddpm"),
    ("spring_mesh_mcvd", "spring_mesh_mcvd"),
    ("navier_stokes_interpolation", "navier_stokes_interpolation"),
    ("navier_stokes_dyffusion", "navier_stokes_dyffusion"),
    ("navier_stokes_time_conditioned", "navier_stokes_time_conditioned"),
    ("navier_stokes_ddpm", "navier_stokes_ddpm"),
    ("navier_stokes_mcvd", "navier_stokes_mcvd"),
    ("oisst_pacific_interpolation", "oisst_pacific_interpolation"),
    ("oisst_pacific_dyffusion", "oisst_pacific_dyffusion"),
    ("oisst_pacific_time_conditioned", "oisst_pacific_time_conditioned"),
    ("oisst_pacific_at_once", "oisst_pacific_simultaneous"),
    ("oisst_pacific_ddpm", "oisst_pacific_ddpm"),
    ("oisst_pacific_mcvd", "oisst_pacific_mcvd"),
]

SECTION_KEYS = {
    "datamodule": ["batch_size", "eval_batch_size", "horizon",
                   "prediction_horizon", "window", "boxes", "physical_system"],
    "model": ["dim", "dropout", "input_dropout", "block_dropout",
              "block_dropout1", "attn_dropout", "outer_sample_mode",
              "upsample_dims", "with_time_emb"],
    "module": ["num_predictions", "prediction_inputs_noise", "use_ema",
               "ema_decay"],
    "trainer": ["max_epochs", "gradient_clip_val", "accumulate_grad_batches"],
    "diffusion": ["loss_function", "lambda_reconstruction",
                  "lambda_reconstruction2", "forward_conditioning", "schedule",
                  "additional_interpolation_steps",
                  "additional_interpolation_steps_factor",
                  "interpolate_before_t1", "time_encoding",
                  "enable_interpolator_dropout", "sampling_type",
                  "sampling_schedule", "refine_intermediate_predictions",
                  "use_cold_sampling_for_last_step", "timesteps",
                  "sampling_timesteps", "beta_schedule", "objective",
                  "hardcode_betaN", "version", "sigma_begin", "sigma_end",
                  "gamma", "noise_in_cond", "sampling_denoise"],
}


def _norm(v):
    if isinstance(v, tuple):
        return list(v)
    if v == "navier-stokes" or v == "spring-mesh":
        return v
    return v


@pytest.mark.parametrize("ref_name,our_name", PAIRS, ids=[p[1] for p in PAIRS])
def test_preset_matches_literal_reference_yaml(ref_name, our_name):
    ref, body_model_keys = compose_experiment(ref_name)
    ours = get_config(our_name)
    backbone_fields = _our_backbone_fields(ours["model"]["name"])
    ref_target = (ref.get("model") or {}).get("_target_", "")
    family_match = ref_target.endswith(
        REF_TARGET_OF_OURS.get(ours["model"]["name"], "<none>"))

    compared = 0
    for section, keys in SECTION_KEYS.items():
        ref_sec = ref.get(section) or {}
        ours_sec = ours.get(section) or {}
        for k in keys:
            if k not in ref_sec:
                continue
            rv = ref_sec[k]
            if isinstance(rv, str) and rv.startswith("${"):
                continue  # interpolation into an out-of-scope group
            if rv is None and k not in ours_sec:
                continue  # absent == null
            if section == "model" and not family_match and k not in body_model_keys:
                # the ref's main-config default selects a model family its
                # experiment body never configures (e.g. OISST non-diffusion
                # experiments compose unet_simple while setting unet_resnet
                # dropouts); compare only keys the experiment chain itself set
                continue
            if k in ours_sec:
                ov = ours_sec[k]
            elif section == "model" and k in backbone_fields:
                ov = backbone_fields[k]  # config omission == class default
            else:
                raise AssertionError(
                    f"{our_name}: ours missing {section}.{k} (ref={rv!r})")
            assert _norm(ov) == _norm(rv), (
                f"{our_name}: {section}.{k} ours={ov!r} ref={rv!r}")
            compared += 1

    ref_opt = (ref.get("module") or {}).get("optimizer") or {}
    our_opt = ours["module"]["optimizer"]
    for k in ("lr", "weight_decay"):
        if k in ref_opt and not (isinstance(ref_opt[k], str) and ref_opt[k].startswith("${")):
            assert float(our_opt[k]) == float(ref_opt[k]), (
                f"{our_name}: optimizer.{k} ours={our_opt[k]} ref={ref_opt[k]}")
            compared += 1

    es = (ref.get("early_stopping") or {}).get("patience")
    if es is not None:
        assert ours["trainer"]["early_stopping_patience"] == es
        compared += 1
    if "seed" in ref and ref["seed"] != 11:  # 11 = main_config default
        assert ours["seed"] == ref["seed"]
        compared += 1

    assert compared >= 10, f"{our_name}: only {compared} keys compared — composer broke?"
