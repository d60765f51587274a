"""Golden numeric parity vs the installed PyTorch reference (/root/reference).

BASELINE.md's promise (VERDICT r1, Missing #2): measured parity against the
literal reference implementation, not a transcription. torch (CPU) is
installed; the reference modules are imported read-only at test time (see
``_reference_import``) and compared against our JAX implementation:

- beta/sigma schedules: all four variants bit-compared
  (ref ``src/diffusion/schedules.py:7-46``)
- LitEma warmup decay trajectory (ref ``src/models/modules/ema.py:6-78``)
- GaussianDiffusion registered buffers (ref ``denoising_diffusion.py:76-149``)
- Unet forward pass with torch->flax weight porting, dropout off
  (ref ``src/models/unet.py:113-315``)
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from tests._reference_import import REF_ROOT, import_reference, load_standalone


# ---------------------------------------------------------------------------
# schedules
# ---------------------------------------------------------------------------
def test_beta_schedules_match_reference():
    ref = load_standalone("ref_schedules", f"{REF_ROOT}/src/diffusion/schedules.py")
    from dyffusion_tpu.diffusion import schedules as ours

    for T in (10, 50, 1000):
        np.testing.assert_allclose(
            ours.linear_beta_schedule(T),
            ref.linear_beta_schedule(T).numpy().astype(np.float64),
            rtol=1e-6, err_msg=f"linear T={T}",
        )
        np.testing.assert_allclose(
            ours.cosine_beta_schedule(T),
            ref.cosine_beta_schedule(T).numpy().astype(np.float64),
            rtol=1e-6, err_msg=f"cosine T={T}",
        )
        for name in ("linear", "cosine", "sqrt_linear", "sqrt"):
            np.testing.assert_allclose(
                ours.make_beta_schedule(name, T),
                np.asarray(ref.make_beta_schedule(name, T), np.float64),
                rtol=1e-6, err_msg=f"make_beta_schedule {name} T={T}",
            )


# ---------------------------------------------------------------------------
# LitEma
# ---------------------------------------------------------------------------
def test_litema_trajectory_matches_reference():
    ref_ema = load_standalone("ref_ema", f"{REF_ROOT}/src/models/modules/ema.py")
    from dyffusion_tpu.training.ema import ema_update, init_ema

    import jax.numpy as jnp

    torch.manual_seed(0)
    lin = torch.nn.Linear(4, 3)
    ema = ref_ema.LitEma(lin, decay=0.999, use_num_upates=True)

    # explicit copies: jnp.asarray can zero-copy the torch-backed numpy
    # buffer on CPU, and the torch in-place updates below would leak through
    params = {
        "w": jnp.array(np.array(lin.weight.detach().numpy(), copy=True)),
        "b": jnp.array(np.array(lin.bias.detach().numpy(), copy=True)),
    }
    ours = init_ema(params)
    n = jnp.zeros((), jnp.int32)

    rng = np.random.default_rng(1)
    for step in range(6):
        # identical parameter perturbation on both sides
        dw = rng.normal(size=(3, 4)).astype(np.float32)
        db = rng.normal(size=(3,)).astype(np.float32)
        with torch.no_grad():
            lin.weight += torch.from_numpy(dw)
            lin.bias += torch.from_numpy(db)
        ema(lin)
        params = {"w": params["w"] + dw, "b": params["b"] + db}
        ours, n = ema_update(ours, params, n, decay=0.999)

    shadow = dict(ema.named_buffers())
    np.testing.assert_allclose(np.asarray(ours["w"]), shadow["weight"].numpy(), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(ours["b"]), shadow["bias"].numpy(), rtol=1e-5)


# ---------------------------------------------------------------------------
# reference Unet (weight-ported forward parity)
# ---------------------------------------------------------------------------
def _t2f_conv(w):  # torch (O, I, kh, kw) -> flax (kh, kw, I, O)
    return np.transpose(w.detach().numpy(), (2, 3, 1, 0))


def _t2f_dense(w):  # torch Linear (O, I) -> flax Dense (I, O)
    return np.transpose(w.detach().numpy(), (1, 0))


def _t2f_1x1(w):  # torch 1x1 Conv2d (O, I, 1, 1) -> flax Dense (I, O)
    return np.transpose(w.detach().numpy()[:, :, 0, 0], (1, 0))


def _np(t):
    return t.detach().numpy()


def _port_resblock(sd, prefix, has_residual):
    p = {
        "block1_conv": {
            "kernel": _t2f_conv(sd[f"{prefix}.block1.proj.weight"]),
            "bias": _np(sd[f"{prefix}.block1.proj.bias"]),
        },
        "block1_norm": {
            "scale": _np(sd[f"{prefix}.block1.norm.weight"]),
            "bias": _np(sd[f"{prefix}.block1.norm.bias"]),
        },
        "block2_conv": {
            "kernel": _t2f_conv(sd[f"{prefix}.block2.proj.weight"]),
            "bias": _np(sd[f"{prefix}.block2.proj.bias"]),
        },
        "block2_norm": {
            "scale": _np(sd[f"{prefix}.block2.norm.weight"]),
            "bias": _np(sd[f"{prefix}.block2.norm.bias"]),
        },
    }
    if has_residual:
        p["residual_proj"] = {
            "kernel": _t2f_1x1(sd[f"{prefix}.residual_conv.weight"]),
            "bias": _np(sd[f"{prefix}.residual_conv.bias"]),
        }
    if f"{prefix}.mlp.1.weight" in sd:  # FiLM mlp absent when with_time_emb=False
        p["time_mlp"] = {
            "kernel": _t2f_dense(sd[f"{prefix}.mlp.1.weight"]),
            "bias": _np(sd[f"{prefix}.mlp.1.bias"]),
        }
    return p


def _port_attn(sd, prefix, kind):
    """Residual(PreNorm(dim, attention, LayerNorm)) -> PreNormResidual params."""
    qkv_key = f"{prefix}.fn.to_qkv.1.weight" if kind == "linear" else f"{prefix}.fn.to_qkv.weight"
    return {
        "ChannelLayerNorm_0": {"g": _np(sd[f"{prefix}.norm.g"]).reshape(-1)},
        "fn": {
            "to_qkv": {"kernel": _t2f_1x1(sd[qkv_key])},
            "to_out": {
                "kernel": _t2f_1x1(sd[f"{prefix}.fn.to_out.weight"]),
                "bias": _np(sd[f"{prefix}.fn.to_out.bias"]),
            },
        },
    }


def _port_unet_weights(ref_model, n_levels):
    """Full torch->flax parameter-tree port for the 'unet_resnet' backbone."""
    sd = dict(ref_model.state_dict())
    params = {
        "init_conv": {
            "kernel": _t2f_conv(sd["init_conv.weight"]),
            "bias": _np(sd["init_conv.bias"]),
        },
        "final_res_block": _port_resblock(sd, "final_res_block", has_residual=True),
        "final_conv": {
            "kernel": _t2f_1x1(sd["final_conv.weight"]),
            "bias": _np(sd["final_conv.bias"]),
        },
        "mid_block1": _port_resblock(sd, "mid_block1", has_residual=False),
        "mid_block2": _port_resblock(sd, "mid_block2", has_residual=False),
        "mid_attn": _port_attn(sd, "mid_attn.fn", kind="full"),
    }
    if "time_emb_mlp.1.weight" in sd:  # absent when with_time_emb=False
        params["time_emb"] = {
            "Dense_0": {
                "kernel": _t2f_dense(sd["time_emb_mlp.1.weight"]),
                "bias": _np(sd["time_emb_mlp.1.bias"]),
            },
            "Dense_1": {
                "kernel": _t2f_dense(sd["time_emb_mlp.3.weight"]),
                "bias": _np(sd["time_emb_mlp.3.bias"]),
            },
        }
    for i in range(n_levels):
        is_last = i == n_levels - 1
        params[f"down{i}_block1"] = _port_resblock(sd, f"downs.{i}.0", has_residual=False)
        params[f"down{i}_block2"] = _port_resblock(sd, f"downs.{i}.1", has_residual=False)
        params[f"down{i}_attn"] = _port_attn(sd, f"downs.{i}.2.fn", kind="linear")
        if not is_last:
            params[f"down{i}_downsample"] = {
                "kernel": _t2f_conv(sd[f"downs.{i}.3.weight"]),
                "bias": _np(sd[f"downs.{i}.3.bias"]),
            }
        else:
            params[f"down{i}_conv"] = {
                "kernel": _t2f_conv(sd[f"downs.{i}.3.weight"]),
                "bias": _np(sd[f"downs.{i}.3.bias"]),
            }
        params[f"up{i}_block1"] = _port_resblock(sd, f"ups.{i}.0", has_residual=True)
        params[f"up{i}_block2"] = _port_resblock(sd, f"ups.{i}.1", has_residual=True)
        params[f"up{i}_attn"] = _port_attn(sd, f"ups.{i}.2.fn", kind="linear")
        if not is_last:
            params[f"up{i}_upsample"] = {
                "conv": {
                    "kernel": _t2f_conv(sd[f"ups.{i}.3.1.weight"]),
                    "bias": _np(sd[f"ups.{i}.3.1.bias"]),
                }
            }
        else:
            params[f"up{i}_conv"] = {
                "kernel": _t2f_conv(sd[f"ups.{i}.3.weight"]),
                "bias": _np(sd[f"ups.{i}.3.bias"]),
            }
    return params


def test_unet_forward_parity_weight_ported():
    """The flagship backbone: identical outputs (<=1e-4) for ported weights,
    conditioning on, dropout off (ref ``src/models/unet.py:113-315``)."""
    import jax.numpy as jnp

    ref_unet_mod = import_reference("src.models.unet")
    torch.manual_seed(0)
    kw = dict(
        dim=8,
        dim_mults=(1, 2),
        resnet_block_groups=4,
        with_time_emb=True,
        num_input_channels=3,
        num_output_channels=3,
        num_conditional_channels=2,
        spatial_shape=(16, 16),
    )
    ref_model = ref_unet_mod.Unet(**kw)
    ref_model.eval()

    from dyffusion_tpu.models import Unet

    ours = Unet(
        dim=8,
        dim_mults=(1, 2),
        resnet_block_groups=4,
        with_time_emb=True,
        num_input_channels=3,
        num_output_channels=3,
        num_conditional_channels=2,
    )
    params = _port_unet_weights(ref_model, n_levels=2)

    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 3, 16, 16)).astype(np.float32)
    cond = rng.normal(size=(2, 2, 16, 16)).astype(np.float32)
    time = np.asarray([0.5, 3.0], np.float32)

    with torch.no_grad():
        ref_out = ref_model(
            torch.from_numpy(x), time=torch.from_numpy(time), condition=torch.from_numpy(cond)
        ).numpy()

    out = ours.apply(
        {"params": params},
        jnp.asarray(np.transpose(x, (0, 2, 3, 1))),
        time=jnp.asarray(time),
        condition=jnp.asarray(np.transpose(cond, (0, 2, 3, 1))),
        deterministic=True,
    )
    out = np.transpose(np.asarray(out), (0, 3, 1, 2))
    np.testing.assert_allclose(out, ref_out, rtol=1e-4, atol=1e-4)


# ---------------------------------------------------------------------------
# GaussianDiffusion buffers
# ---------------------------------------------------------------------------
def test_gaussian_diffusion_buffers_match_reference():
    ref_unet_mod = import_reference("src.models.unet")
    ref_dd = import_reference("src.diffusion.denoising_diffusion")

    torch.manual_seed(0)
    backbone = ref_unet_mod.Unet(
        dim=8, dim_mults=(1, 2), resnet_block_groups=4, with_time_emb=True,
        num_input_channels=2, num_output_channels=2, spatial_shape=(16, 16),
    )
    from dyffusion_tpu.diffusion.ddpm import GaussianDiffusionConfig, GaussianDiffusionEngine

    for schedule in ("linear", "cosine"):
        for hardcode in (False, True):
            ref = ref_dd.GaussianDiffusion(
                model=backbone, timesteps=20, beta_schedule=schedule,
                hardcode_betaN=hardcode, p2_loss_weight_gamma=1.0,
            )
            eng = GaussianDiffusionEngine(
                GaussianDiffusionConfig(
                    timesteps=20, beta_schedule=schedule, hardcode_betaN=hardcode,
                    p2_loss_weight_gamma=1.0,
                ),
                denoiser_apply=lambda *a: None,
                sample_shape=(16, 16, 2),
            )
            for name in (
                "betas",
                "alphas_cumprod",
                "sqrt_alphas_cumprod",
                "sqrt_one_minus_alphas_cumprod",
                "sqrt_recip_alphas_cumprod",
                "sqrt_recipm1_alphas_cumprod",
                "posterior_variance",
                "posterior_log_variance_clipped",
                "posterior_mean_coef1",
                "posterior_mean_coef2",
                "p2_loss_weight",
            ):
                np.testing.assert_allclose(
                    np.asarray(getattr(eng, name)),
                    getattr(ref, name).numpy(),
                    rtol=2e-5, atol=1e-7,
                    err_msg=f"{name} ({schedule}, hardcode={hardcode})",
                )


# ---------------------------------------------------------------------------
# reference UNet simple (the Navier-Stokes backbone) — weight-ported parity.
# Covers the FUSED bilinear-up2+conv decoder blocks and the no-antialias
# outer resample against the literal torch pipeline (ref unet_simple.py:85-197).
# ---------------------------------------------------------------------------
def _port_unet_simple_weights(ref_model):
    sd = dict(ref_model.state_dict())
    params = {
        "init_conv": {
            "kernel": _t2f_conv(sd["init_conv.weight"]),
            "bias": _np(sd["init_conv.bias"]),
        },
        "time_emb": {
            "Dense_0": {
                "kernel": _t2f_dense(sd["time_emb_mlp.1.weight"]),
                "bias": _np(sd["time_emb_mlp.1.bias"]),
            },
            "Dense_1": {
                "kernel": _t2f_dense(sd["time_emb_mlp.3.weight"]),
                "bias": _np(sd["time_emb_mlp.3.bias"]),
            },
        },
        "readout": {
            # torch ConvTranspose2d (I, O, kh, kw) -> flax (kh, kw, I, O)
            # with SPATIALLY FLIPPED taps (torch CT convolves, flax correlates)
            "kernel": np.ascontiguousarray(
                _np(sd["readout.0.weight"])[:, :, ::-1, ::-1].transpose(2, 3, 0, 1)
            ),
            "bias": _np(sd["readout.0.bias"]),
        },
    }
    batch_stats = {}
    for kind, our_prefix, conv_idx, norm_idx in (
        ("input_ops", "enc", 0, 1),
        ("output_ops", "dec", 1, 2),
    ):
        for i in range(6):
            tp = f"{kind}.{i}"
            blk = {
                "conv": {
                    "kernel": _t2f_conv(sd[f"{tp}.ops.{conv_idx}.weight"]),
                    "bias": _np(sd[f"{tp}.ops.{conv_idx}.bias"]),
                },
                "norm": {
                    "scale": _np(sd[f"{tp}.ops.{norm_idx}.weight"]),
                    "bias": _np(sd[f"{tp}.ops.{norm_idx}.bias"]),
                },
                "time_mlp": {
                    "kernel": _t2f_dense(sd[f"{tp}.time_mlp.1.weight"]),
                    "bias": _np(sd[f"{tp}.time_mlp.1.bias"]),
                },
            }
            params[f"{our_prefix}{i}"] = blk
            if f"{tp}.ops.{norm_idx}.running_mean" in sd:  # BatchNorm blocks
                batch_stats[f"{our_prefix}{i}"] = {
                    "norm": {
                        "mean": _np(sd[f"{tp}.ops.{norm_idx}.running_mean"]),
                        "var": _np(sd[f"{tp}.ops.{norm_idx}.running_var"]),
                    }
                }
    return params, batch_stats


def test_unet_simple_forward_parity_weight_ported():
    """Fused-decoder UNetSimple == literal torch reference (<=1e-3) for ported
    weights, randomized BatchNorm running stats, eval mode, non-square grid
    (exercises the outer bilinear resample both directions)."""
    import jax.numpy as jnp

    ref_mod = import_reference("src.models.unet_simple")
    torch.manual_seed(0)
    ref_model = ref_mod.UNet(
        dim=4,
        with_time_emb=True,
        outer_sample_mode="bilinear",
        upsample_dims=(64, 64),
        dropout=0.0,
        input_dropout=0.0,
        num_input_channels=3,
        num_output_channels=3,
        num_conditional_channels=2,
        spatial_shape=(11, 7),
    )
    # randomize BN running stats so eval-mode normalization is non-trivial
    g = np.random.default_rng(1)
    with torch.no_grad():
        for m in ref_model.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.copy_(torch.from_numpy(
                    g.normal(size=m.running_mean.shape).astype(np.float32) * 0.3))
                m.running_var.copy_(torch.from_numpy(
                    g.uniform(0.5, 1.5, size=m.running_var.shape).astype(np.float32)))
    ref_model.eval()

    from dyffusion_tpu.models.unet_simple import UNetSimple

    ours = UNetSimple(
        dim=4,
        num_input_channels=3,
        num_output_channels=3,
        num_conditional_channels=2,
        with_time_emb=True,
        outer_sample_mode="bilinear",
        upsample_dims=(64, 64),
        dropout=0.0,
        input_dropout=0.0,
    )
    params, batch_stats = _port_unet_simple_weights(ref_model)

    rng = np.random.default_rng(2)
    x = rng.normal(size=(2, 3, 11, 7)).astype(np.float32)
    cond = rng.normal(size=(2, 2, 11, 7)).astype(np.float32)
    time = np.asarray([1.0, 4.0], np.float32)

    with torch.no_grad():
        ref_out = ref_model(
            torch.from_numpy(x), time=torch.from_numpy(time), condition=torch.from_numpy(cond)
        ).numpy()

    out = ours.apply(
        {"params": params, "batch_stats": batch_stats},
        jnp.asarray(np.transpose(x, (0, 2, 3, 1))),
        time=jnp.asarray(time),
        condition=jnp.asarray(np.transpose(cond, (0, 2, 3, 1))),
        deterministic=True,
        train=False,
    )
    out = np.transpose(np.asarray(out), (0, 3, 1, 2))
    np.testing.assert_allclose(out, ref_out, rtol=1e-3, atol=1e-3)


# ---------------------------------------------------------------------------
# reference SimpleConvNet (the spring-mesh backbone) — weight-ported parity.
# Completes the backbone golden set (Unet, UNetSimple, NCSNpp, SimpleConvNet).
# ---------------------------------------------------------------------------
def test_simple_conv_net_forward_parity_weight_ported():
    """conv->BN->FiLM->GELU->residual stack + 1x1 head vs the literal torch
    reference (ref simple_conv_net.py:12-131), eval mode, randomized BN
    running stats, time embedding on."""
    import jax.numpy as jnp

    ref_mod = import_reference("src.models.simple_conv_net")
    torch.manual_seed(1)
    ref_model = ref_mod.SimpleConvNet(
        dim=16,
        with_time_emb=True,
        net_normalization="batch_norm",
        kernel_sizes=(7, 3, 3),
        residual=True,
        dropout=0.0,
        num_input_channels=4,
        num_output_channels=4,
        num_conditional_channels=1,
        spatial_shape=(10, 10),
    )
    g = np.random.default_rng(6)
    with torch.no_grad():
        for m in ref_model.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.copy_(torch.from_numpy(
                    g.normal(size=m.running_mean.shape).astype(np.float32) * 0.3))
                m.running_var.copy_(torch.from_numpy(
                    g.uniform(0.5, 1.5, size=m.running_var.shape).astype(np.float32)))
    ref_model.eval()

    from dyffusion_tpu.models.simple_conv_net import SimpleConvNet

    ours = SimpleConvNet(
        dim=16,
        num_input_channels=4,
        num_output_channels=4,
        num_conditional_channels=1,
        with_time_emb=True,
        net_normalization="batch_norm",
        kernel_sizes=(7, 3, 3),
        residual=True,
        dropout=0.0,
    )
    sd = dict(ref_model.state_dict())
    params = {
        "time_emb": {
            "Dense_0": {
                "kernel": _t2f_dense(sd["time_emb_mlp.1.weight"]),
                "bias": _np(sd["time_emb_mlp.1.bias"]),
            },
            "Dense_1": {
                "kernel": _t2f_dense(sd["time_emb_mlp.3.weight"]),
                "bias": _np(sd["time_emb_mlp.3.bias"]),
            },
        },
        "head": {"kernel": _t2f_1x1(sd["head.weight"]), "bias": _np(sd["head.bias"])},
    }
    batch_stats = {}
    for i in range(3):
        params[f"conv{i}"] = {
            "conv": {
                "kernel": _t2f_conv(sd[f"convs.{i}.conv.weight"]),
                "bias": _np(sd[f"convs.{i}.conv.bias"]),
            },
            "BatchNorm_0": {
                "scale": _np(sd[f"convs.{i}.norm.weight"]),
                "bias": _np(sd[f"convs.{i}.norm.bias"]),
            },
            "time_mlp": {
                "kernel": _t2f_dense(sd[f"convs.{i}.time_mlp.1.weight"]),
                "bias": _np(sd[f"convs.{i}.time_mlp.1.bias"]),
            },
        }
        batch_stats[f"conv{i}"] = {
            "BatchNorm_0": {
                "mean": _np(sd[f"convs.{i}.norm.running_mean"]),
                "var": _np(sd[f"convs.{i}.norm.running_var"]),
            }
        }

    rng = np.random.default_rng(7)
    x = rng.normal(size=(2, 4, 10, 10)).astype(np.float32)
    cond = rng.normal(size=(2, 1, 10, 10)).astype(np.float32)
    time = np.asarray([2.0, 9.0], np.float32)

    with torch.no_grad():
        ref_out = ref_model(
            torch.from_numpy(x), time=torch.from_numpy(time), condition=torch.from_numpy(cond)
        ).numpy()

    out = ours.apply(
        {"params": params, "batch_stats": batch_stats},
        jnp.asarray(np.transpose(x, (0, 2, 3, 1))),
        time=jnp.asarray(time),
        condition=jnp.asarray(np.transpose(cond, (0, 2, 3, 1))),
        deterministic=True,
        train=False,
    )
    out = np.transpose(np.asarray(out), (0, 3, 1, 2))
    np.testing.assert_allclose(out, ref_out, rtol=1e-4, atol=1e-4)
