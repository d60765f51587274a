"""Weight-ported forward parity: SPADE NCSN++ vs the LITERAL torch reference
(``src/models/mcvd/ncsnpp_more.py:451-799`` ``SPADE_NCSNpp`` on its reachable
2-D path, with ``layerspp.MySPADE :98``, ``ResnetBlockBigGANppSPADE :741`` and
``get_act_norm("spade") :555``), loaded read-only from /root/reference.

The reference class is config-object driven (no Hydra preset reaches it); a
``SimpleNamespace`` config drives the literal module here, and its flat
``all_modules`` construction order (identical to the plain NCSNpp ladder) is
replayed to map weights onto our named flax tree.
"""
from types import SimpleNamespace

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp

from tests._reference_import import import_reference


def _t2f_conv(w):  # torch (O, I, kh, kw) -> flax (kh, kw, I, O)
    return np.transpose(w.detach().numpy(), (2, 3, 1, 0))


def _t2f_dense(w):  # torch Linear (O, I) -> flax (I, O)
    return np.transpose(w.detach().numpy(), (1, 0))


def _np(t):
    return t.detach().numpy()


def _port_spade(sd, p):
    """MySPADE (ref layerspp.py:98-185): mlp_shared Sequential(conv, act) +
    gamma/beta convs; the GroupNorm is affine-free (no params)."""
    return {
        "mlp_shared": {
            "kernel": _t2f_conv(sd[f"{p}.mlp_shared.0.weight"]),
            "bias": _np(sd[f"{p}.mlp_shared.0.bias"]),
        },
        "mlp_gamma": {
            "kernel": _t2f_conv(sd[f"{p}.mlp_gamma.weight"]),
            "bias": _np(sd[f"{p}.mlp_gamma.bias"]),
        },
        "mlp_beta": {
            "kernel": _t2f_conv(sd[f"{p}.mlp_beta.weight"]),
            "bias": _np(sd[f"{p}.mlp_beta.bias"]),
        },
    }


def _port_actnorm(sd, p):
    """get_act_norm("spade"): MySPADE as Norm_0 (+ AdaGN Dense when temb'd)."""
    out = {"spade": _port_spade(sd, f"{p}.Norm_0")}
    if f"{p}.Dense_0.weight" in sd:
        out["dense"] = {
            "kernel": _t2f_dense(sd[f"{p}.Dense_0.weight"]),
            "bias": _np(sd[f"{p}.Dense_0.bias"]),
        }
    return out


def _port_resblock(sd, p):
    """ResnetBlockBigGANppSPADE (ref layerspp.py:741-865) -> ours."""
    out = {
        "actnorm0": _port_actnorm(sd, f"{p}.actnorm0"),
        "conv1": {
            "kernel": _t2f_conv(sd[f"{p}.Conv_0.weight"]),
            "bias": _np(sd[f"{p}.Conv_0.bias"]),
        },
        "actnorm1": _port_actnorm(sd, f"{p}.actnorm1"),
        "conv2": {
            "kernel": _t2f_conv(sd[f"{p}.Conv_1.weight"]),
            "bias": _np(sd[f"{p}.Conv_1.bias"]),
        },
    }
    if f"{p}.Conv_2.weight" in sd:  # 1x1 shortcut -> our Dense
        out["shortcut"] = {
            "kernel": _np(sd[f"{p}.Conv_2.weight"])[:, :, 0, 0].T,
            "bias": _np(sd[f"{p}.Conv_2.bias"]),
        }
    return out


def _port_attn(sd, p):
    return {
        "norm": {"scale": _np(sd[f"{p}.GroupNorm_0.weight"]), "bias": _np(sd[f"{p}.GroupNorm_0.bias"])},
        "nin_q": {"kernel": _np(sd[f"{p}.NIN_0.W"]), "bias": _np(sd[f"{p}.NIN_0.b"])},
        "nin_k": {"kernel": _np(sd[f"{p}.NIN_1.W"]), "bias": _np(sd[f"{p}.NIN_1.b"])},
        "nin_v": {"kernel": _np(sd[f"{p}.NIN_2.W"]), "bias": _np(sd[f"{p}.NIN_2.b"])},
        "nin_out": {"kernel": _np(sd[f"{p}.NIN_3.W"]), "bias": _np(sd[f"{p}.NIN_3.b"])},
    }


def _port_spade_ncsnpp(ref_model, dim_mults, num_res_blocks, attn_resolutions, spatial):
    sd = dict(ref_model.state_dict())
    n_res = len(dim_mults)
    all_res = [spatial // (2**i) for i in range(n_res)]
    m = 0
    params = {}
    # temb MLP (ref :511-523, positional embedding -> two Linears)
    params["temb_dense1"] = {
        "kernel": _t2f_dense(sd[f"all_modules.{m}.weight"]),
        "bias": _np(sd[f"all_modules.{m}.bias"]),
    }
    m += 1
    params["temb_dense2"] = {
        "kernel": _t2f_dense(sd[f"all_modules.{m}.weight"]),
        "bias": _np(sd[f"all_modules.{m}.bias"]),
    }
    m += 1
    params["conv_in"] = {
        "kernel": _t2f_conv(sd[f"all_modules.{m}.weight"]),
        "bias": _np(sd[f"all_modules.{m}.bias"]),
    }
    m += 1
    for i in range(n_res):
        for b in range(num_res_blocks):
            params[f"down{i}_block{b}"] = _port_resblock(sd, f"all_modules.{m}")
            m += 1
            if all_res[i] in attn_resolutions:
                params[f"down{i}_attn{b}"] = _port_attn(sd, f"all_modules.{m}")
                m += 1
        if i != n_res - 1:
            params[f"down{i}_downsample"] = _port_resblock(sd, f"all_modules.{m}")
            m += 1
    params["mid_block1"] = _port_resblock(sd, f"all_modules.{m}"); m += 1
    params["mid_attn"] = _port_attn(sd, f"all_modules.{m}"); m += 1
    params["mid_block2"] = _port_resblock(sd, f"all_modules.{m}"); m += 1
    for j, i in enumerate(reversed(range(n_res))):
        for b in range(num_res_blocks + 1):
            params[f"up{j}_block{b}"] = _port_resblock(sd, f"all_modules.{m}")
            m += 1
        if all_res[i] in attn_resolutions:
            params[f"up{j}_attn"] = _port_attn(sd, f"all_modules.{m}")
            m += 1
        if i != 0:
            params[f"up{j}_upsample"] = _port_resblock(sd, f"all_modules.{m}")
            m += 1
    # final get_act_norm("spade", no temb) -> MySPADE only (ref :655-663)
    params["actnorm_out"] = _port_actnorm(sd, f"all_modules.{m}")
    m += 1
    params["conv_out"] = {
        "kernel": _t2f_conv(sd[f"all_modules.{m}.weight"]),
        "bias": _np(sd[f"all_modules.{m}.bias"]),
    }
    m += 1
    leftover = [k for k in sd if int(k.split(".")[1]) >= m]
    assert not leftover, f"unported reference modules: {leftover[:5]}"
    return params


def _ref_config(C, F, Fc, ngf, ch_mult, n_blocks, attn_res, image_size, spade_dim):
    """The config-object the reference SPADE_NCSNpp ctor reads (:454-493)."""
    return SimpleNamespace(
        model=SimpleNamespace(
            arch="unetmore",
            ngf=ngf,
            ch_mult=ch_mult,
            num_res_blocks=n_blocks,
            attn_resolutions=attn_res,
            dropout=0.0,
            time_conditional=True,
            cond_emb=False,
            n_head_channels=64,
            spade_dim=spade_dim,
        ),
        data=SimpleNamespace(
            channels=C,
            num_frames=F,
            num_frames_cond=Fc,
            image_size=image_size,
        ),
    )


def test_torch_nearest_resize_semantics():
    """torch F.interpolate(mode="nearest") picks floor(i*in/out) source pixels
    — on a 16->8 downscale that's the EVEN rows/cols (jax.image.resize's
    half-pixel mapping would pick the odd ones)."""
    import torch.nn.functional as TF

    from dyffusion_tpu.models.ncsnpp import _torch_nearest_resize

    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 16, 12, 3)).astype(np.float32)
    for size in [(8, 6), (4, 3), (16, 12), (5, 7)]:
        ours = np.asarray(_torch_nearest_resize(jnp.asarray(x), size))
        ref = (
            TF.interpolate(torch.from_numpy(np.transpose(x, (0, 3, 1, 2))), size=size, mode="nearest")
            .numpy()
            .transpose(0, 2, 3, 1)
        )
        np.testing.assert_array_equal(ours, ref, err_msg=f"size={size}")


def test_spade_ncsnpp_forward_parity_weight_ported():
    """SPADE NCSN++ 2-D BigGAN path, weights ported torch->flax: identical
    forward (<=2e-3) with SPADE conditioning at every norm, AdaGN temb,
    attention at the 8x8 resolution, FIR up/down inside the blocks."""
    ref_mod = import_reference("src.models.mcvd.ncsnpp_more")
    torch.manual_seed(0)
    C, F, Fc = 2, 2, 2
    cfg = _ref_config(
        C=C, F=F, Fc=Fc, ngf=16, ch_mult=(1, 2), n_blocks=2,
        attn_res=(8,), image_size=16, spade_dim=16,
    )
    ref_model = ref_mod.SPADE_NCSNpp(cfg)
    ref_model.eval()

    from dyffusion_tpu.models.ncsnpp import SPADENCSNpp

    ours = SPADENCSNpp(
        dim=16,
        num_input_channels=C * F,
        num_output_channels=C * F,
        num_conditional_channels=C * Fc,
        spade_dim=16,
        n_head_channels=64,
        dim_mults=(1, 2),
        num_res_blocks=2,
        attn_resolutions=(8,),
        dropout=0.0,
        with_time_emb=True,
        spatial_height=16,
    )
    params = _port_spade_ncsnpp(ref_model, (1, 2), 2, (8,), 16)

    rng = np.random.default_rng(5)
    x = rng.normal(size=(2, C * F, 16, 16)).astype(np.float32)
    cond = rng.normal(size=(2, C * Fc, 16, 16)).astype(np.float32)
    time = np.asarray([3.0, 17.0], np.float32)

    with torch.no_grad():
        ref_out = ref_model(
            torch.from_numpy(x), torch.from_numpy(time), cond=torch.from_numpy(cond)
        ).numpy()

    out = ours.apply(
        {"params": params},
        jnp.asarray(np.transpose(x, (0, 2, 3, 1))),
        time=jnp.asarray(time),
        condition=jnp.asarray(np.transpose(cond, (0, 2, 3, 1))),
        deterministic=True,
    )
    out = np.transpose(np.asarray(out), (0, 3, 1, 2))
    np.testing.assert_allclose(out, ref_out, rtol=2e-3, atol=2e-3)
