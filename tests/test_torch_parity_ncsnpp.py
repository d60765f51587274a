"""Weight-ported forward parity: NCSNpp (the MCVD backbone) vs the LITERAL
torch reference (``src/models/mcvd/ncsnpp_more.py:35-447``, 2-D ``unetmore``
BigGAN path), loaded read-only from /root/reference at test time.

The reference registers everything in a flat ``all_modules`` list walked
sequentially by ``forward``; the port below replays the exact construction
order (ref ``:110-283``) to map ``all_modules.{i}`` onto our named flax tree.
"""
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


def _port_resblock(sd, p):
    """ResnetBlockBigGANppGN (ref layerspp.py:646-740) -> our ResnetBlockBigGAN."""
    out = {
        "actnorm0": {
            "dense": {
                "kernel": _t2f_dense(sd[f"{p}.actnorm0.Dense_0.weight"]),
                "bias": _np(sd[f"{p}.actnorm0.Dense_0.bias"]),
            }
        },
        "conv1": {
            "kernel": _t2f_conv(sd[f"{p}.Conv_0.weight"]),
            "bias": _np(sd[f"{p}.Conv_0.bias"]),
        },
        "actnorm1": {
            "dense": {
                "kernel": _t2f_dense(sd[f"{p}.actnorm1.Dense_0.weight"]),
                "bias": _np(sd[f"{p}.actnorm1.Dense_0.bias"]),
            }
        },
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
    """AttnBlockpp (ref layerspp.py:219-263): NIN.W is already (in, out)."""
    return {
        "norm": {"scale": _np(sd[f"{p}.GroupNorm_0.weight"]), "bias": _np(sd[f"{p}.GroupNorm_0.bias"])},
        "nin_q": {"kernel": _np(sd[f"{p}.NIN_0.W"]), "bias": _np(sd[f"{p}.NIN_0.b"])},
        "nin_k": {"kernel": _np(sd[f"{p}.NIN_1.W"]), "bias": _np(sd[f"{p}.NIN_1.b"])},
        "nin_v": {"kernel": _np(sd[f"{p}.NIN_2.W"]), "bias": _np(sd[f"{p}.NIN_2.b"])},
        "nin_out": {"kernel": _np(sd[f"{p}.NIN_3.W"]), "bias": _np(sd[f"{p}.NIN_3.b"])},
    }


def _port_ncsnpp(ref_model, dim_mults, num_res_blocks, attn_resolutions, spatial):
    sd = dict(ref_model.state_dict())
    n_res = len(dim_mults)
    all_res = [spatial // (2**i) for i in range(n_res)]
    m = 0
    params = {}
    # temb MLP (ref :110-116)
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
    # conv_in (ref :216)
    params["conv_in"] = {
        "kernel": _t2f_conv(sd[f"all_modules.{m}.weight"]),
        "bias": _np(sd[f"all_modules.{m}.bias"]),
    }
    m += 1
    # downsampling (ref :219-240)
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
    # middle (ref :242-250)
    params["mid_block1"] = _port_resblock(sd, f"all_modules.{m}"); m += 1
    params["mid_attn"] = _port_attn(sd, f"all_modules.{m}"); m += 1
    params["mid_block2"] = _port_resblock(sd, f"all_modules.{m}"); m += 1
    # upsampling (ref :252-271)
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
    # final act-norm (affine GroupNorm) + head (ref :273-283)
    params["norm_out"] = {
        "scale": _np(sd[f"all_modules.{m}.Norm_0.weight"]),
        "bias": _np(sd[f"all_modules.{m}.Norm_0.bias"]),
    }
    m += 1
    params["conv_out"] = {
        "kernel": _t2f_conv(sd[f"all_modules.{m}.weight"]),
        "bias": _np(sd[f"all_modules.{m}.bias"]),
    }
    m += 1
    leftover = [k for k in sd if int(k.split(".")[1]) >= m]
    assert not leftover, f"unported reference modules: {leftover[:5]}"
    return params


def test_ncsnpp_forward_parity_weight_ported():
    """2-D unetmore BigGAN NCSNpp, weights ported torch->flax: identical
    forward (<=2e-3) with conditioning, positional time emb, attention at the
    8x8 resolution, FIR up/down inside the BigGAN blocks, dropout off."""
    ref_mod = import_reference("src.models.mcvd.ncsnpp_more")
    torch.manual_seed(0)
    kw = dict(dim_mults=(1, 2), resnet_block_groups=2, attn_resolutions=(8,))
    ref_model = ref_mod.NCSNpp(
        architecture="unetmore",
        dim=16,
        n_head_channels=64,
        dropout=0.0,
        with_time_emb=True,
        cond_emb=False,
        num_input_channels=3,
        num_output_channels=3,
        num_conditional_channels=2,
        spatial_shape=(16, 16),
        **kw,
    )
    ref_model.eval()

    from dyffusion_tpu.models.ncsnpp import NCSNpp

    ours = NCSNpp(
        dim=16,
        num_input_channels=3,
        num_output_channels=3,
        num_conditional_channels=2,
        n_head_channels=64,
        dim_mults=(1, 2),
        num_res_blocks=2,
        attn_resolutions=(8,),
        dropout=0.0,
        with_time_emb=True,
        resblock_type="biggan",
        spatial_height=16,
    )
    params = _port_ncsnpp(ref_model, (1, 2), 2, (8,), 16)

    rng = np.random.default_rng(5)
    x = rng.normal(size=(2, 3, 16, 16)).astype(np.float32)
    cond = rng.normal(size=(2, 2, 16, 16)).astype(np.float32)
    time = np.asarray([3.0, 17.0], np.float32)

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
    np.testing.assert_allclose(out, ref_out, rtol=2e-3, atol=2e-3)
