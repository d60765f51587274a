"""Measured same-host throughput: torch reference vs dyffusion_tpu.

Closes BASELINE.md's open item ("our own measured PyTorch-reference numbers
will be recorded here once the harness exists"): runs the LITERAL reference
DYffusion sampling loop (``/root/reference/src/diffusion/dyffusion.py:335-426``,
torch eager, real ``Unet`` backbone) and OUR engine (``diffusion/dyffusion.py``,
jitted scan) with the SAME ported weights, on the SAME host, and reports
frames/sec for each plus the ratio.

Both sides: dropout off, identical shapes, compile/warmup excluded, timing
ends with a real device->host read (``jax.block_until_ready`` is unreliable
on the axon tunnel). By default JAX runs on CPU so the comparison is
same-silicon (the reference cannot run on TPU); pass ``--jax-platform=``
empty to use the session default (TPU via axon) for a deployment-style
comparison.

Usage: python scripts/bench_torch_reference.py [--dim 16 --spatial 16 ...]
Prints ONE JSON line.
"""
import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--dim", type=int, default=16)
    p.add_argument("--spatial", type=int, default=16)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--channels", type=int, default=2,
                   help="dynamical channels C (SST workload: 1)")
    p.add_argument("--static-channels", type=int, default=1, dest="static_channels",
                   help="static conditioning channels (0 = none, SST workload)")
    p.add_argument("--horizon", type=int, default=4)
    p.add_argument("--k-aux", type=int, default=2, dest="k_aux")
    p.add_argument("--iters", type=int, default=5)
    p.add_argument("--mode", choices=["sample", "train"], default="sample",
                   help="'sample' times the full sampling loop; 'train' times "
                        "one optimization step (two-term p_losses + backward "
                        "+ Adam) on the forecaster, frozen interpolator")
    p.add_argument("--jax-platform", default="cpu",
                   help="'cpu' (default, same-silicon) or '' for session default (TPU)")
    p.add_argument("--mults", default="1,2", help="dim_mults, comma-separated")
    p.add_argument("--groups", type=int, default=4, help="resnet_block_groups")
    p.add_argument("--no-refine", action="store_true",
                   help="disable refine_intermediate_predictions both sides "
                        "(matches the SST bench workload)")
    p.add_argument("--write-json", default=None,
                   help="also write the result (incl. sampling_fps = the torch "
                        "frames/sec) to this path; bench.py reads "
                        "torch_reference_bench.json at the repo root for its "
                        "vs_torch_cpu_reference field")
    args = p.parse_args()
    mults = tuple(int(m) for m in args.mults.split(","))
    refine = not args.no_refine

    if args.jax_platform:
        import jax
        jax.config.update("jax_platforms", args.jax_platform)

    import numpy as np
    import torch

    import jax
    import jax.numpy as jnp

    from tests._reference_import import import_reference
    from tests.test_torch_parity import _port_unet_weights
    from tests.test_torch_parity_engine import _DuckInterpolator, _make_ref_unet
    import tests.test_torch_parity_engine as eng_mod

    # reuse the parity fixture's exact construction at the requested scale
    eng_mod.HGT = eng_mod.WID = args.spatial
    C, SC = args.channels, args.static_channels
    H, K = args.horizon, args.k_aux

    ref_unet_mod = import_reference("src.models.unet")
    ref_dyf_mod = import_reference("src.diffusion.dyffusion")

    torch.manual_seed(0)
    ref_fc = ref_unet_mod.Unet(
        dim=args.dim, dim_mults=mults, resnet_block_groups=args.groups, with_time_emb=True,
        num_input_channels=C, num_output_channels=C,
        num_conditional_channels=C + SC, spatial_shape=(args.spatial, args.spatial))
    torch.manual_seed(1)
    ref_ip = ref_unet_mod.Unet(
        dim=args.dim, dim_mults=mults, resnet_block_groups=args.groups, with_time_emb=True,
        num_input_channels=2 * C, num_output_channels=C,
        num_conditional_channels=SC, spatial_shape=(args.spatial, args.spatial))
    ref_fc.eval(), ref_ip.eval()

    ref_engine = ref_dyf_mod.DYffusion(
        model=ref_fc,
        interpolator=_DuckInterpolator(ref_ip, window=1, horizon=H),
        timesteps=H, forward_conditioning="data", schedule="before_t1_only",
        additional_interpolation_steps=K, interpolate_before_t1=True,
        sampling_type="cold", time_encoding="dynamics",
        refine_intermediate_predictions=refine,
        lambda_reconstruction=0.5, lambda_reconstruction2=0.5,
        enable_interpolator_dropout=False,
    )
    ref_engine.eval()

    from dyffusion_tpu.diffusion import DyffusionConfig, DyffusionEngine
    from dyffusion_tpu.models import Unet, make_apply_fn

    ours_fc = Unet(dim=args.dim, dim_mults=mults, resnet_block_groups=args.groups,
                   with_time_emb=True, num_input_channels=C,
                   num_output_channels=C, num_conditional_channels=C + SC)
    ours_ip = Unet(dim=args.dim, dim_mults=mults, resnet_block_groups=args.groups,
                   with_time_emb=True, num_input_channels=2 * C,
                   num_output_channels=C, num_conditional_channels=SC)
    fc_vars = {"params": _port_unet_weights(ref_fc, n_levels=len(mults))}
    ip_vars = {"params": _port_unet_weights(ref_ip, n_levels=len(mults))}

    engine = DyffusionEngine(
        DyffusionConfig(
            timesteps=H, forward_conditioning="data", schedule="before_t1_only",
            additional_interpolation_steps=K, interpolate_before_t1=True,
            sampling_type="cold", time_encoding="dynamics",
            refine_intermediate_predictions=refine,
            lambda_reconstruction=0.5, lambda_reconstruction2=0.5,
            num_input_channels=C,
        ),
        forecaster_apply=make_apply_fn(ours_fc),
        interpolator_apply=make_apply_fn(ours_ip), interpolator_horizon=H,
    )

    rng = np.random.default_rng(0)
    B = args.batch
    cond = rng.normal(size=(B, C, args.spatial, args.spatial)).astype(np.float32)
    static = (
        rng.normal(size=(B, SC, args.spatial, args.spatial)).astype(np.float32)
        if SC > 0 else None
    )
    frames = B * H

    if args.mode == "train":
        return _bench_train(args, ref_engine, ref_fc, engine, fc_vars, ip_vars,
                            cond, static)

    # ---- torch reference loop ----
    cond_t = torch.from_numpy(cond)
    static_t = torch.from_numpy(static) if static is not None else None
    with torch.no_grad():
        ref_engine.sample(cond_t, static_condition=static_t)  # warmup
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = ref_engine.sample(cond_t, static_condition=static_t)
        torch_s = (time.perf_counter() - t0) / args.iters
    torch_fps = frames / torch_s

    # ---- our jitted engine ----
    nhwc = lambda x: jnp.asarray(np.transpose(x, (0, 2, 3, 1)))
    cond_j = nhwc(cond)
    static_j = nhwc(static) if static is not None else None

    @jax.jit
    def sample_fn(key, c, s):
        return engine.sample(fc_vars, ip_vars, key, c, s)

    key = jax.random.key(0)
    float(jnp.sum(sample_fn(key, cond_j, static_j)))  # warmup/compile
    t0 = time.perf_counter()
    acc = 0.0
    for i in range(args.iters):
        acc += float(jnp.sum(sample_fn(jax.random.fold_in(key, i), cond_j, static_j)))
    jax_s = (time.perf_counter() - t0) / args.iters
    jax_fps = frames / jax_s

    # sanity: same math (weights ported) — outputs should agree to f32 tol
    preds = np.asarray(sample_fn(key, cond_j, static_j))
    theirs = out[f"t{H}_preds"].numpy()
    drift = float(np.max(np.abs(np.transpose(preds[:, H - 1], (0, 3, 1, 2)) - theirs)))

    result = {
        "metric": "dyffusion_sampling_same_host",
        "sampling_fps": round(torch_fps, 2),  # read by bench.py
        "torch_frames_per_sec": round(torch_fps, 2),
        "jax_frames_per_sec": round(jax_fps, 2),
        "speedup_vs_torch_reference": round(jax_fps / torch_fps, 3),
        "max_abs_drift": drift,
        "jax_platform": jax.devices()[0].platform,
        "torch_threads": torch.get_num_threads(),
        "shape": {"B": B, "C": C, "spatial": args.spatial, "dim": args.dim,
                  "mults": list(mults), "refine": refine,
                  "horizon": H, "k_aux": K, "iters": args.iters},
    }
    print(json.dumps(result))
    if args.write_json:
        with open(args.write_json, "w") as f:
            json.dump(result, f)


def _bench_train(args, ref_engine, ref_fc, engine, fc_vars, ip_vars, cond, static):
    """One optimization step both sides: DYffusion two-term p_losses on the
    forecaster (frozen interpolator, ref ``forecasting_multi_horizon.py:422``),
    backward, Adam update."""
    import time

    import numpy as np
    import torch

    import jax
    import jax.numpy as jnp
    import optax

    B, H = args.batch, args.horizon
    rng = np.random.default_rng(1)
    x_last = rng.normal(size=cond.shape).astype(np.float32)

    # ---- torch: eager forward+backward+Adam on the forecaster ----
    ref_engine.train()
    opt = torch.optim.Adam(ref_fc.parameters(), lr=1e-4)
    cond_t = torch.from_numpy(cond)
    x_last_t = torch.from_numpy(x_last)
    static_t = torch.from_numpy(static) if static is not None else None

    def torch_step(i):
        t = torch.from_numpy(
            np.random.default_rng(i).integers(0, engine.num_timesteps, B).astype(np.float32))
        losses = ref_engine.p_losses(
            xt_last=x_last_t, condition=cond_t, t=t, static_condition=static_t)
        opt.zero_grad()
        losses["loss"].backward()
        opt.step()

    torch_step(0)  # warmup
    t0 = time.perf_counter()
    for i in range(args.iters):
        torch_step(i + 1)
    torch_s = (time.perf_counter() - t0) / args.iters

    # ---- jax: jitted value_and_grad + optax.adam, donated state ----
    nhwc = lambda x: jnp.asarray(np.transpose(x, (0, 2, 3, 1)))
    cond_j, x_last_j = nhwc(cond), nhwc(x_last)
    static_j = nhwc(static) if static is not None else None
    tx = optax.adam(1e-4)
    opt_state = tx.init(fc_vars)

    @jax.jit
    def train_step(params, opt_state, key):
        def loss_fn(p):
            loss, _ = engine.loss(p, ip_vars, key, x_last_j, cond_j, static_j)
            return loss
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    key = jax.random.key(0)
    params, opt_state, loss = train_step(fc_vars, opt_state, key)
    float(loss)  # warmup sync
    t0 = time.perf_counter()
    for i in range(args.iters):
        params, opt_state, loss = train_step(params, opt_state, jax.random.fold_in(key, i))
    final = float(loss)  # real device->host sync ends the timing
    jax_s = (time.perf_counter() - t0) / args.iters

    import json
    print(json.dumps({
        "metric": "dyffusion_train_step_same_host",
        "torch_steps_per_sec": round(1.0 / torch_s, 3),
        "jax_steps_per_sec": round(1.0 / jax_s, 3),
        "speedup_vs_torch_reference": round(torch_s / jax_s, 3),
        "final_loss": final,
        "jax_platform": jax.devices()[0].platform,
        "torch_threads": torch.get_num_threads(),
        "shape": {"B": B, "spatial": args.spatial, "dim": args.dim,
                  "horizon": H, "k_aux": args.k_aux, "iters": args.iters},
    }))


if __name__ == "__main__":
    main()
