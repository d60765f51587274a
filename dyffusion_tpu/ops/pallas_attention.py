"""Pallas TPU kernel for the linear-attention core.

The UNet's efficiency attention (``dyffusion_tpu.models.modules.LinearAttention``,
ref ``src/models/modules/attention.py:7-44``) runs, per (batch, head):

    k' = softmax(k over tokens);  q' = softmax(q over dim) * scale;  v' = v/N
    context = k' v'^T  (d x d);   out = context^T q'  (d x N)

The XLA path materializes softmax(k), softmax(q) and the intermediates in
HBM between fusions; this kernel keeps the whole chain in VMEM per
(batch*head) grid cell — two small MXU matmuls plus VPU softmaxes with a
single HBM read of q/k/v and a single write of out.

Correctness is tested against the pure-jnp reference in
``tests/test_pallas_attention.py``; use :func:`linear_attention_core` with
``use_pallas=False`` for the XLA fallback (CPU interpret mode is used
automatically off-TPU).

Measured on v5e (f32, BH=480, d=32): N=3600 pallas 4.67ms vs XLA 4.29ms;
N=900 2.28ms vs 2.15ms — numerically exact, but XLA's own fusion already
saturates these small per-head shapes, so the XLA path stays the default in
the UNet (per SURVEY.md §7.3-5: a Pallas kernel must beat XLA to justify
itself; this one is kept as validated infrastructure for larger grids).
"""
from __future__ import annotations

import contextlib
import functools
import threading

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jnp.ndarray

# trace-time override used by serving.export_run: multi-platform and
# shape-polymorphic artifacts must not contain TPU-only Pallas calls (the
# CPU lowering would fail / polymorphic grids are unsupported), so tracing
# under force_xla_path() routes every auto-gated kernel to its XLA fallback
# (the reference's analogue: CPU fallbacks for its CUDA ops,
# ref ``op/upfirdn2d.py:16-17``).
_XLA_ONLY = threading.local()


def xla_only_forced() -> bool:
    """True while tracing inside :func:`force_xla_path`."""
    return getattr(_XLA_ONLY, "on", False)


@contextlib.contextmanager
def force_xla_path():
    """Context manager: disable TPU-only Pallas kernels for code traced
    inside (numerically equivalent XLA paths take over)."""
    prev = getattr(_XLA_ONLY, "on", False)
    _XLA_ONLY.on = True
    try:
        yield
    finally:
        _XLA_ONLY.on = prev


def _core_reference(q: Array, k: Array, v: Array, scale: float, n_tokens: int) -> Array:
    """Pure-jnp reference: inputs (BH, d, N) -> out (BH, d, N)
    (the 'qkv'-rescale variant, ref ``attention.py:39-44``)."""
    q = jax.nn.softmax(q, axis=-2) * scale
    k = jax.nn.softmax(k, axis=-1)
    v = v / n_tokens
    context = jnp.einsum("bdn,ben->bde", k, v)
    return jnp.einsum("bde,bdn->ben", context, q)


def _kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float, n_tokens: int, n_valid: int):
    # blocks are (1, d, N_pad); token padding is masked out of the softmax/sums
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    d, n_pad = q.shape
    if n_pad != n_valid:
        col = jax.lax.broadcasted_iota(jnp.int32, (d, n_pad), 1)
        valid = col < n_valid
        neg = jnp.finfo(q.dtype).min
        k = jnp.where(valid, k, neg)
        v = jnp.where(valid, v, 0)
    else:
        valid = None
    # softmax over dim axis for q (padding columns produce garbage but are
    # multiplied only into their own output columns, which the caller crops)
    q = jax.nn.softmax(q, axis=0) * scale
    k = jax.nn.softmax(k, axis=1)
    v = v / n_tokens
    # dots pin Precision.DEFAULT: Mosaic lowering rejects HIGH/tensorfloat32,
    # so the global jax_default_matmul_precision must not leak into the kernel
    context = jnp.dot(k, v.T, preferred_element_type=jnp.float32, precision=jax.lax.Precision.DEFAULT)  # (d, d)
    out = jnp.dot(context.T, q.astype(jnp.float32), preferred_element_type=jnp.float32, precision=jax.lax.Precision.DEFAULT)
    o_ref[0] = out.astype(o_ref.dtype)


def _qkv_kernel(qkv_ref, o_ref, *, scale: float, n_tokens: int, n_valid: int, heads: int, dim_head: int):
    """All-heads-per-batch-cell linear attention on the NATURAL qkv layout.

    Reads one (N_pad, 3*h*d) block — the to_qkv Dense output for one batch
    element, channel-major [q|k|v] x head x dim — and writes (N_pad, h*d)
    ready for the out-projection. No HBM-level transposes anywhere: the
    XLA path materializes two (B, h, d, N) rearranged copies of qkv (~1.3 GB
    of traffic at sampler scale), which is what made attention the slowest
    block at 60x60 (PERF.md round-2 profile).

    The two matmuls run at full 128-lane width by computing ALL head pairs in
    one (h*d, h*d) context and masking it to its block-diagonal (one big MXU
    pass beats h tiny d x d ones).
    """
    blk = qkv_ref[0]  # (N_pad, 3*h*d)
    hd = heads * dim_head
    q = blk[:, :hd]
    k = blk[:, hd : 2 * hd]
    v = blk[:, 2 * hd :]
    n_pad = q.shape[0]
    if n_pad != n_valid:
        row = jax.lax.broadcasted_iota(jnp.int32, (n_pad, hd), 0)
        valid = row < n_valid
        k = jnp.where(valid, k, jnp.finfo(jnp.float32).min)
        v = jnp.where(valid, v, 0)
    # block-diagonal ones (same-head pairs) — used both as the segment-sum
    # operator and the cross-head mask
    r = jax.lax.broadcasted_iota(jnp.int32, (hd, hd), 0) // dim_head
    c = jax.lax.broadcasted_iota(jnp.int32, (hd, hd), 1) // dim_head
    same_head = (r == c).astype(jnp.float32)

    # q: softmax over dim_head WITHIN each head. Mosaic cannot lane-split
    # (N, hd) -> (N, h, d), so segment sums run as a matmul with the
    # block-diagonal ones matrix; stability comes from subtracting the row
    # max (>= every group max, so exp stays <= 1). Softmaxes compute in f32;
    # matmul inputs drop back to the input dtype (f32 accumulation via
    # preferred_element_type) to stay inside the 16MB VMEM budget.
    in_dtype = blk.dtype
    qf = q.astype(jnp.float32)
    qe = jnp.exp(qf - jnp.max(qf, axis=1, keepdims=True))
    seg = jnp.dot(qe, same_head, preferred_element_type=jnp.float32, precision=jax.lax.Precision.DEFAULT)  # per-head sums
    qs = (qe / seg * scale).astype(in_dtype)
    # k: softmax over tokens (major axis — directly supported)
    kf = jax.nn.softmax(k.astype(jnp.float32), axis=0).astype(in_dtype)
    vf = (v / n_tokens).astype(in_dtype)
    context = jnp.dot(kf.T, vf, preferred_element_type=jnp.float32, precision=jax.lax.Precision.DEFAULT)  # (hd, hd)
    context = (context * same_head).astype(in_dtype)  # per-head blocks only
    out = jnp.dot(qs, context, preferred_element_type=jnp.float32, precision=jax.lax.Precision.DEFAULT)  # (N_pad, hd)
    o_ref[0] = out.astype(o_ref.dtype)


def _xla_qkv(qkv: Array, heads: int, dim_head: int, scale: float) -> Array:
    """XLA composition of the qkv-layout linear attention (the rearrange +
    reference-core path). Numerically identical to the Pallas kernel (tested
    to 1e-8); also serves as the autodiff rule for it."""
    B, N, F = qkv.shape
    q, k, v = jnp.split(qkv, 3, axis=-1)

    def tr(t):  # (B, N, h*d) -> (B, h, d, N)
        return jnp.transpose(t.reshape(B, N, heads, dim_head), (0, 2, 3, 1))

    out = _core_reference(
        tr(q).reshape(B * heads, dim_head, N),
        tr(k).reshape(B * heads, dim_head, N),
        tr(v).reshape(B * heads, dim_head, N),
        scale,
        N,
    ).reshape(B, heads, dim_head, N)
    return jnp.transpose(out, (0, 3, 1, 2)).reshape(B, N, heads * dim_head)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def _pallas_qkv(qkv: Array, heads: int, dim_head: int, scale: float) -> Array:
    B, N, F = qkv.shape
    LANE = 128
    n_pad = -(-N // LANE) * LANE
    if n_pad != N:
        qkv = jnp.pad(qkv, ((0, 0), (0, n_pad - N), (0, 0)))
    kernel = functools.partial(
        _qkv_kernel, scale=scale, n_tokens=N, n_valid=N, heads=heads, dim_head=dim_head
    )
    out = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[pl.BlockSpec((1, n_pad, F), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(
            (1, n_pad, heads * dim_head), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, n_pad, heads * dim_head), qkv.dtype),
        interpret=jax.default_backend() == "cpu",
    )(qkv)
    return out[:, :N]


def _pallas_qkv_fwd(qkv, heads, dim_head, scale):
    return _pallas_qkv(qkv, heads, dim_head, scale), qkv


def _pallas_qkv_bwd(heads, dim_head, scale, qkv, g):
    # Backward rides the numerically-identical XLA composition: Pallas TPU
    # kernels have no automatic transpose rule, and without this ANY training
    # step through the UNet's attention dies with "Linearization failed"
    # (found by the verify drive — CPU-only tests never take this branch).
    _, vjp = jax.vjp(lambda t: _xla_qkv(t, heads, dim_head, scale), qkv)
    return vjp(g)


_pallas_qkv.defvjp(_pallas_qkv_fwd, _pallas_qkv_bwd)


def linear_attention_qkv(
    qkv: Array,
    heads: int,
    dim_head: int,
    scale: float,
    use_pallas: bool = True,
) -> Array:
    """Fused 'qkv'-rescale linear attention on the natural projection layout.

    Differentiable: the Pallas fast path carries a custom VJP that backprops
    through the identical XLA composition (one extra XLA forward in the
    backward pass — eval keeps the fused kernel, training keeps exact grads).

    Args:
        qkv: (B, N, 3*heads*dim_head) — the to_qkv Dense output, tokens-major.
    Returns:
        (B, N, heads*dim_head) attention output (pre out-projection),
        identical to the jnp reference path in ``LinearAttention``.
    """
    B, N, F = qkv.shape
    assert F == 3 * heads * dim_head
    # VMEM guard: per-cell footprint ~ input block + 3 f32 work buffers +
    # ~5 in-dtype (N, h*d) buffers; fall back to XLA when it would not fit
    # the 16MB scoped-vmem budget (e.g. f32 at 3600 tokens).
    LANE = 128
    n_pad_est = -(-N // LANE) * LANE
    isz = jnp.dtype(qkv.dtype).itemsize
    hd = heads * dim_head
    vmem_est = n_pad_est * F * isz + 3 * n_pad_est * hd * 4 + 5 * n_pad_est * hd * isz
    if vmem_est > 14 * 2**20:
        use_pallas = False
    if not use_pallas:
        return _xla_qkv(qkv, heads, dim_head, scale)
    return _pallas_qkv(qkv, heads, dim_head, scale)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _pallas_core(q: Array, k: Array, v: Array, scale: float) -> Array:
    return _pallas_core_impl(q, k, v, scale)


def _pallas_core_fwd(q, k, v, scale):
    return _pallas_core(q, k, v, scale), (q, k, v)


def _pallas_core_bwd(scale, res, g):
    q, k, v = res
    _, vjp = jax.vjp(lambda a, b, c: _core_reference(a, b, c, scale, q.shape[-1]), q, k, v)
    return vjp(g)


_pallas_core.defvjp(_pallas_core_fwd, _pallas_core_bwd)


def linear_attention_core(
    q: Array, k: Array, v: Array, scale: float, use_pallas: bool = True
) -> Array:
    """Fused linear-attention core (differentiable: custom VJP through the
    identical XLA reference).

    Args:
        q, k, v: (BH, d, N) — per-(batch*head) projections.
        scale: 1/sqrt(d_head).
    Returns:
        (BH, d, N) attention output (pre out-projection).
    """
    BH, d, N = q.shape
    if not use_pallas:
        return _core_reference(q, k, v, scale, N)
    return _pallas_core(q, k, v, scale)


def _pallas_core_impl(q: Array, k: Array, v: Array, scale: float) -> Array:
    BH, d, N = q.shape
    LANE = 128
    n_pad = -(-N // LANE) * LANE
    if n_pad != N:
        pad = ((0, 0), (0, 0), (0, n_pad - N))
        q = jnp.pad(q, pad)
        k = jnp.pad(k, pad)
        v = jnp.pad(v, pad)

    kernel = functools.partial(_kernel, scale=scale, n_tokens=N, n_valid=N)
    out = pl.pallas_call(
        kernel,
        grid=(BH,),
        in_specs=[
            pl.BlockSpec((1, d, n_pad), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d, n_pad), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d, n_pad), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, d, n_pad), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((BH, d, n_pad), q.dtype),
        interpret=jax.default_backend() == "cpu",
    )(q, k, v)
    return out[:, :, :N]
