"""Pallas weight-dequantizing int8 GEMM.

Serving-path kernel: activations (bf16/fp32) x int8 weights with per-output-
channel scales. The weight tile is dequantized in VMEM right before the MXU
dot, so HBM only ever carries int8 weights — a guaranteed 2x (vs bf16) /
4x (vs fp32) weight-bandwidth saving, independent of whether XLA fuses the
convert into the dot operand.

Tiling: grid over (M, N) blocks; the full K dimension stays resident per
tile (K <= a few thousand for the CLIP towers — 768/3072 — comfortably in
VMEM).
"""

import functools

import numpy as np

import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl


def _cdiv(a, b):
    return -(-a // b)


# ---------------------------------------------------------------------------
# kernel-routing gate. The fused int8/w8a8 Pallas paths are selected when
# running on TPU; force_tpu_kernels(True) routes them even off-TPU (the
# pallas_calls all pass interpret=True there) so CPU mesh tests can pin the
# GSPMD composition of the quantized serving/training paths — the exact
# composition the driver's dryrun can't otherwise reach (VERDICT r3 #3).
# Trace-time flag: flip it BEFORE tracing/jitting the function under test.
# ---------------------------------------------------------------------------

_FORCE_KERNELS = False


def force_tpu_kernels(enabled: bool = True) -> None:
    """Test hook: route int8/w8a8 compute through the Pallas kernels even on
    non-TPU backends (interpret mode). Affects functions traced AFTER the
    call; clear with force_tpu_kernels(False) in test teardown."""
    global _FORCE_KERNELS
    _FORCE_KERNELS = enabled


def kernels_active() -> bool:
    """True when the fused Pallas int8 paths should be used (on TPU, or
    forced by force_tpu_kernels for interpret-mode tests)."""
    return _FORCE_KERNELS or jax.default_backend() == "tpu"


def _kernel(x_ref, w_ref, s_ref, o_ref, *, out_dtype):
    x = x_ref[...]
    # dequantize to the ACTIVATION dtype and dot at its MXU rate (bf16 in
    # serving) with an fp32 accumulator — an fp32xfp32 dot here would run
    # the latency path at the fp32 MXU rate and diverge from the
    # quantized_linear XLA fallback, which dequantizes in x.dtype
    w = (w_ref[...].astype(jnp.float32)
         * s_ref[...].astype(jnp.float32)).astype(x.dtype)
    acc = jnp.dot(x, w, preferred_element_type=jnp.float32)
    o_ref[...] = acc.astype(out_dtype)


def int8_matmul(x: jax.Array, w_q: jax.Array, scale: jax.Array,
                block_m: int = 256, block_n: int = 256) -> jax.Array:
    """x (M, K) @ dequant(w_q (K, N), scale (1, N)) -> (M, N) in x.dtype."""
    M, K = x.shape
    K2, N = w_q.shape
    assert K == K2 and scale.shape == (1, N)
    bm = min(block_m, M)
    bn = min(block_n, N)
    # pad to tile multiples
    Mp, Np = _cdiv(M, bm) * bm, _cdiv(N, bn) * bn
    if Mp != M:
        x = jnp.pad(x, ((0, Mp - M), (0, 0)))
    if Np != N:
        w_q = jnp.pad(w_q, ((0, 0), (0, Np - N)))
        scale = jnp.pad(scale, ((0, 0), (0, Np - N)))

    out = pl.pallas_call(
        functools.partial(_kernel, out_dtype=x.dtype),
        grid=(Mp // bm, Np // bn),
        in_specs=[
            pl.BlockSpec((bm, K), lambda i, j: (i, 0)),
            pl.BlockSpec((K, bn), lambda i, j: (0, j)),
            pl.BlockSpec((1, bn), lambda i, j: (0, j)),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j: (i, j)),
        out_shape=jax.ShapeDtypeStruct((Mp, Np), x.dtype),
        compiler_params=_parallel_2d(),
        interpret=jax.default_backend() != "tpu",
    )(x, w_q, scale)
    return out[:M, :N]


def _parallel_2d():
    from jax.experimental.pallas import tpu as pltpu
    return pltpu.CompilerParams(
        dimension_semantics=("parallel", "parallel"))


def quantized_linear(qparams, x: jax.Array, use_kernel: bool = True) -> jax.Array:
    """Apply a linear layer whose kernel was quantized by
    ops.quant.quantize_tower_params ({'q', 'scale'} leaf + optional bias)."""
    q = qparams["kernel"]["q"]
    scale = qparams["kernel"]["scale"]
    orig_shape = x.shape
    x2 = x.reshape(-1, orig_shape[-1])
    if use_kernel and kernels_active():
        y = int8_matmul(x2, q, scale)
    else:
        w = q.astype(x.dtype) * scale.astype(x.dtype)
        y = x2 @ w
    y = y.reshape(orig_shape[:-1] + (q.shape[-1],))
    if "bias" in qparams and qparams["bias"] is not None:
        y = y + qparams["bias"].astype(y.dtype)
    return y


# ---------------------------------------------------------------------------
# w8a8: dynamic per-token activation quantization -> int8 MXU GEMM
#
# The quantize/rescale work happens INSIDE the Pallas kernel: the activation
# tile is quantized in VMEM right before the int8 dot and the int32
# accumulator is rescaled right after, so HBM traffic is identical to a bf16
# GEMM (x in, y out, int8 weights) while the MXU runs at its int8 rate.
# Measured on v5e (relay-amortized two-length chains): the pure int8
# dot + rescale sustains ~280-300 TOP/s at the tower K=768/3072 shapes
# (317 at K=N=4096) vs 158-189 TF/s for a bf16 dot in the same harness —
# the int8 MXU's real rate here, not the nominal 394.
# The fused triple GEMM at the ViT-B/16 shape (13696, 768)x(768, 768)x3
# runs ~255 TOP/s incl. the in-kernel LN+quant; the same composition left
# to XLA is slower because the int32/fp32 intermediates round-trip HBM.
# ---------------------------------------------------------------------------

def quantize_act(x: jax.Array):
    """Per-token (last-axis) symmetric int8 quantization of activations.

    Returns (x_q int8, x_scale fp32 with trailing singleton axis). Exact
    rank-1 rescale: dequant(x_q @ w_q) = (x_q @ w_q) * x_scale * w_scale.
    """
    xf = x.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    xs = jnp.maximum(absmax, 1e-6) * (1.0 / 127.0)
    xq = jnp.clip(jnp.round(xf / xs), -127, 127).astype(jnp.int8)
    return xq, xs


def int8_apply(qleaf, xq: jax.Array, xs: jax.Array, bias=None,
               out_dtype=None) -> jax.Array:
    """int8 x int8 GEMM with rank-1 rescale: (xq (..., K) @ qa (K, N)) *
    xs * w_scale [+ bias]. XLA lowers the int8 dot to the v5e int8 MXU path
    (~394 TOPS vs ~197 bf16 TFLOPS)."""
    q = qleaf["qa"]
    w_scale = qleaf["scale"].astype(jnp.float32)
    lead = xq.shape[:-1]
    acc = jax.lax.dot_general(
        xq.reshape(-1, xq.shape[-1]), q,
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32)
    y = acc.astype(jnp.float32) * xs.reshape(-1, 1) * w_scale
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    out_dtype = out_dtype or xs.dtype
    return y.reshape(lead + (q.shape[-1],)).astype(out_dtype)


def int8_dynamic_linear(params, x: jax.Array) -> jax.Array:
    """Full w8a8 linear: quantize activations per token, int8 GEMM, rescale.

    On TPU this is the fused Pallas kernel (quant + dot + rescale in VMEM);
    elsewhere the XLA composition (numerically identical up to fp32 rounding,
    used by the CPU tests and as the reference)."""
    q = params["kernel"]["qa"]
    scale = params["kernel"]["scale"]
    bias = params.get("bias")
    x2 = x.reshape(-1, x.shape[-1])
    if kernels_active():
        y = w8a8_matmul(x2, q, scale, bias=bias)  # bias fused in-kernel
        bias = None
    else:
        xq, xs = quantize_act(x2)
        y = int8_apply(params["kernel"], xq, xs, out_dtype=x.dtype)
    y = y.reshape(x.shape[:-1] + (q.shape[-1],))
    if bias is not None:
        y = y + bias.astype(y.dtype)
    return y


# ---------------------------------------------------------------------------
# frozen-weight int8 training: int8 MXU forward, bf16 straight-through
# backward for dx. The weights carrying this path are FROZEN (the CLIP
# backbone — reference freeze rule VitaCLIP_model.py:230-239), so no dw is
# ever needed; the only cotangent is dx = dy @ dequant(W)^T, computed against
# the dequantized bf16 weights (the same W the quantized forward represents).
# Under remat the recomputed forward also runs at the int8 rate.
# ---------------------------------------------------------------------------


def _int8_linear_impl(x, qa, scale, bias):
    x2 = x.reshape(-1, x.shape[-1])
    if kernels_active():
        y = w8a8_matmul(x2, qa, scale, bias=bias)
    else:
        xq, xs = quantize_act(x2)
        y = int8_apply({"qa": qa, "scale": scale}, xq, xs, bias=bias,
                       out_dtype=x.dtype)
    return y.reshape(x.shape[:-1] + (qa.shape[-1],))


@jax.custom_vjp
def int8_linear_st(x, qa, scale, bias):
    """w8a8 linear with a straight-through backward: forward = per-token act
    quant + int8 MXU GEMM; backward = dx only (dy @ dequant(W)^T in the
    cotangent dtype). Intended for frozen weights ('qt' leaves from
    ops.quant.quantize_frozen_for_train) — their own cotangents are zero."""
    return _int8_linear_impl(x, qa, scale, bias)


def _int8_st_fwd(x, qa, scale, bias):
    return _int8_linear_impl(x, qa, scale, bias), (qa, scale, bias)


def _int8_st_bwd(res, g):
    qa, scale, bias = res
    w = qa.astype(g.dtype) * scale.astype(g.dtype)          # (K, N)
    g2 = g.reshape(-1, g.shape[-1])
    dx = (g2 @ w.T).reshape(g.shape[:-1] + (qa.shape[0],))
    d_qa = np.zeros(qa.shape, jax.dtypes.float0)            # int primal
    d_scale = jnp.zeros_like(scale)
    d_bias = None if bias is None else jnp.zeros_like(bias)
    return dx, d_qa, d_scale, d_bias


int8_linear_st.defvjp(_int8_st_fwd, _int8_st_bwd)


# --- fused differentiable blocks (frozen LN + int8 GEMMs, hand VJP) --------
#
# The unfused qt composition (separate XLA LayerNorm + one Pallas call per
# GEMM + XLA QuickGELU) measured SLOWER than bf16 at the flagship train
# shape: each Pallas call is an opaque fusion barrier, so the activations
# make extra HBM round trips that cost more than the int8 MXU rate saves —
# and remat=full doubles the forward, doubling the loss. These two ops reuse
# the FUSED inference kernels (w8a8_matmul3, w8a8_mlp_res — LN + quant +
# int8 GEMMs + GELU + residual in VMEM) for the forward and hand-write the
# backward. Frozen-backbone assumption: the LayerNorm scale/bias and the
# int8 weights carry NO cotangents (reference freeze rule
# VitaCLIP_model.py:230-239) — only dx (and the residual) flow back.


def _f0(x):
    return np.zeros(x.shape, jax.dtypes.float0) if \
        jnp.issubdtype(x.dtype, jnp.integer) else jnp.zeros_like(x)


def _ln_stats(x32, eps=1e-5):
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    inv = jax.lax.rsqrt(var + eps)
    return (x32 - mean) * inv, inv


def _ln_bwd_input(g_n, xhat, inv, gamma):
    """dx of y = gamma * xhat + beta wrt x, gamma/beta constant."""
    g = g_n * gamma
    return inv * (g - jnp.mean(g, axis=-1, keepdims=True)
                  - xhat * jnp.mean(g * xhat, axis=-1, keepdims=True))


def _quick_gelu_grad(h):
    s = jax.nn.sigmoid(1.702 * h)
    return s + h * 1.702 * s * (1.0 - s)


@jax.custom_vjp
def int8_qkv3_st(x, wq, wk, wv, sq, sk, sv, bq, bk, bv, ln_s, ln_b):
    """Differentiable fused LN + shared-quant triple int8 GEMM (q/k/v).

    Forward = w8a8_matmul3 (one VMEM pass); backward = dx only:
    dn = sum_i dO_i @ W_i^T through the LayerNorm input formula."""
    outs = w8a8_matmul3(x, (wq, wk, wv), (sq, sk, sv), bias3=(bq, bk, bv),
                        ln=(ln_s, ln_b))
    return tuple(outs)


def _qkv3_fwd(x, wq, wk, wv, sq, sk, sv, bq, bk, bv, ln_s, ln_b):
    outs = int8_qkv3_st(x, wq, wk, wv, sq, sk, sv, bq, bk, bv, ln_s, ln_b)
    return outs, (x, wq, wk, wv, sq, sk, sv, bq, bk, bv, ln_s, ln_b)


def _qkv3_bwd(res, g):
    x, wq, wk, wv, sq, sk, sv, bq, bk, bv, ln_s, ln_b = res
    gq, gk, gv = g
    dn = None
    for gi, w, s in ((gq, wq, sq), (gk, wk, sk), (gv, wv, sv)):
        wf = w.astype(gi.dtype) * s.astype(gi.dtype)
        d = gi @ wf.T
        dn = d if dn is None else dn + d
    xhat, inv = _ln_stats(x.astype(jnp.float32))
    dx = _ln_bwd_input(dn.astype(jnp.float32), xhat, inv,
                       ln_s.astype(jnp.float32)).astype(x.dtype)
    return (dx, _f0(wq), _f0(wk), _f0(wv),
            jnp.zeros_like(sq), jnp.zeros_like(sk), jnp.zeros_like(sv),
            jnp.zeros_like(bq), jnp.zeros_like(bk), jnp.zeros_like(bv),
            jnp.zeros_like(ln_s), jnp.zeros_like(ln_b))


int8_qkv3_st.defvjp(_qkv3_fwd, _qkv3_bwd)


@jax.custom_vjp
def int8_mlp_st(x, w1, s1, b1, w2, s2, b2, ln_s, ln_b, residual):
    """Differentiable fused transformer MLP on int8 (frozen weights):
    forward = w8a8_mlp_res (LN + int8 fc1 + QuickGELU + int8 fc2 + residual
    in VMEM); backward recomputes LN/fc1 once (straight-through through the
    quantization) and returns dx + d_residual only."""
    fc1 = {"kernel": {"qa": w1, "scale": s1}, "bias": b1}
    fc2 = {"kernel": {"qa": w2, "scale": s2}, "bias": b2}
    return w8a8_mlp_res(x, fc1, fc2, (ln_s, ln_b), residual)


def _mlp_st_fwd(x, w1, s1, b1, w2, s2, b2, ln_s, ln_b, residual):
    y = int8_mlp_st(x, w1, s1, b1, w2, s2, b2, ln_s, ln_b, residual)
    return y, (x, w1, s1, b1, w2, s2, b2, ln_s, ln_b)


def _mlp_st_bwd(res, g):
    x, w1, s1, b1, w2, s2, b2, ln_s, ln_b = res
    g32 = g.astype(jnp.float32)
    xhat, inv = _ln_stats(x.astype(jnp.float32))
    gamma = ln_s.astype(jnp.float32)
    n = (xhat * gamma + ln_b.astype(jnp.float32)).astype(g.dtype)
    w1f = w1.astype(g.dtype) * s1.astype(g.dtype)
    w2f = w2.astype(g.dtype) * s2.astype(g.dtype)
    h = (n @ w1f).astype(jnp.float32) + b1.astype(jnp.float32)
    da = g32 @ w2f.T.astype(jnp.float32)
    dh = (da * _quick_gelu_grad(h)).astype(g.dtype)
    dn = dh @ w1f.T
    dx = _ln_bwd_input(dn.astype(jnp.float32), xhat, inv,
                       gamma).astype(x.dtype)
    return (dx, _f0(w1), jnp.zeros_like(s1), jnp.zeros_like(b1),
            _f0(w2), jnp.zeros_like(s2), jnp.zeros_like(b2),
            jnp.zeros_like(ln_s), jnp.zeros_like(ln_b), g)


int8_mlp_st.defvjp(_mlp_st_fwd, _mlp_st_bwd)


def _pick_bn(Np: int, cap: int = 1024) -> int:
    for bn in range(cap, 0, -128):
        if Np % bn == 0:
            return bn
    return 128


def _ln_f32(x32, scale, bias, eps=1e-5):
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    return (x32 - mean) * jax.lax.rsqrt(var + eps) * scale + bias


def _quant_rows(x32):
    xs = jnp.maximum(jnp.max(jnp.abs(x32), axis=-1, keepdims=True), 1e-6) \
        * (1.0 / 127.0)
    return jnp.round(x32 * (1.0 / xs)).astype(jnp.int8), xs


def _quick_gelu(x32):
    return x32 * jax.nn.sigmoid(1.702 * x32)


def _w8a8_kernel(x_ref, w_ref, s_ref, *rest, out_dtype, has_bias):
    rest = list(rest)
    o_ref = rest.pop()
    x = x_ref[...].astype(jnp.float32)
    xq, xs = _quant_rows(x)
    acc = jnp.dot(xq, w_ref[...], preferred_element_type=jnp.int32)
    y = acc.astype(jnp.float32) * xs * s_ref[...].astype(jnp.float32)
    if has_bias:
        y = y + rest.pop(0)[...].astype(jnp.float32)
    o_ref[...] = y.astype(out_dtype)


def w8a8_matmul(x: jax.Array, w_q: jax.Array, scale: jax.Array,
                bias=None, block_m: int = 512) -> jax.Array:
    """Fused act-quant int8 GEMM: per-row int8 quant (VMEM) ->
    int8 MXU dot -> rescale [-> + bias].

    x (M, K) bf16/fp32; w_q (K, N) int8; scale (1, N) fp32; bias (N,).
    One HBM read of x and one write of the (M, N) output — same traffic as a
    plain bf16 GEMM with the MXU at its int8 rate. (Callers needing a fused
    pre-LN use w8a8_matmul3 / w8a8_mlp — an ln param here was dead code.)
    """
    from jax.experimental.pallas import tpu as pltpu

    M, K = x.shape
    K2, N = w_q.shape
    assert K == K2 and scale.shape == (1, N), (x.shape, w_q.shape, scale.shape)
    bm = min(block_m, _cdiv(M, 8) * 8)
    Np = _cdiv(N, 128) * 128
    bn = _pick_bn(Np)
    if Np != N:
        w_q = jnp.pad(w_q, ((0, 0), (0, Np - N)))
        scale = jnp.pad(scale, ((0, 0), (0, Np - N)), constant_values=1.0)

    in_specs = [pl.BlockSpec((bm, K), lambda i, j: (i, 0)),
                pl.BlockSpec((K, bn), lambda i, j: (0, j)),
                pl.BlockSpec((1, bn), lambda i, j: (0, j))]
    args = [x, w_q, scale]
    if bias is not None:
        b = bias.reshape(1, N)
        if Np != N:
            b = jnp.pad(b, ((0, 0), (0, Np - N)))
        in_specs.append(pl.BlockSpec((1, bn), lambda i, j: (0, j)))
        args.append(b)

    out = pl.pallas_call(
        functools.partial(_w8a8_kernel, out_dtype=x.dtype,
                          has_bias=bias is not None),
        grid=(_cdiv(M, bm), Np // bn),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((bm, bn), lambda i, j: (i, j)),
        out_shape=jax.ShapeDtypeStruct((M, Np), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
        interpret=jax.default_backend() != "tpu",
    )(*args)
    return out[:, :N] if Np != N else out


def _w8a8_kernel3(x_ref, wq_ref, wk_ref, wv_ref, s_ref, b_ref, *rest,
                  out_dtype, has_ln):
    rest = list(rest)
    oq_ref, ok_ref, ov_ref = rest[-3:]
    x = x_ref[...].astype(jnp.float32)
    if has_ln:
        x = _ln_f32(x, rest[0][...].astype(jnp.float32),
                    rest[1][...].astype(jnp.float32))
    xq, xs = _quant_rows(x)
    s = s_ref[...].astype(jnp.float32)   # (3, N) stacked q/k/v channel scales
    b = b_ref[...].astype(jnp.float32)   # (3, N) stacked biases
    for idx, (w_ref, o_ref) in enumerate(
            ((wq_ref, oq_ref), (wk_ref, ok_ref), (wv_ref, ov_ref))):
        acc = jnp.dot(xq, w_ref[...], preferred_element_type=jnp.int32)
        o_ref[...] = (acc.astype(jnp.float32) * xs * s[idx:idx + 1]
                      + b[idx:idx + 1]).astype(out_dtype)


def _pick_bm_even(M: int, cap: int) -> int:
    """Largest row-block <= cap (sublane-aligned) that yields an EVEN number
    of grid blocks, so the two v5e megacores split a parallel 1D grid
    evenly. At the bench shape (M=13696) the 856-row cap picks 16 blocks:
    measured 0.190 ms vs 0.203 ms for bm=512 (27 blocks, 14/13 split).
    bm=1712 (8 blocks) measured 0.184 but its ~20 MB scoped footprint
    (bf16 block + fp32 LN copy + three outputs) trips the 16 MB scoped
    VMEM limit in some surrounding compositions."""
    best = min(cap, _cdiv(M, 8) * 8)
    n = _cdiv(M, best)
    if n > 1:
        n += n % 2
    return _cdiv(_cdiv(M, n), 8) * 8


def w8a8_matmul3(x: jax.Array, wq3, scale3, bias3=None, ln=None,
                 block_m: int = 856):
    """Shared-quant triple GEMM for self-attention q/k/v projections: the
    activation tile is read from HBM, [LayerNorm'd,] and quantized ONCE,
    then multiplied by three int8 weight matrices (one VMEM-resident copy
    each). Saves 2/3 of the activation reads and all redundant
    normalization/quantization work vs three separate GEMMs.

    wq3: three (K, N) int8 kernels; scale3: three (1, N) fp32 scales;
    bias3: three (N,) biases; ln: (scale (K,), bias (K,)) LayerNorm params.
    Returns three (M, N) arrays in x.dtype.
    """
    from jax.experimental.pallas import tpu as pltpu

    M, K = x.shape
    N = wq3[0].shape[1]
    for w in wq3:
        assert w.shape == (K, N)
    bm = _pick_bm_even(M, block_m)
    scales = jnp.concatenate([s.astype(jnp.float32) for s in scale3], axis=0)
    if bias3 is None:
        biases = jnp.zeros((3, N), jnp.float32)
    else:
        biases = jnp.stack([b.astype(jnp.float32) for b in bias3], axis=0)

    in_specs = [pl.BlockSpec((bm, K), lambda i: (i, 0))] + \
               [pl.BlockSpec((K, N), lambda i: (0, 0))] * 3 + \
               [pl.BlockSpec((3, N), lambda i: (0, 0))] * 2
    args = [x] + list(wq3) + [scales, biases]
    if ln is not None:
        for p in ln:
            in_specs.append(pl.BlockSpec((1, K), lambda i: (0, 0)))
            args.append(p.reshape(1, K))

    outs = pl.pallas_call(
        functools.partial(_w8a8_kernel3, out_dtype=x.dtype,
                          has_ln=ln is not None),
        grid=(_cdiv(M, bm),),
        in_specs=in_specs,
        out_specs=[pl.BlockSpec((bm, N), lambda i: (i, 0))] * 3,
        out_shape=[jax.ShapeDtypeStruct((M, N), x.dtype)] * 3,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
        interpret=jax.default_backend() != "tpu",
    )(*args)
    return outs


def _w8a8_kernel3_cat(x_ref, e_ref, wq_ref, wk_ref, wv_ref, s_ref, b_ref,
                      ln_s_ref, ln_b_ref, oq_ref, ok_ref, ov_ref, *,
                      out_dtype, lx: int, le: int):
    """_w8a8_kernel3 over a block of C clips whose rows arrive as two
    arrays — C*lx patch rows and C*le extras rows — stitched per clip in
    VMEM (all pieces 8-row aligned) into the interleaved kv layout before
    the shared LN+quant and the three dots. One launch replaces the
    XLA kv concatenate (a (BT, lx+le, D) HBM write + re-read)."""
    C = x_ref.shape[0] // lx
    parts = []
    for c in range(C):
        parts.append(x_ref[c * lx:(c + 1) * lx, :])
        parts.append(e_ref[c * le:(c + 1) * le, :])
    x = jnp.concatenate(parts, axis=0).astype(jnp.float32)
    x = _ln_f32(x, ln_s_ref[...].astype(jnp.float32),
                ln_b_ref[...].astype(jnp.float32))
    xq, xs = _quant_rows(x)
    s = s_ref[...].astype(jnp.float32)
    b = b_ref[...].astype(jnp.float32)
    for idx, (w_ref, o_ref) in enumerate(
            ((wq_ref, oq_ref), (wk_ref, ok_ref), (wv_ref, ov_ref))):
        acc = jnp.dot(xq, w_ref[...], preferred_element_type=jnp.int32)
        o_ref[...] = (acc.astype(jnp.float32) * xs * s[idx:idx + 1]
                      + b[idx:idx + 1]).astype(out_dtype)


def w8a8_matmul3_cat(x, e, wq3, scale3, bias3=None, ln=None,
                     clips_per_block: int = 2):
    """Shared-quant triple GEMM over the interleaved [x-rows; extras-rows]
    per-clip kv layout WITHOUT materializing the concatenated kv in HBM.

    x (B, Lx, K) and e (B, Le, K) with Lx, Le multiples of 8 (the
    sublane-aligned serving layout); returns three (B, Lx+Le, N) arrays.
    Requires B % clips_per_block == 0.

    clips_per_block default 2: fastest in both r05 healthy-window sweeps
    at the serving shape (BT=128, Lx=200, Le=24 — 0.3501/0.3607 ms vs
    cpb=4's 0.3526/0.3796, cpb=1's 0.3843; cpb>=8 is a compiler crash,
    the >=1792-row block overflows VMEM), confirmed by the same-window
    full-model A/B together with the MLP block_m change: 761.2 -> 777.0
    clips/s (queued_bench_r05/DECISIONS.md).
    """
    from jax.experimental.pallas import tpu as pltpu

    B, Lx, K = x.shape
    Le = e.shape[1]
    assert Lx % 8 == 0 and Le % 8 == 0, (Lx, Le)
    assert B % clips_per_block == 0, (B, clips_per_block)
    C = clips_per_block
    Lkv = Lx + Le
    N = wq3[0].shape[1]
    scales = jnp.concatenate([s.astype(jnp.float32) for s in scale3], axis=0)
    if bias3 is None:
        biases = jnp.zeros((3, N), jnp.float32)
    else:
        biases = jnp.stack([bb.astype(jnp.float32) for bb in bias3], axis=0)
    assert ln is not None
    x2, e2 = x.reshape(-1, K), e.reshape(-1, K)

    in_specs = [pl.BlockSpec((C * Lx, K), lambda i: (i, 0)),
                pl.BlockSpec((C * Le, K), lambda i: (i, 0))] + \
               [pl.BlockSpec((K, N), lambda i: (0, 0))] * 3 + \
               [pl.BlockSpec((3, N), lambda i: (0, 0))] * 2 + \
               [pl.BlockSpec((1, K), lambda i: (0, 0))] * 2
    args = [x2, e2] + list(wq3) + [scales, biases,
                                   ln[0].reshape(1, K), ln[1].reshape(1, K)]
    outs = pl.pallas_call(
        functools.partial(_w8a8_kernel3_cat, out_dtype=x.dtype,
                          lx=Lx, le=Le),
        grid=(B // C,),
        in_specs=in_specs,
        out_specs=[pl.BlockSpec((C * Lkv, N), lambda i: (i, 0))] * 3,
        out_shape=[jax.ShapeDtypeStruct((B * Lkv, N), x.dtype)] * 3,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
        interpret=jax.default_backend() != "tpu",
    )(*args)
    return tuple(o.reshape(B, Lkv, N) for o in outs)


def _w8a8_mlp_kernel(x_ref, w1_ref, s1_ref, b1_ref, w2_ref, s2_ref, b2_ref,
                     *rest, out_dtype, has_ln):
    rest = list(rest)
    o_ref = rest.pop()
    x = x_ref[...].astype(jnp.float32)
    if has_ln:
        x = _ln_f32(x, rest[0][...].astype(jnp.float32),
                    rest[1][...].astype(jnp.float32))
    xq, xs = _quant_rows(x)
    acc1 = jnp.dot(xq, w1_ref[...], preferred_element_type=jnp.int32)
    h = acc1.astype(jnp.float32) * xs * s1_ref[...].astype(jnp.float32) \
        + b1_ref[...].astype(jnp.float32)
    h = _quick_gelu(h)
    hq, hs = _quant_rows(h)
    acc2 = jnp.dot(hq, w2_ref[...], preferred_element_type=jnp.int32)
    y = acc2.astype(jnp.float32) * hs * s2_ref[...].astype(jnp.float32) \
        + b2_ref[...].astype(jnp.float32)
    o_ref[...] = y.astype(out_dtype)


def w8a8_mlp(x: jax.Array, fc1, fc2, ln=None, block_m: int = 512):
    """Fully fused transformer MLP: [LayerNorm ->] quant -> int8 fc1 ->
    +bias -> QuickGELU -> quant -> int8 fc2 -> +bias, entirely in VMEM.

    Besides running both GEMMs at the int8 MXU rate, this removes the
    (M, 4K) fc1 intermediate from HBM (the XLA bf16 path writes and re-reads
    it because XLA never fuses through a matmul).

    fc1/fc2: {'kernel': {'qa', 'scale'}, 'bias'} pytrees.
    """
    from jax.experimental.pallas import tpu as pltpu

    M, K = x.shape
    w1, s1 = fc1["kernel"]["qa"], fc1["kernel"]["scale"]
    w2, s2 = fc2["kernel"]["qa"], fc2["kernel"]["scale"]
    H = w1.shape[1]
    N = w2.shape[1]
    assert w2.shape[0] == H
    bm = min(block_m, _cdiv(M, 8) * 8)

    in_specs = [pl.BlockSpec((bm, K), lambda i: (i, 0)),
                pl.BlockSpec((K, H), lambda i: (0, 0)),
                pl.BlockSpec((1, H), lambda i: (0, 0)),
                pl.BlockSpec((1, H), lambda i: (0, 0)),
                pl.BlockSpec((H, N), lambda i: (0, 0)),
                pl.BlockSpec((1, N), lambda i: (0, 0)),
                pl.BlockSpec((1, N), lambda i: (0, 0))]
    args = [x, w1, s1, fc1["bias"].reshape(1, H),
            w2, s2, fc2["bias"].reshape(1, N)]
    if ln is not None:
        for p in ln:
            in_specs.append(pl.BlockSpec((1, K), lambda i: (0, 0)))
            args.append(p.reshape(1, K))

    out = pl.pallas_call(
        functools.partial(_w8a8_mlp_kernel, out_dtype=x.dtype,
                          has_ln=ln is not None),
        grid=(_cdiv(M, bm),),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((bm, N), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((M, N), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
        interpret=jax.default_backend() != "tpu",
    )(*args)
    return out


def w8a8_mlp_res(x: jax.Array, fc1, fc2, ln, residual: jax.Array,
                 block_m: int | None = None):
    """w8a8_mlp with the residual add fused into the store: returns
    residual + MLP(LN(x)). Saves one full read+write pass over the
    (M, N) activations per block.

    block_m default: 640 when M divides into exact 640-row blocks — the
    r05 sweep at the serving shape (M=25600 = 128 frames x 200 aligned
    query rows) measured 640 fastest in two independent healthy windows
    (0.9018/0.9043 ms vs 400 -> 0.9378/0.9384, 512 -> 0.9108/0.9249,
    856 -> 0.9089/0.9197; >=1024 is a compiler crash: the fp32 hidden
    tile alone is >=12.6 MB of VMEM), and the same-window FULL-MODEL A/B
    confirmed it end-to-end: 761.2 -> 777.0 clips/s together with the
    qkv-cat clips_per_block 4 -> 2 (queued_bench_r05/DECISIONS.md;
    r04's one-off 0.73 ms @400 did not reproduce). Else 400 when M
    divides into 400-row blocks (the r04-swept choice), else 512 —
    partial-block geometries are unswept (ADVICE r4)."""
    from jax.experimental.pallas import tpu as pltpu

    M, K = x.shape
    if block_m is None:
        block_m = (640 if M % 640 == 0
                   else 400 if M % 400 == 0 else 512)
    w1, s1 = fc1["kernel"]["qa"], fc1["kernel"]["scale"]
    w2, s2 = fc2["kernel"]["qa"], fc2["kernel"]["scale"]
    H = w1.shape[1]
    N = w2.shape[1]
    # NOTE: an even grid-block count does NOT help here (measured at
    # M=12608: 512x25 blocks 0.420 ms vs even 488x26 0.471 / 576x22
    # 0.434) — unlike the qkv3 kernel, so keep the plain cap.
    bm = min(block_m, _cdiv(M, 8) * 8)

    def kernel(x_ref, w1_ref, s1_ref, b1_ref, w2_ref, s2_ref, b2_ref,
               ln_s_ref, ln_b_ref, r_ref, o_ref):
        x32 = x_ref[...].astype(jnp.float32)
        x32 = _ln_f32(x32, ln_s_ref[...].astype(jnp.float32),
                      ln_b_ref[...].astype(jnp.float32))
        xq, xs = _quant_rows(x32)
        acc1 = jnp.dot(xq, w1_ref[...], preferred_element_type=jnp.int32)
        h = acc1.astype(jnp.float32) * xs * s1_ref[...].astype(jnp.float32) \
            + b1_ref[...].astype(jnp.float32)
        h = _quick_gelu(h)
        hq, hs = _quant_rows(h)
        acc2 = jnp.dot(hq, w2_ref[...], preferred_element_type=jnp.int32)
        y = acc2.astype(jnp.float32) * hs * s2_ref[...].astype(jnp.float32) \
            + b2_ref[...].astype(jnp.float32)
        o_ref[...] = (y + r_ref[...].astype(jnp.float32)).astype(o_ref.dtype)

    out = pl.pallas_call(
        kernel,
        grid=(_cdiv(M, bm),),
        in_specs=[pl.BlockSpec((bm, K), lambda i: (i, 0)),
                  pl.BlockSpec((K, H), lambda i: (0, 0)),
                  pl.BlockSpec((1, H), lambda i: (0, 0)),
                  pl.BlockSpec((1, H), lambda i: (0, 0)),
                  pl.BlockSpec((H, N), lambda i: (0, 0)),
                  pl.BlockSpec((1, N), lambda i: (0, 0)),
                  pl.BlockSpec((1, N), lambda i: (0, 0)),
                  pl.BlockSpec((1, K), lambda i: (0, 0)),
                  pl.BlockSpec((1, K), lambda i: (0, 0)),
                  pl.BlockSpec((bm, N), lambda i: (i, 0))],
        out_specs=pl.BlockSpec((bm, N), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((M, N), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
        interpret=jax.default_backend() != "tpu",
    )(x, w1, s1, fc1["bias"].reshape(1, H), w2, s2,
      fc2["bias"].reshape(1, N), ln[0].reshape(1, K), ln[1].reshape(1, K),
      residual)
    return out
