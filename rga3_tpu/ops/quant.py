"""Int8/int4 weight-only quantization (the reference's optional
bitsandbytes 4/8-bit inference path, TPU-native — ref:
evaluation/mevis_val_u/inference_mevis.py:70-93 `load_in_8bit` /
`load_in_4bit`).

Weight-only, symmetric, per-output-channel: kernels are stored int8 in HBM
(halving the weight traffic that bounds KV-cached decode) and dequantized
in-register at matmul time — XLA fuses the int8->bf16 convert and the
per-column scale into the matmul epilogue. Activations stay bf16, so
quality loss is far smaller than full int8 GEMM.

Tree layout: a quantized Dense is `{kernel_q: int8 (..., in, out),
scale: f32 (..., out)}` (leading axes carry nn.scan layer stacking).
"""
from __future__ import annotations

import functools
from typing import Any, Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def quantize_int8(
    w: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(..., in, out) float kernel -> int8 kernel + (..., out) f32 scale.
    Symmetric per-output-channel: scale = amax/127."""
    amax = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=-2)
    scale = jnp.where(amax > 0, amax / 127.0, 1.0)
    q = jnp.clip(
        jnp.round(w.astype(jnp.float32) / scale[..., None, :]), -127, 127
    ).astype(jnp.int8)
    return q, scale.astype(jnp.float32)


def int8_matmul(
    x: jnp.ndarray, kernel_q: jnp.ndarray, scale: jnp.ndarray
) -> jnp.ndarray:
    """x (..., in) @ dequant(kernel_q (in, out)) -> (..., out), in x.dtype."""
    y = x @ kernel_q.astype(x.dtype)
    return y * scale.astype(x.dtype)


def int8_w8a8_matmul(
    x: jnp.ndarray, kernel_q: jnp.ndarray, scale: jnp.ndarray
) -> jnp.ndarray:
    """W8A8: dynamic per-token activation quantization + native int8 MXU
    dot (s8 x s8 -> s32 runs at 2x the bf16 FLOP rate on v5e), dequant
    by (token_scale x channel_scale).

    Compute-bound prefill/vision legs only — weight-bound decode gains
    nothing from faster math and would pay the activation-quant error
    for free (QuantDense gates on the static token-axis length).
    Accuracy: symmetric absmax/127 per token ~0.4% relative error per
    matmul on Gaussian activations; outlier-heavy real activations are
    the known W8A8 risk (SmoothQuant territory) — validate end-task
    quality before enabling in production serving."""
    xs = jnp.max(
        jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True
    ) / 127.0
    xs = jnp.maximum(xs, 1e-8)
    xq = jnp.round(x.astype(jnp.float32) / xs).astype(jnp.int8)
    y = jax.lax.dot_general(
        xq, kernel_q,
        (((xq.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    return (
        y.astype(jnp.float32) * xs * scale.astype(jnp.float32)
    ).astype(x.dtype)


# ---------------------------------------------------------------------------
# Int4 weight-only (the reference's `load_in_4bit` counterpart): two
# nibbles packed per int8 byte along the input dim, symmetric [-7, 7]
# with group-wise scales (per-output-channel int4 loses too much; the
# group dim rides the input axis like GPTQ/bnb blockwise scales).
# ---------------------------------------------------------------------------

INT4_GROUP = 32  # input-dim rows per scale group (the llama.cpp Q4_0
# blocksize; measured ~15% lower output error than group-128 on Gaussian
# weights at 0.125 extra bytes/weight of f32 scales)


def int4_group(in_dim: int) -> int:
    """Scale-group size for a given input dim: 32 when both packed halves
    split cleanly into groups (in % 64 == 0), otherwise the whole dim
    (per-channel) — must match between quantize-time and apply-time."""
    return INT4_GROUP if in_dim % (2 * INT4_GROUP) == 0 else in_dim


def quantize_int4(
    w: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(..., in, out) float kernel -> packed int4 (..., in//2, out) +
    (..., in//group, out) f32 group scales. in must be even.

    Packing layout: byte row j holds original row j in its LOW nibble and
    original row j + in//2 in its HIGH nibble (contiguous halves, not
    interleaved pairs). Dequantization is then `concat(low, high)` along
    the contraction dim, which XLA fuses into two dot operands — an
    interleaved layout needs a stack+reshape shuffle that materializes
    the full bf16 weight matrix in HBM every matmul (measured 19.5 vs
    ~150 tok/s on 3B decode, and an HBM OOM at 7B)."""
    *lead, in_dim, out = w.shape
    assert in_dim % 2 == 0, in_dim
    g = int4_group(in_dim)
    # keep the big rescale in the weight's own dtype: a full f32 copy of a
    # stacked 28-layer bf16 kernel doubles the quantization peak HBM
    # (abs/max are exact in bf16; the bf16 divide can flip a borderline
    # level vs f32 — irrelevant at int4's 9% RTN error)
    wf = w.reshape(*lead, in_dim // g, g, out)
    amax = jnp.max(jnp.abs(wf), axis=-2).astype(jnp.float32)
    scale = jnp.where(amax > 0, amax / 7.0, 1.0)
    q = jnp.clip(
        jnp.round(wf / scale[..., None, :].astype(w.dtype)), -7, 7
    ).astype(jnp.int8).reshape(*lead, in_dim, out)
    half = in_dim // 2
    low = q[..., :half, :]
    high = q[..., half:, :]
    packed = jnp.bitwise_or(
        jnp.bitwise_and(low, 15), jnp.left_shift(high, 4)
    ).astype(jnp.int8)
    return packed, scale.astype(jnp.float32)


def _int4_unpack_halves(
    kernel_q4: jnp.ndarray, scale_g: jnp.ndarray, dtype
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Packed (..., in//2, out) -> (low, high) dequantized (..., in//2, out)
    weight halves in `dtype` (elementwise producers only — fusable)."""
    half, out = kernel_q4.shape[-2:]
    in_dim = half * 2
    g = int4_group(in_dim)
    low = jnp.right_shift(jnp.left_shift(kernel_q4, 4), 4)  # arithmetic
    high = jnp.right_shift(kernel_q4, 4)  # sign-extends
    lead = kernel_q4.shape[:-2]
    if g == in_dim:  # per-channel: one scale row shared by both halves
        s = scale_g.astype(dtype)[..., 0:1, :]
        return low.astype(dtype) * s, high.astype(dtype) * s
    gh = half // g  # groups per half

    def scaled(q, s):
        wf = q.astype(dtype).reshape(*lead, gh, g, out)
        return (wf * s.astype(dtype)[..., None, :]).reshape(
            *lead, half, out
        )

    return (
        scaled(low, scale_g[..., :gh, :]),
        scaled(high, scale_g[..., gh:, :]),
    )


def _int4_kernel(
    x_lo_ref, x_hi_ref, q_ref, s_ref, out_ref, acc_ref,
    *, gs: int, n_lo: int
):
    """One (m, out, in) grid step: dequantize a packed int4 weight block
    in VMEM (nibble unpack + group scales) and accumulate two dots.

    gs = scale groups per in-block (0 means per-channel scales: s_ref has
    one row shared by both halves); n_lo = scale rows of the low half."""
    i = pl.program_id(2)

    @pl.when(i == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    # unpack in int32: Mosaic does not legalize arith.shrsi on int8
    # vectors on v5e (the int8-domain version failed to compile with
    # "failed to legalize operation 'arith.shrsi'" on
    # vector<8x128x4xi8>), so upcast first — int32 shifts lower fine.
    # The sign extension of the i8->i32 cast makes hi = p >> 4 correct
    # directly; lo needs the shift-up/shift-down pair.
    p = q_ref[:].astype(jnp.int32)
    hi = jnp.right_shift(p, 4)  # top nibble carries the byte's sign
    lo = jnp.right_shift(jnp.left_shift(p, 28), 28)  # arithmetic
    hb, ob = q_ref.shape
    x_dtype = x_lo_ref.dtype

    # Scales hit the (m, ob) PARTIAL-DOT OUTPUTS, not the (hb, ob)
    # weight block — the weight-sized elementwise dequant multiply was
    # the VPU bottleneck (chain A/B at 28x 3584^2, m=16: 2.41 ->
    # 2.15 ms/chain, scripts/bench_int4_kernel.py v1; also lower
    # rounding error, 0.0029 vs 0.0047 rel).
    if gs == 0:  # per-channel: one scale row shared by both halves
        a_lo = jnp.dot(x_lo_ref[:], lo.astype(x_dtype),
                       preferred_element_type=jnp.float32)
        a_hi = jnp.dot(x_hi_ref[:], hi.astype(x_dtype),
                       preferred_element_type=jnp.float32)
        acc_ref[:] += (a_lo + a_hi) * s_ref[0:1, :]
    else:
        g = hb // gs
        acc = acc_ref[:]
        for gi in range(gs):
            sl = slice(gi * g, (gi + 1) * g)
            a_lo = jnp.dot(x_lo_ref[:, sl], lo[sl].astype(x_dtype),
                           preferred_element_type=jnp.float32)
            a_hi = jnp.dot(x_hi_ref[:, sl], hi[sl].astype(x_dtype),
                           preferred_element_type=jnp.float32)
            acc = (
                acc
                + a_lo * s_ref[i * gs + gi, :][None, :]
                + a_hi * s_ref[n_lo + i * gs + gi, :][None, :]
            )
        acc_ref[:] = acc

    @pl.when(i == pl.num_programs(2) - 1)
    def _():
        out_ref[:] = acc_ref[:].astype(out_ref.dtype)


def _pick_block(dim: int, candidates) -> int:
    for c in candidates:
        if dim % c == 0:
            return c
    return 0


def _int4_matmul_pallas(
    x2d: jnp.ndarray,
    kernel_q4: jnp.ndarray,
    scale_g: jnp.ndarray,
    interpret: bool = False,
) -> jnp.ndarray:
    """(M, in) @ packed int4 (in//2, out) via a Pallas kernel that reads
    only the packed bytes + scales from HBM and dequantizes in VMEM.

    XLA's dot-operand fusion handles the int8 path (convert + epilogue
    scale) but not int4's unpack + contraction-dim group scales — it
    materializes the full bf16 weights per step (slow) and its 1-token
    graph ran out of device memory at 7B on v5e. This kernel is also the
    roofline path: decode HBM traffic = 0.5 B/weight + scales."""
    m, in_dim = x2d.shape
    half, out = kernel_q4.shape
    g = int4_group(in_dim)
    n_groups = scale_g.shape[0]

    # pad rows to the bf16 min sublane tile (decode is M=1; the pad rows
    # are multiplied and discarded — weight reads dominate regardless)
    m_pad = -(-m // 16) * 16
    m_blk = min(m_pad, 256)
    while m_pad % m_blk:
        m_blk //= 2
    if g == in_dim:
        # per-channel scales: the single scale row is sliced statically,
        # any aligned in-block works
        hb = _pick_block(half, (512, 256, 128, 64, 32))
    else:
        # group scales are sliced at i*gs sublanes in-kernel; Mosaic
        # requires the offset/extent be multiples of 8 rows -> gs >= 8
        # -> in-block >= 256 packed rows
        hb = _pick_block(half, (512, 256))
    ob = _pick_block(out, (512, 256, 128))
    if not hb or not ob:
        wl, wh = _int4_unpack_halves(kernel_q4, scale_g, x2d.dtype)
        return x2d[..., :half] @ wl + x2d[..., half:] @ wh
    if m_pad != m:
        x2d = jnp.pad(x2d, ((0, m_pad - m), (0, 0)))

    import functools

    n_in = half // hb
    if g == in_dim:  # per-channel: one scale row shared by both halves
        gs, n_lo = 0, 0
    else:
        gs = hb // INT4_GROUP
        n_lo = half // INT4_GROUP

    out_arr = pl.pallas_call(
        functools.partial(_int4_kernel, gs=gs, n_lo=n_lo),
        grid=(m_pad // m_blk, out // ob, n_in),
        in_specs=[
            pl.BlockSpec((m_blk, hb), lambda mi, o, i: (mi, i)),
            pl.BlockSpec((m_blk, hb), lambda mi, o, i: (mi, n_in + i)),
            pl.BlockSpec((hb, ob), lambda mi, o, i: (i, o)),
            # all scale rows for this out-block; groups sliced in-kernel
            # (a (groups-per-block, ob) spec would violate the 8-sublane
            # block tiling when hb/32 < 8)
            pl.BlockSpec((n_groups, ob), lambda mi, o, i: (0, o)),
        ],
        out_specs=pl.BlockSpec((m_blk, ob), lambda mi, o, i: (mi, o)),
        out_shape=jax.ShapeDtypeStruct((m_pad, out), x2d.dtype),
        scratch_shapes=[pltpu.VMEM((m_blk, ob), jnp.float32)],
        interpret=interpret,
    )(x2d, x2d, kernel_q4, scale_g.astype(jnp.float32))
    return out_arr[:m] if m_pad != m else out_arr


def int4_matmul(
    x: jnp.ndarray,
    kernel_q4: jnp.ndarray,
    scale_g: jnp.ndarray,
    interpret: bool = False,
) -> jnp.ndarray:
    """x (..., in) @ dequant(packed (in//2, out), scales (groups, out)).

    On TPU (2-D kernels) this runs the Pallas dequant-matmul kernel; the
    fallback splits into two dots over the contiguous input halves so the
    unpack + group-scale stay elementwise producers XLA can fuse into the
    dot operands."""
    half = kernel_q4.shape[-2]
    on_tpu = jax.default_backend() == "tpu"
    if (on_tpu or interpret) and kernel_q4.ndim == 2:
        lead = x.shape[:-1]
        y = _int4_matmul_pallas(
            x.reshape(-1, x.shape[-1]), kernel_q4, scale_g,
            interpret=interpret,
        )
        return y.reshape(*lead, y.shape[-1])
    wl, wh = _int4_unpack_halves(kernel_q4, scale_g, x.dtype)
    return x[..., :half] @ wl + x[..., half:] @ wh


# Dense submodules of the LM that get quantized (q/k/v/o, MLP, lm_head).
# Embeddings (gather-only) and LoRA adapters stay in float.
QWEN_QUANT_KEYS = (
    "q_proj", "k_proj", "v_proj", "o_proj",
    "gate_proj", "up_proj", "down_proj", "lm_head",
)
# Vision-tower blocks (QwenVisionConfig.quant_int8); patch embed and the
# merger stay float.
VISION_QUANT_KEYS = (
    "attn_qkv", "attn_proj", "mlp_gate", "mlp_up", "mlp_down",
)


def quantize_qwen_params(
    params: Dict[str, Any],
    keys: Sequence[str] = QWEN_QUANT_KEYS,
    include_vision: bool = False,
    bits: int = 8,
) -> Dict[str, Any]:
    """Walk a QwenForCausalLM params tree and replace each targeted Dense
    `{kernel}` with `{kernel_q, scale}` (bits=8) or `{kernel_q4, scale_g}`
    (bits=4). Works for both unrolled (`layers_i`) and scanned
    (`layers_scan`, stacked kernels) layouts; biases are kept as-is. Use
    with QwenTextConfig(quant_int8=True) / (quant_int4=True)."""
    from flax.core import meta

    assert bits in (4, 8), bits
    params = meta.unbox(params)
    if include_vision:
        keys = tuple(keys) + VISION_QUANT_KEYS

    def walk(node, name):
        if isinstance(node, dict):
            if name in keys and "kernel" in node:
                out = {k: v for k, v in node.items() if k != "kernel"}
                if bits == 8:
                    q, scale = quantize_int8(jnp.asarray(node["kernel"]))
                    out["kernel_q"] = q
                    out["scale"] = scale
                else:
                    q4, sg = quantize_int4(jnp.asarray(node["kernel"]))
                    out["kernel_q4"] = q4
                    out["scale_g"] = sg
                return out
            return {k: walk(v, k) for k, v in node.items()}
        return node

    return walk(params, "")


def random_quantized_params(
    shapes: Dict[str, Any],
    bits: int = 0,
    keys: Sequence[str] = QWEN_QUANT_KEYS,
    seed: int = 0,
    dtype=jnp.bfloat16,
    bits_map: Dict[str, int] = None,
) -> Dict[str, Any]:
    """Random already-quantized params for benchmarks, built LEAF BY LEAF
    (each generate+quantize in its own small jit).

    Generating the full fp tree and quantizing it inside one jit peaks at
    fp-tree + quantize temps + quantized-tree HBM — at 7B that OOM'd the
    15.75G v5e chip and, on the shared-relay allocator, poisoned later
    allocations even when it squeaked through. Here the peak is the
    quantized-so-far tree + one stacked kernel + its quantize temps.

    `shapes` is the (unboxed) eval_shape tree for the FP model's params;
    returns the tree quantize_qwen_params (or quantize_for_serving, when
    `bits_map` spells out per-module bits) would produce."""
    from flax.core import meta

    shapes = meta.unbox(shapes)
    if bits_map is None:
        assert bits in (4, 8), bits
        bits_map = {k: bits for k in keys}
    key_holder = [jax.random.PRNGKey(seed)]

    def gen(sd):
        key_holder[0], sub = jax.random.split(key_holder[0])
        return _gen_leaf(sub, sd.shape, dtype)

    jq8 = jax.jit(quantize_int8)
    jq4 = jax.jit(quantize_int4)

    def walk(node, name):
        if isinstance(node, dict):
            if name in bits_map and "kernel" in node:
                out = {}
                for k, v in node.items():
                    if k == "kernel":
                        fp = gen(v)
                        if bits_map[name] == 8:
                            out["kernel_q"], out["scale"] = jq8(fp)
                        else:
                            out["kernel_q4"], out["scale_g"] = jq4(fp)
                        jax.block_until_ready(out)
                        del fp
                    else:
                        out[k] = gen(v)
                return out
            return {k: walk(v, k) for k, v in node.items()}
        return gen(node)

    return walk(shapes, "")


def random_serving_params(
    shapes: Dict[str, Any], mode: str, seed: int = 0
) -> Dict[str, Any]:
    """Leaf-wise random params matching quantize_for_serving(mode):
    int8 -> int8 LM + int8 vision; int4 -> int4 LM + int8 vision."""
    lm_bits = {"int8": 8, "int4": 4}[mode]
    bits_map = {k: lm_bits for k in QWEN_QUANT_KEYS}
    bits_map.update({k: 8 for k in VISION_QUANT_KEYS})
    return random_quantized_params(shapes, seed=seed, bits_map=bits_map)


@functools.partial(jax.jit, static_argnums=(1, 2))
def _gen_leaf(key, shape, dtype):
    return (jax.random.normal(key, shape) * 0.02).astype(dtype)


def quantize_for_serving(
    qwen_params: Dict[str, Any], mode: str
) -> Dict[str, Any]:
    """One-call serving transform for a Qwen(VL) subtree.

    mode "int8": int8 LM + int8 vision tower. mode "int4": int4 LM +
    int8 vision tower (the LM weights dominate decode HBM traffic;
    vision stays int8 for quality). Matches QwenTextConfig
    quant_int8/quant_int4 + QwenVisionConfig quant_int8."""
    if mode == "int8":
        return quantize_qwen_params(qwen_params, include_vision=True)
    assert mode == "int4", mode
    p8 = quantize_qwen_params(qwen_params, keys=VISION_QUANT_KEYS, bits=8)
    return quantize_qwen_params(p8, keys=QWEN_QUANT_KEYS, bits=4)


QUANT_CKPT_FILE = "rga3_quant.safetensors"
QUANT_CKPT_META = "rga3_quant.json"


def save_quantized(params: Dict[str, Any], out_dir: str, meta: Dict) -> str:
    """Persist an (already-quantized) params tree as one safetensors file
    + a meta json. Cold-start then reads int8/int4 kernels directly —
    no full-precision weights travel host->device (the slow hop on
    tunneled TPU setups), and disk shrinks accordingly."""
    import json
    import os

    import numpy as np
    from safetensors.numpy import save_file

    flat: Dict[str, Any] = {}

    def walk(node, path):
        if isinstance(node, dict):
            for kk, vv in node.items():
                walk(vv, path + (kk,))
            return
        flat["/".join(path)] = np.asarray(node)

    walk(params, ())
    os.makedirs(out_dir, exist_ok=True)
    save_file(flat, os.path.join(out_dir, QUANT_CKPT_FILE))
    with open(os.path.join(out_dir, QUANT_CKPT_META), "w") as f:
        json.dump(meta, f, indent=2)
    return out_dir


def is_quantized_dir(model_dir: str) -> bool:
    import os

    return os.path.exists(os.path.join(model_dir, QUANT_CKPT_FILE))


def load_quantized(model_dir: str) -> Tuple[Dict[str, Any], Dict]:
    """Inverse of save_quantized: (nested params tree, meta)."""
    import json
    import os

    from safetensors import safe_open

    tree: Dict[str, Any] = {}
    with safe_open(
        os.path.join(model_dir, QUANT_CKPT_FILE), framework="numpy"
    ) as f:
        for key in f.keys():
            node = tree
            parts = key.split("/")
            for p in parts[:-1]:
                node = node.setdefault(p, {})
            node[parts[-1]] = f.get_tensor(key)
    with open(os.path.join(model_dir, QUANT_CKPT_META)) as f:
        meta = json.load(f)
    return tree, meta


def dequantize_qwen_params(params: Dict[str, Any]) -> Dict[str, Any]:
    """Inverse transform (for export / debugging): {kernel_q, scale} ->
    {kernel} float32."""

    def walk(node):
        if isinstance(node, dict):
            if "kernel_q" in node and "scale" in node:
                out = {
                    k: v for k, v in node.items()
                    if k not in ("kernel_q", "scale")
                }
                out["kernel"] = (
                    np.asarray(node["kernel_q"], np.float32)
                    * np.asarray(node["scale"], np.float32)[..., None, :]
                )
                return out
            if "kernel_q4" in node and "scale_g" in node:
                out = {
                    k: v for k, v in node.items()
                    if k not in ("kernel_q4", "scale_g")
                }
                p = np.asarray(node["kernel_q4"], np.int8)
                low = np.right_shift(np.left_shift(p, 4), 4)
                high = np.right_shift(p, 4)
                *lead, half, o = p.shape
                in_dim = half * 2
                w = np.concatenate([low, high], axis=-2).astype(np.float32)
                g = int4_group(in_dim)
                sg = np.asarray(node["scale_g"], np.float32)
                out["kernel"] = (
                    w.reshape(*lead, in_dim // g, g, o) * sg[..., None, :]
                ).reshape(*lead, in_dim, o)
                return out
            return {k: walk(v) for k, v in node.items()}
        return node

    return walk(params)
